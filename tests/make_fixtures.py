"""Generate the checked-in codec fixtures under tests/fixtures/.

Run from the repo root:  python -m tests.make_fixtures

Synthesizes ogg/vorbis and ogg/opus sample files (the reference UI accepts
`aac flac m4a mp3 oga ogg opus wav`, src/prototypes/constants/tracks.ts:5,
but its own ogg/opus sample files are LFS-missing from the snapshot) by
compiling and running tests/tools/make_codec_fixtures.cpp against the
system ffmpeg libraries.  The outputs are committed so the test suite does
NOT need the encoders — only the decoder the engine already binds.
"""

from __future__ import annotations

import ctypes.util
import pathlib
import subprocess
import tempfile

HERE = pathlib.Path(__file__).resolve().parent
FIXTURES = HERE / "fixtures"
TOOL_SRC = HERE / "tools" / "make_codec_fixtures.cpp"


def _lib(name: str) -> str:
    found = ctypes.util.find_library(name)
    if not found:
        raise SystemExit(f"lib{name} not found")
    return f"/usr/lib/x86_64-linux-gnu/{found}"


def main() -> None:
    FIXTURES.mkdir(exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        exe = pathlib.Path(td) / "make_codec_fixtures"
        subprocess.run(
            [
                "g++", "-O2", "-std=c++17", "-o", str(exe), str(TOOL_SRC),
                _lib("avformat"), _lib("avcodec"), _lib("avutil"),
            ],
            check=True,
        )
        vorbis = FIXTURES / "fixture_vorbis.ogg"
        opus = FIXTURES / "fixture_opus.ogg"
        subprocess.run([str(exe), str(vorbis), str(opus)], check=True)
        for p in (vorbis, opus):
            print(p.name, p.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
