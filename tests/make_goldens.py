"""Generate the checked-in regression goldens under tests/goldens/.

Run from the repo root:  python -m tests.make_goldens

Pins the end-to-end decode -> spec -> u16 image -> tile pipeline
byte-for-byte (SURVEY §4 "implication for the rebuild": an image-diff test
the reference itself lacks).  Artifacts:

  goldens.json        scalar anchors (decode, stats, spec bounds, hashes)
  synth48k_db_crop.npy    f32 dB crop (frames 1000:1032, all mel rows)
  synth48k_spec_t0.bin    spectrogram tile bytes, level (0,0) tile (1,0)
  synth48k_spec_t1.bin    spectrogram tile bytes, level (2,1) tile (0,0)
  synth48k_wave_t0.bin    waveform tile bytes, level 0 tile 3 (per-sample)
  synth48k_wave_t1.bin    waveform tile bytes, level 11 tile 0
  sample16k_spec_t0.bin / sample16k_wave_t0.bin   same for the real corpus
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import sys
import tempfile

import numpy as np

# goldens pin the CPU-backend pipeline — the backend tests run on
# (tests/conftest.py); force it before jax initializes
os.environ["JAX_PLATFORMS"] = "cpu"
# goldens pin the post-switch state synchronously
os.environ["THESIA_DEFER_SETTINGS"] = "0"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tests.synth import SYNTH48K_N, SYNTH48K_SR, synth48k_wavs, synth48k_write  # noqa: E402

GOLDENS = pathlib.Path(__file__).resolve().parent / "goldens"
SAMPLES = pathlib.Path("/root/reference/samples")
SAMPLE_16K = SAMPLES / "sample_16k.wav"


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"


def corpus_files() -> list[pathlib.Path]:
    """Every decodeable file in the reference samples dir (sorted for
    deterministic track ids; invalid_audio.wav is the decode-failure
    fixture — covered by test_engine, not a golden), plus the checked-in
    ogg/vorbis + ogg/opus fixtures so the vorbis/opus numerics paths are
    pinned end-to-end too."""
    return sorted(
        p for p in SAMPLES.iterdir() if p.name != "invalid_audio.wav"
    ) + sorted(FIXTURES.glob("*.ogg"))


def corpus_goldens() -> dict:
    """Pin the END-TO-END pipeline for the whole present samples corpus
    (VERDICT r3 weak #3: previously only synth-48k + sample_16k were pinned,
    so a numerics regression confined to e.g. the s24 or 22.05 kHz path
    passed the suite).  Per file: decode anchors, format-info naming
    (audio.rs:195-260 semantics), stats, dB-array sha, u16-image sha per
    channel, and tile bytes at >=2 LODs (len+sha)."""
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.render import default_colormap_rgba8

    files = corpus_files()
    out: dict = {"files": [p.name for p in files]}
    with tempfile.TemporaryDirectory() as td:
        s = EngineSession(settings_dir=pathlib.Path(td) / "cfg")
        s.init(default_colormap_rgba8())
        ids = list(range(len(files)))
        added = s.add_tracks(ids, [str(p) for p in files])
        assert added == ids, (added, ids)
        s.apply_track_list_changes()
        s.tm.images.drain()

        for tid, path in zip(ids, files):
            tr = s.tracklist[tid]
            wavs = np.asarray(tr.original.wavs, np.float32)
            st = tr.original.stats
            res = s.tm.specs[tid]
            db = np.ascontiguousarray(np.asarray(res.db_padded)[:, : res.n_frames])
            entry = {
                "decode": {
                    "n_ch": int(wavs.shape[0]),
                    "n_samples": int(wavs.shape[1]),
                    "sr": int(tr.sr),
                    "first_8": wavs[0, :8].tolist(),
                    "sum_abs": float(np.abs(wavs, dtype=np.float64).sum()),
                    "sha_samples": sha(wavs.tobytes()),
                },
                "format_info": s.get_format_info(tid),
                "stats": {
                    "global_lufs": st.global_lufs,
                    "rms_db": st.rms_db,
                    "max_peak": st.max_peak,
                    "max_peak_db": st.max_peak_db,
                },
                "sha_db": sha(db.tobytes()),
                "sha_img": [
                    sha(np.ascontiguousarray(s.tm.spec_imgs[(tid, ch)]).tobytes())
                    for ch in range(wavs.shape[0])
                ],
                "tiles": {},
            }
            md = s.get_audio_render_metadata(f"{tid}_0")
            entry["metadata"] = md
            h, w = s.tm.images.geometry(tid)
            lx2 = 1 if w >= 2 else 0
            ly2 = 1 if h >= 2 else 0
            lv2 = 4 if wavs.shape[1] >= 16 * 1024 else 0
            for name, data in [
                ("spec_l00", s.get_spectrogram_tile(f"{tid}_0", 0, 0, 0, 0)),
                (f"spec_l{lx2}{ly2}", s.get_spectrogram_tile(f"{tid}_0", lx2, ly2, 0, 0)),
                ("wave_l0", s.get_waveform_tile(f"{tid}_0", 0, 0)),
                (f"wave_l{lv2}", s.get_waveform_tile(f"{tid}_0", lv2, 0)),
            ]:
                # tile headers carry process-dependent revisions (first 8
                # bytes); pin the payload
                entry["tiles"][name] = {"len": len(data), "sha": sha(data[8:])}
            out[path.name] = entry
        out["db_range"] = [s.tm.min_db, s.tm.max_db]
        s.tm.images.shutdown()  # stop streamer threads before the tmpdir goes
    return out


def main() -> None:
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.render import default_colormap_rgba8
    from thesia_tpu import native

    GOLDENS.mkdir(exist_ok=True)
    out: dict = {"native_tile_encoder": native.available()}

    wavs = synth48k_wavs()
    out["synth48k"] = {
        "n_samples": SYNTH48K_N,
        "sr": SYNTH48K_SR,
        "first_16": wavs[0, :16].tolist(),
        "sum_abs": float(np.abs(wavs, dtype=np.float64).sum()),
        "sha_samples": sha(wavs.tobytes()),
    }

    with tempfile.TemporaryDirectory() as td:
        wav_path = pathlib.Path(td) / "synth48k.wav"
        synth48k_write(wav_path)
        out["synth48k"]["sha_file"] = sha(wav_path.read_bytes())

        s = EngineSession(settings_dir=pathlib.Path(td) / "cfg")
        s.init(default_colormap_rgba8())
        added = s.add_tracks([0, 1], [str(wav_path), str(SAMPLE_16K)])
        assert added == [0, 1], added
        s.apply_track_list_changes()

        # decode/stats anchors (host reference paths)
        tl = s.tracklist
        tr = tl[0]
        st = tr.original.stats
        out["synth48k"]["stats"] = {
            "global_lufs": st.global_lufs,
            "rms_db": st.rms_db,
            "max_peak": st.max_peak,
            "max_peak_db": st.max_peak_db,
        }

        s.tm.images.drain()  # settle isComputing for a deterministic golden
        md0 = s.get_audio_render_metadata("0_0")
        md1 = s.get_audio_render_metadata("1_0")
        out["synth48k"]["metadata"] = md0
        out["sample16k_metadata"] = md1
        out["db_range"] = [s.tm.min_db, s.tm.max_db]

        res = s.tm.specs[0]
        db = np.asarray(res.db_padded)[0, :res.n_frames]
        out["synth48k"]["spec"] = {
            "shape": list(db.shape),
            "min_db": float(db.min()),
            "max_db": float(db.max()),
            "sha_db": sha(np.ascontiguousarray(db).tobytes()),
        }
        np.save(GOLDENS / "synth48k_db_crop.npy", db[1000:1032])

        img = s.tm.spec_imgs[(0, 0)]
        out["synth48k"]["img"] = {
            "shape": list(img.shape),
            "sha": sha(np.ascontiguousarray(img).tobytes()),
        }

        tiles = {
            "synth48k_spec_t0.bin": ("0_0", "spec", (0, 0, 1, 0)),
            "synth48k_spec_t1.bin": ("0_0", "spec", (2, 1, 0, 0)),
            "synth48k_wave_t0.bin": ("0_0", "wave", (0, 3)),
            "synth48k_wave_t1.bin": ("0_0", "wave", (11, 0)),
            "sample16k_spec_t0.bin": ("1_0", "spec", (0, 0, 0, 0)),
            "sample16k_wave_t0.bin": ("1_0", "wave", (4, 0)),
        }
        out["tiles"] = {}
        for fname, (idch, kind, args) in tiles.items():
            if kind == "spec":
                data = s.get_spectrogram_tile(idch, *args)
            else:
                data = s.get_waveform_tile(idch, *args)
            (GOLDENS / fname).write_bytes(data)
            out["tiles"][fname] = {"len": len(data), "sha": sha(data)}

        # settings-change recompute path (set_spec_setting, SURVEY §3.3):
        # 20 ms Linear config pins a second executable family end-to-end
        from thesia_tpu.dsp.framing import SpecSetting

        s.set_spec_setting(
            SpecSetting.from_json(
                {"winMillisec": 20, "tOverlap": 4, "fOverlap": 1, "freqScale": "Linear"}
            ).to_json()
        )
        s.tm.images.drain()
        md20 = s.get_audio_render_metadata("0_0")
        out["synth48k_metadata_20ms_linear"] = md20
        data = s.get_spectrogram_tile("0_0", 1, 1, 1, 0)
        (GOLDENS / "synth48k_spec_20ms_linear.bin").write_bytes(data)
        out["tiles"]["synth48k_spec_20ms_linear.bin"] = {
            "len": len(data), "sha": sha(data),
        }
        s.tm.images.shutdown()  # stop streamer threads before the tmpdir goes

    (GOLDENS / "goldens.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out["synth48k"]["stats"], indent=1))
    print("tiles:", {k: v["len"] for k, v in out["tiles"].items()})

    corpus = corpus_goldens()
    (GOLDENS / "corpus.json").write_text(json.dumps(corpus, indent=1))
    print("corpus:", {f: corpus[f]["stats"]["global_lufs"] for f in corpus["files"]})


if __name__ == "__main__":
    main()
