"""Randomized end-to-end soak over the full command surface (CPU backend).

A lite model checker: ~120 random operations against a live EngineSession —
adds/removes/reloads, settings and dB-range churn, normalize/guard cycling,
tile and metadata fetches (including out-of-range), axis markers, player
commands — asserting that nothing raises outside the documented error
contract and that the session settles consistent at the end."""

import numpy as np
import pytest

from thesia_tpu.engine.session import EngineSession, format_id_ch
from thesia_tpu.io.wav import encode_wav_f32, encode_wav_s16
from thesia_tpu.render import default_colormap_rgba8

OPS = 120


@pytest.mark.parametrize("seed", [1, 2])
def test_session_random_ops_soak(tmp_path, seed):
    rng = np.random.default_rng(seed)
    # small corpus: mixed sr/depth/channels
    paths = []
    for i, (sr, c, sec, enc) in enumerate([
        (8000, 1, 0.8, encode_wav_f32),
        (8000, 2, 1.5, encode_wav_s16),
        (16000, 1, 1.0, encode_wav_f32),
        (22050, 2, 0.6, encode_wav_s16),
    ]):
        w = (0.4 * rng.uniform(-1, 1, (c, int(sr * sec)))).astype(np.float32)
        p = tmp_path / f"s{i}.wav"
        p.write_bytes(enc(w, sr))
        paths.append(str(p))

    s = EngineSession(settings_dir=str(tmp_path / "cfg"))
    s.init(default_colormap_rgba8())
    live: set[int] = set()
    next_id = 0
    expected_errors = (ValueError, KeyError, AssertionError)

    def random_id():
        if live and rng.random() < 0.8:
            return int(rng.choice(sorted(live)))
        return int(rng.integers(0, next_id + 2))

    for step in range(OPS):
        op = rng.integers(0, 15)
        try:
            if op == 0 or not live:  # add
                tid = next_id
                next_id += 1
                added = s.add_tracks([tid], [str(rng.choice(paths))])
                live.update(added)
                s.apply_track_list_changes()
            elif op == 1 and len(live) > 1:  # remove
                tid = int(rng.choice(sorted(live)))
                s.remove_tracks([tid])
                live.discard(tid)
                s.apply_track_list_changes()
            elif op == 2:
                s.reload_tracks([random_id()])
                s.apply_track_list_changes()
            elif op == 3:
                s.set_spec_setting({
                    "winMillisec": float(rng.choice([10.0, 20.0, 40.0])),
                    "tOverlap": int(rng.choice([1, 2, 4, 8])),
                    "fOverlap": 1,
                    "freqScale": str(rng.choice(["Mel", "Linear"])),
                })
            elif op == 4:
                s.set_db_range(float(rng.choice([40.0, 80.0, 100.0, 120.0])))
            elif op == 5:
                t = str(rng.choice(["Off", "LUFS", "PeakdB", "RMSdB"]))
                body = {"type": t} if t == "Off" else {"type": t, "target": float(rng.uniform(-30, -3))}
                s.set_common_normalize(body)
            elif op == 6:
                s.set_common_guard_clipping(str(rng.choice(["Clip", "ReduceGlobalLevel", "Limiter"])))
            elif op == 7:  # tiles, sometimes absurd
                tid = random_id()
                ch = int(rng.integers(0, 3))
                s.get_spectrogram_tile(
                    format_id_ch(tid, ch),
                    int(rng.integers(0, 6)), int(rng.integers(0, 3)),
                    int(rng.integers(0, 9)), int(rng.integers(0, 3)),
                )
                s.get_waveform_tile(format_id_ch(tid, ch), int(rng.integers(0, 20)), int(rng.integers(0, 6)))
            elif op == 8:
                s.get_audio_render_metadata(format_id_ch(random_id(), int(rng.integers(0, 2))))
            elif op == 9:
                from thesia_tpu.axis.markers import calc_freq_axis_markers, calc_time_axis_markers
                from thesia_tpu.common.freqscale import FreqScale

                calc_time_axis_markers(0.0, float(rng.uniform(0.1, 100)), 1.0, 2, 100.0)
                calc_freq_axis_markers((0.0, float(rng.uniform(100, 12000))), FreqScale.Mel, 8, 4, 11025.0)
            elif op == 10:
                tid = random_id()
                s.set_track_player(tid, float(rng.uniform(0, 3)))
                s.seek_player(float(rng.uniform(-1, 10)))
                s.pause_player() if rng.random() < 0.5 else s.resume_player()
            elif op == 11:
                # extreme-but-valid settings: the hop>=1 floor and the
                # huge-window rfft fallback paths must survive the churn
                s.set_spec_setting({
                    "winMillisec": float(rng.choice([1.0, 2000.0])),
                    "tOverlap": int(rng.choice([1, 32])),
                    "fOverlap": 1,
                    "freqScale": str(rng.choice(["Mel", "Linear"])),
                })
                # restore a production-ish setting so later steps stay fast
                s.set_spec_setting({
                    "winMillisec": 40.0, "tOverlap": 4, "fOverlap": 1,
                    "freqScale": "Mel",
                })
            elif op == 12:
                # hostile knobs -> documented ValueError only (inf parses
                # from JSON's bare Infinity literal)
                s.set_db_range(float(rng.choice([np.inf, np.nan, -5.0, 0.0])))
            elif op == 13:
                # poisoned persists are rejected at entry, never stored
                s.set_user_settings({"specSetting": {
                    "winMillisec": float(rng.choice([1e9, np.nan])),
                    "tOverlap": 4, "fOverlap": 1, "freqScale": "Mel",
                }})
            else:
                s.get_max_db() if hasattr(s, "get_max_db") else None
                s.apply_track_list_changes()
        except expected_errors:
            pass  # documented client-error contract
        # anything else (TypeError deep in the engine, deadlock via timeout,
        # struct.error, RuntimeError) fails the test

    # settle and check end-state consistency
    s.apply_track_list_changes()
    s.tm.images.drain(timeout=60)
    for tid in live:
        md = s.get_audio_render_metadata(format_id_ch(tid, 0))
        assert md is not None and md["spectrogramWidth"] > 0
        assert md["isComputing"] is False, f"track {tid} stuck computing"
        body = s.get_spectrogram_tile(format_id_ch(tid, 0), 0, 0, 0, 0)
        assert isinstance(body, (bytes, bytearray)) and len(body) >= 40
    imgs = s.tm.spec_imgs
    img_tids = {tid for tid, _ch in imgs}
    assert img_tids == live, (sorted(img_tids), sorted(live))


def test_deferred_settings_churn_soak(tmp_path, monkeypatch):
    """Randomized churn with DEFERRED switches on (the production default):
    interleaved deferred knob turns, adds, removes, tile fetches, and dB
    changes must settle to a consistent state — the last target applied,
    every live track's image complete, tiles serving, no stuck
    isComputing."""
    import numpy as np

    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32
    from thesia_tpu.render import default_colormap_rgba8

    monkeypatch.setenv("THESIA_DEFER_SETTINGS", "1")
    rng = np.random.default_rng(77)
    td = tmp_path
    paths = []
    for i, (sr, sec) in enumerate([(8000, 4.0), (16000, 3.0), (8000, 2.0)]):
        w = rng.uniform(-0.6, 0.6, (1, int(sr * sec))).astype(np.float32)
        p = td / f"soak{i}.wav"
        p.write_bytes(encode_wav_f32(w, sr))
        paths.append(str(p))

    s = EngineSession(settings_dir=td / "cfg")
    s.init(default_colormap_rgba8())
    assert s.add_tracks([0], [paths[0]]) == [0]
    s.apply_track_list_changes()
    try:
        live = {0}
        next_id = 1
        last_setting = None
        last_norm = None
        last_guard = None
        for step in range(40):
            op = rng.integers(7)
            if op == 5:
                last_norm = rng.choice([
                    {"type": "Off"},
                    {"type": "LUFS", "target": float(rng.uniform(-30, 5))},
                    {"type": "PeakdB", "target": float(rng.uniform(-12, 0))},
                ])
                s.set_common_normalize(last_norm)  # deferred (env default)
            elif op == 6:
                last_guard = str(rng.choice(["Clip", "ReduceGlobalLevel", "Limiter"]))
                s.set_common_guard_clipping(last_guard)  # deferred
            elif op == 0:
                last_setting = {
                    "winMillisec": float(rng.choice([10, 20, 40, 80])),
                    "tOverlap": int(rng.choice([1, 2, 4, 8])),
                    "fOverlap": 1,
                    "freqScale": str(rng.choice(["Mel", "Linear"])),
                }
                s.set_spec_setting(last_setting)  # deferred (env default)
            elif op == 1 and len(live) < 3:
                tid = next_id
                next_id += 1
                if s.add_tracks([tid], [paths[tid % len(paths)]]) == [tid]:
                    live.add(tid)
                s.apply_track_list_changes()
            elif op == 2 and len(live) > 1:
                tid = int(rng.choice(sorted(live)))
                s.remove_tracks([tid])
                live.discard(tid)
                s.apply_track_list_changes()
            elif op == 3:
                s.set_db_range(float(rng.uniform(40, 120)))
            else:
                tid = int(rng.choice(sorted(live)))
                try:
                    s.get_spectrogram_tile(f"{tid}_0", 0, 0, 0, 0)
                except KeyError:
                    pass  # racing a remove
        assert s.settings_settled(timeout=300)
        s.tm.images.drain()
        if last_setting is not None:
            got = s.get_spec_setting()
            assert got["winMillisec"] == last_setting["winMillisec"]
            assert got["tOverlap"] == last_setting["tOverlap"]
            assert s.tm.setting.win_ms == last_setting["winMillisec"]
        # latest normalize/guard targets landed in the tracklist
        if last_norm is not None:
            assert s.tracklist.common_normalize.to_json() == last_norm
            assert s.get_common_normalize() == last_norm
        if last_guard is not None:
            assert s.tracklist.common_guard_clipping.value == last_guard
            assert s.get_common_guard_clipping() == last_guard
        for tid in live:
            md = s.get_audio_render_metadata(f"{tid}_0")
            assert md["isComputing"] is False, tid
            assert md["spectrogramWidth"] > 0
            tile = s.get_spectrogram_tile(f"{tid}_0", 0, 0, 0, 0)
            assert len(tile) > 40
        # range-consistency oracle (round-5 deferred apply): a forced
        # requantize under the SAME range must not change a byte — any
        # image a missed/skipped reconcile left at a stale range diverges
        imgs_settled = {k: np.asarray(v).copy() for k, v in s.tm.spec_imgs.items()}
        s.set_db_range(s.tm.db_range)
        imgs_forced = s.tm.spec_imgs
        assert set(imgs_forced) == set(imgs_settled)
        for k in imgs_settled:
            assert np.array_equal(imgs_settled[k], np.asarray(imgs_forced[k])), k
    finally:
        s.tm.images.shutdown()
