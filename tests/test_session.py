"""End-to-end session tests: the full command surface over real samples.

Mirrors the reference call stacks (SURVEY §3.2, §3.3): add tracks -> specs ->
images -> tiles; settings changes invalidate revisions.
"""

import struct

import numpy as np
import pytest

from thesia_tpu.dynamics.normalize import NormalizeTarget
from thesia_tpu.engine.session import EngineSession, json_number, parse_id_ch_str
from thesia_tpu.render import decode_spectrogram_tile, decode_waveform_tile, default_colormap_rgba8


@pytest.fixture()
def session(tmp_path, samples_dir):
    if not (samples_dir / "sample_16k.wav").exists():
        pytest.skip("sample corpus incomplete")
    s = EngineSession(settings_dir=tmp_path)
    s.init(default_colormap_rgba8())
    return s


def test_json_number():
    assert json_number(float("inf")) == {"type": "Infinity"}
    assert json_number(float("-inf")) == {"type": "NegInfinity"}
    assert json_number(float("nan")) == {"type": "NaN"}
    assert json_number(1.5) == {"type": "Finite", "value": 1.5}


def test_id_ch_parsing():
    assert parse_id_ch_str("3_1") == (3, 1)
    with pytest.raises(ValueError):
        parse_id_ch_str("3")


def test_full_pipeline(session, samples_dir):
    added = session.add_tracks([0, 1], [
        str(samples_dir / "sample_16k.wav"),
        str(samples_dir / "1kHz_1sec_sr24kHz.wav"),
    ])
    assert added == [0, 1]
    refreshed = session.apply_track_list_changes()
    assert set(refreshed) == {"0_0", "1_0"}

    md = session.get_audio_render_metadata("0_0")
    assert md is not None
    assert md["sampleRate"] == 16000
    assert md["spectrogramWidth"] > 0 and md["spectrogramHeight"] > 0

    # waveform tile decodes with the expected header
    data = session.get_waveform_tile("0_0", 4, 0)
    tile = decode_waveform_tile(data)
    assert tile["revision"] == md["waveformRevision"]
    assert tile["samplesPerBin"] == 16
    assert tile["binCount"] > 0
    # second fetch is served from the cache, identical bytes
    assert session.get_waveform_tile("0_0", 4, 0) == data

    # spectrogram tile
    sdata = session.get_spectrogram_tile("0_0", 0, 0, 0, 0)
    stile = decode_spectrogram_tile(sdata)
    assert stile["revision"] == md["spectrogramRevision"]
    assert stile["width"] > 0 and stile["height"] > 0
    assert stile["rgba"].shape[2] == 4

    # getters
    assert session.get_sample_rate(0) == 16000
    assert session.get_channel_counts(0) == 1
    assert session.get_length_sec(0) > 0
    assert session.get_max_track_hz() == 12000.0
    assert session.get_format_info(0)["name"] == "wav - pcm_s16le"
    assert session.get_file_name(0) == "sample_16k.wav"
    assert session.get_max_db()["type"] in ("Finite", "NegInfinity")
    lufs = session.get_global_lufs(1)
    assert lufs["type"] == "Finite" and -40 < lufs["value"] < 0
    assert session.find_id_by_path(str(samples_dir / "sample_16k.wav")) == 0
    assert session.find_id_by_path("/nonexistent.wav") == -1


def test_spec_setting_invalidates_revision(session, samples_dir):
    session.add_tracks([0], [str(samples_dir / "sample_16k.wav")])
    session.apply_track_list_changes()
    md0 = session.get_audio_render_metadata("0_0")
    session.set_spec_setting({"winMillisec": 20.0, "tOverlap": 2, "fOverlap": 1, "freqScale": "Linear"})
    md1 = session.get_audio_render_metadata("0_0")
    assert md1["spectrogramRevision"] > md0["spectrogramRevision"]
    assert md1["spectrogramHeight"] != md0["spectrogramHeight"]
    assert session.get_spec_setting()["freqScale"] == "Linear"


def test_db_range_roundtrip(session, samples_dir):
    session.add_tracks([0], [str(samples_dir / "sample_16k.wav")])
    session.apply_track_list_changes()
    assert session.get_db_range() == 100.0
    session.set_db_range(60.0)
    assert session.get_db_range() == 60.0
    assert session.tm.min_db >= session.tm.max_db - 60.0


def test_normalize_and_guard_commands(session, samples_dir):
    session.add_tracks([0], [str(samples_dir / "sample_16k.wav")])
    session.apply_track_list_changes()
    session.set_common_normalize({"type": "PeakdB", "target": -3.0})
    assert session.get_common_normalize() == {"type": "PeakdB", "target": -3.0}
    peak_db = session.get_max_peak_db(0)
    assert abs(peak_db["value"] + 3.0) < 0.1
    session.set_common_guard_clipping("Limiter")
    assert session.get_common_guard_clipping() == "Limiter"
    session.set_common_normalize({"type": "Off"})
    stats = session.get_guard_clip_stats(0)
    assert isinstance(stats, list)


def test_remove_and_error_paths(session, samples_dir):
    session.add_tracks([0], [str(samples_dir / "sample_16k.wav")])
    session.apply_track_list_changes()
    session.remove_tracks([0])
    assert session.get_audio_render_metadata("0_0") is None
    with pytest.raises(KeyError):
        session.get_waveform_tile("0_0", 0, 0)
    with pytest.raises(KeyError):
        session.get_spectrogram_tile("0_0", 0, 0, 0, 0)
    # add_tracks with an invalid file -> skipped, errored id not in result
    added = session.add_tracks([5, 6], [
        str(samples_dir / "invalid_audio.wav"),
        str(samples_dir / "sample_16k.wav"),
    ])
    assert added == [6]


def test_player_commands(session, samples_dir):
    session.add_tracks([0], [str(samples_dir / "1kHz_1sec_sr24kHz.wav")])
    session.apply_track_list_changes()
    events = []
    session.add_listener(lambda name, p: events.append((name, p)))
    session.set_track_player(0, 0.25)
    st = session.player.state()
    assert st["trackId"] == 0
    assert abs(st["positionSec"] - 0.25) < 1e-6
    session.resume_player()
    assert session.player.state()["isPlaying"]
    session.pause_player()
    assert not session.player.state()["isPlaying"]
    session.seek_player(0.5)
    assert abs(session.player.state()["positionSec"] - 0.5) < 1e-6
    session.set_volume_db(-6.0)
    assert abs(session.player.playback.volume - 10 ** (-6 / 20)) < 1e-6
    assert any(n == "player-state-changed" for n, _ in events)


def test_settings_persistence(tmp_path, samples_dir):
    if not (samples_dir / "sample_16k.wav").exists():
        pytest.skip("sample corpus incomplete")
    s1 = EngineSession(settings_dir=tmp_path)
    s1.init(default_colormap_rgba8())
    s1.set_user_settings({"dBRange": 80.0, "blend": 0.7})
    s2 = EngineSession(settings_dir=tmp_path)
    out = s2.init(default_colormap_rgba8())
    assert out["userSettings"]["dBRange"] == 80.0
    assert out["userSettings"]["blend"] == 0.7
    assert out["constants"]["PLAY_JUMP_SEC"] == 1.0


def test_user_settings_validated_and_poison_proof(tmp_path):
    """set_user_settings rejects values the settings entry points would
    refuse (the reference deserializes into typed UserSettingsOptionals,
    lib.rs:100-149), and a settings.json poisoned BEHIND the API (disk
    corruption, old version) degrades to defaults at init instead of
    bricking it — a persisted winMillisec=1e9 would otherwise build an
    astronomically large DFT matrix inside init's write closure."""
    import json as _json

    s = EngineSession(settings_dir=tmp_path)
    s.init(default_colormap_rgba8())
    # every malformed persist is a ValueError (-> HTTP 400)
    for bad in [
        {"specSetting": {"winMillisec": 1e9, "tOverlap": 4, "fOverlap": 1,
                         "freqScale": "Mel"}},
        {"specSetting": {"winMillisec": float("nan"), "tOverlap": 4,
                         "fOverlap": 1, "freqScale": "Mel"}},
        {"specSetting": {"winMillisec": 40.0, "tOverlap": 9999,
                         "fOverlap": 1, "freqScale": "Mel"}},
        {"specSetting": {"winMillisec": 40.0}},  # missing keys
        {"dBRange": float("nan")},
        {"dBRange": -5.0},
        {"blend": "bogus"},
        {"commonGuardClipping": "NotAMode"},
        {"commonNormalize": {"type": "LUFS"}},  # missing target
    ]:
        with pytest.raises(ValueError):
            s.set_user_settings(bad)
    # a valid partial persist still works after the rejections
    s.set_user_settings({"dBRange": 90.0})
    # poison the store file directly: init must fall back to defaults
    (tmp_path / "settings.json").write_text(_json.dumps({
        "specSetting": {"winMillisec": 1e9, "tOverlap": 4, "fOverlap": 1,
                        "freqScale": "Mel"},
        "dBRange": 90.0,
    }))
    s2 = EngineSession(settings_dir=tmp_path)
    out = s2.init(default_colormap_rgba8())
    assert out["userSettings"]["specSetting"]["winMillisec"] == 40.0
    assert out["userSettings"]["dBRange"] == 90.0  # the sane key survives


def test_failed_settings_switch_rolls_back_consistently(session, samples_dir, monkeypatch):
    """A switch that dies mid-recompute (device OOM, transient XLA error)
    must leave setting read-back AND the computed state on the proven-good
    old setting — not tm.setting claiming a never-applied value (review
    finding)."""
    session.add_tracks([0], [str(samples_dir / "sample_8k.wav")])
    session.apply_track_list_changes()
    session.tm.images.drain()
    old = session.get_spec_setting()
    w0 = session.get_audio_render_metadata("0_0")["spectrogramWidth"]

    orig = type(session.tm)._update_specs
    calls = {"n": 0}

    def boom(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:  # fail the switch, let the rollback recompute run
            raise RuntimeError("injected device failure")
        return orig(self, *a, **k)

    monkeypatch.setattr(type(session.tm), "_update_specs", boom)
    with pytest.raises(RuntimeError):
        session.set_spec_setting(
            {"winMillisec": 80.0, "tOverlap": 4, "fOverlap": 1, "freqScale": "Mel"},
            defer=False,
        )
    assert session.get_spec_setting() == old
    assert session.tm.setting.to_json() == old
    session.tm.images.drain()
    assert session.get_audio_render_metadata("0_0")["spectrogramWidth"] == w0
    # engine still fully operational on the old setting
    assert len(session.get_spectrogram_tile("0_0", 0, 0, 0, 0)) > 44


def test_failed_normalize_switch_restores_mode(session, samples_dir, monkeypatch):
    """TrackList.set_common_normalize failing mid-apply restores the mode
    attribute and re-applies the old target so no track is left half-gained
    against a flipped mode (review finding)."""
    session.add_tracks([1], [str(samples_dir / "sample_8k.wav")])
    session.apply_track_list_changes()
    before = session.tracklist.common_normalize.to_json()

    orig = type(session.tracklist)._normalize_tracks
    calls = {"n": 0}

    def boom(self, tracks):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected")
        return orig(self, tracks)

    monkeypatch.setattr(type(session.tracklist), "_normalize_tracks", boom)
    with pytest.raises(RuntimeError):
        session.tracklist.set_common_normalize(
            NormalizeTarget.from_json({"type": "LUFS", "target": -20.0})
        )
    assert session.tracklist.common_normalize.to_json() == before
    assert calls["n"] == 2  # the rollback re-apply ran


def test_open_files_dialog_path(tmp_path):
    s = EngineSession(settings_dir=tmp_path)
    assert s.get_open_files_dialog_path() == ""
    s.set_open_files_dialog_path("/music")
    assert s.get_open_files_dialog_path() == "/music"


def test_hostile_args_clean_errors(session, samples_dir):
    """Malformed tile coords / non-finite player args raise ValueError (the
    service maps these to 400s, never 500s)."""
    session.add_tracks([0], [str(samples_dir / "sample_8k.wav")])
    session.apply_track_list_changes()
    with pytest.raises(ValueError):
        session.get_waveform_tile("0_0", -1, 0)
    with pytest.raises(ValueError):
        session.get_waveform_tile("0_0", 2, -5)
    with pytest.raises(ValueError):
        session.get_spectrogram_tile("0_0", -1, 0, 0, 0)
    with pytest.raises(ValueError):
        session.get_spectrogram_tile("0_0", 0, 0, -1, 0)
    with pytest.raises(ValueError):
        session.seek_player(float("nan"))
    with pytest.raises(ValueError):
        session.set_track_player(0, float("inf"))
    with pytest.raises(ValueError):
        session.set_volume_db(float("-inf"))
    # out-of-range but well-formed coords return empty tiles, not errors
    assert len(session.get_waveform_tile("0_0", 40, 0)) == 36
    assert len(session.get_spectrogram_tile("0_0", 30, 30, 0, 0)) == 44


def test_non_numeric_args_clean_errors(session, samples_dir):
    """Non-numeric/None command args coerce-or-ValueError (never TypeError,
    which the service would surface as a 500)."""
    session.add_tracks([0], [str(samples_dir / "sample_8k.wav")])
    session.apply_track_list_changes()
    with pytest.raises(ValueError):
        session.get_waveform_tile("0_0", "x", 0)
    with pytest.raises(ValueError):
        session.get_waveform_tile("0_0", None, 0)
    with pytest.raises(ValueError):
        session.get_spectrogram_tile("0_0", 0, "y", 0, 0)
    with pytest.raises(ValueError):
        session.seek_player(None)
    with pytest.raises(ValueError):
        session.seek_player("NaN")
    with pytest.raises(ValueError):
        session.set_volume_db(None)
    # numeric strings coerce (lenient JSON clients)
    assert len(session.get_waveform_tile("0_0", "2", "0")) > 24


def test_wav_prefetch_upload_adopted_and_bitexact(tmp_path, monkeypatch):
    """Big 16-bit WAV adds upload the interleaved payload concurrently with
    decode (device-side deinterleave); the adopted upload must produce the
    same spectrogram bit-for-bit as the ordinary planar upload path, and the
    spec compute must reuse it (no second upload)."""
    import numpy as np

    from thesia_tpu.dsp.spectrogram import SpectrogramAnalyzer
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_s16
    from thesia_tpu.render import default_colormap_rgba8

    rng = np.random.default_rng(51)
    w = rng.uniform(-0.8, 0.8, (2, 120_000)).astype(np.float32)
    p = tmp_path / "pf.wav"
    p.write_bytes(encode_wav_s16(w, 8000))

    monkeypatch.setattr(EngineSession, "_PREFETCH_MIN_FILE_BYTES", 0)
    monkeypatch.setattr(SpectrogramAnalyzer, "_PREFETCH_MIN_BYTES", 0)
    adopted = []
    orig_adopt = SpectrogramAnalyzer.adopt_wav

    def spy(self, cache_key, dev, n, token):
        adopted.append((cache_key, id(dev)))
        return orig_adopt(self, cache_key, dev, n, token)

    monkeypatch.setattr(SpectrogramAnalyzer, "adopt_wav", spy)
    s = EngineSession(settings_dir=str(tmp_path / "cfg"))
    s.init(default_colormap_rgba8())
    s.add_tracks([0], [str(p)])
    an = s.tm.spec_analyzer
    assert adopted and adopted[0][0] == 0  # prefetch really adopted
    assert 0 in an._wav_cache
    assert id(an._wav_cache[0][0]) == adopted[0][1]  # cache entry IS it
    dev, n, token = an._wav_cache[0]
    assert n == 120_000 and token == s.tracklist[0].original.version
    # the cached device wav equals the decoded planar samples exactly
    host = np.asarray(dev)[:, :n]
    np.testing.assert_array_equal(host, s.tracklist[0].original.wavs)
    # spec compute must have REUSED the adopted upload, not replaced it
    s.apply_track_list_changes()
    assert id(an._wav_cache[0][0]) == id(dev)
    # and the pipeline output matches a session without prefetch
    s.tm.images.drain()
    imgs_pf = {k: np.asarray(v) for k, v in s.tm.spec_imgs.items()}
    monkeypatch.setattr(EngineSession, "_PREFETCH_MIN_FILE_BYTES", 1 << 60)
    s2 = EngineSession(settings_dir=str(tmp_path / "cfg2"))
    s2.init(default_colormap_rgba8())
    s2.add_tracks([0], [str(p)])
    s2.apply_track_list_changes()
    s2.tm.images.drain()
    for k, img in s2.tm.spec_imgs.items():
        np.testing.assert_array_equal(imgs_pf[k], np.asarray(img))


def test_wav_prefetch_read_failure_falls_back(tmp_path, monkeypatch):
    """The decoder and the prefetch share ONE file read (a changed-file race
    is structurally impossible).  When that shared read fails, the decoder
    must fall back to its own read, the prefetch must not adopt, and the
    ordinary upload path must leave the decoded samples in the cache."""
    import numpy as np

    from thesia_tpu.dsp.spectrogram import SpectrogramAnalyzer
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_s16
    from thesia_tpu.render import default_colormap_rgba8

    rng = np.random.default_rng(52)
    a = rng.uniform(-0.8, 0.8, (1, 60_000)).astype(np.float32)
    p = tmp_path / "race.wav"
    p.write_bytes(encode_wav_s16(a, 8000))

    monkeypatch.setattr(EngineSession, "_PREFETCH_MIN_FILE_BYTES", 0)
    monkeypatch.setattr(SpectrogramAnalyzer, "_PREFETCH_MIN_BYTES", 0)
    s = EngineSession(settings_dir=str(tmp_path / "cfg"))
    s.init(default_colormap_rgba8())

    def boom(read_fut):
        read_fut.result()  # consume
        raise OSError("simulated prefetch read/upload failure")

    monkeypatch.setattr(EngineSession, "_prefetch_one", lambda self, rf: boom(rf))
    added = s.add_tracks([0], [str(p)])
    assert added == [0]
    dev, n, _tok = s.tm.spec_analyzer._wav_cache[0]
    np.testing.assert_array_equal(
        np.asarray(dev)[:, :n], s.tracklist[0].original.wavs
    )

    # and a failing READ: decode must recover with its own read
    def bad_read(self, track_ids, paths):
        import concurrent.futures

        futs = {}
        pool = concurrent.futures.ThreadPoolExecutor(1)

        def fail():
            raise OSError("simulated read failure")

        rf = pool.submit(fail)
        uf = pool.submit(lambda: None)
        for tid in track_ids:
            futs[tid] = (rf, uf)
        return futs

    monkeypatch.setattr(EngineSession, "_start_wav_prefetch", bad_read)
    added = s.add_tracks([1], [str(p)])
    assert added == [1]
    np.testing.assert_array_equal(s.tracklist[1].original.wavs, s.tracklist[0].original.wavs)


# ---------------------------------------------------------------------------
# Deferred settings switches (round 4): set_spec_setting returns at
# dispatch; a serial background worker compiles off-lock then applies;
# latest generation wins; metadata reports isComputing until it lands.


def _deferred_session(tmp_path, monkeypatch):
    import threading

    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32
    from thesia_tpu.render import default_colormap_rgba8

    s = EngineSession(settings_dir=tmp_path / "cfg")
    s.init(default_colormap_rgba8())
    w = np.random.default_rng(0).uniform(-0.5, 0.5, (1, 16000)).astype(np.float32)
    p = tmp_path / "d.wav"
    p.write_bytes(encode_wav_f32(w, 8000))
    assert s.add_tracks([0], [str(p)]) == [0]
    s.apply_track_list_changes()
    s.tm.images.drain()
    gate = threading.Event()
    entered = threading.Event()
    orig = s._precompile_setting

    def gated(setting, gen):
        entered.set()
        assert gate.wait(20)
        return orig(setting, gen)

    monkeypatch.setattr(s, "_precompile_setting", gated)
    return s, gate, entered


def test_deferred_settings_switch_returns_at_dispatch(tmp_path, monkeypatch):
    import time

    s, gate, entered = _deferred_session(tmp_path, monkeypatch)
    md_before = s.get_audio_render_metadata("0_0")
    t0 = time.perf_counter()
    s.set_spec_setting(
        {"winMillisec": 20, "tOverlap": 4, "fOverlap": 1, "freqScale": "Mel"},
        defer=True,
    )
    call_s = time.perf_counter() - t0
    assert call_s < 1.0  # returned before the (gated) compile
    assert entered.wait(10)
    # read-back sees the TARGET; metadata reports computing; the OLD
    # revision keeps serving tiles
    assert s.get_spec_setting()["winMillisec"] == 20
    assert s.spec_switch_pending()
    md_mid = s.get_audio_render_metadata("0_0")
    assert md_mid["isComputing"] is True
    assert md_mid["spectrogramWidth"] == md_before["spectrogramWidth"]
    tile = s.get_spectrogram_tile("0_0", 0, 0, 0, 0)
    assert len(tile) > 40  # old-revision tile still serves mid-switch
    gate.set()
    assert s.settings_settled(timeout=60)
    s.tm.images.drain()
    md_after = s.get_audio_render_metadata("0_0")
    assert md_after["isComputing"] is False
    assert md_after["spectrogramWidth"] != md_before["spectrogramWidth"]
    assert md_after["spectrogramRevision"] > md_before["spectrogramRevision"]


def test_deferred_settings_switch_latest_wins(tmp_path, monkeypatch):
    s, gate, entered = _deferred_session(tmp_path, monkeypatch)
    applied = []
    orig_set = s.tm.set_setting

    def counting(tracklist, setting):
        applied.append(setting.win_ms)
        return orig_set(tracklist, setting)

    monkeypatch.setattr(s.tm, "set_setting", counting)
    for wm in (20, 80, 10):
        s.set_spec_setting(
            {"winMillisec": wm, "tOverlap": 4, "fOverlap": 1, "freqScale": "Mel"},
            defer=True,
        )
    assert entered.wait(10)
    gate.set()
    assert s.settings_settled(timeout=60)
    s.tm.images.drain()
    # superseded generations never dispatched; only the last applied
    assert applied == [10.0]
    assert s.get_spec_setting()["winMillisec"] == 10


def test_deferred_env_default(tmp_path, monkeypatch):
    """THESIA_DEFER_SETTINGS=1 (the production default) defers; the test
    conftest pins 0 so the rest of the suite stays synchronous."""
    monkeypatch.setenv("THESIA_DEFER_SETTINGS", "1")
    s, gate, entered = _deferred_session(tmp_path, monkeypatch)
    s.set_spec_setting(
        {"winMillisec": 20, "tOverlap": 4, "fOverlap": 1, "freqScale": "Mel"}
    )
    assert entered.wait(10)  # went through the background worker
    assert s.spec_switch_pending()
    gate.set()
    assert s.settings_settled(timeout=60)
    assert s.get_spec_setting()["winMillisec"] == 20


# ---------------------------------------------------------------------------
# Deferred normalize / guard switches (round 4): same return-at-dispatch
# contract as set_spec_setting — a Limiter-engaging session otherwise blocks
# the caller on gain-seq compute + wav re-upload under the write lock.


def _deferred_common_session(tmp_path, monkeypatch):
    import threading

    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32
    from thesia_tpu.render import default_colormap_rgba8

    s = EngineSession(settings_dir=tmp_path / "cfg")
    s.init(default_colormap_rgba8())
    w = np.random.default_rng(0).uniform(-0.5, 0.5, (1, 16000)).astype(np.float32)
    p = tmp_path / "d.wav"
    p.write_bytes(encode_wav_f32(w, 8000))
    assert s.add_tracks([0], [str(p)]) == [0]
    s.apply_track_list_changes()
    s.tm.images.drain()
    gate = threading.Event()
    entered = threading.Event()
    orig = s.tm.update_all_specs_imgs

    def gated(tracklist):
        entered.set()
        assert gate.wait(20)
        return orig(tracklist)

    monkeypatch.setattr(s.tm, "update_all_specs_imgs", gated)
    return s, gate, entered


def test_deferred_normalize_returns_at_dispatch(tmp_path, monkeypatch):
    import time

    s, gate, entered = _deferred_common_session(tmp_path, monkeypatch)
    md_before = s.get_audio_render_metadata("0_0")
    t0 = time.perf_counter()
    s.set_common_normalize({"type": "LUFS", "target": -20.0}, defer=True)
    call_s = time.perf_counter() - t0
    assert call_s < 1.0  # returned before the (gated) recompute
    assert entered.wait(10)
    # read-back sees the TARGET while the switch is still landing
    assert s.get_common_normalize() == {"type": "LUFS", "target": -20.0}
    assert s.spec_switch_pending()
    assert s.get_audio_render_metadata("0_0")["isComputing"] is True
    gate.set()
    assert s.settings_settled(timeout=60)
    s.tm.images.drain()
    assert s.tracklist.common_normalize.to_json() == {"type": "LUFS", "target": -20.0}
    md_after = s.get_audio_render_metadata("0_0")
    assert md_after["isComputing"] is False
    # the landed switch invalidated tiles (revision bump, viewer repaints)
    assert md_after["spectrogramRevision"] > md_before["spectrogramRevision"]


def test_deferred_normalize_latest_wins(tmp_path, monkeypatch):
    s, gate, entered = _deferred_common_session(tmp_path, monkeypatch)
    applied = []
    orig_set = type(s.tracklist).set_common_normalize

    def counting(tl, target):
        applied.append(target.to_json())
        return orig_set(tl, target)

    monkeypatch.setattr(type(s.tracklist), "set_common_normalize", counting)
    for target in (-10.0, -16.0, -23.0):
        s.set_common_normalize({"type": "LUFS", "target": target}, defer=True)
    assert entered.wait(10)
    gate.set()
    assert s.settings_settled(timeout=60)
    # superseded generations never dispatched; only the last applied
    assert applied == [{"type": "LUFS", "target": -23.0}]
    assert s.get_common_normalize() == {"type": "LUFS", "target": -23.0}


def test_deferred_guard_switch_and_cross_kind_fifo(tmp_path, monkeypatch):
    """Queue normalize THEN guard deferred; the serial pool applies both in
    order and the final state equals the synchronous sequence."""
    s, gate, entered = _deferred_common_session(tmp_path, monkeypatch)
    s.set_common_normalize({"type": "PeakdB", "target": -1.0}, defer=True)
    s.set_common_guard_clipping("Limiter", defer=True)
    assert s.get_common_guard_clipping() == "Limiter"
    assert entered.wait(10)
    gate.set()
    assert s.settings_settled(timeout=60)
    assert s.tracklist.common_guard_clipping.value == "Limiter"
    assert s.tracklist.common_normalize.to_json() == {"type": "PeakdB", "target": -1.0}

    # synchronous twin for the final state
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32
    from thesia_tpu.render import default_colormap_rgba8

    s2 = EngineSession(settings_dir=tmp_path / "cfg2")
    s2.init(default_colormap_rgba8())
    w = np.random.default_rng(0).uniform(-0.5, 0.5, (1, 16000)).astype(np.float32)
    p2 = tmp_path / "d2.wav"
    p2.write_bytes(encode_wav_f32(w, 8000))
    assert s2.add_tracks([0], [str(p2)]) == [0]
    s2.apply_track_list_changes()
    s2.set_common_normalize({"type": "PeakdB", "target": -1.0}, defer=False)
    s2.set_common_guard_clipping("Limiter", defer=False)
    np.testing.assert_array_equal(s.tracklist[0].audio.wavs, s2.tracklist[0].audio.wavs)


def test_deferred_guard_invalid_mode_raises_synchronously(tmp_path, monkeypatch):
    s, gate, entered = _deferred_common_session(tmp_path, monkeypatch)
    with pytest.raises(ValueError):
        s.set_common_guard_clipping("Bogus", defer=True)
    assert not s.spec_switch_pending()
    gate.set()


def test_deferred_common_switch_failure_rolls_back(tmp_path, monkeypatch):
    s, gate, entered = _deferred_common_session(tmp_path, monkeypatch)
    events = []
    s.add_listener(lambda name, p: events.append((name, p)))

    def boom(tl, mode):
        raise RuntimeError("simulated switch failure")

    # fail BEFORE the tracklist mutates: the reported value must roll back
    # to the actual (unchanged) state, not the never-applied target
    monkeypatch.setattr(type(s.tracklist), "set_common_guard_clipping", boom)
    s.set_common_guard_clipping("Limiter", defer=True)
    assert s.settings_settled(timeout=60)  # must not hang on failure
    # reported target rolled back to the tracklist's ACTUAL state
    assert s.get_common_guard_clipping() == "ReduceGlobalLevel"
    assert ("settings-switch-failed", {"commonGuardClipping": "Limiter"}) in events
