"""Background neighbor-shape precompile (VERDICT r2 #4)."""

import numpy as np
import pytest

from thesia_tpu.common.freqscale import FreqScale
from thesia_tpu.dsp import precompile
from thesia_tpu.dsp.framing import SpecSetting
from thesia_tpu.dsp.spectrogram import SpectrogramAnalyzer


def test_neighbor_settings_cover_knobs():
    cur = SpecSetting()
    ns = precompile.neighbor_settings(cur)
    keys = {(s.win_ms, s.t_overlap, s.freq_scale) for s in ns}
    assert (40.0, 1, FreqScale.Mel) in keys
    assert (40.0, 32, FreqScale.Mel) in keys
    assert (40.0, 4, FreqScale.Linear) in keys
    assert (20.0, 4, FreqScale.Mel) in keys
    # current setting itself excluded
    assert (40.0, 4, FreqScale.Mel) not in keys


def test_group_signature_matches_real_grouping():
    an = SpectrogramAnalyzer()
    items = [(0, (2, 48000), 16000), (1, (1, 48000), 16000), (2, (1, 30000), 8000)]
    sig = precompile.group_signature(an, items, SpecSetting())
    assert sig is not None
    arrays, specs = sig
    assert len(arrays) == 2  # two (sr, ...) groups
    for g, st in zip(arrays, specs):
        raw, ns, gains, cw, sw, mel = g
        hop, t_overlap, use_mel, bucket, pad, t_cap, rfft_n_fft, _sh = st
        assert raw.shape[1] == bucket and ns.shape[0] == raw.shape[0]
        assert gains.shape == ns.shape and gains.dtype == np.float32
        assert cw.shape == sw.shape
        assert rfft_n_fft is None  # production shapes stay on the DFT GEMM
        assert use_mel and mel.shape[0] == cw.shape[1]


def test_warmer_compiles_and_real_call_reuses(monkeypatch, tmp_path):
    monkeypatch.setenv("THESIA_PRECOMPILE", "1")
    an = SpectrogramAnalyzer()
    items = [(0, (1, 50000), 8000)]
    setting = SpecSetting(t_overlap=2)
    w = precompile.ShapeWarmer()
    w.submit([precompile.spec_groups_job(an, items, setting)])
    assert w.drain(timeout=120.0)
    assert w.compiled_count >= 1
    # the real batched call under that setting must still work
    wavs = np.random.default_rng(0).uniform(-0.5, 0.5, (1, 50000)).astype(np.float32)
    res = an.calc_specs_batched([(0, wavs, 8000, 1)], setting)
    assert res[0].n_frames > 0


def test_warmer_supersede_and_dedup(monkeypatch):
    monkeypatch.setenv("THESIA_PRECOMPILE", "1")
    an = SpectrogramAnalyzer()
    items = [(0, (1, 30000), 8000)]
    w = precompile.ShapeWarmer()
    job = precompile.spec_groups_job(an, items, SpecSetting(t_overlap=8))
    w.submit([job])
    assert w.drain(timeout=120.0)
    n = w.compiled_count
    w.submit([job])  # same signature: dedup, no second compile
    assert w.drain(timeout=120.0)
    assert w.compiled_count == n


def test_quantize_jobs_lower(monkeypatch):
    monkeypatch.setenv("THESIA_PRECOMPILE", "1")
    an = SpectrogramAnalyzer()
    items = [(0, (2, 48000), 16000)]
    jobs = precompile.quantize_jobs(an, items, SpecSetting(), max_sr=16000, colormap_length=258)
    assert jobs
    w = precompile.ShapeWarmer()
    w.submit(jobs)
    assert w.drain(timeout=120.0)
    assert w.compiled_count >= 1


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("THESIA_PRECOMPILE", "0")
    w = precompile.ShapeWarmer()
    w.submit([lambda: (_ for _ in ()).throw(RuntimeError)])
    assert w.drain(timeout=1.0)  # nothing queued
    assert w.compiled_count == 0


def test_neighbor_settings_nearest_knob_first():
    """VERDICT r3 weak #1: the +-1 detents / adjacent win presets / other
    freq scale come BEFORE the long tail."""
    cur = SpecSetting()  # 40 ms, t_overlap 4, Mel
    ns = precompile.neighbor_settings(cur)
    keys = [(s.win_ms, s.t_overlap, s.freq_scale) for s in ns]
    tier1 = set(keys[:5])
    assert (40.0, 2, FreqScale.Mel) in tier1  # t detent below
    assert (40.0, 8, FreqScale.Mel) in tier1  # t detent above
    assert (20.0, 4, FreqScale.Mel) in tier1  # win preset below
    assert (80.0, 4, FreqScale.Mel) in tier1  # win preset above
    assert (40.0, 4, FreqScale.Linear) in tier1  # other scale
    # the far detents trail
    assert keys.index((40.0, 32, FreqScale.Mel)) > 4
    assert keys.index((40.0, 1, FreqScale.Mel)) > 4
    assert keys.index((10.0, 4, FreqScale.Mel)) > 4
    # still covers everything exactly once
    assert len(keys) == len(set(keys)) == 9


def test_neighbor_settings_edge_detents():
    """At the edge of a detent range the two nearest same-side detents fill
    tier 1 instead of wrapping."""
    cur = SpecSetting(t_overlap=1, win_ms=10.0)
    ns = precompile.neighbor_settings(cur)
    keys = [(s.win_ms, s.t_overlap, s.freq_scale) for s in ns]
    tier1 = set(keys[:5])
    assert (10.0, 2, FreqScale.Mel) in tier1
    assert (10.0, 4, FreqScale.Mel) in tier1
    assert (20.0, 1, FreqScale.Mel) in tier1
    assert (40.0, 1, FreqScale.Mel) in tier1


def test_warmer_interactive_pauses_job_starts(monkeypatch):
    """`with warmer.interactive()` must block NEW job starts until exit
    (interactive settings changes pre-empt compile contention)."""
    import threading
    import time

    monkeypatch.setenv("THESIA_PRECOMPILE", "1")
    w = precompile.ShapeWarmer()
    started = []
    release = threading.Event()

    def slow_job(i):
        def make():
            def lower():
                started.append(i)
                release.wait(timeout=10)
            return (f"job{i}", lower)
        return make

    with w.interactive():
        w.submit([slow_job(0), slow_job(1)])
        time.sleep(0.3)
        assert started == []  # nothing starts while interactive
    # after exit the first job starts
    t0 = time.time()
    while not started and time.time() - t0 < 5:
        time.sleep(0.02)
    assert started == [0]
    # a second interactive block keeps job 1 from starting
    with w.interactive():
        release.set()  # job 0 finishes inside the block
        time.sleep(0.3)
        assert started == [0]
    assert w.drain(timeout=10)
    assert started == [0, 1]


def test_probe_shape_wav_and_flac(tmp_path):
    from thesia_tpu.io.probe import probe_shape
    from thesia_tpu.io.wav import encode_wav_s16

    w = np.zeros((2, 12345), np.float32)
    p = tmp_path / "probe.wav"
    p.write_bytes(encode_wav_s16(w, 22050))
    assert probe_shape(p) == (2, 12345, 22050)

    import pathlib

    flac = pathlib.Path("/root/reference/samples/sample_44k1.flac")
    if flac.exists():
        from thesia_tpu.io.decode import open_audio_file

        got = probe_shape(flac)
        wavs, info = open_audio_file(flac)
        assert got == (wavs.shape[0], wavs.shape[1], info.sr)

    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\x00" * 64)
    assert probe_shape(bad) is None
    assert probe_shape(tmp_path / "missing.wav") is None


def test_probe_m4a_skips_video_trak():
    """An mp4 whose FIRST trak is video (the common 90 kHz timescale) must
    not be probed as 90 kHz audio — the warmer would AOT-compile never-used
    shapes (review finding).  The hdlr handler_type gates trak selection."""
    from thesia_tpu.io.probe import _probe_m4a

    def box(name, payload):
        return (8 + len(payload)).to_bytes(4, "big") + name + payload

    def hdlr(kind):
        # ver/flags + pre_defined + handler_type + reserved[3] + name
        return box(b"hdlr", b"\x00" * 8 + kind + b"\x00" * 13)

    def mdhd(timescale, duration):
        return box(
            b"mdhd",
            b"\x00" * 12
            + timescale.to_bytes(4, "big")
            + duration.to_bytes(4, "big")
            + b"\x00" * 4,
        )

    def trak(kind, timescale, duration):
        return box(b"trak", box(b"mdia", hdlr(kind) + mdhd(timescale, duration)))

    video_first = box(
        b"moov",
        trak(b"vide", 90000, 90000 * 7) + trak(b"soun", 44100, 44100 * 7),
    )
    n_ch, duration, sr = _probe_m4a(video_first)
    assert (sr, duration) == (44100, 44100 * 7)
    # a file with ONLY a video trak probes as nothing, not as 90 kHz audio
    assert _probe_m4a(box(b"moov", trak(b"vide", 90000, 90000))) is None


def test_probe_shape_compressed_containers():
    """Header-only probes for every accepted compressed format: channel
    count and sample rate EXACT (the warm shape's row count and framing
    depend on them), duration within the same wav_size_bucket class as the
    decoded truth (what the warmed executable is keyed on)."""
    import pathlib

    from thesia_tpu.dsp.spectrogram import wav_size_bucket
    from thesia_tpu.io.decode import open_audio_file
    from thesia_tpu.io.probe import probe_shape

    cases = [
        "/root/reference/samples/sample_44k1.mp3",
        "/root/reference/samples/sample_44k1-aac.m4a",
        "/root/reference/samples/sample_44k1-alac.m4a",
        "tests/fixtures/fixture_vorbis.ogg",
        "tests/fixtures/fixture_opus.ogg",
    ]
    for path in cases:
        if not pathlib.Path(path).exists():
            continue
        got = probe_shape(path)
        assert got is not None, path
        n_ch, n, sr = got
        wavs, info = open_audio_file(path)
        assert n_ch == wavs.shape[0], path  # exact (incl. AAC esds ASC)
        assert sr == info.sr, path
        assert abs(n - wavs.shape[1]) / wavs.shape[1] < 0.01, path
        assert wav_size_bucket(n) == wav_size_bucket(wavs.shape[1]), path
        # ogg probes are sample-exact (granule position)
        if path.endswith(".ogg"):
            assert n == wavs.shape[1], path


def test_warm_for_pending_add_submits_current_setting_first(monkeypatch, tmp_path):
    """The header-probed warm pass covers the CURRENT setting first, and
    warms the program the engine would actually EXECUTE: _spec_full for a
    lone add (the manager's len(track_ids) > 1 gate routes singles through
    calc_spec_multi), _spec_groups for a multi-file add."""
    monkeypatch.setenv("THESIA_PRECOMPILE", "1")
    from thesia_tpu.engine.manager import TrackManager
    from thesia_tpu.engine.track import TrackList

    tm = TrackManager()
    tl = TrackList()
    tm.set_colormap_length(tl, 258)
    captured = {}
    monkeypatch.setattr(
        tm.shape_warmer, "submit", lambda jobs: captured.setdefault("jobs", list(jobs))
    )
    tm.warm_for_pending_add([], [("probe:x", (1, 48000), 16000)], 16000)
    jobs = captured.pop("jobs")
    key, _lower = jobs[0]()
    assert key[0] == "spec_full"  # single add dispatches _spec_full

    tm2 = TrackManager()
    tm2.set_colormap_length(tl, 258)
    monkeypatch.setattr(
        tm2.shape_warmer, "submit", lambda jobs: captured.setdefault("jobs", list(jobs))
    )
    tm2.warm_for_pending_add(
        [], [("probe:x", (1, 48000), 16000), ("probe:y", (2, 48000), 16000)], 16000
    )
    jobs = captured.pop("jobs")
    key, _lower = jobs[0]()
    assert key[0] == "spec_groups"  # multi-file add dispatches the batch


def test_spec_full_job_lowers_the_real_program(monkeypatch):
    """spec_full_job's lowered signature must accept the exact call
    calc_spec_multi makes (bucket choice incl. the pad-overflow grow)."""
    monkeypatch.setenv("THESIA_PRECOMPILE", "1")
    an = SpectrogramAnalyzer()
    setting = SpecSetting(t_overlap=2)
    w = precompile.ShapeWarmer()
    w.submit([precompile.spec_full_job(an, (1, 50000), 8000, setting)])
    assert w.drain(timeout=120.0)
    assert w.compiled_count == 1
    # the real single-track call under that setting still works
    wavs = np.random.default_rng(1).uniform(-0.5, 0.5, (1, 50000)).astype(np.float32)
    res = an.calc_spec_multi(wavs, 8000, setting, cache_key="sfj", token=0)
    assert res.n_frames > 0
