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
        hop, t_overlap, use_mel, bucket, pad, t_cap, _sh = st
        assert raw.shape[1] == bucket and ns.shape[0] == raw.shape[0]
        assert gains.shape == ns.shape and gains.dtype == np.float32
        assert cw.shape == sw.shape
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
