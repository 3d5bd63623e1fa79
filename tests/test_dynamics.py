"""Dynamics golden tests.

Goldens from reference: src-tauri/src/core/dynamics/envelope.rs:516-638,
limiter.rs:265-291, stats.rs:224-283, normalize.rs:85-110.
"""

import numpy as np
import pytest

from thesia_tpu.dynamics import (
    AudioStats,
    BoxFilter,
    BoxStackFilter,
    BoxSum,
    GuardClippingMode,
    GuardClippingStats,
    NormalizeTarget,
    PeakHold,
    PerfectLimiter,
    box_filter_signal,
    box_stack_signal,
    calc_normalize_gain,
    exponential_release_scan,
    guard_clipping,
    integrated_lufs,
    sliding_max,
)
from thesia_tpu.dynamics.envelope import optimal_ratios, stack_layer_lengths


def test_box_sum_matches_brute_force():
    rng = np.random.default_rng(42)
    signal = rng.uniform(-1, 1, 500)
    max_len = 50
    bs = BoxSum(max_len)
    bf = BoxFilter(max_len)
    for i in range(len(signal)):
        box_len = int(rng.integers(1, max_len + 1))
        result = bs.step(signal[i], box_len)
        bf.set(box_len)
        result_avg = bf.step(signal[i])
        start = max(i + 1 - box_len, 0)
        expected = signal[start : i + 1].sum()
        assert abs(result - expected) < 1e-12
        assert abs(result_avg - expected / box_len) < 1e-12


def test_box_stack_golden():
    # reference: envelope.rs:584-591
    inp = [1.0, 1, 1, 1, 0, 0, 0, 0, 0, 0]
    target = [0.25, 0.75, 1.0, 1.0, 0.75, 0.25, 0.0, 0.0, 0.0, 0.0]
    stack = BoxStackFilter(3, 3)
    stack.reset(0.0)
    out = [stack.step(x) for x in inp]
    np.testing.assert_allclose(out, target, atol=1e-15)
    # vectorized form agrees
    out_vec = box_stack_signal(np.array(inp), 3, 3, 0.0)
    np.testing.assert_allclose(out_vec, target, atol=1e-12)


def test_optimal_ratios_sum_to_one():
    for size in range(1, 20):
        r = optimal_ratios(size)
        assert len(r) == size
        assert abs(r.sum() - 1.0) < 1e-4


def test_peak_hold_golden():
    # reference: envelope.rs:627-638
    audio = [0.0, 0.1, 0.2, 1.0, 0.9, 0.4, 0.0, -0.5, -0.9, -1.0, -0.4, 1.0, 0.7]
    target = [0.0, 0.1, 0.2, 1.0, 1.0, 1.0, 0.9, 0.4, 0.0, -0.5, -0.4, 1.0, 1.0]
    sr = 24000
    hold_ms = 3.0 / sr * 1000.0
    ph = PeakHold(sr, hold_ms)
    out = [ph.step(x) for x in audio]
    np.testing.assert_array_equal(out, target)
    # vectorized sliding_max agrees
    np.testing.assert_array_equal(sliding_max(np.array(audio), 3), target)


def test_sliding_max_brute_force():
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, 300)
    for w in (1, 2, 3, 7, 64, 300, 400):
        got = sliding_max(x, w)
        exp = np.array([x[max(t - w + 1, 0) : t + 1].max() for t in range(len(x))])
        np.testing.assert_array_equal(got, exp)


def test_box_filter_signal_with_history():
    x = np.array([0.0, 0.0, 0.0, 3.0])
    # length 3, history fill 1 -> [2/3, 1/3, 0, 1]
    np.testing.assert_allclose(box_filter_signal(x, 3, 1.0), [2 / 3, 1 / 3, 0, 1], atol=1e-15)


def test_exponential_release_scan_matches_sequential():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, 2000)
    release = 123.4
    got = exponential_release_scan(x, release, 1.0)
    slew = 1.0 / (release + 1.0)
    y = 1.0
    exp = np.empty_like(x)
    for i, xi in enumerate(x):
        y = min(xi, y + (xi - y) * slew)
        exp[i] = y
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-13)


def test_limiter_bounds_and_effectiveness():
    # reference: limiter.rs:265-291 — +18 dB boosted audio, all gains in [0,1]
    rng = np.random.default_rng(11)
    sr = 8000
    wav = (rng.uniform(-1, 1, sr * 2) * 0.3).astype(np.float32)
    wav *= 8.0  # ~ +18 dB
    limiter = PerfectLimiter(sr, 1.0, 5.0, 15.0, 40.0)
    out, gain_seq = limiter.process(wav)
    assert ((gain_seq >= 0.0) & (gain_seq <= 1.0)).all()
    assert np.abs(out).max() <= 1.0
    # gain dips to ~1/peak (peak = 0.3*8 = 2.4 -> min gain ~ 0.4167)
    assert gain_seq.min() < 1.0 / np.abs(wav).max() + 0.01


def test_limiter_streaming_parity():
    """Vectorized gain chain == streaming per-sample chain (reference
    limiter.rs:145-156 composition)."""
    rng = np.random.default_rng(5)
    sr = 1000
    n = 600
    wav = (rng.uniform(-1, 1, n) * 3.0).astype(np.float32)
    lim = PerfectLimiter(sr)
    got = lim.calc_gain_seq(wav[None, :])

    # streaming reference
    ph = PeakHold(sr, 5.0 + 15.0)
    rel_slew = 1.0 / (lim.release_samples + 1.0)
    stack = BoxStackFilter(lim.attack, 3)
    stack.reset(1.0)
    y_rel = 1.0
    eps = np.finfo(np.float64).eps
    gains = []
    frames = list(np.abs(wav.astype(np.float64))) + [0.0] * lim.attack
    for v in frames:
        raw = 1.0 / (v + eps) if v > 1.0 else 1.0
        held = -ph.step(-raw)
        y_rel = min(held, y_rel + (held - y_rel) * rel_slew)
        gains.append(min(stack.step(y_rel), 1.0))
    exp = np.array(gains[lim.attack :])
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-9)


def test_guard_clipping_modes():
    wav = np.array([[0.0, 1.5, -2.0, 0.5]], np.float32)
    out, res = guard_clipping(wav, 48000, GuardClippingMode.Clip)
    np.testing.assert_array_equal(out, [[0.0, 1.0, -1.0, 0.5]])
    assert res.kind == "wav_before_clip"
    stats = res.per_channel_stats()
    assert stats[0].reduction_cnt == 2

    out, res = guard_clipping(wav, 48000, GuardClippingMode.ReduceGlobalLevel)
    assert res.kind == "global_gain"
    assert abs(res.global_gain - 0.5) < 1e-7
    assert abs(np.abs(out).max() - 1.0) < 1e-7

    unclipped = np.array([[0.5, -0.25]], np.float32)
    out, res = guard_clipping(unclipped, 48000, GuardClippingMode.Limiter)
    np.testing.assert_array_equal(out, unclipped)
    assert res.kind == "gain_sequence" and (res.gain_seq == 1.0).all()


def test_guard_engages_despite_nan_samples():
    """One NaN sample must not disable the guard: the reference's
    f32::max fold (and the native path's `if (av > abs_max)`) skip NaN,
    while a plain .max() propagated it and let >1.0 samples through
    unlimited (review finding)."""
    wav = np.array([[0.0, np.nan, 1.5, -2.0, 0.5]], np.float32)
    out, res = guard_clipping(wav, 48000, GuardClippingMode.ReduceGlobalLevel)
    assert res.kind == "global_gain" and abs(res.global_gain - 0.5) < 1e-7
    out, res = guard_clipping(wav, 48000, GuardClippingMode.Limiter)
    assert res.kind == "gain_sequence" and res.gain_seq.min() < 1.0
    # clip-mode stats still report the reduction
    stats = GuardClippingStats.from_wav_before_clip(wav[0])
    assert stats.reduction_cnt == 2 and stats.max_reduction_gain_db < 0.0
    # nan_safe_abs_max semantics pinned: NaN skipped, 0 floor, empty -> 0
    from thesia_tpu.dynamics.stats import nan_safe_abs_max

    assert nan_safe_abs_max(np.float32([np.nan, np.nan])) == 0.0
    assert nan_safe_abs_max(np.zeros(0, np.float32)) == 0.0
    assert nan_safe_abs_max(np.float32([np.nan, -3.0])) == 3.0


def test_peak_hold_zero_length_window():
    """A hold window rounding to 0 samples passes values through instead
    of crashing max([]) (review finding)."""
    from thesia_tpu.dynamics.envelope import PeakHold

    ph = PeakHold(8000, 0.05)  # 0.4 samples -> rounds to 0 -> floored to 1
    assert ph.step(0.5) == 0.5
    assert ph.step(0.25) == 0.25


def test_guard_clipping_stats_goldens():
    # reference: stats.rs:224-241
    clipped = np.array([-1.5, -1.0, 0.5, 2.0], np.float32)
    stats = GuardClippingStats.from_wav_before_clip(clipped)
    assert stats.reduction_cnt == 2
    assert abs(stats.max_reduction_gain_db - (-6.0206)) < 1e-3
    assert str(stats) == "max -6.02 dB, total 2 samples"
    assert str(GuardClippingStats.from_wav_before_clip(np.array([-1.0, 0.25, 1.0]))) == ""
    assert str(GuardClippingStats.from_global_gain(0.5)) == "-6.02 dB"
    gs = GuardClippingStats.from_gain_seq(np.array([0.25, 1.0, 0.5], np.float32))
    assert gs.reduction_cnt == 2
    assert abs(gs.max_reduction_gain_db - 20 * np.log10(0.25)) < 1e-3


def test_normalize_gain_goldens():
    # reference: normalize.rs:85-110
    stats = AudioStats(global_lufs=-23.0, rms_db=-12.0, max_peak=0.5, max_peak_db=-6.0)
    assert calc_normalize_gain(NormalizeTarget("Off"), stats) == 1.0
    assert abs(calc_normalize_gain(NormalizeTarget("LUFS", -20.0), stats) - 10 ** (3 / 20)) < 1e-6
    assert abs(calc_normalize_gain(NormalizeTarget("RMSdB", -18.0), stats) - 10 ** (-6 / 20)) < 1e-6
    assert abs(calc_normalize_gain(NormalizeTarget("PeakdB", -1.0), stats) - 10 ** (5 / 20)) < 1e-6


def test_lufs_sine_sanity():
    """997 Hz full-scale sine ~= -3.01 LUFS by construction of BS.1770."""
    sr = 48000
    t = np.arange(sr * 3) / sr
    wav = np.sin(2 * np.pi * 997.0 * t)[None, :]
    lufs = integrated_lufs(wav, sr)
    assert abs(lufs - (-3.01)) < 0.05


def test_lufs_gain_linearity():
    sr = 44100
    rng = np.random.default_rng(9)
    wav = (rng.uniform(-1, 1, sr * 2) * 0.1)[None, :]
    base = integrated_lufs(wav, sr)
    plus6 = integrated_lufs(wav * 2.0, sr)
    assert abs((plus6 - base) - 20 * np.log10(2)) < 0.15


def test_lufs_short_audio_is_neg_inf():
    sr = 8000
    wav = np.zeros((1, 100), np.float32)
    assert integrated_lufs(wav, sr) == -np.inf


def test_lufs_silence_is_neg_inf():
    sr = 48000
    wav = np.zeros((1, sr), np.float32)
    assert integrated_lufs(wav, sr) == -np.inf


def test_limiter_nan_channel_still_limits_finite_channels():
    """Reference parity (limiter.rs:148 f32::max fold ignores NaN): a NaN
    in one channel must not disable limiting of the other channels' peaks
    (np.max propagated the NaN and produced unity gain -> hard clipping)."""
    from thesia_tpu.dynamics.limiter import PerfectLimiter

    sr = 8000
    n = 4000
    wavs = np.zeros((2, n), np.float32)
    wavs[1, :] = 1.5  # channel 1 constantly over threshold
    wavs[0, 100] = np.nan
    lim = PerfectLimiter(sr)
    gain = lim.calc_gain_seq(wavs)
    # the sustained 1.5 overload must be reduced toward 1/1.5
    mid = gain[n // 2 : n // 2 + 100]
    assert (mid < 0.75).all(), mid.max()


def test_lufs_device_short_track_returns_neg_inf():
    """Tracks shorter than one 400 ms gating block: the device helper must
    return -inf like the host path, not raise (review finding)."""
    from thesia_tpu.dynamics.loudness import integrated_lufs
    from thesia_tpu.dynamics.stats_device import integrated_lufs_device

    w = np.zeros((1, 1000), np.float32)
    assert integrated_lufs(w, 48000) == -np.inf
    dev = integrated_lufs_device(w, 48000)
    assert dev is None or dev == -np.inf


# ---------------------------------------------------------------------------
# ebur128 histogram-mode gating (reference: stats.rs:44-109 uses the ebur128
# crate with Mode::all(), which enables its 0.1-LU histogram; bin tables per
# libebur128 init_histogram / find_histogram_index / gated_loudness)


def _hist_gated_reference(z):
    """Independent counts-based emulation of libebur128's histogram path,
    written the way the C library does it (integer bincount over 1000 bins)
    to cross-check loudness.gated_lufs_from_blocks(histogram=True)."""
    from thesia_tpu.dynamics.loudness import HIST_BOUNDARIES, HIST_ENERGIES

    counts = np.zeros(1000, np.int64)
    for e in np.asarray(z, np.float64):
        if e < HIST_BOUNDARIES[0]:
            continue  # absolute gate: never stored
        lo, hi = 0, 1000
        while hi - lo != 1:  # libebur128 find_histogram_index bisection
            mid = (lo + hi) // 2
            if e >= HIST_BOUNDARIES[mid]:
                lo = mid
            else:
                hi = mid
        counts[lo] += 1
    n = counts.sum()
    if n == 0:
        return -np.inf
    rel = (counts * HIST_ENERGIES).sum() / n * 10.0 ** (-1.0)
    sel = HIST_ENERGIES > rel
    n_g = counts[sel].sum()
    if n_g == 0:
        return -np.inf
    e_g = (counts[sel] * HIST_ENERGIES[sel]).sum() / n_g
    return -0.691 + 10.0 * np.log10(e_g)


def _energy_of(loudness_db):
    return 10.0 ** ((np.asarray(loudness_db, np.float64) + 0.691) / 10.0)


def test_histogram_gating_matches_counts_emulation():
    from thesia_tpu.dynamics.loudness import gated_lufs_from_blocks

    rng = np.random.default_rng(41)
    for _ in range(20):
        louds = rng.uniform(-80.0, 5.0, size=rng.integers(1, 400))
        z = _energy_of(louds)
        got = gated_lufs_from_blocks(z, histogram=True)
        exp = _hist_gated_reference(z)
        if np.isinf(exp):
            assert np.isinf(got)
        else:
            assert abs(got - exp) < 1e-12, (got, exp)


def test_histogram_single_bin_is_bin_center():
    """All blocks at -23.03 LUFS fall in bin [-23.1, -23.0) whose center is
    -23.05: the displayed histogram-mode value is the center, NOT the exact
    energy — the quantization the reference's Mode::all() bakes in."""
    from thesia_tpu.dynamics.loudness import gated_lufs_from_blocks

    z = np.full(50, _energy_of(-23.03))
    assert abs(gated_lufs_from_blocks(z, histogram=True) - (-23.05)) < 1e-9
    assert abs(gated_lufs_from_blocks(z, histogram=False) - (-23.03)) < 1e-9


def test_histogram_and_exact_gates_can_disagree():
    """Constructed block set where the two gating modes differ by more than
    fp noise: scan a candidate block's loudness across the exact-mode
    relative threshold; quantization must flip at least one case."""
    from thesia_tpu.dynamics.loudness import gated_lufs_from_blocks

    body = _energy_of(np.full(40, -20.0))
    diffs = []
    for cand in np.arange(-30.70, -30.20, 0.004):
        z = np.concatenate([body, [_energy_of(cand)]])
        h = gated_lufs_from_blocks(z, histogram=True)
        e = gated_lufs_from_blocks(z, histogram=False)
        diffs.append(abs(h - e))
    # somewhere in the scan the candidate is inside one gate and outside the
    # other -> the integrated values separate well beyond quantization noise
    assert max(diffs) > 5e-3, max(diffs)
    # ... while the modes never drift more than the documented ~0.05 LU+bin
    assert max(diffs) < 0.1, max(diffs)


def test_histogram_absolute_gate_boundary_inclusive():
    """libebur128 stores blocks with energy >= boundary[0] (loudness -70
    exactly is KEPT); the exact-energy mode's strict > drops it."""
    from thesia_tpu.dynamics.loudness import (
        HIST_BOUNDARIES,
        gated_lufs_from_blocks,
        quantize_blocks_to_histogram,
    )

    z = np.array([HIST_BOUNDARIES[0]])
    assert quantize_blocks_to_histogram(z).size == 1
    assert np.isfinite(gated_lufs_from_blocks(z, histogram=True))


def test_histogram_clamps_above_table():
    """Energies above the last boundary (>= +30 LUFS) land in bin 999."""
    from thesia_tpu.dynamics.loudness import (
        HIST_ENERGIES,
        quantize_blocks_to_histogram,
    )

    q = quantize_blocks_to_histogram(np.array([_energy_of(50.0)]))
    assert q[0] == HIST_ENERGIES[999]


def test_histogram_vs_exact_on_real_audio_small():
    """On real-ish audio the two modes agree to ~0.05 LU (sanity bound)."""
    from thesia_tpu.dynamics.loudness import integrated_lufs

    sr = 24000
    rng = np.random.default_rng(7)
    wav = (rng.standard_normal((2, sr * 3)) * 0.05).astype(np.float32)
    h = integrated_lufs(wav, sr, histogram=True)
    e = integrated_lufs(wav, sr, histogram=False)
    assert abs(h - e) < 0.06, (h, e)
