"""Golden tests for mel scale / filterbank / windows / FreqScale.

Golden values from reference: src-common/src/lib.rs:169-232 and
src-tauri/src/core/windows.rs:88-92.
"""

import numpy as np
import pytest

from thesia_tpu.common import (
    FreqScale,
    WindowType,
    calc_mel_fb,
    calc_mel_fb_default,
    calc_normalized_win,
    hann,
    hz_to_mel,
    mel_to_hz,
)


def test_mel_hz_convert():
    assert abs(hz_to_mel(100.0) - 1.5) < 1e-14
    assert abs(hz_to_mel(1100.0) - 16.38629404765444) < 1e-14
    assert abs(mel_to_hz(1.0) - 66.66666666666667) < 1e-13
    assert abs(mel_to_hz(16.0) - 1071.1702874944676) < 1e-12


def test_mel_fb_golden_row():
    sr, n_fft, n_mel = 24000, 2048, 80
    mel0_answer = [
        0.0,
        0.07852016499598029,
        0.15704032999196058,
        0.23556049498794085,
        0.25,
        0.17147983500401973,
        0.09295967000803942,
        0.014439505012059144,
        0.0,
    ]
    fb = calc_mel_fb(sr, n_fft, n_mel, 0.0, None, True, np.float64)
    assert fb.shape == (n_fft // 2 + 1, n_mel)
    row0 = fb[:, 0]
    np.testing.assert_allclose(row0[: len(mel0_answer)], mel0_answer, atol=1e-8)
    assert (row0[len(mel0_answer) :] == 0).all()


@pytest.mark.parametrize("sr", [400, 800, 1000, 2000, 4000, 8000, 16000, 24000, 44100, 48000, 88200, 96000])
@pytest.mark.parametrize("n_fft_exp", [5, 8, 11, 14])
def test_mel_fb_default_no_empty_filters(sr, n_fft_exp):
    n_fft = 2**n_fft_exp
    fb = calc_mel_fb_default(sr, n_fft)
    assert (fb.sum(axis=0) > 0).all(), f"empty mel filter: sr={sr} n_fft={n_fft} n_mel={fb.shape[1]}"
    if fb.shape[1] != fb.shape[0]:
        fb_fail = calc_mel_fb(sr, n_fft, fb.shape[1] + 1, 0.0, None, True, np.float32)
        assert (fb_fail.sum(axis=0) == 0).any(), f"n_mel could be larger: sr={sr} n_fft={n_fft}"


def test_hann_window():
    np.testing.assert_array_equal(hann(4, False, np.float32), [0.0, 0.5, 1.0, 0.5])


def test_normalized_window():
    w = calc_normalized_win(WindowType.Hann, 4, 4)
    np.testing.assert_allclose(w, [0.0, 0.125, 0.25, 0.125])


def test_freqscale_roundtrip():
    for scale in (FreqScale.Linear, FreqScale.Mel):
        for hz in (10.0, 440.0, 1000.0, 8000.0):
            rel = scale.hz_to_relative_freq(hz, (0.0, 12000.0))
            back = scale.relative_freq_to_hz(rel, (0.0, 12000.0))
            assert abs(back - hz) < 1e-2


def test_hz_range_to_idx():
    assert FreqScale.Linear.hz_range_to_idx((2000.0, 1000.0), 48000, 100) == (0, 0)
    assert FreqScale.Linear.hz_range_to_idx((0.0, 24000.0), 48000, 100) == (0, 100)
    assert FreqScale.Linear.hz_range_to_idx((0.0, 12000.0), 48000, 100) == (0, 50)
    lo, hi = FreqScale.Mel.hz_range_to_idx((0.0, 11025.0), 48000, 128)
    assert lo == 0 and hi < 128
