from .melscale import (
    MEL_DIFF_2K_1K,
    MIN_LOG_MEL,
    mel_to_hz,
    hz_to_mel,
    calc_mel_fb,
    calc_mel_fb_default,
)
from .freqscale import FreqScale
from .windows import WindowType, calc_normalized_win, hann, blackman

__all__ = [
    "MEL_DIFF_2K_1K",
    "MIN_LOG_MEL",
    "mel_to_hz",
    "hz_to_mel",
    "calc_mel_fb",
    "calc_mel_fb_default",
    "FreqScale",
    "WindowType",
    "calc_normalized_win",
    "hann",
    "blackman",
]
