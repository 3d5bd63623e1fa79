from .framing import SpecSetting, SrWinNfft
from .decibel import db_from_amp, db_from_power, amp_from_db, power_from_db
from .stft import stft_frame_count, perform_stft, reflect_pad_1d
from .spectrogram import SpectrogramAnalyzer

__all__ = [
    "SpecSetting",
    "SrWinNfft",
    "db_from_amp",
    "db_from_power",
    "amp_from_db",
    "power_from_db",
    "stft_frame_count",
    "perform_stft",
    "reflect_pad_1d",
    "SpectrogramAnalyzer",
]
