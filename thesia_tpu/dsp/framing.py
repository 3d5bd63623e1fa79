"""Spectrogram framing parameters.

SpecSetting derives per-sample-rate framing:
    hop   = round(win_ms * sr / 1000 / t_overlap)
    win   = hop * t_overlap
    n_fft = next_pow2(win) * f_overlap
reference: src-tauri/src/core/spectrogram.rs:30-99.
"""

from __future__ import annotations

import dataclasses

from ..common.freqscale import FreqScale


def next_power_of_two(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


@dataclasses.dataclass(frozen=True)
class SrWinNfft:
    sr: int
    win_length: int
    n_fft: int


@dataclasses.dataclass
class SpecSetting:
    win_ms: float = 40.0
    t_overlap: int = 4
    f_overlap: int = 1
    freq_scale: FreqScale = FreqScale.Mel

    def calc_hop_length(self, sr: int) -> int:
        # rust f64::round = round-half-away-from-zero.  Floor at 1: a
        # UI-reachable combination (1 ms window, t_overlap 32, 8 kHz) rounds
        # to hop 0, where the reference's own math divides by zero — the
        # engine must stay well-defined instead (review finding)
        x = self.win_ms * sr / 1000.0 / self.t_overlap
        import math

        return max(int(math.floor(x + 0.5)), 1)

    def calc_win_length(self, sr: int) -> int:
        return self.calc_hop_length(sr) * self.t_overlap

    def calc_n_fft(self, sr: int) -> int:
        return next_power_of_two(self.calc_win_length(sr)) * self.f_overlap

    def calc_framing_params(self, sr: int) -> tuple[int, int, int]:
        """(hop_length, win_length, n_fft)."""
        hop = self.calc_hop_length(sr)
        win = hop * self.t_overlap
        return hop, win, next_power_of_two(win) * self.f_overlap

    def calc_sr_win_nfft(self, sr: int) -> SrWinNfft:
        hop, win, n_fft = self.calc_framing_params(sr)
        return SrWinNfft(sr=sr, win_length=win, n_fft=n_fft)

    def to_json(self) -> dict:
        return {
            "winMillisec": self.win_ms,
            "tOverlap": self.t_overlap,
            "fOverlap": self.f_overlap,
            "freqScale": self.freq_scale.value,
        }

    @classmethod
    def from_json(cls, d: dict) -> "SpecSetting":
        return cls(
            win_ms=float(d["winMillisec"]),
            t_overlap=int(d["tOverlap"]),
            f_overlap=int(d["fOverlap"]),
            freq_scale=FreqScale(d["freqScale"]),
        )

    def validated(self) -> "SpecSetting":
        """Magnitude caps shared by every entry point that can introduce a
        setting (set_spec_setting, set_user_settings, init's persisted
        restore): an absurd window or overlap would otherwise OOM the
        folded-DFT GEMM instead of returning a clean error.  The reference
        UI clamps client-side (MIN_WIN_MILLISEC=1, T_OVERLAP_VALUES max 32,
        fOverlap fixed 1 — constants/tracks.ts:205-207)."""
        if not self.win_ms > 0.0:  # also rejects NaN
            raise ValueError("winMillisec must be positive")
        if self.win_ms > 2000.0:
            raise ValueError("winMillisec too large (max 2000)")
        if not 1 <= self.t_overlap <= 64:
            raise ValueError("tOverlap out of range (1..64)")
        if not 1 <= self.f_overlap <= 8:
            raise ValueError("fOverlap out of range (1..8)")
        return self
