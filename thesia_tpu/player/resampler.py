"""Streaming polyphase windowed-sinc resampler.

Functional analogue of the reference's rubato async-sinc resampler
(reference: src-tauri/src/player/stream.rs:14-233: sinc length 256, 128
phases, Blackman-Harris window).  Vectorized over output frames; keeps
carry-over state across chunks for streaming use.
"""

from __future__ import annotations

import numpy as np

SINC_LEN = 256
# 512 phases + linear interpolation puts the interpolation spur floor below
# -100 dBc (128 phases measured -84.5 dBc); the bank is 513*256 f64 = 1 MB
N_PHASES = 512


def _blackman_harris(n: int) -> np.ndarray:
    x = np.arange(n) / n
    return (
        0.35875
        - 0.48829 * np.cos(2 * np.pi * x)
        + 0.14128 * np.cos(4 * np.pi * x)
        - 0.01168 * np.cos(6 * np.pi * x)
    )


def make_polyphase_bank(
    ratio_out_in: float, sinc_len: int = SINC_LEN, n_phases: int = N_PHASES
) -> np.ndarray:
    """(n_phases+1, sinc_len) filter bank; cutoff scaled for downsampling."""
    cutoff = min(ratio_out_in, 1.0) * 0.95
    bank = np.empty((n_phases + 1, sinc_len))
    half = sinc_len // 2
    window = _blackman_harris(sinc_len)
    for p in range(n_phases + 1):
        frac = p / n_phases
        t = np.arange(sinc_len) - half + 1 - frac
        bank[p] = np.sinc(t * cutoff) * cutoff * window
    return bank


class StreamResampler:
    """Resamples planar float32 (or interleaved via frames) streams."""

    def __init__(self, sr_in: int, sr_out: int, n_ch: int):
        self.sr_in = sr_in
        self.sr_out = sr_out
        self.n_ch = n_ch
        self.ratio = sr_in / sr_out  # input frames per output frame
        self.bank = make_polyphase_bank(sr_out / sr_in)
        self.half = SINC_LEN // 2
        # carry: last SINC_LEN input frames (n_ch, SINC_LEN)
        self._carry = np.zeros((n_ch, SINC_LEN), np.float32)
        self._pos = float(self.half)  # input-frame position of next output

    def reset(self) -> None:
        self._carry[:] = 0.0
        self._pos = float(self.half)

    def process(self, block: np.ndarray) -> np.ndarray:
        """block: (n_ch, n_in) -> (n_ch, n_out)."""
        block = np.atleast_2d(np.asarray(block, np.float32))
        buf = np.concatenate([self._carry, block], axis=1)
        n_total = buf.shape[1]
        # output positions: self._pos, self._pos+ratio, ... while window fits
        max_pos = n_total - self.half - 1
        if max_pos <= self._pos:
            n_out = 0
        else:
            n_out = int(np.floor((max_pos - self._pos) / self.ratio)) + 1
        out = np.zeros((self.n_ch, n_out), np.float32)
        if n_out:
            from .. import native

            if native.available():
                out = native.resample_block(
                    buf, self.bank, self._pos, self.ratio, n_out
                )
                self._pos = float(self._pos + n_out * self.ratio)
                # falls through to the SHARED carry epilogue below — the
                # native and numpy paths must stay interchangeable
            else:
                pos = self._pos + np.arange(n_out) * self.ratio
                ip = np.floor(pos).astype(np.int64)
                frac = pos - ip
                ph = frac * N_PHASES
                ph_i = np.floor(ph).astype(np.int64)
                ph_f = (ph - ph_i).astype(np.float64)
                f0 = self.bank[ph_i]          # (n_out, SINC_LEN)
                f1 = self.bank[ph_i + 1]
                filt = f0 + (f1 - f0) * ph_f[:, None]
                idx = ip[:, None] + np.arange(-self.half + 1, self.half + 1)[None, :]
                idx = np.clip(idx, 0, n_total - 1)
                for c in range(self.n_ch):
                    out[c] = np.einsum("ok,ok->o", buf[c][idx], filt).astype(np.float32)
                self._pos = float(pos[-1] + self.ratio)
        # keep last SINC_LEN frames as carry
        keep = min(SINC_LEN, n_total)
        carry = buf[:, n_total - keep :]
        if keep < SINC_LEN:
            carry = np.concatenate(
                [np.zeros((self.n_ch, SINC_LEN - keep), np.float32), carry], axis=1
            )
        self._carry = carry
        self._pos -= n_total - keep
        return out
