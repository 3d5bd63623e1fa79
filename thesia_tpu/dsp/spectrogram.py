"""Fused spectrogram pipeline: frames -> real-DFT matmul -> |.| -> mel GEMM -> dB.

TPU-first rework of the reference analyzer (reference:
src-tauri/src/core/spectrogram.rs:101-253).  The reference caches windows,
rustfft plans and mel filterbanks per parameter set and runs per-frame FFTs on
a rayon pool; here each parameter set compiles ONE fused XLA program that
processes a fixed-size chunk of frames entirely on the MXU/VPU, and the host
loops chunks (dispatch is async, so chunks pipeline on device).

Compilation-stability design (interactive viewers can't afford recompiles):
  * chunk of frames is a fixed static size; the frame start offset is dynamic
  * the device-resident wav buffer is padded to a geometric size bucket, so a
    given (win, hop, n_fft, n_mel, wav_bucket) tuple compiles exactly once
  * out-of-range gathers clamp; trailing garbage frames are sliced off
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..common.freqscale import FreqScale
from ..common.melscale import calc_mel_fb_default
from ..common.windows import WindowType, calc_normalized_win
from .framing import SpecSetting, SrWinNfft
from .stft import make_dft_matrices, reflect_pad_1d, stft_frame_count

DEFAULT_CHUNK_FRAMES = 2048
_WAV_BUCKET_BASE = 1 << 16


def wav_size_bucket(n: int) -> int:
    b = _WAV_BUCKET_BASE
    while b < n:
        b *= 2
    return b


@functools.partial(
    jax.jit, static_argnames=("chunk_frames", "win_length", "hop_length", "use_mel")
)
def _spec_chunk(
    padded_wav,
    t0,
    cw,
    sw,
    mel_fb,
    *,
    chunk_frames: int,
    win_length: int,
    hop_length: int,
    use_mel: bool,
):
    """One chunk of the fused pipeline. Returns (chunk_frames, F) dB values."""
    starts = t0 * hop_length + jnp.arange(chunk_frames, dtype=jnp.int32) * hop_length
    idx = starts[:, None] + jnp.arange(win_length, dtype=jnp.int32)[None, :]
    frames = jnp.take(padded_wav, idx, mode="clip")
    re = jnp.dot(frames, cw, precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, sw, precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    if use_mel:
        out = jnp.dot(mag, mel_fb, precision=jax.lax.Precision.HIGHEST)
    else:
        out = mag
    # dB from amplitude with amin=0 (decibel.rs:212): 0 -> -inf, negatives
    # cannot occur here (mag >= 0, mel_fb >= 0).
    return 20.0 * jnp.where(out > 0, jnp.log10(jnp.where(out > 0, out, 1.0)), -jnp.inf)


class SpectrogramAnalyzer:
    """Caches per-parameter device constants and compiled pipelines.

    reference: src-tauri/src/core/spectrogram.rs:101-185 (prepare/retain
    lifecycle), :187-212 (calc_spec semantics).
    """

    def __init__(self, chunk_frames: int = DEFAULT_CHUNK_FRAMES):
        from ..runtime import device_warmup

        device_warmup()
        self.chunk_frames = chunk_frames
        self._dft: dict[tuple[int, int], tuple[jax.Array, jax.Array]] = {}
        self._mel_fbs: dict[tuple[int, int], jax.Array] = {}
        self._host_bufs: dict[int, np.ndarray] = {}

    # -- lifecycle ---------------------------------------------------------
    def prepare(self, params, freq_scale: FreqScale) -> None:
        for p in params:
            key = (p.win_length, p.n_fft)
            if key not in self._dft:
                window = calc_normalized_win(WindowType.Hann, p.win_length, p.n_fft)
                n_pad_left = (p.n_fft - p.win_length) // 2
                cw, sw = make_dft_matrices(window, p.n_fft, n_pad_left)
                self._dft[key] = (jnp.asarray(cw), jnp.asarray(sw))
        if freq_scale is FreqScale.Mel:
            for p in params:
                key = (p.sr, p.n_fft)
                if key not in self._mel_fbs:
                    self._mel_fbs[key] = jnp.asarray(calc_mel_fb_default(p.sr, p.n_fft))
        else:
            self._mel_fbs.clear()

    def retain(self, params, freq_scale: FreqScale) -> None:
        keep_wn = {(p.win_length, p.n_fft) for p in params}
        keep_sn = {(p.sr, p.n_fft) for p in params}
        self._dft = {k: v for k, v in self._dft.items() if k in keep_wn}
        if freq_scale is FreqScale.Mel:
            self._mel_fbs = {k: v for k, v in self._mel_fbs.items() if k in keep_sn}
        else:
            self._mel_fbs.clear()

    def mel_fb(self, sr: int, n_fft: int) -> jax.Array:
        key = (sr, n_fft)
        if key not in self._mel_fbs:
            self._mel_fbs[key] = jnp.asarray(calc_mel_fb_default(sr, n_fft))
        return self._mel_fbs[key]

    def _dft_mats(self, win_length: int, n_fft: int):
        key = (win_length, n_fft)
        if key not in self._dft:
            window = calc_normalized_win(WindowType.Hann, win_length, n_fft)
            n_pad_left = (n_fft - win_length) // 2
            cw, sw = make_dft_matrices(window, n_fft, n_pad_left)
            self._dft[key] = (jnp.asarray(cw), jnp.asarray(sw))
        return self._dft[key]

    # -- compute -----------------------------------------------------------
    def calc_spec(self, wav: np.ndarray, sr: int, setting: SpecSetting) -> jax.Array:
        """dB spectrogram (n_frames, F); F = n_fft//2+1 (linear) or n_mel.

        Returns a device array; convert with np.asarray for host use.
        reference: src-tauri/src/core/spectrogram.rs:187-212.
        """
        hop, win, n_fft = setting.calc_framing_params(sr)
        wav = np.asarray(wav, np.float32)
        n = wav.shape[-1]
        n_frames = stft_frame_count(n, win, hop)
        pad = win // 2
        host_padded = reflect_pad_1d(wav, pad, pad)
        bucket = wav_size_bucket(host_padded.shape[-1])
        buf = self._host_bufs.get(bucket)
        if buf is None:
            buf = self._host_bufs[bucket] = np.zeros(bucket, np.float32)
        buf[: host_padded.shape[-1]] = host_padded
        buf[host_padded.shape[-1] :] = 0.0
        padded_dev = jnp.asarray(buf)

        cw, sw = self._dft_mats(win, n_fft)
        use_mel = setting.freq_scale is FreqScale.Mel
        mel = self.mel_fb(sr, n_fft) if use_mel else jnp.zeros((1, 1), jnp.float32)

        chunks = []
        t0 = 0
        while t0 < n_frames:
            chunks.append(
                _spec_chunk(
                    padded_dev,
                    jnp.int32(t0),
                    cw,
                    sw,
                    mel,
                    chunk_frames=self.chunk_frames,
                    win_length=win,
                    hop_length=hop,
                    use_mel=use_mel,
                )
            )
            t0 += self.chunk_frames
        if not chunks:
            f = mel.shape[1] if use_mel else n_fft // 2 + 1
            return jnp.zeros((0, f), jnp.float32)
        out = jnp.concatenate(chunks, axis=0)[:n_frames]
        return out
