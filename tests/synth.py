"""Deterministic synthesized corpus stand-ins.

The reference test corpus has git-LFS-missing files (sample_48k.wav et al,
/root/reference/.MISSING_LARGE_BLOBS); these generators produce equivalent
deterministic material — same length/sample-rate class as sample_48k.wav
(mono, 2,113,529 samples @ 48 kHz, reference: src-tauri/src/core/audio.rs:506)
— so every parity-shaped assertion always runs (VERDICT r1 item 10).
"""

from __future__ import annotations

import numpy as np

SYNTH48K_N = 2_113_529
SYNTH48K_SR = 48000


def synth48k_wavs() -> np.ndarray:
    """Mono (1, 2113529) f32 @48 kHz: chirp + tone + slow AM envelope,
    s16-quantized (the decode path the real corpus file would take)."""
    n, sr = SYNTH48K_N, SYNTH48K_SR
    t = np.arange(n, dtype=np.float64) / sr
    dur = n / sr
    f0, f1 = 100.0, 8000.0
    chirp = np.sin(2 * np.pi * (f0 * t + (f1 - f0) / (2 * dur) * t * t))
    tone = np.sin(2 * np.pi * 997.0 * t)
    env = 0.55 + 0.35 * np.sin(2 * np.pi * 0.25 * t)
    x = env * (0.6 * chirp + 0.25 * tone)
    # s16 round trip exactly like io.wav decode (s16 -> x/32768)
    q = np.clip(np.floor(x * 32768.0 + 0.5), -32768, 32767).astype(np.int16)
    return (q.astype(np.float32) / 32768.0)[None, :]


def synth48k_write(path) -> None:
    from thesia_tpu.io.wav import encode_wav_s16

    path = str(path)
    with open(path, "wb") as f:
        f.write(encode_wav_s16(synth48k_wavs(), SYNTH48K_SR))


def synth_stereo_write(path, sr: int = 48000, sec: float = 2.0) -> None:
    """Small stereo helper for service/session tests."""
    from thesia_tpu.io.wav import encode_wav_s16

    n = int(sr * sec)
    t = np.arange(n, dtype=np.float64) / sr
    left = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    right = 0.4 * np.sin(2 * np.pi * 554.37 * t)
    w = np.stack([left, right]).astype(np.float32)
    with open(str(path), "wb") as f:
        f.write(encode_wav_s16(w, sr))
