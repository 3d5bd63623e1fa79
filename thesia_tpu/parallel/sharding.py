"""Multi-chip sharding of the batched spectrogram pipeline.

The meaningful parallel axes for this workload (reference has only rayon
thread-parallelism, SURVEY §2.9) are:

  * batch ("tracks"):  (track x channel) rows of the batched STFT — pure data
    parallelism, no collectives;
  * freq ("freq"):     columns of the DFT matrices and rows of the mel
    filterbank — tensor-parallel GEMMs.  The mel GEMM contracts over the
    sharded freq axis, so XLA inserts a psum (reduce-scatter/all-reduce)
    over the "freq" axis — riding ICI.

Everything is expressed with jax.sharding + NamedSharding on one jitted
function; GSPMD places the collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, freq_parallel: int = 1) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    assert n % freq_parallel == 0
    import numpy as np

    return Mesh(
        np.array(devices).reshape(n // freq_parallel, freq_parallel),
        axis_names=("tracks", "freq"),
    )


def batched_spec_db(frames, cw, sw, mel_fb):
    """frames (B, T, win) -> dB mel spectrogram (B, T, n_mel).

    The core batched compute: two DFT GEMMs, magnitude, mel GEMM, dB.
    """
    re = jnp.einsum("btw,wf->btf", frames, cw, precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("btw,wf->btf", frames, sw, precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.einsum("btf,fm->btm", mag, mel_fb, precision=jax.lax.Precision.HIGHEST)
    return 20.0 * jnp.where(mel > 0, jnp.log10(jnp.where(mel > 0, mel, 1.0)), -jnp.inf)


def batched_frames(wavs_padded, n_frames: int, win_length: int, hop_length: int):
    """(B, L_padded) reflect-padded signals -> (B, n_frames, win) frames."""
    starts = jnp.arange(n_frames, dtype=jnp.int32) * hop_length
    idx = starts[:, None] + jnp.arange(win_length, dtype=jnp.int32)[None, :]
    return jnp.take(wavs_padded, idx, axis=-1, mode="clip")


def sharded_spec_pipeline(mesh: Mesh):
    """Returns a jitted fn (wavs_padded, cw, sw, mel_fb, n_frames, win, hop)
    -> (B, T, n_mel) dB, sharded batch over "tracks" and DFT freq over
    "freq"."""

    @functools.partial(jax.jit, static_argnames=("n_frames", "win_length", "hop_length"))
    def run(wavs_padded, cw, sw, mel_fb, *, n_frames, win_length, hop_length):
        wavs_padded = jax.lax.with_sharding_constraint(
            wavs_padded, NamedSharding(mesh, P("tracks", None))
        )
        cw = jax.lax.with_sharding_constraint(cw, NamedSharding(mesh, P(None, "freq")))
        sw = jax.lax.with_sharding_constraint(sw, NamedSharding(mesh, P(None, "freq")))
        mel_fb = jax.lax.with_sharding_constraint(mel_fb, NamedSharding(mesh, P("freq", None)))
        frames = batched_frames(wavs_padded, n_frames, win_length, hop_length)
        out = batched_spec_db(frames, cw, sw, mel_fb)
        return jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P("tracks", None, None)))

    return run
