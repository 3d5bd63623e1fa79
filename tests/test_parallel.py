"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thesia_tpu.common.melscale import calc_mel_fb_default
from thesia_tpu.common.windows import WindowType, calc_normalized_win
from thesia_tpu.dsp.stft import make_dft_matrices
from thesia_tpu.parallel.sharding import (
    batched_frames,
    batched_spec_db,
    make_mesh,
    sharded_spec_pipeline,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pipeline_matches_single_device():
    sr, win, hop, n_fft = 8000, 320, 80, 512
    n_frames = 16
    batch = 8
    window = calc_normalized_win(WindowType.Hann, win, n_fft)
    cw, sw = make_dft_matrices(window, n_fft, (n_fft - win) // 2)
    mel = calc_mel_fb_default(sr, n_fft)
    # pad freq so "freq"=2 shards evenly
    n_freq = cw.shape[1]
    pad_f = (-n_freq) % 2
    cw_p = np.pad(cw, ((0, 0), (0, pad_f)))
    sw_p = np.pad(sw, ((0, 0), (0, pad_f)))
    mel_p = np.pad(mel, ((0, pad_f), (0, 0)))

    rng = np.random.default_rng(0)
    wavs = rng.uniform(-1, 1, (batch, n_frames * hop + win)).astype(np.float32)

    mesh = make_mesh(8, freq_parallel=2)
    run = sharded_spec_pipeline(mesh)
    sharded = np.asarray(
        run(
            jnp.asarray(wavs), jnp.asarray(cw_p), jnp.asarray(sw_p), jnp.asarray(mel_p),
            n_frames=n_frames, win_length=win, hop_length=hop,
        )
    )
    frames = batched_frames(jnp.asarray(wavs), n_frames, win, hop)
    single = np.asarray(batched_spec_db(frames, jnp.asarray(cw), jnp.asarray(sw), jnp.asarray(mel)))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=1e-3, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
