"""Process-level device runtime helpers."""

from __future__ import annotations

import numpy as np

_warmed = False


def device_warmup() -> None:
    """One-time device<->host transfer warmup.

    On the axon-tunneled TPU backend the first device->host copy in a process
    pays a large one-time setup cost (minutes for a 2-D array, ~10 s for a
    1-D array; afterwards every transfer is fast).  Doing a tiny 1-D round
    trip up front absorbs it at engine startup instead of on the first
    user-visible spectrogram fetch.  No-op cost on CPU backends.
    """
    global _warmed
    if _warmed:
        return
    import jax.numpy as jnp

    np.asarray(jnp.arange(8, dtype=jnp.float32) * 2.0)
    _warmed = True
