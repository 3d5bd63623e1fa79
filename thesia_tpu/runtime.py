"""Process-level device runtime helpers."""

from __future__ import annotations

import logging
import os
import threading

import numpy as np

log = logging.getLogger(__name__)

_lock = threading.Lock()
_thread: threading.Thread | None = None
_done = False
_configured = False


def configure_jax_cache() -> None:
    """Enable the persistent XLA compilation cache (huge cold-start win on
    the tunneled TPU: a recompiled pipeline drops from minutes to ~20 ms on
    the next process).  Must run before the first compile."""
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    cache_dir = os.environ.get(
        "THESIA_JAX_CACHE", os.path.expanduser("~/.thesia_tpu/jax_cache")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _do_warmup() -> None:
    global _done, _thread
    import jax.numpy as jnp

    try:
        np.asarray(jnp.arange(8, dtype=jnp.float32) * 2.0)
        _done = True
    except Exception:
        # transient tunnel error: clear the handle so a later call RETRIES
        # instead of joining this dead thread and silently reporting warm
        log.warning("device warmup failed; will retry on next use", exc_info=True)
        with _lock:
            if _thread is threading.current_thread():
                _thread = None


def warmup_done() -> bool:
    """True once the one-time device<->host warmup has completed (or on
    backends where it's instant).  The shape warmer gates on this so its
    background compiles never contend with the first-touch tunnel setup."""
    return _done


def device_warmup(background: bool = False) -> None:
    """One-time device<->host transfer warmup.

    On the axon-tunneled TPU backend the first device->host copy in a process
    pays a large one-time setup cost (minutes for a 2-D array, ~10 s for a
    1-D array; afterwards every transfer is fast).  A tiny 1-D round trip
    absorbs it.  With background=True the warmup runs on a daemon thread
    (service startup); a later foreground call joins it before first use.
    No-op cost on CPU backends.
    """
    configure_jax_cache()
    global _thread
    with _lock:
        if _done:
            return
        if _thread is None:
            _thread = threading.Thread(target=_do_warmup, daemon=True, name="device-warmup")
            _thread.start()
        t = _thread
    if not background:
        t.join()
