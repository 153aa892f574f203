"""Persistent XLA compilation cache + tunnel warmup.

The full X-Decoder graph takes minutes to compile on TPU; the persistent cache
brings every subsequent process launch (benchmarks, eval shards, resumed
training) down to seconds. Called by every entry point.

Known remote-TPU (axon) runtime behavior, measured 2026-08-16:
- the FIRST device->host transfer of a process stalls ~2-4 min (one-time
  handshake); subsequent D2H runs at ~35 MB/s, H2D at ~65 MB/s;
- while a D2H is pending, ALL other tunnel traffic (H2D, dispatch, compile)
  blocks — so do NOT issue background readbacks to "warm" the channel
  (empirically this serializes the whole process behind the stall); let the
  first real readback absorb it instead.
"""

from __future__ import annotations

import os
import threading


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even under plugins that ignore the env var (the
    remote-TPU axon plugin does); must run before first device use."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def warm_transfer_channel() -> threading.Thread:
    def _warm():
        try:
            import jax
            import jax.numpy as jnp

            jax.device_get(jnp.zeros(()))
        except Exception:
            pass

    t = threading.Thread(target=_warm, daemon=True, name="d2h-warmup")
    t.start()
    return t


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "GEOPURIFY_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "jax"),
        )
    apply_platform_env()
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # deliberately NO warm_transfer_channel() here — see module docstring
    return cache_dir
