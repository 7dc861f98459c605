"""JAX runtime configuration shared by all device code.

Enables the persistent XLA compilation cache: the alignment engine
compiles one kernel per (LA, LB, W) shape bucket (~10-30 s each on
TPU), and without an on-disk cache every process pays that again —
for the reference-equivalent pipeline that would dominate wall-clock
on small runs. Importing this module once (ops modules do it) makes
all compilations shared across runs.
"""

from __future__ import annotations

import os

_configured = False


def configure() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    cache_dir = os.environ.get(
        "SHASTA_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "shasta_tpu_jax"),
    )
    if cache_dir and cache_dir != "0":
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # older jax without these options

    # Keep the host CPU platform available alongside a TPU platform:
    # shape buckets the Pallas kernel cannot serve fall back to the
    # jnp scan implementation, which must NEVER run through a remote
    # TPU relay (per-row dispatches at ~150 ms latency each).
    # Respect an explicit jax.config platform choice (e.g. tests force
    # "cpu" via jax.config.update) — only the value actually in effect
    # is extended, never overridden from the environment.
    try:
        cur = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if cur and "cpu" not in cur.split(","):
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass


def cpu_device():
    """The host CPU device, or None when unavailable."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


configure()
