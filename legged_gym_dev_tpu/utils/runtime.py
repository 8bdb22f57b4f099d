"""Runtime/platform helpers for TPU execution.

The framework's compute paths are backend-agnostic JAX; this module holds the
few knobs that matter for production TPU runs.
"""
from __future__ import annotations

import jax


def setup_tpu_runtime(prng: str = "rbg",
                      compilation_cache: str | None = "~/.cache/jax_comp") \
        -> None:
    """Configure JAX for TPU production runs.

    - ``rbg`` PRNG: the counter-based threefry default is slow to compile and
      run on TPU; ``rbg`` uses the hardware RNG path (standard practice for
      large TPU jobs; measured ~6x faster compiles for RNG-heavy graphs on
      this backend). All framework code threads explicit keys, so the choice
      is a pure runtime knob.
    - Persistent compilation cache: first compiles of the quadruped
      scalar-graph programs take 10-30 min on the remote backend; the
      on-disk cache makes every later process start instant for unchanged
      programs.
    """
    if prng:
        jax.config.update("jax_default_prng_impl", prng)
    if compilation_cache:
        import os

        path = os.path.expanduser(compilation_cache)
        os.makedirs(path, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", path)
            # Cache everything that took noticeable compile time.
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # older jax without the persistent-cache config


def force_cpu(n_devices: int = 8) -> None:
    """Force a virtual multi-device CPU platform (test/dry-run harness)."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
