"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU via
``xla_force_host_platform_device_count`` (no TPU pod needed), per the
framework's test strategy (SURVEY.md §4).

Note: the environment's sitecustomize registers a remote-TPU ("axon") JAX
backend and force-sets ``jax_platforms``; plain env vars are not enough, we
must override the config after import (compiles over the TPU tunnel take
20-40s each, which makes the suite unusably slow and non-hermetic).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Headless GL for mujoco.Renderer (no display in this image; Mesa EGL
# initializes only on the surfaceless platform). Must precede any
# `import mujoco` — mujoco picks its GL backend at import time.
os.environ.setdefault("MUJOCO_GL", "egl")
os.environ.setdefault("EGL_PLATFORM", "surfaceless")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
