from .runtime import force_cpu, setup_tpu_runtime

__all__ = ["force_cpu", "setup_tpu_runtime"]
