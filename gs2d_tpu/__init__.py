"""gs2d_tpu: TPU-native 2D Gaussian splatting framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
Ushio/2dGaussianSplatting (the `2dgaussiansplatting_tpu` blueprint package;
named importably). See README.md for the architecture map.
"""

import os as _os

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes (cuts the multi-minute
    remote-compile cost of the tunneled TPU runtime to ~0 on warm starts)."""
    import jax

    path = path or _os.path.expanduser("~/.cache/gs2d_tpu_xla")
    _os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
