"""Convergence metrics, defined to be comparable with the reference readout.

The reference prints MSE in 8-bit units: sum over pixels of ||(C - ref)*255||^2
over RGB divided by H*W*3, accumulated in double (main.cpp:796-807). PSNR
follows as 10*log10(255^2 / mse).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_255(color, ref):
    """Mean squared error on the 0-255 scale over RGB (main.cpp:796-806)."""
    d = (color - ref) * jnp.float32(255.0)
    return jnp.mean(d * d)


def psnr_from_mse(mse):
    """PSNR in dB from the 0-255-scale MSE."""
    return jnp.float32(10.0) * jnp.log10(jnp.float32(255.0 * 255.0) / mse)


def psnr(color, ref):
    return psnr_from_mse(mse_255(color, ref))
