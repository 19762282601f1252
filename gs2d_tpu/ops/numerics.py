"""Low-level numerics shared by every rasterization path.

All functions are vectorized jnp transliterations of the scalar math that
defines the reference's numerical behavior:

- ``pcg`` / ``pcg3d``: deterministic uint32 hash RNG (reference main.cpp:10-24)
- ``exp_approx``: (1 + x/8)^8 fast exponential with a flush-to-zero guard
  (reference main.cpp:49-83)
- ``solve_quadratic``: cancellation-safe quadratic roots (reference
  main.cpp:171-185)
- ``sign_of``: branchless sign with sign(0) = +1 (reference main.cpp:34-37)

They are pure jnp so they run identically inside jit, inside Pallas kernels,
and under vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from gs2d_tpu.config import EXP_APPROX_FLUSH

UINT32_MAX_F = 4294967296.0  # float(0xFFFFFFFF) rounds up to 2^32


def pcg(v):
    """PCG hash of a uint32 array (reference main.cpp:10-15)."""
    v = jnp.asarray(v, jnp.uint32)
    state = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def pcg3d(v):
    """3-lane PCG hash; ``v`` has shape (..., 3) uint32 (reference main.cpp:17-24)."""
    v = jnp.asarray(v, jnp.uint32)
    v = v * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> jnp.uint32(16))
    y = y ^ (y >> jnp.uint32(16))
    z = z ^ (z >> jnp.uint32(16))
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def pcg3d_unit(v):
    """pcg3d mapped to [0, 1) floats the way the reference converts it
    (uint32 -> float32, then / float(0xFFFFFFFF); reference main.cpp:290-291)."""
    h = pcg3d(v)
    return h.astype(jnp.float32) / jnp.float32(UINT32_MAX_F)


def sign_of(v):
    """sign with sign(0) == +1 (reference main.cpp:34-37)."""
    return jnp.where(v < 0.0, jnp.float32(-1.0), jnp.float32(1.0))


def exp_approx(x):
    """Fast exp: (1 + x/8)^8 by three squarings, flushing to zero below the
    subnormal-safety threshold (reference main.cpp:49-83).

    Matches the reference bit-for-bit on float32 inputs in the domain used by
    the rasterizer (x <= 0).
    """
    x = jnp.float32(1.0) + x * jnp.float32(0.125)
    flush = x < jnp.float32(EXP_APPROX_FLUSH)
    x = x * x
    x = x * x
    x = x * x
    return jnp.where(flush, jnp.float32(0.0), x)


def exp_ref(x, use_approx: bool = True):
    """exp_approx by default; exact exp in validation mode (reference main.cpp:51)."""
    return exp_approx(x) if use_approx else jnp.exp(x)


def solve_quadratic(a, b, c):
    """Roots of a*x^2 + b*x + c = 0, cancellation-safe (reference main.cpp:171-185).

    Returns (ok, x_lo, x_hi). Where ``ok`` is False (negative discriminant)
    the roots are garbage and must be masked by the caller, mirroring the
    reference's early-return of zero roots.
    """
    det = b * b - jnp.float32(4.0) * a * c
    ok = det >= 0.0
    sdet = jnp.sqrt(jnp.maximum(det, 0.0))
    k = (-b - sign_of(b) * sdet) * jnp.float32(0.5)
    x0 = k / a
    x1 = c / k
    return ok, jnp.minimum(x0, x1), jnp.maximum(x0, x1)


def trunc_to_int(x):
    """C-style float -> int conversion (truncation toward zero).

    The reference's loop bounds are ``int begY = pos.y - hsize`` etc.
    (main.cpp:490-491, 507-508); matching those edge pixels exactly requires
    the same truncation semantics.
    """
    return jnp.trunc(x).astype(jnp.int32)
