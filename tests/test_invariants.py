"""Structural invariants of the rasterizer (the deterministic-kernel analog
of race detection, SURVEY.md section 5): transmittance stays in [0, 1],
composited color is bounded by the color simplex, renders are bitwise
deterministic, and the compositing monoid is associative."""

import jax
import numpy as np

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.ops.render_jax import render_forward, render_forward_band
from tests.helpers import random_splats, to_params

H, W = 48, 64


def test_transmittance_in_unit_interval(rng):
    for trial in range(3):
        n = 128
        cfg = SplatConfig(width=W, height=H, n_splats=n)
        s = random_splats(rng, n, W, H, opacity_range=(0.5, 1.0))
        C, T = render_forward(to_params(s), cfg)
        T = np.asarray(T)
        assert (T >= 0.0).all() and (T <= 1.0).all()


def test_color_bounded_by_accumulated_weight(rng):
    """C = sum w_i c_i with sum w_i = 1 - T_final <= 1 and c in [0,1]^3,
    so every channel obeys 0 <= C <= 1 - T_final."""
    n = 96
    cfg = SplatConfig(width=W, height=H, n_splats=n)
    s = random_splats(rng, n, W, H, opacity_range=(0.2, 1.0))
    C, T = render_forward(to_params(s), cfg)
    C, T = np.asarray(C), np.asarray(T)
    assert (C >= 0.0).all()
    assert (C <= (1.0 - T)[..., None] + 1e-5).all()


def test_render_deterministic(rng):
    n = 64
    cfg = SplatConfig(width=W, height=H, n_splats=n)
    p = to_params(random_splats(rng, n, W, H))
    f = jax.jit(render_forward, static_argnums=1)
    a = np.asarray(f(p, cfg)[0])
    b = np.asarray(f(p, cfg)[0])
    np.testing.assert_array_equal(a, b)


def test_monoid_associativity(rng):
    """Splitting the splat list at any point and combining with
    (Ca + Ta*Cb, Ta*Tb) reproduces the unsplit composite (threshold off)."""
    n = 60
    cfg = SplatConfig(width=W, height=H, n_splats=n, min_throughput=0.0)
    s = random_splats(rng, n, W, H)
    p = to_params(s)
    C_full, T_full = render_forward(p, cfg)

    for cut in (1, 17, 30, 59):
        pa = jax.tree.map(lambda x: x[:cut], p)
        pb = jax.tree.map(lambda x: x[cut:], p)
        Ca, Ta = render_forward_band(pa, cfg)
        Cb, Tb = render_forward_band(pb, cfg)
        C = Ca + Ta[..., None] * Cb
        T = Ta * Tb
        np.testing.assert_allclose(
            np.asarray(C[: H, : W]), np.asarray(C_full), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(T[: H, : W]), np.asarray(T_full), atol=1e-6)
