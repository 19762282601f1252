"""Forward rasterizer: scan renderer vs the loop-faithful NumPy oracle."""

import jax
import numpy as np
import pytest

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.ops.render_jax import render, render_forward
from gs2d_tpu.params import init_params
from oracle import oracle_numpy as onp
from tests.helpers import from_params, random_splats, to_params

H, W = 48, 64


def make_case(rng, n):
    cfg = SplatConfig(width=W, height=H, n_splats=n)
    s = random_splats(rng, n, W, H)
    return cfg, s, to_params(s)


class TestForwardVsOracle:
    @pytest.mark.parametrize("n", [1, 7, 64, 256])
    def test_allclose(self, rng, n):
        cfg, s, params = make_case(rng, n)
        want_C, want_T = onp.forward(s, H, W)
        got_C, got_T = jax.jit(render_forward, static_argnums=1)(params, cfg)
        np.testing.assert_allclose(np.asarray(got_T), want_T, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_C), want_C, rtol=1e-5, atol=1e-6)

    def test_reference_init_allclose(self, rng):
        """The actual reference workload shape: pcg3d-initialized splats."""
        cfg = SplatConfig(width=W, height=H, n_splats=128)
        params = init_params(cfg)
        s = from_params(params)
        want_C, want_T = onp.forward(s, H, W)
        got_C, got_T = render_forward(params, cfg)
        np.testing.assert_allclose(np.asarray(got_C), want_C, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_T), want_T, rtol=1e-6, atol=1e-6)

    def test_saturating_opacity_early_out(self, rng):
        """Stacked opaque splats drive T below 1/256: the masked early-out
        must reproduce the sequential skip semantics exactly."""
        n = 64
        cfg = SplatConfig(width=W, height=H, n_splats=n)
        s = random_splats(rng, n, W, H, opacity_range=(0.95, 1.0))
        # Pile them all on the same spot to force saturation.
        s.pos[:] = np.float32([W / 2, H / 2]) + rng.normal(0, 2.0, (n, 2)).astype(np.float32)
        want_C, want_T = onp.forward(s, H, W)
        assert (want_T < 1.0 / 256.0).any(), "test must actually saturate"
        got_C, got_T = render_forward(to_params(s), cfg)
        np.testing.assert_allclose(np.asarray(got_T), want_T, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(got_C), want_C, rtol=1e-5, atol=1e-6)

    def test_offscreen_splats_no_contribution(self, rng):
        cfg, s, params = make_case(rng, 16)
        s.pos[:, 0] += 10000.0
        got_C, got_T = render_forward(to_params(s), cfg)
        assert float(np.abs(np.asarray(got_C)).max()) == 0.0
        assert float(np.asarray(got_T).min()) == 1.0

    def test_exact_exp_mode(self, rng):
        """cfg.use_exp_approx=False switches to exact exp (reference
        main.cpp:51 validation mode)."""
        cfg, s, params = make_case(rng, 32)
        cfg2 = cfg.replace(use_exp_approx=False)
        C1, _ = render_forward(params, cfg)
        C2, _ = render_forward(params, cfg2)
        d = np.abs(np.asarray(C1) - np.asarray(C2)).max()
        assert 0 < d < 0.15  # differs, but only by the approximation error


class TestRenderAPI:
    def test_render_jit_and_shape(self, rng):
        cfg, _, params = make_case(rng, 32)
        out = jax.jit(render, static_argnums=1)(params, cfg)
        assert out.shape == (H, W, 3)
        assert out.dtype == np.float32

    def test_padding_independence(self, rng):
        """Tile padding must not change the image."""
        cfg, s, params = make_case(rng, 32)
        cfg_b = cfg.replace(tile_h=32, tile_w=256)
        a = np.asarray(render_forward(params, cfg)[0])
        b = np.asarray(render_forward(params, cfg_b)[0])
        np.testing.assert_array_equal(a, b)
