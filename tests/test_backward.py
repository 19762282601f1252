"""Analytic backward pass: vs the NumPy oracle, finite differences, and
jax.grad of an exact-exp forward (the reference's three validation modes,
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.ops.render_jax import l2_loss, render, render_backward, render_forward
from oracle import oracle_numpy as onp
from tests.helpers import random_splats, to_params

H, W = 48, 64


def make_case(rng, n, **kw):
    cfg = SplatConfig(width=W, height=H, n_splats=n)
    s = random_splats(rng, n, W, H, **kw)
    ref = np.clip(rng.uniform(0, 1, (H, W, 3)), 0, 1).astype(np.float32)
    return cfg, s, to_params(s), ref


def grads_close(got, want, rtol, atol_scale=1e-5):
    """Compare gradient arrays with an atol proportional to their magnitude
    (per-splat grads are sums of thousands of float32 terms)."""
    got, want = np.asarray(got), np.asarray(want)
    atol = atol_scale * max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


class TestBackwardVsOracle:
    @pytest.mark.parametrize("n", [1, 16, 128])
    def test_allclose(self, rng, n):
        cfg, s, params, ref = make_case(rng, n)
        C0, _ = onp.forward(s, H, W)
        want = onp.backward(s, C0, ref, H, W)
        got = render_backward(params, jnp.asarray(C0), jnp.asarray(C0 - ref), cfg)
        grads_close(got.color, want.color, 2e-4)
        grads_close(got.opacity, want.opacity, 2e-4)
        grads_close(got.pos, want.pos, 5e-4)
        grads_close(got.sx, want.sx, 5e-4)
        grads_close(got.sy, want.sy, 5e-4)
        grads_close(got.rot, want.rot, 5e-4)

    def test_saturated_allclose(self, rng):
        """Early-out (T < 1/256) pixels must drop out of the grads exactly."""
        n = 48
        cfg, s, params, ref = make_case(rng, n, opacity_range=(0.95, 1.0))
        s.pos[:] = np.float32([W / 2, H / 2]) + rng.normal(0, 2.0, (n, 2)).astype(np.float32)
        params = to_params(s)
        C0, T = onp.forward(s, H, W)
        assert (T < 1.0 / 256.0).any()
        want = onp.backward(s, C0, ref, H, W)
        got = render_backward(params, jnp.asarray(C0), jnp.asarray(C0 - ref), cfg)
        grads_close(got.color, want.color, 5e-4)
        grads_close(got.pos, want.pos, 1e-3)

    def test_custom_vjp_wiring(self, rng):
        """jax.grad of the L2 loss == analytic backward with cotangent C-ref."""
        cfg, s, params, ref = make_case(rng, 32)
        g = jax.grad(l2_loss)(params, jnp.asarray(ref), cfg)
        C0 = render_forward(params, cfg)[0]
        direct = render_backward(params, C0, C0 - jnp.asarray(ref), cfg)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            np.testing.assert_array_equal(
                np.asarray(getattr(g, f)), np.asarray(getattr(direct, f)))


class TestAlphaOneRegression:
    def test_alpha_exactly_one_jitted(self, rng):
        """Regression: a fully opaque splat centered exactly on a pixel center
        makes alpha == 1.0 there; the (1 - alpha + 1e-15) guard must survive
        XLA's constant reassociation under jit (it rewrote the literal form to
        (1 + 1e-15) - alpha == 0, which NaN'd the whole gradient)."""
        n = 8
        cfg = SplatConfig(width=W, height=H, n_splats=n)
        s = random_splats(rng, n, W, H)
        s.opacity[:] = 1.0
        s.pos[0] = (W // 2 + 0.5, H // 2 + 0.5)  # exact pixel center
        params = to_params(s)
        ref = jnp.zeros((H, W, 3), jnp.float32)
        g = jax.jit(jax.grad(l2_loss), static_argnums=2)(params, ref, cfg)
        for leaf in jax.tree_util.tree_leaves(g):
            assert bool(jnp.isfinite(leaf).all()), "NaN gradient resurfaced"
        # and it still matches the oracle (which divides by exactly 1e-15 at
        # the alpha == 1 pixel, so gradients there are huge: compare loosely)
        C0, _ = onp.forward(s, H, W)
        want = onp.backward(s, C0, np.zeros((H, W, 3), np.float32), H, W)
        grads_close(g.color, want.color, 5e-4)
        grads_close(g.pos, want.pos, 1e-3)


class TestBackwardVsAutodiff:
    def test_matches_jax_grad_exact_exp(self, rng):
        """With exact exp, no saturation, and opacity < 1, the analytic
        gradient formulas should agree with autodiff through the scan forward
        to ~1e-3 relative (the 1e-15 guard and fp32 accumulation differ)."""
        cfg, s, params, ref = make_case(rng, 24, opacity_range=(0.2, 0.7))
        cfg = cfg.replace(use_exp_approx=False)
        ref = jnp.asarray(ref)

        def auto_loss(p):
            C = render_forward(p, cfg)[0]
            d = C - ref
            return 0.5 * jnp.sum(d * d)

        g_auto = jax.grad(auto_loss)(params)
        g_analytic = jax.grad(l2_loss)(params, ref, cfg)
        for f in ("color", "opacity", "pos", "sx", "sy", "rot"):
            a = np.asarray(getattr(g_auto, f), np.float64)
            b = np.asarray(getattr(g_analytic, f), np.float64)
            denom = np.maximum(np.abs(a).max(), 1e-3)
            assert np.max(np.abs(a - b)) / denom < 2e-3, f

    def test_finite_differences(self, rng):
        """Central finite differences on a few random parameters (the
        reference's commented-out validation blocks, main.cpp:642-701)."""
        cfg, s, params, ref = make_case(rng, 8, opacity_range=(0.3, 0.8))
        cfg = cfg.replace(use_exp_approx=False)
        ref = jnp.asarray(ref)
        g = jax.grad(l2_loss)(params, ref, cfg)

        f64 = lambda p: float(l2_loss(p, ref, cfg))
        eps = 1e-2
        checks = []
        for idx in [0, 3, 7]:
            for field, comp in [("pos", 0), ("pos", 1), ("sx", None),
                                ("sy", None), ("rot", None), ("color", 1),
                                ("opacity", None)]:
                arr = np.asarray(getattr(params, field)).copy()
                sel = (idx, comp) if comp is not None else (idx,)
                arr_p, arr_m = arr.copy(), arr.copy()
                arr_p[sel] += eps
                arr_m[sel] -= eps
                lp = f64(params.replace(**{field: jnp.asarray(arr_p)}))
                lm = f64(params.replace(**{field: jnp.asarray(arr_m)}))
                fd = (lp - lm) / (2 * eps)
                an = float(np.asarray(getattr(g, field))[sel])
                checks.append((field, idx, fd, an))
        fds = np.array([c[2] for c in checks])
        ans = np.array([c[3] for c in checks])
        scale = max(np.abs(fds).max(), 1.0)
        bad = [c for c in checks if abs(c[2] - c[3]) > 2e-2 * scale + 2e-2]
        assert not bad, bad
