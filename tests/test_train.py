"""Optimizer and training-loop tests: Adam vs the oracle, full-iteration
equivalence, convergence, NaN tripwire, and restart semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.image import synthetic_target
from gs2d_tpu.params import init_params
from gs2d_tpu.train.adam import adam_update, init_adam_state
from gs2d_tpu.train.loop import fit, init_train_state, make_train_step
from oracle import oracle_numpy as onp
from tests.helpers import from_params, random_splats, to_params

H, W = 48, 64


class TestAdamVsOracle:
    @pytest.mark.parametrize("optimize_opacity", [False, True])
    def test_multi_step(self, rng, optimize_opacity):
        n = 32
        cfg = SplatConfig(width=W, height=H, n_splats=n,
                          optimize_opacity=optimize_opacity)
        s = random_splats(rng, n, W, H)
        params = to_params(s)
        state = init_adam_state(params)
        ost = onp.init_adam(n)
        for step in range(4):
            g = random_splats(rng, n, W, H)  # arbitrary fake gradients
            go = onp.Splats(g.pos - 5.0, g.sx - 5.0, g.sy - 5.0, g.rot - 1.0,
                            g.color - 0.5, g.opacity - 0.5)
            params, state = adam_update(params, to_params(go), state, cfg)
            so = from_params(to_params(s)) if step == 0 else so  # noqa: F821
            # advance oracle
            if step == 0:
                so = s.copy()
            so, ost = onp.adam_step(so, go, ost, optimize_opacity=optimize_opacity,
                                    width=W, height=H)
            for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
                np.testing.assert_allclose(
                    np.asarray(getattr(params, f)), getattr(so, f),
                    rtol=2e-5, atol=2e-6, err_msg=f"{f} step {step}")

    def test_bias_powers(self, rng):
        cfg = SplatConfig(width=W, height=H, n_splats=4)
        params = to_params(random_splats(rng, 4, W, H))
        st = init_adam_state(params)
        g = to_params(random_splats(rng, 4, W, H))
        _, st = adam_update(params, g, st, cfg)
        assert np.isclose(float(st.beta1t), 0.9)
        assert np.isclose(float(st.beta2t), 0.99)
        assert int(st.step) == 1

    def test_clamps(self, rng):
        cfg = SplatConfig(width=W, height=H, n_splats=4, learning_rate=1e6,
                          optimize_opacity=True)
        params = to_params(random_splats(rng, 4, W, H))
        g = jax.tree.map(jnp.ones_like, params)
        params, _ = adam_update(params, g, init_adam_state(params), cfg)
        p = np.asarray(params.pos)
        assert (p[:, 0] >= 0).all() and (p[:, 0] <= W - 1).all()
        assert (np.asarray(params.sx) >= 1.0).all()
        assert (np.asarray(params.color) >= 0).all() and (np.asarray(params.color) <= 1).all()
        assert (np.asarray(params.opacity) >= 0.1).all()


class TestLrDecay:
    """Exponential lr schedule (net-new vs the constant-lr reference,
    main.cpp:715). With a constant gradient g, Adam's update is exactly
    lr_t * sign(g) (m_hat=g, v_hat=g^2), so parameter deltas measure the
    schedule directly."""

    def _deltas(self, cfg, n_steps):
        n = 8
        params = to_params(random_splats(np.random.default_rng(0), n, W, H))
        state = init_adam_state(params)
        g = jax.tree.map(jnp.ones_like, params)
        deltas = []
        for _ in range(n_steps):
            new, state = adam_update(params, g, state, cfg)
            # rot is unclamped and far from any boundary for these splats
            deltas.append(float(params.rot[0] - new.rot[0]))
            params = new
        return deltas

    def test_schedule_matches_formula(self):
        lr0, lrf, T = 0.05, 0.005, 8
        cfg = SplatConfig(width=W, height=H, n_splats=8, learning_rate=lr0,
                          lr_final=lrf, lr_decay_iters=T)
        deltas = self._deltas(cfg, 12)
        for t, d in enumerate(deltas):
            frac = min(t / T, 1.0)
            expected = lr0 * (lrf / lr0) ** frac
            np.testing.assert_allclose(d, expected, rtol=1e-4,
                                       err_msg=f"step {t}")
        # held at lr_final beyond T
        np.testing.assert_allclose(deltas[-1], lrf, rtol=1e-4)

    def test_disabled_matches_constant(self):
        base = SplatConfig(width=W, height=H, n_splats=8, learning_rate=0.05)
        dec0 = SplatConfig(width=W, height=H, n_splats=8, learning_rate=0.05,
                           lr_decay_iters=0, lr_final=1e-9)
        np.testing.assert_array_equal(self._deltas(base, 3),
                                      self._deltas(dec0, 3))


class TestFullIterationVsOracle:
    def test_two_iterations_allclose(self, rng):
        """Complete fwd+bwd+Adam iterations must track the oracle."""
        n = 48
        cfg = SplatConfig(width=W, height=H, n_splats=n)
        ref = synthetic_target(H, W)
        s = random_splats(rng, n, W, H)
        state = init_train_state(cfg).replace(params=to_params(s))
        step_fn = make_train_step(cfg)
        so, ost = s.copy(), onp.init_adam(n)
        for it in range(2):
            state, aux = step_fn(state, jnp.asarray(ref))
            so, ost, C0, g, mse = onp.train_iteration(so, ost, ref, H, W)
            assert np.isclose(float(aux.mse), mse, rtol=1e-3), it
            for f in ("pos", "sx", "sy", "rot", "color"):
                got = np.asarray(getattr(state.params, f))
                want = getattr(so, f)
                # Adam normalizes by grad magnitude, so parameter deltas are
                # O(lr); allow small absolute slack from fp32 reduction order.
                np.testing.assert_allclose(got, want, rtol=2e-3, atol=6e-3,
                                           err_msg=f"{f} iter {it}")


class TestConvergence:
    def test_mse_decreases(self, rng):
        cfg = SplatConfig(width=W, height=H, n_splats=96)
        ref = jnp.asarray(synthetic_target(H, W))
        state, hist = fit(ref, cfg, iterations=60, log_every=10, log_fn=None)
        assert len(hist) >= 2
        assert hist[-1]["mse"] < hist[0]["mse"] * 0.6, hist

    def test_deterministic_restart(self):
        """Restart == re-init (reference Restart button, main.cpp:828-831):
        two runs from init are bitwise identical."""
        cfg = SplatConfig(width=W, height=H, n_splats=32)
        ref = jnp.asarray(synthetic_target(H, W))
        s1, _ = fit(ref, cfg, iterations=5)
        s2, _ = fit(ref, cfg, iterations=5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNaNGuard:
    def test_raises_on_nonfinite(self):
        cfg = SplatConfig(width=W, height=H, n_splats=8)
        ref = jnp.asarray(synthetic_target(H, W))
        state = init_train_state(cfg)
        bad = state.params.replace(sx=state.params.sx.at[0].set(jnp.nan))
        # Clamp keeps NaN (min/max propagate NaN in jnp? jnp.clip keeps NaN),
        # so the tripwire must fire on the first logged step.
        state = state.replace(params=bad)
        with pytest.raises(FloatingPointError):
            fit(ref, cfg, iterations=2, state=state, log_every=1, log_fn=None)


class TestInitMatchesOracle:
    def test_init_bitwise(self):
        cfg = SplatConfig(width=268, height=213, n_splats=256)
        p = init_params(cfg)
        s = onp.init_splats(256, 268, 213)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            np.testing.assert_array_equal(
                np.asarray(getattr(p, f)), getattr(s, f), err_msg=f)
