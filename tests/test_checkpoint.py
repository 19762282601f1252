"""Checkpoint/resume: the state contract is {params, Adam moments, bias
powers, step} (SURVEY.md section 5; reference main.cpp:271-278)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.checkpoint import Checkpointer, load_npz, load_npz_config, save_npz
from gs2d_tpu.io.image import synthetic_target
from gs2d_tpu.train.loop import fit, init_train_state

H, W = 32, 64


def _assert_states_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("use_orbax", [False, True])
class TestCheckpointer:
    def test_roundtrip(self, tmp_path, use_orbax):
        cfg = SplatConfig(width=W, height=H, n_splats=16)
        ref = jnp.asarray(synthetic_target(H, W))
        state, _ = fit(ref, cfg, iterations=3)
        ck = Checkpointer(str(tmp_path / "ck"), use_orbax=use_orbax)
        ck.save(3, state, cfg)
        assert ck.latest_step() == 3
        restored = ck.restore(3, init_train_state(cfg))
        _assert_states_equal(state, restored)

    def test_resume_equals_continuous(self, tmp_path, use_orbax):
        """fit(6) == fit(3) -> checkpoint -> restore -> fit(3): bitwise."""
        cfg = SplatConfig(width=W, height=H, n_splats=16)
        ref = jnp.asarray(synthetic_target(H, W))
        cont, _ = fit(ref, cfg, iterations=6)

        half, _ = fit(ref, cfg, iterations=3)
        ck = Checkpointer(str(tmp_path / "ck"), use_orbax=use_orbax)
        ck.save(3, half, cfg)
        step, restored = ck.restore_latest(init_train_state(cfg))
        assert step == 3
        resumed, _ = fit(ref, cfg, iterations=3, state=restored)
        _assert_states_equal(cont, resumed)

    def test_retention(self, tmp_path, use_orbax):
        cfg = SplatConfig(width=W, height=H, n_splats=4)
        state = init_train_state(cfg)
        ck = Checkpointer(str(tmp_path / "ck"), keep=2, use_orbax=use_orbax)
        for s in (1, 2, 3, 4):
            ck.save(s, state)
        assert ck.all_steps() == [3, 4]


class TestNpzFormat:
    def test_config_roundtrip(self, tmp_path):
        cfg = SplatConfig(width=W, height=H, n_splats=16, learning_rate=0.07)
        state = init_train_state(cfg)
        p = str(tmp_path / "s.npz")
        save_npz(p, state, cfg)
        cfg2 = load_npz_config(p)
        assert cfg2 == cfg
        restored = load_npz(p, init_train_state(cfg))
        _assert_states_equal(state, restored)


class TestElasticRecovery:
    def test_recovers_from_nan(self, tmp_path):
        """Inject a NaN mid-fit; the driver must restore the checkpoint,
        back off lr, and complete."""
        import gs2d_tpu.train.loop as loop_mod
        from gs2d_tpu.train.loop import fit_with_recovery

        cfg = SplatConfig(width=W, height=H, n_splats=16)
        ref = jnp.asarray(synthetic_target(H, W))
        ck = Checkpointer(str(tmp_path / "ck"), use_orbax=False)

        calls = {"n": 0}
        orig_fit = loop_mod.fit

        def sabotaged_fit(*args, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                # run 3 real iterations (checkpointing), then fault
                st, hist = orig_fit(*args[:2], 3, **{k: v for k, v in kw.items()
                                                     if k != "iterations"})
                raise FloatingPointError("injected")
            return orig_fit(*args, **kw)

        loop_mod.fit = sabotaged_fit
        try:
            state, hist, n_rec = fit_with_recovery(
                ref, cfg, iterations=6, checkpointer=ck,
                checkpoint_every=2, log_fn=None)
        finally:
            loop_mod.fit = orig_fit
        assert n_rec == 1
        assert ck.latest_step() == 6
        for leaf in jax.tree.leaves(state.params):
            assert bool(jnp.isfinite(leaf).all())
