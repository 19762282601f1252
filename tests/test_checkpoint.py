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


class TestShardedCheckpoint:
    def test_save_restore_on_mesh(self, tmp_path):
        """Orbax save of a mesh-sharded state restores directly onto the
        mesh with the original shardings (multi-host contract, exercised on
        the virtual 8-device CPU mesh)."""
        pytest.importorskip("orbax.checkpoint")
        from gs2d_tpu.parallel.mesh import make_mesh
        from gs2d_tpu.parallel.sharded import (fit_sharded,
                                               init_batched_state,
                                               make_sharded_train_step,
                                               pad_ref_batch)

        cfg = SplatConfig(width=W, height=H, n_splats=16, min_throughput=0.0)
        mesh = make_mesh(data=2, tile=2, splat=2)
        refs = jnp.stack([synthetic_target(H, W, seed=s) for s in (0, 1)])
        state, _ = fit_sharded(refs, cfg, mesh, iterations=2)

        ck = Checkpointer(str(tmp_path / "ck"), use_orbax=True)
        ck.save(2, state, cfg)

        # Restore onto the mesh: `like` carries the shardings.
        _, shardings = make_sharded_train_step(cfg, mesh)
        like = jax.device_put(init_batched_state(cfg, 2), shardings["state"])
        restored = ck.restore(2, like)
        _assert_states_equal(state, restored)
        assert restored.params.pos.sharding == state.params.pos.sharding

        # And training continues from the restored sharded state.
        cont, _ = fit_sharded(refs, cfg, mesh, iterations=1, state=restored)
        for leaf in jax.tree.leaves(cont):
            assert np.isfinite(np.asarray(leaf)).all()


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
