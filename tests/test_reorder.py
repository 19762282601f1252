"""Morton reordering: permutation correctness and training behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.image import synthetic_target
from gs2d_tpu.params import DEAD_POS
from gs2d_tpu.train.loop import fit, init_train_state
from gs2d_tpu.train.reorder import morton_codes, reorder_state
from tests.helpers import random_splats, to_params

H, W = 32, 64


def test_permutation_preserves_population():
    cfg = SplatConfig(width=W, height=H, n_splats=64)
    state = init_train_state(cfg)
    m1 = jax.tree.map(lambda x: x + 1.0, state.opt.m)  # distinguishable
    state = state.replace(opt=state.opt.replace(m=m1))
    new = reorder_state(state, cfg)
    # same multiset of splats
    a = np.sort(np.asarray(state.params.pos[:, 0]))
    b = np.sort(np.asarray(new.params.pos[:, 0]))
    np.testing.assert_array_equal(a, b)
    # moments moved with their splats: recover the permutation and check
    perm = np.argsort(np.asarray(morton_codes(state.params, cfg)),
                      kind="stable")
    np.testing.assert_array_equal(
        np.asarray(new.opt.m.sx), np.asarray(state.opt.m.sx)[perm])
    # codes are non-decreasing after reorder
    codes = np.asarray(morton_codes(new.params, cfg))
    assert (np.diff(codes.astype(np.int64)) >= 0).all()


def test_dead_slots_sort_last():
    cfg = SplatConfig(width=W, height=H, n_splats=8)
    state = init_train_state(cfg)
    p = state.params
    p = p.replace(pos=p.pos.at[2].set(DEAD_POS).at[5].set(DEAD_POS))
    state = state.replace(params=p)
    new = reorder_state(state, cfg)
    pos0 = np.asarray(new.params.pos[:, 0])
    assert (pos0[:6] > DEAD_POS * 0.5).all()
    assert (pos0[6:] <= DEAD_POS * 0.5).all()


def test_training_continues_after_reorder():
    """Reordering mid-fit doesn't blow up the objective (order changes the
    blend only where splats overlap)."""
    cfg = SplatConfig(width=W, height=H, n_splats=48)
    ref = jnp.asarray(synthetic_target(H, W))
    state, h0 = fit(ref, cfg, iterations=20, log_every=19, log_fn=None)
    state = reorder_state(state, cfg)
    state, h1 = fit(ref, cfg, iterations=20, state=state, log_every=19,
                    log_fn=None)
    assert h1[-1]["mse"] <= h0[-1]["mse"] * 1.1
