"""Spatial (Morton) reordering of the splat population.

At large N the binning gather and gradient scatter walk per-splat rows in
tile order; when splat indices are spatially random (as after init or many
densify cycles), every row touch is a random HBM access. Periodically
re-sorting the population along a Morton (Z-order) curve of splat centers
makes each tile's id run nearly contiguous, turning those row walks into
mostly-sequential traffic -- and keeps sort keys short-range in the binner.

Reordering permutes the *population*, which changes the fixed compositing
index order (Form.pdf p2). For image fitting the order is an arbitrary
artifact of initialization (the reference seeds it randomly,
main.cpp:294-302); swapping it changes blending only where splats overlap
and the optimizer re-converges within a few iterations. It is therefore an
explicit, opt-in maintenance operation (like densify), never applied
silently: CLI --reorder-every, or reorder_state() between fit blocks.

Adam moments follow their splats through the permutation; bias powers and
the step count are order-free. Dead slots (pos at DEAD_POS) sort to the
end, keeping live splats contiguous.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.params import DEAD_POS, GaussianParams
from gs2d_tpu.train.loop import TrainState


def _part1by1(x):
    """Interleave 16-bit x with zeros (Morton helper), uint32 in/out."""
    x = x & jnp.uint32(0x0000FFFF)
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x33333333)
    x = (x | (x << 1)) & jnp.uint32(0x55555555)
    return x


def morton_codes(params: GaussianParams, cfg: SplatConfig) -> jax.Array:
    """(N,) uint32 Z-order codes of splat centers on a 16-bit grid; dead
    slots get the maximum code (sort last)."""
    scale = jnp.float32(65535.0)
    qx = jnp.clip(params.pos[:, 0] / jnp.float32(max(cfg.width, 1)), 0.0,
                  1.0) * scale
    qy = jnp.clip(params.pos[:, 1] / jnp.float32(max(cfg.height, 1)), 0.0,
                  1.0) * scale
    code = _part1by1(qx.astype(jnp.uint32)) | (
        _part1by1(qy.astype(jnp.uint32)) << 1)
    dead = params.pos[:, 0] <= jnp.float32(DEAD_POS * 0.5)
    return jnp.where(dead, jnp.uint32(0xFFFFFFFF), code)


def reorder_perm(params: GaussianParams, cfg: SplatConfig) -> jax.Array:
    """Stable permutation sorting splats along the Morton curve."""
    return jnp.argsort(morton_codes(params, cfg), stable=True)


def reorder_state(state: TrainState, cfg: SplatConfig) -> TrainState:
    """Permute the population (and its Adam moments) into Morton order."""
    perm = reorder_perm(state.params, cfg)

    def take(x):
        return jnp.take(x, perm, axis=0)

    return TrainState(
        params=jax.tree.map(take, state.params),
        opt=state.opt.replace(
            m=jax.tree.map(take, state.opt.m),
            v=jax.tree.map(take, state.opt.v),
        ),
    )
