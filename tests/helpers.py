"""Shared test utilities: paired random splat sets for oracle comparison."""

from __future__ import annotations

import numpy as np

from gs2d_tpu.params import GaussianParams
from oracle.oracle_numpy import Splats


def random_splats(rng, n, width, height, opacity_range=(0.3, 1.0)):
    """A random but well-conditioned splat population as a NumPy Splats."""
    pos = np.stack(
        [
            rng.uniform(-3.0, width + 3.0, n),
            rng.uniform(-3.0, height + 3.0, n),
        ],
        -1,
    ).astype(np.float32)
    sx = rng.uniform(1.5, 12.0, n).astype(np.float32)
    sy = rng.uniform(1.5, 12.0, n).astype(np.float32)
    rot = rng.uniform(0.0, np.pi, n).astype(np.float32)
    color = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    opacity = rng.uniform(*opacity_range, n).astype(np.float32)
    return Splats(pos, sx, sy, rot, color, opacity)


def to_params(s: Splats) -> GaussianParams:
    return GaussianParams(
        pos=s.pos, sx=s.sx, sy=s.sy, rot=s.rot, color=s.color, opacity=s.opacity
    )


def from_params(p: GaussianParams) -> Splats:
    return Splats(
        pos=np.asarray(p.pos),
        sx=np.asarray(p.sx),
        sy=np.asarray(p.sy),
        rot=np.asarray(p.rot),
        color=np.asarray(p.color),
        opacity=np.asarray(p.opacity),
    )
