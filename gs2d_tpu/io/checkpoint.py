"""Checkpoint / resume.

The reference keeps all fitting state in RAM and can only restart from
scratch (main.cpp:828-831). The resume contract (SURVEY.md section 5) is the
exact state list the reference would need: splat parameters, the per-param
Adam moments, the running bias-correction powers beta1t/beta2t, and the
iteration count (main.cpp:271-278).

Two backends:
- orbax (default when available): async-capable, sharding-aware -- restores
  directly onto a device mesh for multi-host runs.
- npz: dependency-free flat-array fallback, also the interchange format.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.train.loop import TrainState


def _flatten(state: TrainState) -> dict:
    leaves, treedef = jax.tree.flatten(state)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}


def _unflatten(arrays: dict, like: TrainState) -> TrainState:
    leaves, treedef = jax.tree.flatten(like)
    new = [arrays[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new)


def save_npz(path: str, state: TrainState, cfg: Optional[SplatConfig] = None):
    """Write the full train state (and config) to a single .npz file."""
    payload = _flatten(state)
    if cfg is not None:
        payload["config_json"] = np.frombuffer(
            json.dumps(cfg.__dict__).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_npz(path: str, like: TrainState) -> TrainState:
    with np.load(path) as z:
        return _unflatten(dict(z), like)


def load_npz_config(path: str) -> Optional[SplatConfig]:
    with np.load(path) as z:
        if "config_json" not in z:
            return None
        raw = json.loads(bytes(z["config_json"]).decode())
        return SplatConfig(**{k: tuple(v) if isinstance(v, list) else v
                              for k, v in raw.items()})


class Checkpointer:
    """Directory-based checkpoint manager with step retention.

    Uses orbax when importable; falls back to npz files named step_{n}.npz.
    """

    def __init__(self, directory: str, keep: int = 3, use_orbax: bool | None = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        if use_orbax is None:
            try:
                import orbax.checkpoint  # noqa: F401
                use_orbax = True
            except Exception:
                use_orbax = False
        self.use_orbax = use_orbax
        if use_orbax:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=keep),
            )

    # -- save ----------------------------------------------------------------
    def save(self, step: int, state: TrainState, cfg: Optional[SplatConfig] = None):
        if self.use_orbax:
            import orbax.checkpoint as ocp

            # Pass jax.Arrays through untouched: orbax writes sharded arrays
            # per-shard (multi-host safe). Forcing np.asarray here would
            # all-gather every array onto one host and fail on
            # process-spanning shardings.
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
            if cfg is not None:
                with open(os.path.join(self.directory, "config.json"), "w") as f:
                    json.dump(cfg.__dict__, f)
        else:
            save_npz(os.path.join(self.directory, f"step_{step}.npz"), state, cfg)
            self._prune_npz()

    def _prune_npz(self):
        steps = sorted(self.all_steps())
        for s in steps[: -self.keep]:
            os.remove(os.path.join(self.directory, f"step_{s}.npz"))

    # -- load ----------------------------------------------------------------
    def all_steps(self):
        if self.use_orbax:
            return sorted(self._mgr.all_steps())
        out = []
        for f in os.listdir(self.directory):
            if f.startswith("step_") and f.endswith(".npz"):
                out.append(int(f[len("step_"):-len(".npz")]))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, step: int, like: TrainState) -> TrainState:
        """Restore state shaped (and sharded) like ``like``.

        ``like``'s leaves may be concrete jax.Arrays (their shardings are
        reused -- arrays land directly on the mesh, per-shard, no host
        round-trip) or plain host arrays (single-process restore)."""
        if self.use_orbax:
            import orbax.checkpoint as ocp

            def absify(x):
                if isinstance(x, jax.Array):
                    return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                sharding=x.sharding)
                return np.asarray(x)

            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(
                    jax.tree.map(absify, like)))
            return jax.tree.unflatten(
                jax.tree.structure(like), jax.tree.leaves(restored))
        return load_npz(os.path.join(self.directory, f"step_{step}.npz"), like)

    def restore_latest(self, like: TrainState) -> tuple[Optional[int], TrainState]:
        step = self.latest_step()
        if step is None:
            return None, like
        return step, self.restore(step, like)
