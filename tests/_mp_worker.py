"""Multi-process worker: one JAX controller of a 2-process CPU cluster.

Launched by tests/test_multiprocess.py (2 subprocesses x 2 local virtual
devices = a 4-device global mesh spanning processes). Runs the production
sharded pallas train step over (tile=2, splat=2) with cross-process gloo
collectives, compares against the single-device fused step computed
independently on each process (deterministic init), and round-trips the
sharded state through the orbax checkpointer (per-shard multi-host save).

Prints MP_WORKER_OK on success; any assertion kills the exit code.
"""

import os
import sys

port, pid, ckdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
combine = sys.argv[4] if len(sys.argv) > 4 else "fold"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

import jax

jax.config.update("jax_platforms", "cpu")

from gs2d_tpu.parallel.multihost import initialize_cluster

initialize_cluster(coordinator_address=f"127.0.0.1:{port}",
                   num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4

import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.checkpoint import Checkpointer
from gs2d_tpu.io.image import synthetic_target
from gs2d_tpu.ops import render_pallas as rp
from gs2d_tpu.parallel.mesh import make_mesh
from gs2d_tpu.parallel.multihost import fetch_replicated, put_global
from gs2d_tpu.parallel.sharded import (init_batched_state,
                                       make_sharded_train_step,
                                       pad_ref_batch)
from gs2d_tpu.train.loop import init_train_state, make_train_step_fused

H, W = 32, 48
cfg = SplatConfig(width=W, height=H, n_splats=32, tile_h=8,
                  min_throughput=0.0, max_splats_per_tile=32)
mesh = make_mesh(tile=2, splat=2)
step, sh = make_sharded_train_step(cfg, mesh, renderer="pallas",
                                   overlap_chunks=2, combine=combine)

ref = synthetic_target(H, W, seed=0)
refs = pad_ref_batch(jnp.asarray(ref)[None], cfg)
state0 = init_batched_state(cfg, 1)
state = put_global(state0, sh["state"])
refs_g = put_global(np.asarray(refs), sh["ref"])

new_state, aux = step(state, refs_g)
mse = float(fetch_replicated(aux.mse)[0])
assert bool(fetch_replicated(aux.all_finite).all())

# Independent single-device reference on each process (min_throughput=0
# keeps the splat-sharded semantics identical to sequential).
sstep = make_train_step_fused(cfg)
s1 = init_train_state(cfg)
refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
out1, aux1 = sstep(s1, refc)
assert np.isclose(mse, float(aux1.mse), rtol=1e-5), (mse, float(aux1.mse))
new_pos = fetch_replicated(new_state.params.pos)[0]
np.testing.assert_allclose(new_pos, np.asarray(out1.params.pos),
                           rtol=1e-4, atol=2e-3)

# Sharded checkpoint round-trip: orbax writes each process's shards; the
# restore lands directly back onto the mesh.
ck = Checkpointer(ckdir)
ck.save(1, new_state, cfg)
restored = ck.restore(1, new_state)
np.testing.assert_array_equal(fetch_replicated(restored.params.pos),
                              fetch_replicated(new_state.params.pos))

print(f"MP_WORKER_OK p{pid} combine={combine} mse={mse:.4f}", flush=True)
