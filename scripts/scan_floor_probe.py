#!/usr/bin/env python
"""Probe the on-device lax.scan per-iteration floor on the tunneled TPU.

Four scans, 200 iterations each, timed like the bench (fetch a scalar):

  empty    carry = f32 scalar + 1                      -> pure loop overhead
  soa      Adam on the production SoA pytree (27 leaves) with zero grads
  stacked  Adam on ONE (16, N) stacked array
  history  empty + per-step (1,) stacked output        -> ys stacking cost

If `empty` is ~µs/iter, the 0.19 ms "adam scan" floor (dissect_rest) is
the body, not the loop, and fusing Adam is worth it. If `empty` itself is
~0.2 ms/iter the floor is runtime-level and the headline is kernel-bound.
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.train.adam import adam_update, init_adam_state
    from gs2d_tpu.train.loop import init_train_state

    n_iters = 200
    cfg = SplatConfig(width=268, height=213, n_splats=1024)
    state = init_train_state(cfg)

    def timed(name, fn, *args):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        dt = time.perf_counter() - t0
        print(f"{name:8s} {dt / n_iters * 1e3:7.3f} ms/iter", flush=True)

    @jax.jit
    def empty(x):
        def body(c, _):
            return c + 1.0, None
        return jax.lax.scan(body, x, None, length=n_iters)[0]

    timed("empty", empty, jnp.float32(0.0))

    @jax.jit
    def history(x):
        def body(c, _):
            return c + 1.0, c
        return jax.lax.scan(body, x, None, length=n_iters)[1]

    timed("history", history, jnp.float32(0.0))

    zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    @jax.jit
    def soa(params, opt):
        def body(carry, _):
            p, o = carry
            p, o = adam_update(p, zero_g, o, cfg)
            return (p, o), None
        return jax.lax.scan(body, (params, opt), None, length=n_iters)[0]

    timed("soa", soa, state.params, state.opt)

    stacked = jnp.zeros((16, cfg.n_splats), jnp.float32)

    @jax.jit
    def stacked_adam(p, m, v):
        def body(carry, _):
            p, m, v, b1t, b2t = carry
            b1t, b2t = b1t * 0.9, b2t * 0.99
            g = jnp.zeros_like(p)
            m = 0.9 * m + 0.1 * g
            v = 0.99 * v + 0.01 * g * g
            p = p - 0.05 * (m / (1.0 - b1t)) / (
                jnp.sqrt(v / (1.0 - b2t)) + 1e-15)
            return (p, m, v, b1t, b2t), None
        return jax.lax.scan(
            body, (p, m, v, jnp.float32(1.0), jnp.float32(1.0)),
            None, length=n_iters)[0]

    timed("stacked", stacked_adam, stacked, stacked, stacked)


if __name__ == "__main__" and "--unroll" not in sys.argv:
    main()


def probe_unroll():
    import jax
    import jax.numpy as jnp
    import time

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    n_iters = 200

    for u in (1, 2, 4, 8):
        @jax.jit
        def empty(x, u=u):
            def body(c, _):
                return c + 1.0, c
            return jax.lax.scan(body, x, None, length=n_iters, unroll=u)[0]

        out = empty(jnp.float32(0.0))
        _ = float(out)
        t0 = time.perf_counter()
        _ = float(empty(jnp.float32(0.0)))
        dt = time.perf_counter() - t0
        print(f"unroll={u}  {dt / n_iters * 1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__" and "--unroll" in sys.argv:
    probe_unroll()
