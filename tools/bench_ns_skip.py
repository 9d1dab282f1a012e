#!/usr/bin/env python
"""A/B the probe-gated carried-inverse refresh skip (ADMMSettings.ns_skip_tol).

Measures device-resident scan throughput (the production regime, same
harness as bench.py) for ns_skip_tol=0 (refresh every tick) vs a gated
configuration, at two per-tick snapshot-jitter levels:

  jitter=0.0  — H constant across ticks (the stock bench regime): every
                tick's probe passes, so this is the *upper bound* of the
                skip win.
  jitter>0    — per-tick momentum jitter emulates the 200 Hz
                relinearisation drift of a real flight; the probe
                residual actually grows between refreshes, so this is
                the honest regime.

Usage: python tools/bench_ns_skip.py [batch] [scan_len]

Note on solved=: the printed solved fraction averages status over the
final timed repetition only, and the timed reps start from each arm's own
post-warmup carry (the arms' solvers differ, so the warmup leaves slightly
different carry states). Fine for the A/B throughput comparison this tool
exists for; the solved= values are not from identical tick populations.
"""

import dataclasses
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache_tpu"))

    import __graft_entry__ as ge
    from ironcub_mpc_tpu.ops import admm

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scan_len = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    base = admm.ADMMSettings(max_iter=40, polish=True,
                             rho_update_iters=(15,), pallas_mode="off",
                             kinv_guard=True,
                             guard_axis=admm.BATCH_GUARD_AXIS)
    results = {}
    for name, tol in (("refresh_every_tick", 0.0), ("skip_tol_0.02", 0.02)):
        settings = dataclasses.replace(base, ns_skip_tol=tol)
        cfg, sched, sel, settings, problem, carry, snap, vs_mpc = ge._setup(
            settings=settings)

        def tick(c, s, e):
            return vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                   c, s, e)

        vtick = jax.vmap(tick, axis_name=admm.BATCH_GUARD_AXIS)
        carries0 = jax.tree.map(lambda a: jnp.stack([a] * batch), carry)
        snaps = jax.tree.map(lambda a: jnp.stack([a] * batch), snap)
        key = jax.random.PRNGKey(0)
        snaps = snaps._replace(
            momentum_body=snaps.momentum_body
            + 0.1 * jax.random.normal(key, snaps.momentum_body.shape))
        est = jnp.zeros((batch, 4))

        for jitter in (0.0, 0.2):
            @jax.jit
            def chain(carries, jit_scale=jitter):
                def body(cc, k):
                    # per-tick momentum jitter: relinearisation drift
                    s_t = snaps._replace(
                        momentum_body=snaps.momentum_body
                        + jit_scale * jax.random.normal(
                            jax.random.fold_in(key, k),
                            snaps.momentum_body.shape))
                    cc, out = vtick(cc, s_t, est)
                    ok = jnp.mean(((out.status == 1)
                                   | (out.status == 2)).astype(jnp.float32))
                    return cc, ok
                return jax.lax.scan(body, carries,
                                    jnp.arange(scan_len, dtype=jnp.int32))

            carries, ok = chain(carries0)
            jax.block_until_ready(ok)
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                carries, ok = chain(carries)
            jax.block_until_ready(ok)
            dt = (time.time() - t0) / reps / scan_len
            sps = batch / dt
            solved = float(jnp.mean(ok))
            results[(name, jitter)] = (sps, solved)
            print(f"{name:22s} jitter={jitter:4.2f}  "
                  f"{sps:9.0f} solves/s  solved={solved:.3f}",
                  flush=True)

    for jitter in (0.0, 0.2):
        a = results[("refresh_every_tick", jitter)][0]
        b = results[("skip_tol_0.02", jitter)][0]
        print(f"jitter={jitter}: skip is {100 * (b / a - 1):+.1f}%")


if __name__ == "__main__":
    main()
