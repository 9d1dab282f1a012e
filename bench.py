#!/usr/bin/env python
"""Benchmark: full multi-rate MPC solves/s on one chip.

Measures the reference's timed quantity — update + solveMPC
(variable_sampling_mpc.py:110-114): per-tick linearisation, constraint
assembly, equilibration apply, KKT factorisation, warm-started ADMM solve
with polish, and command extraction — at the full 588-var / 512-constraint
multi-rate horizon, batched over scenarios with vmap.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 5000}
(baseline: BASELINE.json north-star ≥5000 aggregate solves/s on v5p-16).
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache_tpu"))

    import __graft_entry__ as ge
    from ironcub_mpc_tpu.ops import admm

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # real-time-grade solver settings (matches closed-loop usage)
    settings = admm.ADMMSettings(max_iter=60, polish=True,
                                 rho_update_iters=(15, 40))
    cfg, sched, sel, settings, problem, carry, snap, vs_mpc = ge._setup(
        settings=settings)

    def tick(carry, snap, est):
        return vs_mpc.mpc_tick(cfg, sched, sel, settings, problem, carry,
                               snap, est)

    carries = jax.tree.map(lambda a: jnp.stack([a] * batch), carry)
    snaps = jax.tree.map(lambda a: jnp.stack([a] * batch), snap)
    # perturb initial states a little so lanes are not redundant
    key = jax.random.PRNGKey(0)
    snaps = snaps._replace(
        momentum_body=snaps.momentum_body
        + 0.1 * jax.random.normal(key, snaps.momentum_body.shape,
                                  snaps.momentum_body.dtype))
    est = jnp.zeros((batch, 4))

    step = jax.jit(jax.vmap(tick))
    # warmup / compile
    t0 = time.time()
    carries, out = step(carries, snaps, est)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        carries, out = step(carries, snaps, est)
    jax.block_until_ready(out)
    dt = time.time() - t0

    solves_per_s = batch * iters / dt
    solved = float(jnp.mean((out.status == 1) | (out.status == 2)))
    result = {
        "metric": "mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 5000.0, 3),
    }
    print(json.dumps(result))
    print(f"# device={jax.devices()[0].platform} batch={batch} iters={iters} "
          f"compile={compile_s:.1f}s measure={dt:.2f}s "
          f"per-solve={1e3*dt/(batch*iters):.3f}ms solved_frac={solved:.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
