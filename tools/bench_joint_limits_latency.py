#!/usr/bin/env python
"""Batch-1 latency of the joint-limits configuration on the chip.

With ``use_joint_position_constraint=True`` the condensed box widens to
n_box=120 (box0=0). Round 2's Pallas Woodbury kernel could not hold that
box and the ρ-refresh silently fell back to pure JAX — the latency path
degraded exactly when the extra constraint made solves harder. The kernel
now tiles its Gauss-Jordan buffer across lanes; this tool measures the
device-sequential single-solve latency of that configuration, fused Pallas
vs pure JAX (same protocol as bench.py's latency metric).

Usage: python tools/bench_joint_limits_latency.py [chain=100]
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
                      str(ROOT / (".jax_cache_tpu"
                                  if jax.default_backend() == "tpu"
                                  else ".jax_cache")))

    import __graft_entry__ as ge
    from ironcub_mpc_tpu.core.config import MPCConfig
    from ironcub_mpc_tpu.ops import admm

    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg0 = dataclasses.replace(MPCConfig(),
                               use_joint_position_constraint=True)
    base = admm.ADMMSettings(max_iter=40, polish=True,
                             rho_update_iters=(15,), kinv_guard=True)

    for mode in ("off", "on"):
        settings = dataclasses.replace(base, pallas_mode=mode)
        cfg, sched, sel, settings, problem, carry, snap, vs_mpc = ge._setup(
            cfg=cfg0, settings=settings)

        @jax.jit
        def chain_fn(carry, snap, est):
            def body(c, _):
                c, out = vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                         c, snap, est)
                return c, out.status
            return jax.lax.scan(body, carry, None, length=chain)

        c1, st = chain_fn(carry, snap, jnp.zeros(4))
        jax.block_until_ready(st)
        solved = float(np.mean((np.asarray(st) == 1)
                               | (np.asarray(st) == 2)))
        seq = []
        for _ in range(5):
            t0 = time.perf_counter()
            c1, st = chain_fn(c1, snap, jnp.zeros(4))
            jax.block_until_ready(st)
            seq.append((time.perf_counter() - t0) / chain)
        p50 = float(np.median(seq) * 1e3)
        print(f"joint-limits n_box=120 pallas={mode}: "
              f"p50={p50:.3f} ms/solve (deadline 5 ms), "
              f"solved_frac={solved:.3f}, "
              f"device={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
