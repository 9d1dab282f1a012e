#!/usr/bin/env python
"""Head-to-head of the batched ADMM-segment implementations on the chip.

The segment (x ← K⁻¹rhs + clip/dual updates, ~40 iterations) dominates the
batched solve. Three candidates at the flagship shape (nU=120 → P=128,
batch 512, 40 iterations):

1. `xla-scan`  — pure-JAX lax.scan of batched GEMMs (the current
   throughput winner: re-reads K⁻¹ [B,128,128] from HBM every iteration).
2. `pallas-single` — vmapped single-scenario kernel (the latency path:
   one grid step per scenario, K⁻¹ resident in VMEM).
3. `pallas-group8` — grouped kernel, 8 scenarios per grid step with all
   eight K⁻¹s resident (ops/pallas_solve.admm_segment_grouped).

Usage: python tools/bench_segment_kernels.py [batch=512] [iters=40]
Prints per-variant wall time and solves/s-equivalent; answers VERDICT r2
item 3b (can a batched segment kernel match XLA throughput?).
"""

import sys
import time
from functools import partial
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
    from ironcub_mpc_tpu.ops import pallas_solve as ps

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 512
    LEN = int(args[1]) if len(args) > 1 else 40
    nU, P = 120, 128
    box0 = 96  # stock throttle box: n_box = 24
    sigma, alpha_r = 1e-6, 1.6

    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, nU, nU)).astype(np.float32)
    K = A @ A.transpose(0, 2, 1) / nU + 2.0 * np.eye(nU, dtype=np.float32)
    Kinv = np.linalg.inv(K).astype(np.float32)
    q = rng.standard_normal((B, nU)).astype(np.float32)
    lb = np.full((B, nU), -1e20, np.float32)
    ub = np.full((B, nU), 1e20, np.float32)
    lb[:, box0:], ub[:, box0:] = -1.0, 1.0
    rho = np.zeros((B, nU), np.float32)
    rho[:, box0:] = 0.5
    rhoi = np.where(rho > 0, 1.0 / np.maximum(rho, 1e-30), 0.0).astype(
        np.float32)
    zero = np.zeros((B, nU), np.float32)

    pad_m = lambda M: jnp.pad(jnp.asarray(M), ((0, 0), (0, P - nU),
                                               (0, P - nU)))
    pad_v = lambda v: jnp.pad(jnp.asarray(v), ((0, 0), (0, P - nU)))
    Kp, qp_, lbp, ubp = pad_m(Kinv), pad_v(q), pad_v(lb), pad_v(ub)
    rhop, rhoip, z0 = pad_v(rho), pad_v(rhoi), pad_v(zero)

    def xla_scan(Kinv, q, lb, ub, rho, rhoi, x, z, y):
        def body(carry, _):
            x, z, y = carry
            rhs = sigma * x - q + rho * z - y
            x_t = jnp.einsum("bp,bpq->bq", rhs, Kinv,
                             precision=jax.lax.Precision.HIGHEST)
            x_n = alpha_r * x_t + (1 - alpha_r) * x
            z_rel = alpha_r * x_t + (1 - alpha_r) * z
            z_un = z_rel + y * rhoi
            z_n = jnp.clip(z_un, lb, ub)
            y_n = rho * (z_un - z_n)
            return (x_n, z_n, y_n), None
        (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=LEN)
        return x, z, y

    def pallas_single(Kinv, q, lb, ub, rho, rhoi, x, z, y):
        f = partial(ps.admm_segment, sigma=sigma, alpha=alpha_r, length=LEN)
        at = lambda v: v[:, None, :]
        x, z, y = jax.vmap(f)(Kinv, at(q), at(lb), at(ub), at(rho),
                              at(rhoi), at(x), at(z), at(y))
        return x[:, 0], z[:, 0], y[:, 0]

    def pallas_group(Kinv, q, lb, ub, rho, rhoi, x, z, y):
        return ps.admm_segment_grouped(Kinv, q, lb, ub, rho, rhoi, x, z, y,
                                       sigma=sigma, alpha=alpha_r,
                                       length=LEN, group=8)

    variants = [("xla-scan", xla_scan), ("pallas-single", pallas_single),
                ("pallas-group8", pallas_group)]
    results = {}
    ref = None
    for name, fn in variants:
        jf = jax.jit(fn)
        out = jf(Kp, qp_, lbp, ubp, rhop, rhoip, z0, z0, z0)
        jax.block_until_ready(out)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jf(Kp, qp_, lbp, ubp, rhop, rhoip, z0, z0, z0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        results[name] = dt
        x = np.asarray(out[0])[:, :nU]
        if ref is None:
            ref = x
        else:
            err = np.abs(x - ref).max()
            assert err < 2e-3, (name, err)
        print(f"{name:>14}: {1e3 * dt:7.3f} ms/segment-batch "
              f"({B / dt:9.0f} segments/s)  device="
              f"{jax.devices()[0].platform}")
    best_pl = min(results["pallas-single"], results["pallas-group8"])
    print(f"# pallas/xla ratio: {best_pl / results['xla-scan']:.2f}x "
          f"(>1 means XLA scan still wins throughput)")


if __name__ == "__main__":
    main()
