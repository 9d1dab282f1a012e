"""Mosaic-lowering regression test: the Pallas kernels must COMPILE on a
real TPU backend, not just pass in interpret mode.

Round-1 shipped a kernel using ``dynamic_update_slice`` (no Mosaic lowering)
that every interpret-mode test passed — and every real-TPU solve crashed.
This test runs the kernels with ``interpret=False`` on the TPU backend in a
subprocess (conftest pins this process to CPU) and is skipped when no TPU is
attached, so lowering failures can never ship silently again.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    print("NO_TPU")
    sys.exit(0)

# remote Mosaic compiles through the tunnel can be slow; cache them so
# repeat runs are instant
jax.config.update("jax_compilation_cache_dir", "@ROOT@/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "@ROOT@")
from ironcub_mpc_tpu.ops import pallas_solve as ps

P, nU, n_box = 128, 120, 24
box0 = nU - n_box
rng = np.random.default_rng(0)
A = rng.standard_normal((nU, nU)).astype(np.float32)
K = A @ A.T / nU + nU * np.eye(nU, dtype=np.float32)
sigma = 0.1
rho_old = np.zeros(nU, np.float32); rho_old[box0:] = 0.5
rho_new = np.zeros(nU, np.float32); rho_new[box0:] = 1.7
H = K - sigma * np.eye(nU, dtype=np.float32) - np.diag(rho_old)
Kinv = np.linalg.inv(K).astype(np.float32)

pad_m = lambda M: jnp.pad(jnp.asarray(M), ((0, P - nU), (0, P - nU)))
pad_c = lambda v: jnp.pad(jnp.asarray(v), (0, P - nU))[:, None]
pad_r = lambda v: jnp.pad(jnp.asarray(v, jnp.float32), (0, P - nU))[None, :]

out = ps.woodbury_ns(pad_m(Kinv), pad_m(H), pad_c(rho_new - rho_old),
                     pad_c(rho_new), box0=box0, n_box=n_box, sigma=sigma,
                     n_ns=2)
Kt = H + sigma * np.eye(nU, dtype=np.float32) + np.diag(rho_new)
resid = np.abs(np.asarray(out)[:nU, :nU] @ Kt - np.eye(nU)).max()
assert resid < 1e-3, f"woodbury inverse residual {resid}"

q = rng.standard_normal(nU).astype(np.float32)
lb = np.full(nU, -1e20, np.float32); ub = np.full(nU, 1e20, np.float32)
lb[box0:] = -1.0; ub[box0:] = 1.0
rhoi = np.where(rho_new > 0, 1.0 / np.maximum(rho_new, 1e-30), 0.0)
zero = np.zeros(nU, np.float32)
x, z, y = ps.admm_segment(pad_m(Kinv), pad_r(q), pad_r(lb), pad_r(ub),
                          pad_r(rho_new), pad_r(rhoi.astype(np.float32)),
                          pad_r(zero), pad_r(zero), pad_r(zero),
                          sigma=sigma, alpha=1.6, length=30)
x = np.asarray(x)[0, :nU]
assert np.isfinite(x).all(), "segment produced non-finite iterates"

# wide-box woodbury (joint-limits config: n_box=120, box0=0 — the GJ
# buffer spans two lane tiles); must lower, not only interpret
n_box_w = nU
rho_ow = np.full(nU, 0.5, np.float32)
rho_nw = np.full(nU, 1.7, np.float32)
Kw = A @ A.T / nU + nU * np.eye(nU, dtype=np.float32)
Hw = Kw - sigma * np.eye(nU, dtype=np.float32) - np.diag(rho_ow)
Kinvw = np.linalg.inv(Kw).astype(np.float32)
outw = ps.woodbury_ns(pad_m(Kinvw), pad_m(Hw), pad_c(rho_nw - rho_ow),
                      pad_c(rho_nw), box0=0, n_box=n_box_w, sigma=sigma,
                      n_ns=2)
Ktw = Hw + sigma * np.eye(nU, dtype=np.float32) + np.diag(rho_nw)
residw = np.abs(np.asarray(outw)[:nU, :nU] @ Ktw - np.eye(nU)).max()
assert residw < 1e-3, f"wide-box woodbury inverse residual {residw}"
# x should approach the box-QP solution: check the unconstrained KKT
# residual projected on the free head is small-ish after 30 iterations
print("OK", float(resid), float(np.abs(x).max()))
"""


@pytest.mark.slow
def test_kernels_lower_on_tpu():
    env = dict(os.environ)
    # undo the CPU pinning the test harness applies
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _SCRIPT.replace("@ROOT@", str(ROOT))],
            capture_output=True, text=True, timeout=1200, env=env,
            cwd=str(ROOT))
    except subprocess.TimeoutExpired:
        # A Mosaic LOWERING failure (what this test guards against) errors
        # out in seconds; a hang past 20 min means the tunnel's remote
        # compile service is unresponsive (observed: the same kernels
        # compiled in ~27 s earlier the same day). Skip rather than
        # misreport an environment outage as a lowering regression — but
        # LOUDLY: a skipped gate means the TPU-lowering guarantee was NOT
        # checked this run (skip policy documented in README).
        print("\n" + "!" * 72 + "\n!! PALLAS TPU LOWERING GATE SKIPPED: "
              "remote Mosaic compile service\n!! unresponsive (>20 min). "
              "Lowering was NOT verified this run.\n" + "!" * 72 + "\n",
              file=sys.stderr, flush=True)
        pytest.skip("LOWERING GATE NOT EVALUATED: remote Mosaic compile "
                    "service unresponsive (>20 min)")
    out = proc.stdout.strip().splitlines()
    if proc.returncode == 0 and out and out[-1] == "NO_TPU":
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, (
        f"TPU kernel lowering failed:\n{proc.stdout}\n{proc.stderr[-4000:]}")
    assert out and out[-1].startswith("OK")
