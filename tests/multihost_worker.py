"""Worker for tests/test_multihost.py: one of N coordinated JAX processes.

Initializes jax.distributed against a localhost coordinator, builds a global
2-axis mesh spanning both processes' CPU devices, and runs
(a) a sharded psum reduction (the Monte-Carlo statistics pattern) and
(b) a row-sharded tensor-parallel ADMM solve (parallel/tp_admm) whose
constraint shards live on different *processes*, so its psum/pmax
collectives cross the process boundary (the DCN path of SURVEY §2.6).
Prints machine-readable RESULT lines that the test asserts on.
"""

import os
import sys

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=NPROC, process_id=PID)

import jax.numpy as jnp
from functools import partial
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.parallel.tp_admm import solve_tp

assert jax.process_count() == NPROC
assert jax.local_device_count() == 4
n_dev = jax.device_count()

mesh = Mesh(np.array(jax.devices()).reshape(n_dev // 2, 2),
            ("scenario", "kkt"))


def replicated(x):
    x = np.asarray(x, np.float32)
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, P()), lambda idx: x[idx])


# --- (a) cross-process psum: Σ i² over a scenario-sharded global array ----
vals = np.arange(n_dev // 2, dtype=np.float32)
x = jax.make_array_from_callback(
    (n_dev // 2,), NamedSharding(mesh, P("scenario")),
    lambda idx: vals[idx])


@partial(shard_map, mesh=mesh, in_specs=(P("scenario"),), out_specs=P(),
         check_vma=False)
def sum_sq(xs):
    return jax.lax.psum(jnp.sum(xs * xs), "scenario")


got = float(np.asarray(sum_sq(x))[()] if np.asarray(sum_sq(x)).ndim else
            np.asarray(sum_sq(x)))
want = float(np.sum(vals ** 2))
print(f"RESULT psum {got:.6f} {want:.6f}", flush=True)

# --- (b) tensor-parallel QP solve with rows sharded across processes ------
rng = np.random.default_rng(0)
n, m = 24, 16
M = rng.normal(size=(n, n))
P_mat = (M @ M.T + np.eye(n)).astype(np.float32)
q = rng.normal(size=n).astype(np.float32)
A = rng.normal(size=(m, n)).astype(np.float32)
l = -np.ones(m, np.float32)
u = np.ones(m, np.float32)

settings = admm.ADMMSettings(max_iter=100, polish=False)
A_g = jax.make_array_from_callback(
    A.shape, NamedSharding(mesh, P("kkt")), lambda idx: A[idx])
l_g = jax.make_array_from_callback(
    l.shape, NamedSharding(mesh, P("kkt")), lambda idx: l[idx])
u_g = jax.make_array_from_callback(
    u.shape, NamedSharding(mesh, P("kkt")), lambda idx: u[idx])
sol = solve_tp(replicated(P_mat), replicated(q), A_g, l_g, u_g, mesh,
               settings)

# single-process float reference
ref = admm.solve(jnp.asarray(P_mat), jnp.asarray(q), jnp.asarray(A),
                 jnp.asarray(l), jnp.asarray(u),
                 admm.ADMMSettings(max_iter=400, polish=False))
# sol.x is replicated (out_specs P()) — read the local copy
x_tp = np.asarray(jax.device_get(sol.x.addressable_shards[0].data))
err = float(np.abs(x_tp - np.asarray(ref.x)).max())
print(f"RESULT tp_solve status={int(np.asarray(sol.status))} xerr={err:.6f}",
      flush=True)
print("WORKER_DONE", flush=True)
