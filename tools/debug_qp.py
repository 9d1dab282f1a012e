"""Scratch: inspect the hover QP conditioning and ADMM convergence."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, joint_selector
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.qp import mpc as mpc_mod
from helpers import make_hover_snapshot, make_test_trajectories

CFG = MPCConfig(); SCHED = build_schedule(CFG); SEL = joint_selector(RobotConfig(), CFG)
S = admm.ADMMSettings(max_iter=int(sys.argv[1]) if len(sys.argv) > 1 else 400)

snap = make_hover_snapshot()
channels, alpha = make_test_trajectories()
problem, carry = mpc_mod.configure(CFG, SCHED, SEL, snap, channels, alpha, S)

g, A, lb, ub, carry2, lin = mpc_mod._assemble(CFG, SCHED, SEL, problem, carry, snap, jnp.zeros(4))
print("g range", float(jnp.min(g)), float(jnp.max(g)))
print("A absmax", float(jnp.max(jnp.abs(A))), "rows nonzero", int(jnp.sum(jnp.any(A != 0, axis=1))))
print("lb/ub range", float(jnp.min(lb)), float(jnp.max(ub)))
print("Ac absmax", float(jnp.max(jnp.abs(lin.Ac))), "c absmax", float(jnp.max(jnp.abs(lin.c))))

for dt in (jnp.float32, jnp.float64):
    H = problem.H.astype(dt)
    sol = admm.solve(H, g.astype(dt), A.astype(dt), lb.astype(dt), ub.astype(dt), S)
    print(dt.__name__, "status", int(sol.status), "pri", float(sol.pri_res), "dua", float(sol.dua_res))
    sol2 = admm.solve(H, g.astype(dt), A.astype(dt), lb.astype(dt), ub.astype(dt),
                      admm.ADMMSettings(max_iter=S.max_iter, polish=False))
    print(dt.__name__, "nopolish status", int(sol2.status), "pri", float(sol2.pri_res), "dua", float(sol2.dua_res))
    x = sol.x
    print("  thrust knot1:", np.asarray(x[26+12:26+16]))

# reused-scaling path (as mpc_tick)
S2 = admm.ADMMSettings(max_iter=150, polish=True)
data = admm.prepare(problem.H, g, A, lb, ub, S2, scaling=problem.scaling)
sol = admm.solve_prepared(data, S2, x0=carry.warm_x, y0=carry.warm_y)
print("reused scaling: status", int(sol.status), "pri", float(sol.pri_res), "dua", float(sol.dua_res))
d1 = admm.prepare(problem.H, g, A, lb, ub, S2)
print("fresh scale d range", float(jnp.min(d1.scaling.d)), float(jnp.max(d1.scaling.d)), "c", float(d1.scaling.c))
print("saved scale d range", float(jnp.min(problem.scaling.d)), float(jnp.max(problem.scaling.d)), "c", float(problem.scaling.c))
print("fresh e range", float(jnp.min(d1.scaling.e)), float(jnp.max(d1.scaling.e)))
print("saved e range", float(jnp.min(problem.scaling.e)), float(jnp.max(problem.scaling.e)))
sol1 = admm.solve_prepared(d1, S2, x0=carry.warm_x, y0=carry.warm_y)
print("fresh scaling warm: status", int(sol1.status), "pri", float(sol1.pri_res), "dua", float(sol1.dua_res))
