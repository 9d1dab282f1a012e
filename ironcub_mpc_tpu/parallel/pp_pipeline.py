"""Pipeline parallelism: the four condensed-tick stages spread over a
``"pipe"`` mesh axis, with scenario micro-batches streaming through.

The SURVEY §2.6 PP axis. The condensed MPC tick factors into four stages
with a natural producer/consumer chain:

    S0 prep        — reference shift, linearisation, initial state
    S1 condense    — per-tick gradients + exact state elimination
    S2 solve       — warm-started box-QP ADMM (the FLOP-heavy stage)
    S3 extract     — solution slicing + command integration

Each pipe device owns one stage. Scenario micro-batches enter at S0; every
step each device applies its stage to its resident payload and passes the
result to the next device with ``lax.ppermute`` over ICI (GPipe-style
schedule, ``n_micro + 3`` steps, no weight state so no flush hazards). The
payload is the union of all stage products (fixed shapes, zero-filled until
produced) so the ring carries one homogeneous pytree.

Per-solve this is demonstration-scale — one chip fits thousands of these
QPs — but the schedule, the stage split and the collective pattern are the
real thing, and they compose with the ``"scenario"`` data-parallel axis on
an orthogonal mesh dimension (each pipe stage vmaps over its micro-batch).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import MPCConfig
from ..core.types import MPCCarry, MPCOutput, RobotSnapshot
from ..ops import admm
from ..qp import condensed
from ..qp import mpc as vs_mpc

N_STAGES = 4


class _Payload(NamedTuple):
    """Union of every stage's products (fixed shapes; zeros until set)."""

    carry: MPCCarry
    snap: RobotSnapshot
    est: jnp.ndarray
    # S0 products
    state_ref: jnp.ndarray
    lin: vs_mpc.LinearizedDynamics
    x0: jnp.ndarray
    pin: jnp.ndarray
    # S1 products
    qp: condensed.CondensedQP
    # S2 products
    csol: condensed.CondensedSolution
    # S3 products
    out: MPCOutput


def _zero_payload(cfg: MPCConfig, carry, snap, est, dtype=jnp.float32):
    ns, ni = cfg.n_states, cfg.n_iter
    nU = condensed.n_inputs(cfg)
    nb = condensed.n_box(cfg)
    z = lambda *shape: jnp.zeros(shape, dtype)
    lin = vs_mpc.LinearizedDynamics(
        Ac=z(ns, ns), BJ=z(ns, cfg.n_ctrl_joints), BT=z(ns, cfg.n_jets),
        c=z(ns))
    qp = condensed.CondensedQP(H=z(nU, nU), q=z(nU), lb=z(nb), ub=z(nb),
                               F=z(ni, ns, nU), f=z(ni, ns))
    csol = condensed.CondensedSolution(
        u=z(nU), y=z(nb), states=z(ni, ns),
        status=jnp.zeros((), jnp.int32), pri_res=z(), dua_res=z(),
        kinv=z(nU, nU), rho_vec=z(nb), rho_scalar=z())
    J = snap.joint_pos.shape[-1]
    if cfg.enable_debug_log_mode:
        from ..core.types import DebugInfo

        m = cfg.n_constraints
        debug = DebugInfo(total_cost=z(), block_costs=z(4),
                          constraint_lb=z(m), constraint_ax=z(m),
                          constraint_ub=z(m))
    else:
        debug = None
    out = MPCOutput(
        joints_pos_ref=z(J), throttle=z(4), thrust_des=z(4),
        thrust_dot_des=z(4), final_state=z(ns),
        status=jnp.zeros((), jnp.int32), pri_res=z(), dua_res=z(),
        alpha_gravity=z(), pos_com_ref=z(3), rpy_ref=z(3), mom_ref=z(6),
        debug=debug)
    return _Payload(carry=carry, snap=snap, est=est, state_ref=z(ns, ni),
                    lin=lin, x0=z(ns), pin=jnp.zeros((), bool), qp=qp,
                    csol=csol, out=out)


def _stages(cfg: MPCConfig, sched, joint_sel, settings, problem):
    def s0_prep(p: _Payload) -> _Payload:
        carry, prep = vs_mpc._tick_prep(cfg, joint_sel, problem, p.carry,
                                        p.snap, p.est)
        return p._replace(carry=carry, state_ref=prep.state_ref,
                          lin=prep.lin, x0=prep.x0,
                          pin=jnp.asarray(prep.pin, bool))

    def s1_condense(p: _Payload) -> _Payload:
        prep = vs_mpc.TickPrep(state_ref=p.state_ref, lin=p.lin, x0=p.x0,
                               pin=p.pin)
        qp, _, _, _ = vs_mpc.condense_from_prep(cfg, sched, joint_sel,
                                                problem, p.carry, prep)
        return p._replace(qp=qp)

    def s2_solve(p: _Payload) -> _Payload:
        csol = vs_mpc.solve_condensed(cfg, settings, problem, p.carry, p.qp)
        if csol.kinv is None:  # keep payload shapes fixed
            csol = csol._replace(kinv=p.csol.kinv, rho_vec=p.csol.rho_vec,
                                 rho_scalar=p.csol.rho_scalar)
        return p._replace(csol=csol)

    def s3_extract(p: _Payload) -> _Payload:
        csol = p.csol
        if not settings.kinv_carry:
            csol = csol._replace(kinv=None, rho_vec=None, rho_scalar=None)
        prep = vs_mpc.TickPrep(state_ref=p.state_ref, lin=p.lin, x0=p.x0,
                               pin=p.pin)
        carry, out = vs_mpc.extract_condensed(
            cfg, joint_sel, p.carry, csol, settings, problem=problem,
            sched=sched, prep=prep, qp=p.qp)
        return p._replace(carry=carry, out=out)

    return [s0_prep, s1_condense, s2_solve, s3_extract]


def pipeline_tick(cfg: MPCConfig, sched, joint_sel,
                  settings: admm.ADMMSettings, problem,
                  carries, snaps, est, mesh: Mesh, axis: str = "pipe"):
    """One MPC tick for a batch of scenarios, pipelined over ``axis``.

    ``carries``/``snaps``/``est`` are batched pytrees with leading dim
    B = n_micro × micro; the batch is cut into ``n_micro`` micro-batches
    that stream through the four stages. Requires ``mesh.shape[axis] ==
    N_STAGES``. Returns (carries', outputs) with the same leading dim.
    """
    assert mesh.shape[axis] == N_STAGES, mesh.shape
    B = est.shape[0]
    stages = _stages(cfg, sched, joint_sel, settings, problem)

    def vstage(i):
        return jax.vmap(stages[i])

    n_micro = N_STAGES  # one resident micro-batch per device
    assert B % n_micro == 0, (B, n_micro)
    micro = B // n_micro

    def to_micro(t):
        return jax.tree.map(
            lambda a: a.reshape(n_micro, micro, *a.shape[1:]), t)

    carries_m = to_micro(carries)
    snaps_m = to_micro(snaps)
    est_m = to_micro(est)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P()), out_specs=P(axis),
             check_vma=False)
    def run(carries_m, snaps_m, est_m):
        stage_id = jax.lax.axis_index(axis)

        c0 = jax.tree.map(lambda a: a[0], carries_m)
        s0 = jax.tree.map(lambda a: a[0], snaps_m)
        payload = jax.vmap(
            lambda c, s, e: _zero_payload(cfg, c, s, e))(
                c0, s0, est_m[0])

        results = payload  # accumulator shell, filled by the last stage

        def step(t, state):
            # t is a Python int (static schedule)
            payload, results = state
            if t < n_micro:
                # inject micro-batch t at stage 0
                fresh = jax.vmap(
                    lambda c, s, e: _zero_payload(cfg, c, s, e))(
                        jax.tree.map(lambda a: a[t], carries_m),
                        jax.tree.map(lambda a: a[t], snaps_m),
                        est_m[t])
                take_fresh = stage_id == 0
                payload = jax.tree.map(
                    lambda f, p: jnp.where(
                        jnp.reshape(take_fresh, (1,) * f.ndim), f, p),
                    fresh, payload)
            # apply this device's stage
            payload = jax.lax.switch(stage_id, [vstage(i) for i in
                                                range(N_STAGES)], payload)
            if t >= N_STAGES - 1:
                # the last stage finishes micro-batch t-(S-1) at step t
                done = stage_id == N_STAGES - 1
                results = jax.tree.map(
                    lambda r, p: jnp.where(
                        jnp.reshape(done, (1,) * r.ndim), p, r),
                    results, payload)
            # rotate payloads one stage forward
            perm = [(i, (i + 1) % N_STAGES) for i in range(N_STAGES)]
            payload = jax.tree.map(
                lambda a: jax.lax.ppermute(a, axis, perm), payload)
            return payload, results

        outs_c = []
        outs_o = []
        state = (payload, results)
        for t in range(n_micro + N_STAGES - 1):
            state = step(t, state)
            payload, results = state
            if t >= N_STAGES - 1:
                outs_c.append(results.carry)
                outs_o.append(results.out)
        carries_out = jax.tree.map(lambda *xs: jnp.stack(xs), *outs_c)
        outs_out = jax.tree.map(lambda *xs: jnp.stack(xs), *outs_o)
        return carries_out, outs_out

    carries_out, outs_out = run(carries_m, snaps_m, est_m)
    # out_specs=P(axis) stacks per-device copies along the leading axis:
    # [S * n_micro, micro, ...]; only the LAST stage's slab holds results
    def collect(t):
        return jax.tree.map(
            lambda a: a.reshape(N_STAGES, n_micro, micro, *a.shape[2:])[-1]
                       .reshape(B, *a.shape[2:]), t)

    return collect(carries_out), collect(outs_out)
