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
payload is the union of the stage products (fixed shapes, zero-filled until
produced) so the ring carries one homogeneous pytree.

The ring is SLIMMED to what actually crosses an edge (default, debug off):

- the measured robot state (``snap``/``est``) never rides the ring — it is
  only consumed at S0, where the static GPipe schedule knows which
  micro-batch is being injected, so S0 reads it from the replicated input;
- the state-from-input map ``F``/``f`` is sliced to knots (0, −1) after
  condensing — the solve's ``states`` output is only ever read at those
  two knots (thrust/thrust-rate extraction and the final state,
  variableSamplingMPC.cpp:93-108), while the H/q fold that needs all 17
  knots happens inside S1 before the send;
- the refreshed carried K⁻¹/ρ are folded into the carry AT S2, so the
  solution pytree in the ring carries no second [nU, nU] matrix.

Per lane this is ~150 KB/step vs ~400 KB for the naive
union-of-everything payload (F alone is 212 KB of it); with
``enable_debug_log_mode`` the full shapes are kept because the debug
channels genuinely need every knot.

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
    """Union of the stage products that must cross an edge (fixed shapes;
    zeros until set)."""

    carry: MPCCarry
    # S0 products
    state_ref: jnp.ndarray
    lin: vs_mpc.LinearizedDynamics
    x0: jnp.ndarray
    pin: jnp.ndarray
    # S1 products (F/f sliced to knots (0, -1) unless debug needs them all)
    qp: condensed.CondensedQP
    # S2 products (kinv/rho folded into carry at S2, so csol carries none)
    csol: condensed.CondensedSolution
    # S3 products
    out: MPCOutput


def _zero_payload(cfg: MPCConfig, carry, n_joints: int, dtype=jnp.float32):
    ns, ni = cfg.n_states, cfg.n_iter
    slim = not cfg.enable_debug_log_mode
    nk = 2 if slim else ni
    nU = condensed.n_inputs(cfg)
    nb = condensed.n_box(cfg)
    z = lambda *shape: jnp.zeros(shape, dtype)
    lin = vs_mpc.LinearizedDynamics(
        Ac=z(ns, ns), BJ=z(ns, cfg.n_ctrl_joints), BT=z(ns, cfg.n_jets),
        c=z(ns))
    qp = condensed.CondensedQP(H=z(nU, nU), q=z(nU), lb=z(nb), ub=z(nb),
                               F=z(nk, ns, nU), f=z(nk, ns))
    csol = condensed.CondensedSolution(
        u=z(nU), y=z(nb), states=z(nk, ns),
        status=jnp.zeros((), jnp.int32), pri_res=z(), dua_res=z(),
        kinv=None if slim else z(nU, nU),
        rho_vec=None if slim else z(nb),
        rho_scalar=None if slim else z(),
        guard_fired=jnp.zeros((), bool))
    if cfg.enable_debug_log_mode:
        from ..core.types import DebugInfo

        m = cfg.n_constraints
        debug = DebugInfo(total_cost=z(), block_costs=z(4),
                          constraint_lb=z(m), constraint_ax=z(m),
                          constraint_ub=z(m))
    else:
        debug = None
    out = MPCOutput(
        joints_pos_ref=z(n_joints), throttle=z(4), thrust_des=z(4),
        thrust_dot_des=z(4), final_state=z(ns),
        status=jnp.zeros((), jnp.int32), pri_res=z(), dua_res=z(),
        alpha_gravity=z(), pos_com_ref=z(3), rpy_ref=z(3), mom_ref=z(6),
        guard_fired=jnp.zeros((), bool), debug=debug)
    return _Payload(carry=carry, state_ref=z(ns, ni),
                    lin=lin, x0=z(ns), pin=jnp.zeros((), bool), qp=qp,
                    csol=csol, out=out)


def _stages(cfg: MPCConfig, sched, joint_sel, settings, problem):
    slim = not cfg.enable_debug_log_mode

    def s0_prep(p: _Payload, snap: RobotSnapshot, est) -> _Payload:
        carry, prep = vs_mpc._tick_prep(cfg, joint_sel, problem, p.carry,
                                        snap, est)
        return p._replace(carry=carry, state_ref=prep.state_ref,
                          lin=prep.lin, x0=prep.x0,
                          pin=jnp.asarray(prep.pin, bool))

    def s1_condense(p: _Payload, snap, est) -> _Payload:
        prep = vs_mpc.TickPrep(state_ref=p.state_ref, lin=p.lin, x0=p.x0,
                               pin=p.pin)
        qp, _, _, _ = vs_mpc.condense_from_prep(cfg, sched, joint_sel,
                                                problem, p.carry, prep)
        if slim:
            # the solve only reads states at knots (0, -1); the H/q fold
            # consumed the full F above — don't ship 17 knots over ICI
            keep = jnp.asarray([0, cfg.n_iter - 1])
            qp = qp._replace(F=qp.F[keep], f=qp.f[keep])
        return p._replace(qp=qp)

    def s2_solve(p: _Payload, snap, est) -> _Payload:
        csol = vs_mpc.solve_condensed(cfg, settings, problem, p.carry, p.qp)
        carry = p.carry
        if settings.kinv_carry and csol.kinv is not None:
            # fold the refreshed solver state into the carry HERE so the
            # ring does not ship a second [nU, nU] matrix to S3
            carry = carry._replace(kinv=csol.kinv, rho_vec=csol.rho_vec,
                                   rho_scalar=csol.rho_scalar)
        if slim:
            csol = csol._replace(kinv=None, rho_vec=None, rho_scalar=None)
        return p._replace(carry=carry, csol=csol)

    def s3_extract(p: _Payload, snap, est) -> _Payload:
        # kinv was folded into the carry at S2: hand extract a csol whose
        # solver-state fields mirror the carry so its own fold is a no-op
        csol = p.csol
        if settings.kinv_carry and csol.kinv is None:
            csol = csol._replace(kinv=p.carry.kinv,
                                 rho_vec=p.carry.rho_vec,
                                 rho_scalar=p.carry.rho_scalar)
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
    n_joints = snaps.joint_pos.shape[-1]

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
        payload = jax.vmap(lambda c: _zero_payload(cfg, c, n_joints))(c0)

        results = payload  # accumulator shell, filled by the last stage

        def step(t, state):
            # t is a Python int (static schedule)
            payload, results = state
            if t < n_micro:
                # inject micro-batch t at stage 0
                fresh = jax.vmap(lambda c: _zero_payload(cfg, c, n_joints))(
                    jax.tree.map(lambda a: a[t], carries_m))
                take_fresh = stage_id == 0
                payload = jax.tree.map(
                    lambda f, p: jnp.where(
                        jnp.reshape(take_fresh, (1,) * f.ndim), f, p),
                    fresh, payload)
            # the measured state never rides the ring: the static schedule
            # says stage 0 is working micro-batch t, so it reads
            # snaps_m[t]/est_m[t] straight from the replicated inputs
            # (later stages receive the same operands and ignore them)
            ti = min(t, n_micro - 1)
            snap_t = jax.tree.map(lambda a: a[ti], snaps_m)
            est_t = est_m[ti]
            payload = jax.lax.switch(
                stage_id, [vstage(i) for i in range(N_STAGES)],
                payload, snap_t, est_t)
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
