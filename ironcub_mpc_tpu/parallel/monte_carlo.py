"""Mesh-sharded Monte-Carlo robustness sweeps (BASELINE configs 4-5).

Thousands of perturbed closed-loop rollouts — wind gusts, thrust-model
mismatch, initial-state noise, sensor noise seeds — run as one `vmap` over
the scenario axis, sharded across the device mesh with `shard_map`; aggregate
statistics (success rates, tracking-error moments, worst case) are reduced
with ``psum``/``pmax`` over ICI, so only scalars leave the device.

Failure handling (SURVEY §5): per-scenario solver-status vectors and NaN
guards classify diverged rollouts; they are masked out of the statistics and
reported, never allowed to poison the reduction.

Performance note: sweeps are batched, so construct the ``ClosedLoop`` with
``ADMMSettings(pallas_mode="off")`` — the batched-GEMM solver path wins
throughput at large batch (42.1k vs 24.5k solves/s at 512 on v5e); the
fused Pallas kernels are the batch-1 latency path. Keep the carried-inverse
recovery guard by setting ``guard_axis=admm.BATCH_GUARD_AXIS`` (the sweep
vmaps with that axis name): the guard's recovery branch then triggers per
*tick with any bad lane* instead of lowering to both-branches per lane —
measured 40.3k vs 42.1k solves/s at batch 512 on v5e, -4.4% for full
recovery coverage (see ``ADMMSettings.guard_axis``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import admm
from ..runtime.loop import ClosedLoop, LoopCarry


@dataclasses.dataclass(frozen=True)
class ScenarioConfig:
    """Perturbation magnitudes for a robustness sweep."""

    wind_force_std: float = 10.0       # N, constant gust per scenario
    thrust_scale_std: float = 0.05     # multiplicative turbine mismatch
    base_vel_std: float = 0.05         # m/s initial base-velocity noise
    joint_pos_std: float = 0.01        # rad initial posture noise
    com_err_fail: float = 0.5          # m: tracking error declaring failure
    # model-mismatch axis (sim-to-real margin): the plant flies perturbed
    # inertial parameters / jet placements while the controller keeps the
    # nominal model. 0 = controller model == plant model (the reference's
    # only regime).
    mass_scale_std: float = 0.0        # per-link mass+inertia rel. error
    jet_pos_std_m: float = 0.0         # m, per-jet placement error (link frame)


class SweepResult(NamedTuple):
    n_scenarios: jnp.ndarray
    n_failed: jnp.ndarray          # diverged (NaN) or failure-threshold hit
    n_solver_bad: jnp.ndarray      # any non-solved tick (post-recovery)
    mean_com_err: jnp.ndarray      # mean over healthy scenarios [m]
    max_com_err: jnp.ndarray       # worst healthy scenario [m]
    solved_frac: jnp.ndarray       # fraction of (scenario, tick) solved
    # --- failure forensics (SURVEY §5; VERDICT r4 weak 4) ----------------
    # per-status tick counts aggregated over all (scenario, tick) pairs,
    # POST-recovery when recovery is on: [solved, solved_inaccurate,
    # primal_infeasible, dual_infeasible, max_iter, guard_fired]
    status_counts: jnp.ndarray = None      # [6] int32
    n_ticks_recovered: jnp.ndarray = None  # bad ticks fixed by the retry
    n_ticks_retried: jnp.ndarray = None    # bad ticks that got a retry
    # per-lane forensics (host-side arrays, [n]): worst tracking error and
    # whether any tick stayed non-solved — feeds scenario resampling
    lane_max_err: jnp.ndarray = None
    lane_solver_bad: jnp.ndarray = None


# status_counts column order
STATUS_COLS = ("solved", "solved_inaccurate", "primal_infeasible",
               "dual_infeasible", "max_iter", "guard_fired")


def make_batched_carry(carry: LoopCarry, n: int, scen: ScenarioConfig,
                       seed: int = 0) -> LoopCarry:
    """Replicate a configured carry across ``n`` scenarios and apply i.i.d.
    perturbations to the plant state."""
    batched = jax.tree.map(lambda a: jnp.stack([a] * n), carry)
    key = jax.random.PRNGKey(seed)
    k_wind, k_scale, k_vel, k_q, k_rng, k_mass, k_jet = jax.random.split(
        key, 7)
    dt_ = carry.plant.base_p.dtype
    n_links = carry.plant.mass_scale.shape[-1]
    plant = batched.plant._replace(
        wind_force=scen.wind_force_std * jax.random.normal(k_wind, (n, 3), dt_),
        thrust_scale=1.0 + scen.thrust_scale_std
        * jax.random.normal(k_scale, (n, 4), dt_),
        base_v=batched.plant.base_v
        + scen.base_vel_std * jax.random.normal(k_vel, (n, 6), dt_),
        q=batched.plant.q
        + scen.joint_pos_std * jax.random.normal(k_q, batched.plant.q.shape, dt_),
        rng=jax.vmap(jax.random.PRNGKey)(
            jax.random.randint(k_rng, (n,), 0, 2**31 - 1)),
        mass_scale=jnp.clip(
            1.0 + scen.mass_scale_std
            * jax.random.normal(k_mass, (n, n_links), dt_), 0.2, 5.0),
        jet_pos_offset=scen.jet_pos_std_m
        * jax.random.normal(k_jet, (n, 4, 3), dt_),
    )
    return batched._replace(plant=plant)


def _sweep_ckpt_save(path, carry, acc, done: int):
    import orbax.checkpoint as ocp

    from pathlib import Path

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(),
                   {"carry": carry, "acc": acc,
                    "done": jnp.asarray(done)}, force=True)


def _sweep_ckpt_restore(path, carry_like, acc_like):
    import orbax.checkpoint as ocp

    from pathlib import Path

    with ocp.PyTreeCheckpointer() as ckptr:
        target = {"carry": carry_like, "acc": acc_like,
                  "done": jnp.asarray(0)}
        out = ckptr.restore(Path(path).absolute(),
                            args=ocp.args.PyTreeRestore(target))
    return out["carry"], out["acc"], int(out["done"])


def recovery_settings(settings: admm.ADMMSettings) -> admm.ADMMSettings:
    """Solver settings for the failure-recovery retry of a bad tick:
    fresh factorisation + ρ reset (``kinv_reset`` ignores the carried
    inverse/ρ for this solve, re-factorises at the setup ρ, and — unlike
    kinv_carry=False — writes the fresh factorisation back into the lane
    carry so a persistently corrupted carry cannot re-trigger the retry
    on every subsequent tick) and an iteration boost with extra
    adaptive-ρ marks — the closest analogue of re-running OSQP setup
    after a failed solve (IMPCProblem.cpp:279-297 detects; the reference
    keeps last commands, this actually retries)."""
    return dataclasses.replace(
        settings, kinv_reset=True, max_iter=max(200, 2 * settings.max_iter),
        rho_update_iters=(25, 75, 150), term_check_every=0)


def run_sweep(loop: ClosedLoop, problem, batched_carry: LoopCarry,
              n_ticks: int, mesh: Mesh,
              scen: ScenarioConfig = ScenarioConfig(),
              chunk_ticks: int | None = None,
              checkpoint_dir: str | None = None,
              recover: bool = False) -> SweepResult:
    """Run every scenario for ``n_ticks`` and reduce statistics on-device.

    The scenario batch is sharded over the mesh's "scenario" axis; each
    device scans its shard locally; the final statistics are ``psum``/``pmax``
    collectives. Works identically on one chip (mesh of 1) and a multi-host
    slice.

    Statistics accumulate IN the scan carry — O(1) memory per lane instead
    of materialising [n_ticks, ...] telemetry (full telemetry at 1024 lanes
    x 2000 ticks is GBs). ``chunk_ticks`` splits the rollout into several
    shorter device programs with the (carry, accumulators) threaded on
    device between them — long-running single programs can trip worker
    watchdogs (observed through the TPU tunnel at 1024 x 2000); chunking
    bounds per-program wall time without changing the result.

    ``checkpoint_dir`` persists (batched carry, accumulators, tick cursor)
    after every chunk (Orbax pytree checkpoint, SURVEY §5 checkpoint/resume
    for long Monte-Carlo sweeps): calling run_sweep again with the same
    directory resumes from the last completed chunk and produces the same
    result as an uninterrupted run (rollouts are deterministic given the
    carry).
    """
    n = batched_carry.plant.base_p.shape[0]
    chunk = int(chunk_ticks) if chunk_ticks else int(n_ticks)
    rec_settings = recovery_settings(loop.settings) if recover else None

    def roll_chunk_one(carry, acc, length):
        def body(state, _):
            carry, (max_err, sum_solved, any_bad, cnt, n_rec, n_ret) = state
            carry0 = carry
            carry, tel = loop.tick(problem, carry)
            if recover:
                # failure recovery (SURVEY §5): re-run the tick for bad
                # lanes with a fresh factorisation + iteration boost — a
                # real branch via the psum-reduced predicate, so good
                # ticks pay one collective and only ticks with an actual
                # bad lane pay the retry (same mechanism as kinv_guard)
                bad = tel.solver_status >= admm.PRIMAL_INFEASIBLE
                n_bad = jax.lax.psum(bad.astype(jnp.int32),
                                     admm.BATCH_GUARD_AXIS)
                carry_r, tel_r = jax.lax.cond(
                    n_bad > 0,
                    lambda c0: loop.tick(problem, c0, rec_settings),
                    lambda c0: (carry, tel), carry0)
                pick = lambda r, o: jnp.where(bad, r, o)
                carry = jax.tree.map(pick, carry_r, carry)
                tel = jax.tree.map(pick, tel_r, tel)
                rec_ok = bad & ((tel_r.solver_status == admm.SOLVED)
                                | (tel_r.solver_status
                                   == admm.SOLVED_INACCURATE))
                n_ret = n_ret + bad.astype(jnp.int32)
                n_rec = n_rec + rec_ok.astype(jnp.int32)
            err = jnp.linalg.norm(tel.com_position
                                  - tel.com_position_desired)
            err = jnp.where(jnp.isfinite(err), err, jnp.inf)
            max_err = jnp.maximum(max_err, err)
            st = tel.solver_status
            sum_solved = sum_solved + (
                (st == admm.SOLVED) | (st == admm.SOLVED_INACCURATE)
            ).astype(jnp.float32)
            any_bad = any_bad | (st >= admm.PRIMAL_INFEASIBLE)
            # per-status histogram (STATUS_COLS order) + guard-fired count
            cnt = cnt + jnp.stack([
                st == admm.SOLVED, st == admm.SOLVED_INACCURATE,
                st == admm.PRIMAL_INFEASIBLE, st == admm.DUAL_INFEASIBLE,
                st == admm.MAX_ITER_REACHED,
                tel.guard_fired]).astype(jnp.int32)
            return (carry, (max_err, sum_solved, any_bad, cnt, n_rec,
                            n_ret)), None

        state, _ = jax.lax.scan(body, (carry, acc), None, length=length)
        return state

    def chunk_fn(length):
        @jax.jit
        @partial(shard_map, mesh=mesh,
                 in_specs=(P("scenario"), P("scenario")),
                 out_specs=(P("scenario"), P("scenario")),
                 check_vma=False)
        def step(shard_carry, acc):
            # axis_name feeds the batch-level kinv_guard
            # (ADMMSettings.guard_axis) and the recovery predicate
            return jax.vmap(
                lambda c, a: roll_chunk_one(c, a, length),
                axis_name=admm.BATCH_GUARD_AXIS)(shard_carry, acc)
        return step

    carry = batched_carry
    acc = (jnp.zeros((n,), jnp.float32),      # max_err
           jnp.zeros((n,), jnp.float32),      # sum_solved
           jnp.zeros((n,), bool),             # any_bad
           jnp.zeros((n, 6), jnp.int32),      # status histogram
           jnp.zeros((n,), jnp.int32),        # n recovered
           jnp.zeros((n,), jnp.int32))        # n retried
    done = 0
    ckpt_path = None
    if checkpoint_dir is not None:
        from pathlib import Path

        ckpt_path = Path(checkpoint_dir) / "sweep_state"
        if ckpt_path.exists():
            carry, acc, done = _sweep_ckpt_restore(ckpt_path, carry, acc)
    step_full = chunk_fn(chunk)
    while done < n_ticks:
        length = min(chunk, n_ticks - done)
        step = step_full if length == chunk else chunk_fn(length)
        carry, acc = step(carry, acc)
        jax.block_until_ready(acc[0])
        done += length
        if ckpt_path is not None:
            _sweep_ckpt_save(ckpt_path, carry, acc, done)
    max_err, sum_solved, any_bad, cnt, n_rec, n_ret = acc

    @partial(shard_map, mesh=mesh, in_specs=(P("scenario"),) * 3,
             out_specs=P(), check_vma=False)
    def reduce_stats(max_err, sum_solved, any_bad):
        failed = (~jnp.isfinite(max_err)) | (max_err > scen.com_err_fail)
        healthy = ~failed
        n_h = jax.lax.psum(jnp.sum(healthy), "scenario")
        sum_err = jax.lax.psum(
            jnp.sum(jnp.where(healthy, max_err, 0.0)), "scenario")
        worst = jax.lax.pmax(
            jnp.max(jnp.where(healthy, max_err, -jnp.inf)), "scenario")
        n_failed = jax.lax.psum(jnp.sum(failed), "scenario")
        n_bad = jax.lax.psum(jnp.sum(any_bad), "scenario")
        solved_frac = jax.lax.pmean(jnp.mean(sum_solved / n_ticks),
                                    "scenario")
        return (n_h, sum_err, worst, n_failed, n_bad, solved_frac)

    n_h, sum_err, worst, n_failed, n_bad, solved_frac = reduce_stats(
        max_err, sum_solved, any_bad)
    return SweepResult(
        n_scenarios=jnp.asarray(n),
        n_failed=n_failed,
        n_solver_bad=n_bad,
        mean_com_err=sum_err / jnp.maximum(n_h, 1),
        max_com_err=worst,
        solved_frac=solved_frac,
        status_counts=jnp.sum(cnt, axis=0),
        n_ticks_recovered=jnp.sum(n_rec),
        n_ticks_retried=jnp.sum(n_ret),
        lane_max_err=max_err,
        lane_solver_bad=any_bad)
