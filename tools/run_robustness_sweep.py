#!/usr/bin/env python
"""Monte-Carlo robustness sweep at scale → committed evidence artifact.

BASELINE configs 4-5: hundreds of perturbed closed-loop rollouts (constant
wind gusts, multiplicative thrust-model mismatch, initial base-velocity and
posture noise) run as one sharded `vmap` over the scenario axis
(parallel/monte_carlo.py), with the batch-level carried-inverse guard
active. Writes SWEEP_r{N}.json with failure counts, solver health and
tracking-error statistics.

The sweep branches AIRBORNE: the nominal mission is fast-forwarded past
takeoff (--skip, default 22 s — alphaGravity saturated, ~140 N total
thrust), then every scenario perturbs that carry and flies on. Constant
gusts at these magnitudes knock a *standing* robot over before it can take
off (measured: |wind| ≳ 15 N topples within 2 s of the ramp — the MPC is a
flight controller with no stance/contact authority, same as the
reference's), so a from-standing sweep measures gravity, not robustness.

Usage: python tools/run_robustness_sweep.py [n_scenarios=256] [seconds=10]
           [--skip 22] [--out SWEEP.json] [--ckpt DIR] [--ns-skip]
           [--no-recover] [--no-resample]

With --ckpt the per-level sweep state is checkpointed after every chunk
(orbax); re-running the same command resumes interrupted levels.

Round-5 forensics (SURVEY §5, VERDICT r4 weak 4 / missing 3): each level
reports the per-status tick histogram (solved / inaccurate / infeasible /
max-iter / guard-fired), solver-failure RECOVERY is on by default (bad
ticks are retried with a fresh factorisation + iteration boost through a
psum-guarded real branch; --no-recover disables), and failed scenarios
are RESAMPLED once with replacement draws (--no-resample disables).
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / (".jax_cache_tpu"
                                  if jax.default_backend() == "tpu"
                                  else ".jax_cache")))

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_scen = int(args[0]) if args else 256
    seconds = float(args[1]) if len(args) > 1 else 10.0
    out_path = None
    ckpt_root = None
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            out_path = Path(sys.argv[i + 1])
        if a == "--ckpt" and i + 1 < len(sys.argv):
            ckpt_root = Path(sys.argv[i + 1])

    from ironcub_mpc_tpu.ops import admm
    from ironcub_mpc_tpu.parallel import (
        ScenarioConfig, make_batched_carry, make_mesh, run_sweep)
    from ironcub_mpc_tpu.runtime import flight

    loop, pos_traj, alpha_traj = flight.build_flight_loop(use_nn=True)

    s = flight.standing_state(loop.plant,
                              loop.plant.sim_cfg.initial_position_deg)
    s = jax.jit(lambda s: loop.settle(s, 2.0))(s)
    problem, carry = loop.configure(
        s, {k: np.asarray(v) for k, v in pos_traj.channels.items()},
        np.asarray(alpha_traj.channels["alphaGravity"])[:, 0])

    skip_s = 22.0
    for i, a in enumerate(sys.argv):
        if a == "--skip" and i + 1 < len(sys.argv):
            skip_s = float(sys.argv[i + 1])
    if skip_s > 0:
        n_skip = int(round(skip_s / loop.cfg.period_mpc))
        print(f"fast-forwarding nominal mission {skip_s:.0f} s "
              f"({n_skip} ticks) to branch airborne ...", flush=True)
        carry, _ = loop.rollout_jit()(problem, carry, n_skip)

    # throughput settings for the batched sweep: batched-GEMM path + the
    # batch-level recovery guard (monte_carlo.py module docstring). Applied
    # only now — the nominal fast-forward above is unbatched, where the
    # guard's psum axis would be unbound (lane-mode guard handles batch 1).
    # --ns-skip additionally enables the probe-gated refresh skip
    # (ADMMSettings.ns_skip_tol, +3.9% solver throughput at unchanged
    # solved_frac — tools/bench_ns_skip.py); off by default so committed
    # sweep artifacts stay comparable across rounds.
    ns_skip = 0.02 if "--ns-skip" in sys.argv else 0.0
    loop.settings = dataclasses.replace(
        loop.settings, pallas_mode="off",
        guard_axis=admm.BATCH_GUARD_AXIS, ns_skip_tol=ns_skip)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_scenario=n_dev, n_kkt=1)
    n_ticks = int(round(seconds / loop.cfg.period_mpc))
    # robustness CURVE over gust severity: a constant wind on a
    # momentum-tracking flight controller produces a steady offset
    # roughly proportional to the gust, so one pooled number hides the
    # shape; failure = diverged past 1.0 m from the reference path
    from ironcub_mpc_tpu.parallel.monte_carlo import STATUS_COLS

    recover = "--no-recover" not in sys.argv
    resample = "--no-resample" not in sys.argv
    wind_levels = [5.0, 10.0, 20.0]
    n_per = max(n_dev, n_scen // len(wind_levels) // n_dev * n_dev)
    levels_out = []
    t0 = time.time()
    for w_std in wind_levels:
        scen = ScenarioConfig(wind_force_std=w_std, com_err_fail=1.0)
        batched = make_batched_carry(carry, n_per, scen,
                                     seed=int(w_std * 100))
        print(f"sweeping {n_per} scenarios x {seconds:.0f} s at "
              f"wind std {w_std:.0f} N on {n_dev} device(s) "
              f"[{jax.devices()[0].platform}] ...", flush=True)
        ck = (str(ckpt_root / f"wind_{int(w_std)}") if ckpt_root else None)
        res = run_sweep(loop, problem, batched, n_ticks=n_ticks, mesh=mesh,
                        scen=scen, chunk_ticks=250, checkpoint_dir=ck,
                        recover=recover)
        jax.block_until_ready(res.mean_com_err)
        level = {
            "wind_force_std_n": w_std,
            "n_scenarios": int(res.n_scenarios),
            "n_failed": int(res.n_failed),
            "n_solver_bad": int(res.n_solver_bad),
            "success_rate": round(1.0 - int(res.n_failed) / n_per, 4),
            "solved_frac": round(float(res.solved_frac), 6),
            "mean_max_com_err_m": round(float(res.mean_com_err), 4),
            "worst_healthy_com_err_m": round(float(res.max_com_err), 4),
            # forensics: per-status tick histogram + recovery outcome
            "status_counts": {k: int(v) for k, v in
                              zip(STATUS_COLS,
                                  np.asarray(res.status_counts))},
            "recovery_on": recover,
            "n_ticks_retried": int(res.n_ticks_retried),
            "n_ticks_recovered": int(res.n_ticks_recovered),
        }
        # scenario resampling (SURVEY §5): failed scenarios are replaced
        # by fresh draws at the same severity and re-flown once — keeps
        # the level's statistics at n_per honest draws instead of
        # conditioning on the unlucky ones
        if resample and int(res.n_failed) > 0:
            n_re = max(n_dev,
                       -(-int(res.n_failed) // n_dev) * n_dev)
            re_batched = make_batched_carry(
                carry, n_re, scen, seed=int(w_std * 100) + 7919)
            re_res = run_sweep(loop, problem, re_batched, n_ticks=n_ticks,
                               mesh=mesh, scen=scen, chunk_ticks=250,
                               recover=recover)
            level["resampled"] = {
                "n_drawn": n_re,
                "n_failed": int(re_res.n_failed),
                "solved_frac": round(float(re_res.solved_frac), 6),
                "mean_max_com_err_m": round(float(re_res.mean_com_err), 4),
            }
        levels_out.append(level)
    wall = time.time() - t0

    total = n_per * len(wind_levels)
    record = {
        "metric": "robustness_sweep",
        "n_scenarios_total": total,
        "seconds": seconds,
        "n_ticks": n_ticks,
        "branch_airborne_at_s": skip_s,
        "thrust_scale_std": ScenarioConfig().thrust_scale_std,
        "base_vel_std": ScenarioConfig().base_vel_std,
        "joint_pos_std": ScenarioConfig().joint_pos_std,
        "com_err_fail_m": 1.0,
        "levels": levels_out,
        "wall_s": round(wall, 1),
        "scenario_rollouts_per_s": round(total / wall, 2),
        "tick_solves_per_s": round(total * n_ticks / wall, 1),
        "solver": {
            "max_iter": loop.settings.max_iter,
            "term_check_every": loop.settings.term_check_every,
            "eps_abs": loop.settings.eps_abs,
            "eps_rel": loop.settings.eps_rel,
            "ns_skip_tol": loop.settings.ns_skip_tol,
            "rho_update_iters": list(loop.settings.rho_update_iters),
        },
        "device": jax.devices()[0].platform,
        "n_devices": n_dev,
    }
    print(json.dumps(record))
    if out_path:
        out_path.write_text(json.dumps(record, indent=1) + "\n")
        print(f"-> {out_path}")


if __name__ == "__main__":
    main()
