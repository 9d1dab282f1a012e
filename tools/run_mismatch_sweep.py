#!/usr/bin/env python
"""Model-mismatch robustness sweep → committed evidence artifact.

The buildable half of the blocked real-asset gap (VERDICT r4 missing 1 /
next 4): the controller linearises against the NOMINAL calibrated Mk3
model while each scenario's plant flies perturbed inertial parameters
(±mass_scale_std per-link segment masses+inertias) and jet placements
(±jet_pos_std_m, link frame). The curve of tracking degradation vs
mismatch level directly predicts the sim-to-real margin — how wrong the
solid-primitive inertia estimates can be before the controller's gust
margin erodes. The reference's only robustness mechanism is sensor noise
(ironcub_mujoco_simulator.py:263-288); it never separates controller
model from plant model.

Scenarios branch AIRBORNE (same protocol as run_robustness_sweep.py) and
carry a fixed moderate 5 N gust std so the mismatch axis is measured in
the regime the robot actually fights.

Usage: python tools/run_mismatch_sweep.py [n_per_level=256] [seconds=10]
           [--skip 22] [--out MISMATCH.json] [--ckpt DIR]
           [--wind N] [--quick]

--wind sets the fixed gust std (default 5 N) so the gust x mismatch
interaction can be mapped slice by slice; --quick runs only the matched
and ±10%/1 cm levels.
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
    skip_s = 22.0
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            out_path = Path(sys.argv[i + 1])
        if a == "--ckpt" and i + 1 < len(sys.argv):
            ckpt_root = Path(sys.argv[i + 1])
        if a == "--skip" and i + 1 < len(sys.argv):
            skip_s = float(sys.argv[i + 1])
    wind_std = 5.0
    for i, a in enumerate(sys.argv):
        if a == "--wind" and i + 1 < len(sys.argv):
            wind_std = float(sys.argv[i + 1])

    from ironcub_mpc_tpu.ops import admm
    from ironcub_mpc_tpu.parallel import (
        ScenarioConfig, make_batched_carry, make_mesh, run_sweep)
    from ironcub_mpc_tpu.parallel.monte_carlo import STATUS_COLS
    from ironcub_mpc_tpu.runtime import flight

    loop, pos_traj, alpha_traj = flight.build_flight_loop(use_nn=True)
    s = flight.standing_state(loop.plant,
                              loop.plant.sim_cfg.initial_position_deg)
    s = jax.jit(lambda s: loop.settle(s, 2.0))(s)
    problem, carry = loop.configure(
        s, {k: np.asarray(v) for k, v in pos_traj.channels.items()},
        np.asarray(alpha_traj.channels["alphaGravity"])[:, 0])

    if skip_s > 0:
        n_skip = int(round(skip_s / loop.cfg.period_mpc))
        print(f"fast-forwarding nominal mission {skip_s:.0f} s "
              f"({n_skip} ticks) to branch airborne ...", flush=True)
        carry, _ = loop.rollout_jit()(problem, carry, n_skip)

    loop.settings = dataclasses.replace(
        loop.settings, pallas_mode="off",
        guard_axis=admm.BATCH_GUARD_AXIS)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_scenario=n_dev, n_kkt=1)
    n_ticks = int(round(seconds / loop.cfg.period_mpc))
    n_per = max(n_dev, n_scen // n_dev * n_dev)
    # mismatch curve: (segment-mass rel. error, jet placement error [m])
    levels = [(0.0, 0.0), (0.05, 0.005), (0.10, 0.01), (0.20, 0.02)]
    if "--quick" in sys.argv:
        levels = [levels[0], levels[2]]
    levels_out = []
    t0 = time.time()
    for m_std, j_std in levels:
        scen = ScenarioConfig(wind_force_std=wind_std, com_err_fail=1.0,
                              mass_scale_std=m_std, jet_pos_std_m=j_std)
        batched = make_batched_carry(carry, n_per, scen,
                                     seed=int(m_std * 1000) + 11)
        print(f"sweeping {n_per} scenarios x {seconds:.0f} s at mass "
              f"±{m_std:.0%} / jets ±{j_std*100:.1f} cm "
              f"[{jax.devices()[0].platform}] ...", flush=True)
        ck = (str(ckpt_root / f"mm_{int(m_std*100)}") if ckpt_root else None)
        res = run_sweep(loop, problem, batched, n_ticks=n_ticks, mesh=mesh,
                        scen=scen, chunk_ticks=250, checkpoint_dir=ck,
                        recover=True)
        jax.block_until_ready(res.mean_com_err)
        levels_out.append({
            "mass_scale_std": m_std,
            "jet_pos_std_m": j_std,
            "n_scenarios": int(res.n_scenarios),
            "n_failed": int(res.n_failed),
            "success_rate": round(1.0 - int(res.n_failed) / n_per, 4),
            "solved_frac": round(float(res.solved_frac), 6),
            "mean_max_com_err_m": round(float(res.mean_com_err), 4),
            "worst_healthy_com_err_m": round(float(res.max_com_err), 4),
            "status_counts": {k: int(v) for k, v in
                              zip(STATUS_COLS,
                                  np.asarray(res.status_counts))},
            "n_ticks_retried": int(res.n_ticks_retried),
            "n_ticks_recovered": int(res.n_ticks_recovered),
        })
    wall = time.time() - t0

    record = {
        "metric": "model_mismatch_sweep",
        "controller_model": "nominal calibrated Mk3 (data/ironcub_mk3_calibrated.urdf)",
        "plant_model": "per-scenario perturbed masses/inertias + jet placements",
        "wind_force_std_n": wind_std,
        "n_scenarios_total": n_per * len(levels),
        "seconds": seconds,
        "n_ticks": n_ticks,
        "branch_airborne_at_s": skip_s,
        "com_err_fail_m": 1.0,
        "levels": levels_out,
        "wall_s": round(wall, 1),
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
