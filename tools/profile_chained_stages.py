#!/usr/bin/env python
"""Budget the solve interior in the CHAINED regime (VERDICT r4 weak 2).

Round 4 established that per-call stage timings are dispatch-floor-dominated
through the TPU tunnel; the honest methodology is to CHAIN full ticks in a
lax.scan (the production regime, same harness as bench.py's replay mode)
and difference the per-tick time of tick variants with individual stages
disabled. This tool applies that methodology to the solve interior:

  variant            what it isolates (by difference vs full)
  -----------------  -------------------------------------------------
  prep_only          _tick_prep (reference shift, linearise, x0)
  prep_condense      + condense (state elimination, H_c/q_c)  -> solve = full - this
  no_polish          Schur polish cost
  no_guard           kinv_guard probe + recovery cond cost
  no_ns_skip         refresh cost with probe gate off (refresh every tick)
  term_off           the early-segment-exit win (fixed 40 iters)
  iters sweep        per-iteration slope (term off): max_iter in {10,20,30,40}

plus the max_iter ECONOMICS: solved_frac and command fidelity vs a
max_iter=400 golden run over the same replayed stream, for
max_iter in {20, 25, 30, 40} (early exit on).

Usage: python tools/profile_chained_stages.py [batch=256] [scan_len=50]
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
                      str(ROOT / ".jax_cache_tpu"
                          if jax.default_backend() == "tpu"
                          else ROOT / ".jax_cache"))

    from ironcub_mpc_tpu.ops import admm
    from ironcub_mpc_tpu.qp import mpc as vs_mpc
    from ironcub_mpc_tpu.runtime.replay import load_flight_replay

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scan_len = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    replay = load_flight_replay()
    cfg, sched, sel = replay.cfg, replay.sched, replay.sel
    snap_stream, est_stream = replay.stream(scan_len)
    key = jax.random.PRNGKey(0)
    lane_jitter = 0.1 * jax.random.normal(key, (batch, 6), jnp.float32)

    base = admm.ADMMSettings(max_iter=40, polish=True, rho_update_iters=(15,),
                             pallas_mode="off", kinv_guard=True,
                             guard_axis=admm.BATCH_GUARD_AXIS,
                             ns_skip_tol=0.02, term_check_every=5)

    def measure(settings, stage: str = "full"):
        """Chained per-tick time of a tick variant; stage truncates the
        pipeline after prep ('prep_only') or condense ('prep_condense')."""
        problem, carry = replay.configure(settings)

        def tick_full(c, s, e):
            return vs_mpc.mpc_tick(cfg, sched, sel, settings, problem, c, s, e)

        def tick_prep(c, s, e):
            c, prep = vs_mpc._tick_prep(cfg, sel, problem, c, s, e)
            # reduce to a scalar so nothing downstream is dead-code-eliminated
            return c, (prep.x0.sum() + prep.lin.Ac.sum()
                       + prep.state_ref.sum())

        def tick_condense(c, s, e):
            c, prep = vs_mpc._tick_prep(cfg, sel, problem, c, s, e)
            qp, *_ = vs_mpc.condense_from_prep(cfg, sched, sel, problem, c,
                                               prep)
            return c, (qp.H.sum() + qp.q.sum() + qp.F.sum())

        tick = {"full": tick_full, "prep_only": tick_prep,
                "prep_condense": tick_condense}[stage]
        vtick = jax.vmap(tick, axis_name=admm.BATCH_GUARD_AXIS)
        carries = jax.tree.map(lambda a: jnp.stack([a] * batch), carry)

        @jax.jit
        def chain(carries):
            def body(cc, xs):
                snap_t, est_t = xs
                snap_b = jax.tree.map(
                    lambda a: jnp.broadcast_to(a, (batch,) + a.shape), snap_t)
                snap_b = snap_b._replace(
                    momentum_body=snap_b.momentum_body + lane_jitter)
                est_b = jnp.broadcast_to(est_t, (batch, 4))
                cc, out = vtick(cc, snap_b, est_b)
                if stage == "full":
                    r = jnp.mean(((out.status == 1) | (out.status == 2))
                                 .astype(jnp.float32))
                else:
                    r = jnp.mean(out)
                return cc, r
            return jax.lax.scan(body, carries, (snap_stream, est_stream))

        carries, r = chain(carries)
        jax.block_until_ready(r)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            carries, r = chain(carries)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / reps / scan_len * 1e3
        return ms, float(jnp.mean(r)) if stage == "full" else float("nan")

    print(f"# chained replay regime, batch={batch}, scan_len={scan_len}, "
          f"device={jax.devices()[0].platform}", flush=True)
    rows = []
    full_ms, full_ok = measure(base, "full")
    rows.append(("full tick", full_ms, full_ok))
    for name, settings, stage in (
        ("prep_only", base, "prep_only"),
        ("prep_condense", base, "prep_condense"),
        ("no_polish", dataclasses.replace(base, polish=False), "full"),
        ("no_guard", dataclasses.replace(base, kinv_guard=False), "full"),
        ("no_ns_skip", dataclasses.replace(base, ns_skip_tol=0.0), "full"),
        ("term_off", dataclasses.replace(base, term_check_every=0), "full"),
    ):
        ms, ok = measure(settings, stage)
        rows.append((name, ms, ok))
    for name, ms, ok in rows:
        print(f"{name:16s} {ms:7.3f} ms/tick"
              + ("" if np.isnan(ok) else f"  solved={ok:.3f}"), flush=True)
    d = dict((n, m) for n, m, _ in rows)
    print(f"\n# stage budget by difference (batch {batch}):")
    print(f"prep                {d['prep_only']:7.3f} ms")
    print(f"condense            {d['prep_condense'] - d['prep_only']:7.3f} ms")
    print(f"solve (all)         {d['full tick'] - d['prep_condense']:7.3f} ms")
    print(f"  polish            {d['full tick'] - d['no_polish']:7.3f} ms")
    print(f"  guard probe/cond  {d['full tick'] - d['no_guard']:7.3f} ms")
    print(f"  refresh (gated)   {d['no_ns_skip'] - d['full tick']:7.3f} ms "
          "(cost of refreshing every tick instead)")
    print(f"  early-exit win    {d['term_off'] - d['full tick']:7.3f} ms")

    # per-iteration slope with early exit off
    print("\n# per-iteration slope (term_check off):", flush=True)
    it_ms = {}
    for mi in (10, 20, 30, 40):
        ms, ok = measure(dataclasses.replace(base, term_check_every=0,
                                             max_iter=mi,
                                             rho_update_iters=(15,)
                                             if mi > 15 else ()), "full")
        it_ms[mi] = ms
        print(f"max_iter={mi:3d}  {ms:7.3f} ms/tick  solved={ok:.3f}",
              flush=True)
    slope = (it_ms[40] - it_ms[20]) / 20.0
    print(f"slope ~{slope*1e3:.1f} us/iteration "
          f"(~{40*slope:.3f} ms of the fixed-40 tick is iterations)")

    # --- max_iter economics vs golden commands ---------------------------
    print("\n# max_iter economics (early exit on, vs max_iter=400 golden):",
          flush=True)

    def run_commands(settings):
        problem, carry = replay.configure(settings)

        @jax.jit
        def chain(carry):
            def body(c, xs):
                c, out = vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                         c, xs[0], xs[1])
                return c, (out.status, out.throttle, out.joints_pos_ref,
                           out.thrust_des)
            return jax.lax.scan(body, carry, (snap_stream, est_stream))

        _, (st, thr, jp, td) = chain(carry)
        return (np.asarray(st), np.asarray(thr), np.asarray(jp),
                np.asarray(td))

    golden = run_commands(dataclasses.replace(
        base, guard_axis=None, max_iter=400, rho_update_iters=(25, 75, 150),
        term_check_every=0))
    for mi in (20, 25, 30, 40):
        st, thr, jp, td = run_commands(dataclasses.replace(
            base, guard_axis=None, max_iter=mi,
            rho_update_iters=(15,) if mi > 15 else ()))
        ok = np.mean((st == 1) | (st == 2))
        print(f"max_iter={mi:3d}: solved={ok:.3f}  "
              f"max|dThrottle|={np.abs(thr - golden[1]).max():.4f}%  "
              f"max|dJoint|={np.abs(jp - golden[2]).max():.5f} rad  "
              f"max|dThrust|={np.abs(td - golden[3]).max():.4f} N",
              flush=True)


if __name__ == "__main__":
    main()
