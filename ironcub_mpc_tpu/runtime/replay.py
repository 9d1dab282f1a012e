"""Recorded-flight replay streams — the shared loading contract.

A replay stream (tools/record_flight_snapshots.py) holds T+1 full
:class:`RobotSnapshot` frames plus the per-tick EKF thrust-rate estimates
and the trajectory/alphaGravity windows captured at the recording handoff.
The replay contract is: **tick t consumes snapshot t+1 and est_td[t]**
(the snapshot stream leads by one frame because frame 0 seeds
``configure``). The headline bench (bench.py), the chained stage profiler
(tools/profile_chained_stages.py) and the fidelity tests all replay the
same streams; this module is the single place that contract lives.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, RobotConfig, joint_selector
from ..core.types import RobotSnapshot
from ..horizon.schedule import build_schedule

ROOT = Path(__file__).resolve().parents[2]
DEFAULT_STREAM = ROOT / "tests" / "golden" / "flight_snapshots.npz"


class FlightReplay(NamedTuple):
    cfg: object                    # the flight MPCConfig (static)
    sched: object                  # HorizonSchedule (static)
    sel: tuple                     # joint selector (static)
    snaps: RobotSnapshot           # pytree, leaves [T+1, ...] f32
    est_td: jnp.ndarray            # [T, 4] EKF thrust-rate per tick
    channels: dict                 # reference-trajectory windows (np)
    alpha: np.ndarray              # alphaGravity slice
    initial_throttle: jnp.ndarray  # [4] applied throttle at handoff

    @property
    def n_ticks(self) -> int:
        return int(self.est_td.shape[0])

    def snap_of(self, t: int) -> RobotSnapshot:
        """Frame ``t`` (0 seeds configure; tick t consumes frame t+1)."""
        return jax.tree.map(lambda a: a[t], self.snaps)

    def stream(self, scan_len: int):
        """(snap_stream, est_stream) for a ``lax.scan`` over ticks
        0..scan_len-1: snapshot frames 1..scan_len paired with
        est_td[0..scan_len-1]."""
        assert scan_len <= self.n_ticks, (scan_len, self.n_ticks)
        snap_stream = jax.tree.map(lambda a: a[1:scan_len + 1], self.snaps)
        return snap_stream, self.est_td[:scan_len]

    def configure(self, settings):
        """(problem, carry) configured from frame 0 with the recorded
        trajectory windows and applied throttle."""
        from ..qp import mpc as vs_mpc

        return vs_mpc.configure(
            self.cfg, self.sched, self.sel, self.snap_of(0), self.channels,
            self.alpha, settings, initial_throttle=self.initial_throttle)


def load_flight_replay(path: str | Path = DEFAULT_STREAM) -> FlightReplay:
    """Load a recorded stream with the flight configuration it was
    recorded under (runtime/flight.build_flight_loop's MPC config)."""
    npz = np.load(path)
    cfg = dataclasses.replace(MPCConfig(),
                              weight_regularization_joint_pos=200.0)
    snaps = RobotSnapshot(**{
        f: jnp.asarray(npz[f"snap_{f}"], jnp.float32)
        for f in RobotSnapshot._fields})
    return FlightReplay(
        cfg=cfg,
        sched=build_schedule(cfg),
        sel=joint_selector(RobotConfig(), cfg),
        snaps=snaps,
        est_td=jnp.asarray(npz["est_td"], jnp.float32),
        channels={k: np.asarray(npz[f"ch_{k}"]) for k in
                  ("positionCoM", "velocityCoM", "RPY", "RPYDot")},
        alpha=np.asarray(npz["alpha"]),
        initial_throttle=jnp.asarray(npz["initial_throttle"], jnp.float32),
    )
