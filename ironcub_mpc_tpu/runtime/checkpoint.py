"""Checkpoint / resume of closed-loop and Monte-Carlo state.

The reference has no checkpointing (telemetry dump at exit only,
variable_sampling_mpc.py:163-194); for long pod-scale sweeps the TPU build
persists everything that defines a run mid-flight: the full
:class:`~ironcub_mpc_tpu.runtime.loop.LoopCarry` (plant state, MPC carry
with its warm starts, reference windows, trajectory cursors and multi-rate
counters) and the :class:`~ironcub_mpc_tpu.qp.mpc.MPCProblem` constants.

Uses Orbax with pytree checkpointing; carries are pytrees of arrays, so
batched (vmapped) sweep state saves identically to a single run.
"""

from __future__ import annotations

from pathlib import Path

import jax


def save(path: str | Path, problem, carry, step: int | None = None) -> str:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"problem": problem, "carry": carry,
                          "step": jax.numpy.asarray(step or 0)},
                   force=True)
    return str(path)


def restore(path: str | Path, problem_like, carry_like):
    """Restore with the given pytree structures as templates (shapes/dtypes
    must match what was saved — e.g. the same batch size for sweep state)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        target = {"problem": problem_like, "carry": carry_like,
                  "step": jax.numpy.asarray(0)}
        out = ckptr.restore(path, args=ocp.args.PyTreeRestore(target))
    return out["problem"], out["carry"], int(out["step"])
