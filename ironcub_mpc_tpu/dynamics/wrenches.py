"""External-wrench aggregation, ZMP and ground-contact detection.

Parity layer for the wrench-related quantities of ``Robot::setState``
(utils/src/Robot.cpp:280-322): wrenches measured in body-fixed frames are
transported to the world frame and summed, the zero-moment point is computed
from the total wrench, the ground-contact flag compares the vertical force
against the configured threshold, and per-wrench momentum-map (``A_mom``)
and coupling (``Λ``) matrices are exposed for controllers that feed contact
wrenches into the centroidal dynamics.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from ..ops.so3 import skew
from .kinodynamics import KinDyn, LinkState


class WrenchSummary(NamedTuple):
    sum_world: jnp.ndarray        # [6] total wrench at the world origin-ish
    wrenches_mixed: jnp.ndarray   # [W,6] each wrench rotated to world axes
    zmp: jnp.ndarray              # [3] zero-moment point (xy; z = 0)
    on_ground: jnp.ndarray        # [] bool
    amom: jnp.ndarray             # [W,6,6] wrench -> centroidal momentum rate
    lambda_mom: jnp.ndarray       # [6, 6+n] Σ coupling of wrench app. points


def compute_wrench_summary(kd: KinDyn, ls: LinkState, J, com,
                           frame_names: Sequence[str], wrenches_body,
                           jac_com, threshold: float) -> WrenchSummary:
    """``wrenches_body``: [W, 6] (force, torque) in each named frame.

    Mirrors the reference quantities:
    - sum: each wrench moved to world via the frame's wrench adjoint
      (Robot.cpp:286-290);
    - mixed: rotation only, no moment transport (Robot.cpp:291-294);
    - ZMP from the summed wrench: x = −τy/fz, y = τx/fz (Robot.cpp:317-321);
    - A_mom per wrench: wrench adjoint of the (I, p − com) transform
      (Robot.cpp:297-301);
    - Λ: −S(f_world) · (J_lin − J_com) rows (Robot.cpp:302-309).
    """
    model = kd.model
    dt_ = ls.p.dtype
    sums = jnp.zeros(6, dt_)
    mixed, amoms, lam = [], [], jnp.zeros((6, 6 + kd.n), dt_)
    for i, name in enumerate(frame_names):
        fr = model.frames[name]
        R_f = ls.R[fr.link] @ jnp.asarray(fr.R, dt_)
        p_f = ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(fr.p, dt_)
        f_w = R_f @ wrenches_body[i, :3]
        tau_w = R_f @ wrenches_body[i, 3:]
        # wrench adjoint of (R_f, p_f): world wrench about the origin of the
        # world frame placed at the application point, i.e. the reference's
        # asAdjointTransformWrench with the frame's world pose
        sums = sums + jnp.concatenate([f_w, tau_w + jnp.cross(p_f, f_w)])
        mixed.append(jnp.concatenate([f_w, tau_w]))
        r = p_f - com
        A = jnp.zeros((6, 6), dt_)
        A = A.at[0:3, 0:3].set(jnp.eye(3, dtype=dt_))
        A = A.at[3:6, 0:3].set(skew(r))
        A = A.at[3:6, 3:6].set(jnp.eye(3, dtype=dt_))
        amoms.append(A)
        Jf = kd.frame_jacobian(J, ls, fr.link, p_f)
        lam = lam.at[3:6].add(-skew(f_w) @ (Jf[0:3] - jac_com))
    mixed = jnp.stack(mixed) if mixed else jnp.zeros((0, 6), dt_)
    amoms = jnp.stack(amoms) if amoms else jnp.zeros((0, 6, 6), dt_)
    fz = sums[2]
    on_ground = fz > threshold
    zmp = jnp.where(
        on_ground,
        jnp.stack([-sums[4] / jnp.where(fz == 0, 1.0, fz),
                   sums[3] / jnp.where(fz == 0, 1.0, fz),
                   jnp.zeros((), dt_)]),
        jnp.zeros(3, dt_))
    return WrenchSummary(sum_world=sums, wrenches_mixed=mixed, zmp=zmp,
                         on_ground=on_ground, amom=amoms, lambda_mom=lam)
