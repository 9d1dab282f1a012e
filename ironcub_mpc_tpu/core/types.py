"""Pytree containers for the MPC pipeline.

The reference threads a mutable ``QPInput`` blackboard plus per-block hidden
state (counters, rolling windows, cursors) through every call
(utils/include/QPInput.h:12-124, costsVSMPC.cpp:118-165,
constraintsVSMPC.cpp:132-141). In a functional TPU design all of that state
is explicit: :class:`RobotSnapshot` is the per-tick kinodynamic measurement,
:class:`MPCCarry` is everything that persists across ticks, and
:class:`MPCOutput` is what the plant consumes. All are pytrees of arrays, so
the whole tick `vmap`s over scenario batches and scans over time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class RobotSnapshot(NamedTuple):
    """Kinodynamic quantities of one measured robot state.

    Produced by ``dynamics.kinodynamics`` (the iDynTree-equivalent layer;
    reference producer: ``Robot::setState``, utils/src/Robot.cpp:198-335).
    Shapes use J = number of modeled joints (23), 4 jets.
    """

    w_R_b: jax.Array              # [3,3] world-from-base rotation
    base_pos: jax.Array           # [3]   base origin, world
    base_ang_vel_world: jax.Array # [3]   measured base angular velocity (world)
    com_pos: jax.Array            # [3]   CoM position, world
    total_mass: jax.Array         # []    robot mass
    momentum_body: jax.Array      # [6]   centroidal momentum, body coords
    inertia_locked: jax.Array     # [3,3] locked inertia at CoM, body orientation
    amom_jets_body: jax.Array     # [6,4] thrust->momentum-rate map, body coords
    jet_axes_world: jax.Array     # [4,3] jet thrust axes, world
    jet_arms_world: jax.Array     # [4,3] jet application arms (r_jet - CoM), world
    jac_jets_lin_joints: jax.Array  # [4,3,J] linear rows of world jet Jacobians, joint cols
    jac_com_joints: jax.Array     # [3,J] CoM Jacobian, joint cols
    rel_jac_lin: jax.Array        # [4,3,J] linear rows of base-relative jet Jacobians
    rel_jac_ang: jax.Array        # [4,3,J] angular rows of base-relative jet Jacobians
    joint_pos: jax.Array          # [J]   measured joint positions
    jet_thrusts: jax.Array        # [4]   estimated/applied thrusts [N]
    # external-wrench aggregation (Robot.cpp:280-322); None when the state
    # was computed without wrench measurements
    ext_wrench_sum: jax.Array = None   # [6] total external wrench, world
    zmp: jax.Array = None              # [3] zero-moment point (z = 0)
    on_ground: jax.Array = None        # [] bool contact flag


class MPCCarry(NamedTuple):
    """All cross-tick state of the multi-rate MPC (explicit, scannable)."""

    # RPY unwrapping (constraintsVSMPC.cpp:232-247)
    rpy_old: jax.Array            # [3]
    n_turns: jax.Array            # [3] int32
    # multi-rate modulo counters (constraintsVSMPC.cpp:326-336, costsVSMPC.cpp:118)
    throttle_counter: jax.Array   # [] int32
    ref_counter: jax.Array        # [] int32
    # rolling reference window, n_ref = nIter - nIterSmall + 1 columns
    pos_com_ref: jax.Array        # [3, n_ref]
    lin_mom_ref: jax.Array        # [3, n_ref]
    rpy_ref: jax.Array            # [3, n_ref]
    ang_mom_ref: jax.Array        # [3, n_ref]
    # current single-column references pushed to the QP input
    # (costsVSMPC.cpp:155-160)
    pos_com_ref_now: jax.Array    # [3]
    rpy_ref_now: jax.Array        # [3]
    mom_ref_now: jax.Array        # [6]
    # trajectory cursors
    pos_traj_idx: jax.Array       # [] int32
    alpha_traj_idx: jax.Array     # [] int32
    alpha_gravity: jax.Array      # [] last alphaGravity value (telemetry)
    # previous MPC outputs (QPInput thrust/throttle state)
    thrust_des: jax.Array         # [4]
    thrust_dot_des: jax.Array     # [4]
    throttle_cmd: jax.Array       # [4] physical % throttle last commanded
    joints_pos_ref: jax.Array     # [J] integrated absolute joint reference
    # ADMM warm start (unscaled)
    warm_x: jax.Array             # [n_var]
    warm_y: jax.Array             # [n_constraints]
    # carried condensed-solver factorisation state (scaled space; None when
    # kinv_carry is off or the full-space solver is selected). Replaces the
    # per-tick batched Cholesky with a Woodbury+Newton-Schulz refresh.
    kinv: jax.Array = None        # [nU, nU]
    rho_vec: jax.Array = None     # [n_box]
    rho_scalar: jax.Array = None  # []


class DebugInfo(NamedTuple):
    """Per-tick QP introspection, emitted when ``enable_debug_log_mode`` is
    on (IMPCProblem.cpp:300-408). Zeroed cost/Ax on non-solved ticks, like
    the reference."""

    total_cost: jax.Array         # [] ½xᵀHx + gᵀx of the accepted solution
    block_costs: jax.Array        # [4] per cost block, registration order:
    #                               ReferenceTracking, Regualarization,
    #                               ThrottleInitialValue, JointPositionReg
    constraint_lb: jax.Array      # [m] stacked per-block lower bounds
    constraint_ax: jax.Array      # [m] A x rows (zeroed when not solved)
    constraint_ub: jax.Array      # [m]


class MPCOutput(NamedTuple):
    """Per-tick controller output (VariableSamplingMPC getters,
    variableSamplingMPC.cpp:114-217)."""

    joints_pos_ref: jax.Array     # [J] absolute joint position reference
    throttle: jax.Array           # [4] physical throttle command [%]
    thrust_des: jax.Array         # [4] predicted thrust at knot 1
    thrust_dot_des: jax.Array     # [4]
    final_state: jax.Array        # [26] terminal predicted state
    status: jax.Array             # [] solver status code
    pri_res: jax.Array
    dua_res: jax.Array
    alpha_gravity: jax.Array
    pos_com_ref: jax.Array        # [3] active CoM reference (telemetry)
    rpy_ref: jax.Array            # [3]
    mom_ref: jax.Array            # [6]
    # [] bool: the carried-inverse recovery guard re-factorised this tick
    # (failure forensics, SURVEY §5; concrete False when inapplicable)
    guard_fired: jax.Array = None
    # per-block introspection; None unless cfg.enable_debug_log_mode (a
    # static config branch — zero overhead when off)
    debug: DebugInfo = None
