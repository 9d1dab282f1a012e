"""SO(3) / RPY algebra used throughout the control stack.

Conventions match the reference (iDynTree): rotations are world-from-body,
RPY is the intrinsic roll-pitch-yaw parameterisation with
``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``, and the Euler-rate map ``W`` relates
body angular velocity to RPY rates by ``ω_body = W(φ) φ̇``
(systemDynamicsVSMPC.cpp:132-156).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(x):
    """3-vector -> skew-symmetric matrix (FlightControlUtils.cpp:77-87).

    Broadcasts over leading axes: ``x`` of shape ``[..., 3]`` yields
    ``[..., 3, 3]``.
    """
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    z = jnp.zeros_like(x0)
    return jnp.stack([
        jnp.stack([z, -x2, x1], axis=-1),
        jnp.stack([x2, z, -x0], axis=-1),
        jnp.stack([-x1, x0, z], axis=-1),
    ], axis=-2)


def unskew(m):
    """Skew-symmetric matrix -> 3-vector (FlightControlUtils.cpp:89-97)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def inv3(M):
    """Closed-form 3x3 inverse (adjugate / determinant), broadcastable.

    ``jnp.linalg.inv`` lowers batched tiny matrices to a sequential LU that
    is dispatch-bound on TPU — measured ~1.3 ms/tick of the batch-256
    chained MPC tick was this one [256,3,3] inverse (the locked-inertia
    inverse in the RPY-kinematics row). The adjugate form is nine fused
    elementwise ops. Intended for well-conditioned physical matrices
    (inertia tensors, Euler-rate maps); no pivoting.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack([jnp.stack([A, B, Cc], axis=-1),
                     jnp.stack([D, E, F], axis=-1),
                     jnp.stack([G, H, I], axis=-1)], axis=-2)
    return adj / det[..., None, None]


def rotx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([o, z, z], axis=-1),
        jnp.stack([z, c, -s], axis=-1),
        jnp.stack([z, s, c], axis=-1),
    ], axis=-2)


def roty(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, o, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1),
    ], axis=-2)


def rotz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def rpy_to_matrix(rpy):
    """RPY -> rotation matrix, R = Rz(y) Ry(p) Rx(r) (iDynTree convention)."""
    return rotz(rpy[..., 2]) @ roty(rpy[..., 1]) @ rotx(rpy[..., 0])


def matrix_to_rpy(R):
    """Rotation matrix -> RPY (iDynTree ``Rotation::asRPY`` convention).

    pitch = asin(-R[2,0]); roll = atan2(R[2,1], R[2,2]);
    yaw = atan2(R[1,0], R[0,0]). Gimbal-lock branch not handled specially
    (the flight envelope keeps |pitch| well below 90 deg).
    """
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_rate_matrix(rpy):
    """W(φ) with ω_body = W φ̇ (systemDynamicsVSMPC.cpp:133-139)."""
    r, p = rpy[..., 0], rpy[..., 1]
    o, z = jnp.ones_like(r), jnp.zeros_like(r)
    cr, sr, cp, sp = jnp.cos(r), jnp.sin(r), jnp.cos(p), jnp.sin(p)
    return jnp.stack([
        jnp.stack([o, z, -sp], axis=-1),
        jnp.stack([z, cr, cp * sr], axis=-1),
        jnp.stack([z, -sr, cr * cp], axis=-1),
    ], axis=-2)


def euler_rate_matrix_inv(rpy):
    """W(φ)⁻¹ in closed form (systemDynamicsVSMPC.cpp:140-147)."""
    r, p = rpy[..., 0], rpy[..., 1]
    o, z = jnp.ones_like(r), jnp.zeros_like(r)
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, tp = jnp.cos(p), jnp.tan(p)
    return jnp.stack([
        jnp.stack([o, sr * tp, cr * tp], axis=-1),
        jnp.stack([z, cr, -sr], axis=-1),
        jnp.stack([z, sr / cp, cr / cp], axis=-1),
    ], axis=-2)


def unwrap_rpy(rpy_new, rpy_old, n_turns):
    """Incremental RPY unwrapping with ±2π turn counting.

    Functional re-expression of the stateful loop in
    ``constraintsVSMPC.cpp:232-247``: turns decrement when the raw angle
    jumps up by more than π, increment when it jumps down.
    Returns (unwrapped, new_turn_counts).
    """
    diff = rpy_new - rpy_old
    n_turns = n_turns - (diff > jnp.pi).astype(n_turns.dtype)
    n_turns = n_turns + (diff < -jnp.pi).astype(n_turns.dtype)
    return rpy_new + 2.0 * jnp.pi * n_turns, n_turns
