"""Tensor-parallel ADMM: constraint rows sharded over the mesh "kkt" axis.

For horizon blow-ups (long horizons / many scenarios per chip) the ADMM
operator's tall constraint matrix can be split by rows across devices:
``A x`` needs no communication (each shard owns its rows), while ``Aᵀ v``
and the reduced-KKT formation ``AᵀρA`` become single ``psum`` collectives
over ICI. The x-update is replicated (the 588×588 Cholesky is cheap); z/y
updates stay fully local to each shard.

This is the "QP block reductions via psum" axis of the BASELINE north star —
pure demonstration-scale for the stock problem, but the code path is real:
identical math to :mod:`ironcub_mpc_tpu.ops.admm` with axis-aware reductions,
and it composes with scenario data-parallelism on the other mesh axis
(vmap inside shard_map).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import admm


def pad_rows(A, l, u, parts: int):
    """Pad constraint rows to a multiple of ``parts`` with 0≤0≤0 rows."""
    m = A.shape[0]
    m_pad = (-m) % parts
    if m_pad:
        A = jnp.concatenate([A, jnp.zeros((m_pad, A.shape[1]), A.dtype)])
        l = jnp.concatenate([l, jnp.zeros(m_pad, l.dtype)])
        u = jnp.concatenate([u, jnp.zeros(m_pad, u.dtype)])
    return A, l, u, m


def solve_tp(P_mat, q, A, l, u, mesh: Mesh,
             settings: admm.ADMMSettings = admm.ADMMSettings(polish=False),
             axis: str = "kkt"):
    """Row-sharded ADMM solve. P/q replicated, A/l/u sharded by rows.

    Returns an :class:`ironcub_mpc_tpu.ops.admm.QPSolution` (x replicated,
    y/z gathered). Polish is not supported in the sharded path (dense KKT
    assembly would defeat the sharding); run it host-side if needed.
    """
    parts = mesh.shape[axis]
    A_p, l_p, u_p, m_orig = pad_rows(A, l, u, parts)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis), P(axis), P(axis)),
             out_specs=(P(), P(axis), P(axis)),
             check_vma=False)
    def inner(P_mat, q, A_s, l_s, u_s):
        dt = P_mat.dtype
        n = P_mat.shape[0]

        def psum(v):
            return jax.lax.psum(v, axis)

        def pmax(v):
            return jax.lax.pmax(v, axis)

        # --- Ruiz equilibration with collective column norms -------------
        D = jnp.ones((n,), dt)
        E_s = jnp.ones(l_s.shape, dt)
        c = jnp.asarray(1.0, dt)
        Pm, qv, As, ls, us = P_mat, q, A_s, l_s, u_s
        for _ in range(settings.scaling_iters):
            colP = jnp.max(jnp.abs(Pm), axis=0)
            colA = pmax(jnp.max(jnp.abs(As), axis=0))
            d = admm._safe_inv_sqrt(jnp.maximum(colP, colA))
            e = admm._safe_inv_sqrt(jnp.max(jnp.abs(As), axis=1))
            Pm = d[:, None] * Pm * d[None, :]
            qv = d * qv
            As = e[:, None] * As * d[None, :]
            ls, us = e * ls, e * us
            D, E_s = D * d, E_s * e
            g = 1.0 / jnp.clip(
                jnp.maximum(jnp.mean(jnp.max(jnp.abs(Pm), axis=0)),
                            jnp.max(jnp.abs(qv))), 1e-8, 1e8)
            Pm, qv, c = g * Pm, g * qv, c * g

        rho_s = admm.rho_vector(ls, us, settings)
        K = Pm + settings.sigma * jnp.eye(n, dtype=dt)
        K = K + psum(As.T @ (rho_s[:, None] * As))
        chol = jnp.linalg.cholesky(K)

        x = jnp.zeros((n,), dt)
        y_s = jnp.zeros(ls.shape, dt)
        z_s = jnp.clip(As @ x, ls, us)

        def body(carry, _):
            x, z_s, y_s = carry
            rhs = settings.sigma * x - qv + psum(As.T @ (rho_s * z_s - y_s))
            x_t = admm._cho_solve(chol, rhs)
            z_t = As @ x_t
            x_n = settings.alpha * x_t + (1 - settings.alpha) * x
            z_rel = settings.alpha * z_t + (1 - settings.alpha) * z_s
            z_un = z_rel + y_s / rho_s
            z_n = jnp.clip(z_un, ls, us)
            y_n = rho_s * (z_un - z_n)
            return (x_n, z_n, y_n), None

        (x, z_s, y_s), _ = jax.lax.scan(
            body, (x, z_s, y_s), None, length=settings.max_iter)

        # unscaled residuals (collective norms); same termination semantics
        # as ops/admm.solve_prepared — primal AND dual tests, with the
        # 10x-relaxed SOLVED_INACCURATE tier
        Aty = psum(As.T @ y_s)
        pri = pmax(jnp.max(jnp.abs((As @ x - z_s) / E_s)))
        dua = jnp.max(jnp.abs((Pm @ x + qv + Aty) / D)) / c
        pri_scale = jnp.maximum(pmax(jnp.max(jnp.abs((As @ x) / E_s))),
                                pmax(jnp.max(jnp.abs(z_s / E_s))))
        dua_scale = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs((Pm @ x) / D)),
                        jnp.max(jnp.abs(Aty / D))),
            jnp.max(jnp.abs(qv / D))) / c
        eps_pri = settings.eps_abs + settings.eps_rel * pri_scale
        eps_dua = settings.eps_abs + settings.eps_rel * dua_scale
        solved = (pri <= eps_pri) & (dua <= eps_dua)
        inacc = (pri <= 10 * eps_pri) & (dua <= 10 * eps_dua)
        status = jnp.where(solved, admm.SOLVED,
                           jnp.where(inacc, admm.SOLVED_INACCURATE,
                                     admm.MAX_ITER_REACHED))
        stats = jnp.stack([pri, dua, status.astype(dt)])
        return (jnp.concatenate([x * D, stats]), y_s * E_s / c, z_s / E_s)

    out, y, z = inner(P_mat, q, A_p, l_p, u_p)
    n = P_mat.shape[0]
    x = out[:n]
    pri, dua, status = out[n], out[n + 1], out[n + 2]
    return admm.QPSolution(
        x=x, y=y[:m_orig], z=z[:m_orig],
        status=status.astype(jnp.int32),
        iterations=jnp.asarray(settings.max_iter, jnp.int32),
        pri_res=pri, dua_res=dua)
