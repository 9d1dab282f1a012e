"""Pallas TPU kernels for the condensed-QP hot primitives.

The condensed solve (qp/condensed.py) spends its time in three places, all
of them small-matrix linear algebra batched over scenarios:

1. the ADMM iteration segment — ``x ← K⁻¹ rhs`` plus vector updates.  As a
   ``lax.scan`` this re-reads the batched ``K⁻¹`` ([B, 120, 120], ~30 MB at
   B=512) from HBM *every iteration*: 60 iterations ≈ 1.8 GB of HBM traffic
   for ~1 GFLOP of compute — pure bandwidth bound.  The Pallas kernel keeps
   each scenario's ``K⁻¹`` resident in VMEM across the whole segment, cutting
   HBM traffic by the iteration count.

2. the rank-n_box Woodbury ρ-refresh + Newton–Schulz polish — five [120,120]
   matmuls per scenario plus a 24×24 inverse.  Fused into one kernel the
   intermediates never leave VMEM.

3. the 24×24 Gauss–Jordan inverse — as stock JAX this unrolls into 24
   sequential dispatch-bound vector steps (~5 ms at B=512); inside the
   Woodbury kernel it is a 24-step ``fori_loop`` over a [32, 128] VMEM
   buffer and costs microseconds.

All kernels are written single-element and batched with ``jax.vmap`` (the
pallas batching rule turns the batch axis into a grid dimension).  Matmuls
request ``Precision.HIGHEST`` — the QP does not survive bf16-grade f32
passes (see the package-level precision note in README.md).

Throughput verdict (measured, tools/bench_segment_kernels.py, v5e,
batch 512 × 40 iterations): the XLA ``lax.scan`` segment runs the batch in
0.046 ms — XLA itself pins the whole 33 MB batched K⁻¹ in VMEM across the
scan and saturates the MXU with [512,·] batched GEMMs. The vmapped
single-scenario kernel takes 4.15 ms (one grid step per scenario: [1,128]
mat-vecs use 1/8 of the MXU sublanes and pay per-step overheads ×512), and
the grouped kernel (``admm_segment_grouped``, 8 scenarios/program) 2.20 ms.
A hand kernel cannot beat the compiler here because each scenario owns a
distinct K⁻¹ — the mat-vec cannot be widened — so these kernels are the
BATCH-1 LATENCY path only (0.31 ms stock / 0.391 vs 0.516 ms pure-JAX on
the n_box=120 joint-limits config); batched throughput runs stock XLA.

Vectors use a "full layout": length ``nU`` with box-constrained entries at
``box0:``, zero-padded to the 128-lane TPU tile.  Outside the box, ρ is 0
and the duals stay identically zero, so no masks are needed in the
iteration body.  Equivalence with the pure-JAX path is oracle-tested in
tests/test_pallas_solve.py.

Reference for the math being fused: OSQP's ADMM scheme as specialised in
qp/condensed.py (itself the condensed form of IMPCProblem.cpp:140-298).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_HIGHEST = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    """Pallas kernels compile only on TPU; interpret elsewhere (tests)."""
    return jax.default_backend() != "tpu"


def _pad_to(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_HIGHEST)


# --------------------------------------------------------------------------
# 1. fused ADMM segment
# --------------------------------------------------------------------------

def _segment_kernel(kinv_ref, q_ref, lb_ref, ub_ref, rho_ref, rhoi_ref,
                    x_ref, z_ref, y_ref, xo_ref, zo_ref, yo_ref,
                    *, sigma, alpha, length):
    Kinv = kinv_ref[:]                    # resident for all `length` iters
    q = q_ref[:]
    lb, ub = lb_ref[:], ub_ref[:]
    rho, rhoi = rho_ref[:], rhoi_ref[:]   # ρ (0 outside box), 1/ρ (0 outside)

    def body(_, carry):
        x, z, y = carry
        # y ≡ 0 and ρ ≡ 0 outside the box, so the full-layout rhs needs no
        # mask: rhs = σx − q + ρz − y
        rhs = sigma * x - q + rho * z - y
        x_t = _dot(rhs, Kinv)             # K⁻¹ is symmetric — row-vector form
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_rel = alpha * x_t + (1.0 - alpha) * z
        z_un = z_rel + y * rhoi
        z_n = jnp.clip(z_un, lb, ub)      # ±BIG outside the box
        y_n = rho * (z_un - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(
        0, length, body, (x_ref[:], z_ref[:], y_ref[:]))
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


def admm_segment(Kinv_p, q_f, lb_f, ub_f, rho_f, rhoi_f, x_f, z_f, y_f,
                 *, sigma: float, alpha: float, length: int):
    """Run ``length`` ADMM iterations with K⁻¹ resident in VMEM.

    All operands are single-element, full-layout and lane-padded:
    ``Kinv_p`` is [P, P], the vectors [1, P] (P = 128 for the stock nU=120).
    Returns the updated ``(x, z, y)``.  Batch with ``jax.vmap``.
    """
    P = Kinv_p.shape[-1]
    vec = jax.ShapeDtypeStruct((1, P), Kinv_p.dtype)
    kernel = functools.partial(_segment_kernel, sigma=float(sigma),
                               alpha=float(alpha), length=int(length))
    return pl.pallas_call(
        kernel,
        out_shape=(vec, vec, vec),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=_interpret(),
    )(Kinv_p, q_f, lb_f, ub_f, rho_f, rhoi_f, x_f, z_f, y_f)


def _segment_group_kernel(kinv_ref, q_ref, lb_ref, ub_ref, rho_ref,
                          rhoi_ref, x_ref, z_ref, y_ref,
                          xo_ref, zo_ref, yo_ref, *, sigma, alpha, length):
    """G scenarios per grid step: K⁻¹s [G, P, P] resident in VMEM, iterate
    vectors as [G, P] blocks. The per-scenario x ← K⁻¹rhs stays a distinct
    [1, P]@[P, P] dot (each scenario has its own K⁻¹), but G of them issue
    back-to-back per iteration — amortising grid-step and loop overheads —
    and every elementwise update runs on native [8, 128] VPU tiles instead
    of [1, 128] slivers."""
    Kinv = kinv_ref[:]                    # [G, P, P]
    G = Kinv.shape[0]
    q = q_ref[:]
    lb, ub = lb_ref[:], ub_ref[:]
    rho, rhoi = rho_ref[:], rhoi_ref[:]

    def body(_, carry):
        x, z, y = carry                   # [G, P]
        rhs = sigma * x - q + rho * z - y
        x_t = jnp.concatenate(
            [_dot(rhs[g:g + 1, :], Kinv[g]) for g in range(G)], axis=0)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_rel = alpha * x_t + (1.0 - alpha) * z
        z_un = z_rel + y * rhoi
        z_n = jnp.clip(z_un, lb, ub)
        y_n = rho * (z_un - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(
        0, length, body, (x_ref[:], z_ref[:], y_ref[:]))
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


def admm_segment_grouped(Kinv_b, q_b, lb_b, ub_b, rho_b, rhoi_b,
                         x_b, z_b, y_b, *, sigma: float, alpha: float,
                         length: int, group: int = 8):
    """Batched ADMM segment, ``group`` scenarios per grid program.

    Operands carry a leading batch axis B (divisible by ``group``):
    ``Kinv_b`` is [B, P, P], vectors [B, P]. The batch is reshaped to
    [B/G, G, ...] and G becomes an in-kernel block dimension — the
    throughput counterpart of the vmapped single-scenario kernel (which
    makes every scenario its own grid step). Returns updated (x, z, y)
    shaped [B, P].
    """
    B, P = Kinv_b.shape[0], Kinv_b.shape[-1]
    if B % group:
        raise ValueError(f"batch {B} not divisible by group {group}")
    n_g = B // group
    km = Kinv_b.reshape(n_g, group, P, P)
    vecs = [v.reshape(n_g, group, P)
            for v in (q_b, lb_b, ub_b, rho_b, rhoi_b, x_b, z_b, y_b)]
    vec = jax.ShapeDtypeStruct((group, P), Kinv_b.dtype)
    kernel = functools.partial(_segment_group_kernel, sigma=float(sigma),
                               alpha=float(alpha), length=int(length))
    grid_call = pl.pallas_call(
        kernel,
        out_shape=(vec, vec, vec),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=_interpret(),
    )
    x, z, y = jax.vmap(grid_call)(km, *vecs)
    return (x.reshape(B, P), z.reshape(B, P), y.reshape(B, P))


# --------------------------------------------------------------------------
# 2. fused Woodbury ρ-refresh + Newton–Schulz (with in-kernel GJ inverse)
# --------------------------------------------------------------------------

def _woodbury_kernel(kinv_ref, h_ref, dcol_ref, rhocol_ref, out_ref,
                     *, box0, n_box, sigma, n_ns):
    """All block embeds/extracts are expressed as matmuls against iota-built
    selection matrices — Mosaic has no lowering for `dynamic_update_slice`
    (nor lane-dim slicing at unaligned offsets), and `box0`/`n_box` are
    trace-time constants anyway, so [32,128]-shaped 0/1 selectors on the MXU
    cost nothing and always lower."""
    dt_ = kinv_ref.dtype
    Kinv = kinv_ref[:]
    P = Kinv.shape[-1]
    gj_rows = max(8, ((n_box + 7) // 8) * 8)
    # GJ buffer holds [M | I] side by side: 2·n_box lanes, padded up to a
    # whole number of 128-lane tiles (1 tile for the stock n_box=24; 2 for
    # the joint-limits config's n_box=120 → a [120, 256] VMEM buffer).
    W = max(LANE, ((2 * n_box + LANE - 1) // LANE) * LANE)

    # Row selector Pr [gj_rows, P]: Pr[i, box0+i] = 1 for i < n_box, and its
    # transpose-shaped column selector Pc [P, W]: Pc[box0+j, j] = 1.
    r_rp = jax.lax.broadcasted_iota(jnp.int32, (gj_rows, P), 0)
    c_rp = jax.lax.broadcasted_iota(jnp.int32, (gj_rows, P), 1)
    Pr = ((c_rp - box0 == r_rp) & (r_rp < n_box)).astype(dt_)
    r_pl = jax.lax.broadcasted_iota(jnp.int32, (P, W), 0)
    c_pl = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
    Pc = ((r_pl - box0 == c_pl) & (c_pl < n_box)).astype(dt_)

    # --- capacitance M = I + diag(d_box) · K⁻¹[box, box], laid in the
    # top-left of a [gj_rows, W] Gauss-Jordan buffer [M | I] ---------------
    S_pad = _dot(_dot(Pr, Kinv), Pc)           # K⁻¹[box,box] at top-left
    dblk = _dot(Pr, dcol_ref[:])               # [gj_rows, 1]
    ids_r = jax.lax.broadcasted_iota(jnp.int32, (gj_rows, W), 0)
    ids_c = jax.lax.broadcasted_iota(jnp.int32, (gj_rows, W), 1)
    eye_l = ((ids_r == ids_c) & (ids_r < n_box)).astype(dt_)
    eye_r = ((ids_c - n_box == ids_r) & (ids_r < n_box)).astype(dt_)
    buf = eye_l + dblk * S_pad + eye_r

    # --- Gauss-Jordan [M | I] on the [gj_rows, W] VMEM buffer -------------
    # No pivoting: M is generically well-pivoted after equilibration and the
    # Newton–Schulz pass below squares away pivot noise (see
    # condensed._gj_inverse). Rows ≥ n_box stay identically zero.
    def gj_step(i, A):
        rowmask = ids_r == i
        colmask = ids_c == i
        piv = jnp.sum(jnp.where(rowmask & colmask, A, 0.0))
        piv = jnp.where(jnp.abs(piv) < 1e-12,
                        jnp.where(piv < 0, -1e-12, 1e-12), piv)
        row = jnp.sum(jnp.where(rowmask, A, 0.0), axis=0, keepdims=True) / piv
        colv = jnp.sum(jnp.where(colmask, A, 0.0), axis=1, keepdims=True)
        A = A - colv * row
        return jnp.where(rowmask, row, A)

    buf = jax.lax.fori_loop(0, n_box, gj_step, buf)

    # --- Woodbury: Knew = K⁻¹ − K⁻¹ (E · diag(d) K⁻¹), E = embed(M⁻¹) -----
    # E = Q · buf · Rm picks M⁻¹ out of buf columns [n_box, 2·n_box) and
    # embeds it at (box0, box0): Q[box0+i, i] = 1, Rm[n_box+j, box0+j] = 1.
    r_pr = jax.lax.broadcasted_iota(jnp.int32, (P, gj_rows), 0)
    c_pr = jax.lax.broadcasted_iota(jnp.int32, (P, gj_rows), 1)
    Q = ((r_pr - box0 == c_pr) & (c_pr < n_box)).astype(dt_)
    r_lp = jax.lax.broadcasted_iota(jnp.int32, (W, P), 0)
    c_lp = jax.lax.broadcasted_iota(jnp.int32, (W, P), 1)
    Rm = ((r_lp - n_box == c_lp - box0)
          & (c_lp >= box0) & (c_lp < box0 + n_box)).astype(dt_)
    E = _dot(_dot(Q, buf), Rm)
    B = dcol_ref[:] * Kinv                 # rows outside the box are zero
    Knew = Kinv - _dot(Kinv, _dot(E, B))

    # --- Newton–Schulz against K built from the *current* H ---------------
    ids_rp = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    ids_cp = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    eye = (ids_rp == ids_cp).astype(dt_)
    K = h_ref[:] + sigma * eye + eye * rhocol_ref[:]
    for _ in range(n_ns):
        Knew = _dot(Knew, 2.0 * eye - _dot(K, Knew))
    out_ref[:] = 0.5 * (Knew + Knew.T)


def woodbury_ns(Kinv_p, H_p, d_col, rho_new_col, *, box0: int, n_box: int,
                sigma: float, n_ns: int = 2):
    """(K(ρ_new))⁻¹ from (K(ρ_old))⁻¹ in one fused kernel.

    ``Kinv_p``/``H_p`` are lane-padded [P, P]; ``d_col`` = (ρ_new − ρ_old)
    and ``rho_new_col`` are full-layout column vectors [P, 1] (zero outside
    the box entries).  Batch with ``jax.vmap``.
    """
    P = Kinv_p.shape[-1]
    if box0 < 0 or n_box < 1 or box0 + n_box > P:
        raise ValueError(
            f"box [{box0}, {box0 + n_box}) invalid for padded size {P} "
            f"(need box0 >= 0, n_box >= 1, box0 + n_box <= P)")
    kernel = functools.partial(_woodbury_kernel, box0=int(box0),
                               n_box=int(n_box), sigma=float(sigma),
                               n_ns=int(n_ns))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, P), Kinv_p.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(Kinv_p, H_p, d_col, rho_new_col)
