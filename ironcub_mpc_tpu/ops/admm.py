"""Batched dense ADMM solver for convex QPs — the OSQP algorithm, TPU-native.

Solves  min ½xᵀPx + qᵀx  s.t.  l ≤ Ax ≤ u  with the operator-splitting
iteration of OSQP (Stellato et al. 2020), which is what the reference uses
through OsqpEigen (IMPCProblem.cpp:140-298): Ruiz equilibration, σ-regularised
reduced KKT system, over-relaxed ADMM with per-constraint ρ (equality rows get
ρ·10³), warm starting, solution polishing on the detected active set, and
primal/dual infeasibility certificates.

TPU-first design decisions (vs. translating OSQP's C):
- **Dense + batched.** The MPC QP is 588×512; a dense formulation keeps every
  product on the MXU and makes the whole solver a single fused XLA program.
  One scenario is one vmap lane: `jax.vmap(solve_prepared)` scales to
  thousands of concurrent solves per chip with zero code change.
- **Factorise once per solve, iterate cheap.** K = P + σI + AᵀρA is formed
  with two matmuls and Cholesky-factorised once; each ADMM iteration is two
  triangular solves + two matvecs (all batched GEMMs under vmap).
- **Fixed iteration count via `lax.scan`** so batched lanes stay in lockstep
  (no data-dependent shapes); residuals and status are computed alongside and
  reported per lane. An early-exit `lax.while_loop` variant is provided for
  the single-solve real-time path.
- **f32 by default** with equilibration doing the conditioning work OSQP
  normally leans on f64 for; pass f64 arrays to run in double (CPU tests).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# status codes
UNSOLVED = 0
SOLVED = 1
SOLVED_INACCURATE = 2
PRIMAL_INFEASIBLE = 3
DUAL_INFEASIBLE = 4
MAX_ITER_REACHED = 5

# Canonical vmap axis name for the batch-level carried-inverse guard (see
# ADMMSettings.guard_axis): vmap the batched tick with
# ``jax.vmap(f, axis_name=BATCH_GUARD_AXIS)`` and set
# ``guard_axis=BATCH_GUARD_AXIS`` in the settings.
BATCH_GUARD_AXIS = "kinv_guard_batch"


@dataclasses.dataclass(frozen=True)
class ADMMSettings:
    """Solver settings; defaults follow OSQP's (osqp.org/docs, v0.6)."""

    rho: float = 0.1
    rho_eq_scale: float = 1e3       # equality rows use rho * rho_eq_scale
    sigma: float = 1e-6
    alpha: float = 1.6
    max_iter: int = 250
    # staged adaptive rho (OSQP `adaptive_rho`): at these iteration counts the
    # scaled residual ratio re-tunes rho and K is re-factorised. Static tuple
    # so batched lanes stay in lockstep (each lane gets its own rho value).
    rho_update_iters: tuple = (25, 75, 150)
    adaptive_rho_tolerance: float = 5.0
    rho_min: float = 1e-6
    rho_max: float = 1e6
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    eps_pinf: float = 1e-4
    eps_dinf: float = 1e-4
    scaling_iters: int = 10
    polish: bool = True
    delta_polish: float = 1e-6
    polish_refine_iters: int = 3
    eq_tol: float = 1e-9            # l==u detection tolerance
    inf_bound: float = 1e20         # OSQP_INFTY analogue
    # condensed fast path: carry (K(ρ))⁻¹ across 200 Hz ticks and refresh it
    # with Woodbury + Newton–Schulz instead of re-factorising (the batched
    # Cholesky is the single most expensive kernel of the tick on TPU).
    kinv_carry: bool = True
    # Newton–Schulz polish depth after each Woodbury refresh of the carried
    # inverse (each step = two nU³ matmuls; quadratic convergence squares
    # the inverse residual per step). ns_steps applies to the iteration-
    # path refreshes (initial carry refresh + adaptive-ρ updates) — one
    # step turns the ~1e-3 inverse residual of a 5 ms relinearisation
    # drift into ~1e-6, factorisation grade, and kinv_guard refactorises
    # the (rare) tick whose drift is too large for one step. Minimum 1:
    # with ns_steps=0 the raw-f32 Woodbury error stalls the dual residual
    # when adaptive ρ walks toward rho_min (measured: MAX_ITER on a plain
    # hover tick) — the NS pass is what makes the refresh
    # factorisation-grade, not an optional polish.
    # polish_ns_steps=0 skips NS on the Schur-polish operator entirely:
    # the polish_refine_iters iterations against the exact operator absorb
    # an unpolished inverse, and the polish acceptance check (only take a
    # polish that lowers the residuals) makes it safe by construction.
    # Measured at batch 512 on v5e: (1,0) is ~5-7% more throughput than
    # the conservative (2,2) at identical solved_frac/residuals.
    ns_steps: int = 1
    polish_ns_steps: int = 0
    # probe-gated refresh skip: when > 0, the carried-inverse refresh
    # (Woodbury + NS on the latency path, the drift-absorbing NS polish on
    # the guarded batched path) is skipped entirely on ticks where the
    # carried inverse's probe residual against the CURRENT K(H, ρ) is
    # already <= this tolerance. The probe residual is a LOWER bound on
    # the true inverse residual (three fixed probe vectors, one supported
    # entirely on the box coordinates so ρ-jump-concentrated error cannot
    # hide) — error aligned with the probes' joint null space can pass the
    # gate, in which case the cost is extra ADMM iterations, never a wrong
    # answer: solver status comes from true residuals against H and
    # kinv_guard re-factorises above 0.1. NS squares the residual whenever
    # it does run, so the carried residual oscillates in [tol², tol]
    # instead of being re-polished to factorisation grade every tick.
    # 0.0 (default) preserves the refresh-every-tick behavior. Must stay
    # well under the kinv_guard recovery threshold (0.1). Under vmap this
    # gate needs ``guard_axis`` (like kinv_guard) to stay a real branch.
    # Measured on v5e at batch 256, tol=0.02 (tools/bench_ns_skip.py):
    # 66.0k -> 68.6k solves/s (+3.9%) at solved_frac 1.000, unchanged
    # under per-tick momentum jitter emulating relinearisation drift.
    ns_skip_tol: float = 0.0
    # verify the refreshed carried inverse each tick and re-factorise via
    # lax.cond when Newton–Schulz left the contraction basin (large state
    # jump / NaN carry). Essentially free on the batch-1 real-time path
    # (the Cholesky branch only executes on a bad tick), but under plain
    # vmap cond lowers to select-with-both-branches, so large batched
    # sweeps pay the Cholesky every tick (~2x throughput, 42.7k → 21.3k
    # solves/s at batch 512 on v5e). For batched sweeps set ``guard_axis``
    # below instead of disabling the guard: the predicate is then reduced
    # across the batch, the cond stays a genuine branch under vmap, and the
    # whole sweep pays the refactorisation only on ticks where at least one
    # lane actually went bad. The carried warm start / ρ are sanitized
    # against non-finite values either way.
    kinv_guard: bool = True
    # batch-level kinv_guard: name of the surrounding ``jax.vmap``
    # ``axis_name`` (use :data:`BATCH_GUARD_AXIS` and
    # ``jax.vmap(f, axis_name=BATCH_GUARD_AXIS)``). When set, the per-lane
    # bad-inverse flags are ``lax.psum``-reduced over that axis; vmap's
    # collective batching rule makes the reduced predicate unbatched, so
    # the recovery ``lax.cond`` survives vmap as a real branch — good
    # ticks cost one psum, bad ticks pay one batched Cholesky with a
    # per-lane select. Must match the vmap axis_name or tracing fails;
    # leave None on the unbatched real-time path.
    guard_axis: str | None = None
    # ignore the carried (K⁻¹, ρ) for THIS solve — fresh factorisation at
    # the setup ρ — while still writing the fresh solver state back into
    # the carry (kinv_carry semantics unchanged). This is the
    # failure-recovery retry knob (parallel/monte_carlo.recovery_settings):
    # kinv_carry=False would also ignore the carry but discards the fresh
    # factorisation afterwards, so a persistently bad carried inverse
    # would re-trigger the retry every tick.
    kinv_reset: bool = False
    # early segment exit (CONDENSED solver path; the full-space batched
    # solver keeps fixed iterations — its batch-1 early-exit variant is
    # solve_adaptive): when > 0, each fixed-length
    # ADMM segment runs as chunks of this many iterations, and between
    # chunks the OSQP termination criterion is evaluated — once EVERY lane
    # satisfies it, the remaining chunks are skipped through a real
    # lax.cond branch (the same psum-over-guard_axis mechanism as
    # kinv_guard, so it survives vmap; unbatched it is a plain branch).
    # This is the batched counterpart of OSQP's check-every-25 termination
    # (IMPCProblem.cpp:279-297 semantics): converged lanes still iterate
    # until the LAST lane converges (lockstep), but the whole batch stops
    # paying iterations the slowest lane no longer needs. A skipped-chunk
    # check costs ~1 matvec vs `term_check_every` K⁻¹ matvecs for the
    # chunk. 0 (default) preserves fixed-iteration behavior. Under vmap
    # set ``guard_axis`` (same trap as kinv_guard: a per-lane cond lowers
    # to both-branches). Adaptive-ρ updates at rho_update_iters marks are
    # additionally masked off for already-converged lanes (OSQP never
    # re-tunes ρ after termination).
    term_check_every: int = 0
    # fused Pallas kernels for the ADMM segment + Woodbury refresh
    # (ops/pallas_solve.py): "auto" = on TPU backends, "on" = always
    # (interpret mode off-TPU; for tests), "off" = pure-JAX path.
    # Measured on v5e (tools/profile_solve_parts.py, bench_segment_kernels,
    # bench_joint_limits_latency): the Pallas kernels (K⁻¹ resident in
    # VMEM, one dispatch per segment) win the LATENCY path — batch-1
    # sequential tick 0.31 ms stock, and 0.391 vs 0.516 ms pure-JAX on the
    # joint-limits config (n_box=120) — while the pure-JAX path (batched
    # GEMMs; XLA pins the batched K⁻¹ in VMEM itself) wins THROUGHPUT at
    # batch 512 (42.1k vs 24.5k solves/s; the isolated XLA segment is 48x
    # faster than the best grouped kernel because per-scenario K⁻¹ mat-vecs
    # can't widen onto the MXU). Set "off" explicitly for large batched
    # sweeps; "auto" suits the single-robot real-time loop.
    pallas_mode: str = "auto"

    def __post_init__(self):
        # ns_steps=0 is a verified-failing configuration (raw-f32 Woodbury
        # error stalls the dual residual; see the ns_steps docstring above):
        # fail fast instead of degrading at runtime.
        if self.ns_steps < 1:
            raise ValueError(f"ns_steps must be >= 1, got {self.ns_steps}")
        if self.polish_ns_steps < 0:
            raise ValueError(
                f"polish_ns_steps must be >= 0, got {self.polish_ns_steps}")
        if not 0.0 <= self.ns_skip_tol < 0.1:
            raise ValueError(
                "ns_skip_tol must be in [0, 0.1) — 0.1 is the kinv_guard "
                f"recovery threshold; got {self.ns_skip_tol}")
        if self.term_check_every < 0:
            raise ValueError("term_check_every must be >= 0, got "
                             f"{self.term_check_every}")


def pallas_enabled(settings: "ADMMSettings") -> bool:
    if settings.pallas_mode == "on":
        return True
    if settings.pallas_mode == "off":
        return False
    return jax.default_backend() == "tpu"


class Scaling(NamedTuple):
    """Ruiz equilibration result: x̄ = D⁻¹x, scaled cost ½x̄ᵀP̄x̄ + c q̄ᵀx̄."""

    d: jax.Array  # [n] primal scaling
    e: jax.Array  # [m] dual scaling
    c: jax.Array  # [] cost scaling


class QPData(NamedTuple):
    """Scaled problem data + factorisation, ready to iterate."""

    P: jax.Array        # [n, n] scaled
    q: jax.Array        # [n] scaled
    A: jax.Array        # [m, n] scaled
    l: jax.Array        # [m] scaled
    u: jax.Array        # [m] scaled
    rho_vec: jax.Array  # [m] per-constraint rho
    chol_K: jax.Array   # [n, n] lower Cholesky of P + σI + AᵀρA
    scaling: Scaling


class QPSolution(NamedTuple):
    x: jax.Array        # [n] primal solution (unscaled)
    y: jax.Array        # [m] dual solution (unscaled)
    z: jax.Array        # [m] constraint activation Ax (unscaled)
    status: jax.Array   # [] int32 status code
    iterations: jax.Array
    pri_res: jax.Array  # [] final unscaled primal residual (inf-norm)
    dua_res: jax.Array  # [] final unscaled dual residual (inf-norm)


def _inf_norm_cols(M):
    return jnp.max(jnp.abs(M), axis=-2)


def _inf_norm_rows(M):
    return jnp.max(jnp.abs(M), axis=-1)


def _safe_inv_sqrt(v, lo=1e-8, hi=1e8):
    """1/sqrt with OSQP's zero-row rule: an (almost) zero norm means the
    row/column carries no data — its scale stays exactly 1 so it cannot
    compound across Ruiz iterations (all-zero constraint rows are legal; the
    reference declares 20 such throttle rows, constraintsVSMPC.cpp:283)."""
    inv = 1.0 / jnp.sqrt(jnp.clip(v, lo, hi))
    return jnp.where(v < lo, jnp.ones_like(inv), inv)


def ruiz_equilibration(P, q, A, l, u, iters: int = 10):
    """Modified Ruiz equilibration of [[P, Aᵀ], [A, 0]] + cost scaling.

    Returns scaled (P̄, q̄, Ā, l̄, ū) and the :class:`Scaling`. Mirrors
    OSQP's `scale_data`: per-iteration inf-norm column equilibration of the
    stacked KKT matrix, then cost normalisation by max(mean col-norm of P̄,
    ‖q̄‖∞).
    """
    n = P.shape[-1]
    m = A.shape[-2]
    dt = P.dtype
    D = jnp.ones((n,), dt)
    E = jnp.ones((m,), dt)
    c = jnp.asarray(1.0, dt)

    def body(carry, _):
        P, q, A, l, u, D, E, c = carry
        d = _safe_inv_sqrt(jnp.maximum(_inf_norm_cols(P), _inf_norm_cols(A)))
        e = _safe_inv_sqrt(_inf_norm_rows(A))
        P = d[:, None] * P * d[None, :]
        q = d * q
        A = e[:, None] * A * d[None, :]
        l = e * l
        u = e * u
        D = D * d
        E = E * e
        # cost scaling
        norm_q = jnp.max(jnp.abs(q))
        mean_col_P = jnp.mean(_inf_norm_cols(P))
        g = 1.0 / jnp.clip(jnp.maximum(mean_col_P, norm_q), 1e-8, 1e8)
        P = g * P
        q = g * q
        c = c * g
        return (P, q, A, l, u, D, E, c), None

    (P, q, A, l, u, D, E, c), _ = jax.lax.scan(
        body, (P, q, A, l, u, D, E, c), None, length=iters)
    return P, q, A, l, u, Scaling(D, E, c)


def rho_vector(l, u, settings: ADMMSettings, rho_scalar=None):
    """Per-constraint rho: equality rows (l==u) get rho * rho_eq_scale.

    Loose rows (l=-inf, u=+inf) get rho * 1e-6 as in OSQP.
    """
    rho0 = settings.rho if rho_scalar is None else rho_scalar
    eq = (u - l) < settings.eq_tol
    loose = (l < -settings.inf_bound * 0.9) & (u > settings.inf_bound * 0.9)
    rho = jnp.full(l.shape, 1.0, l.dtype) * rho0
    rho = jnp.where(loose, rho * 1e-6, rho)
    rho = jnp.where(eq, rho * settings.rho_eq_scale, rho)
    return rho


def factorize(P, A, rho_vec, sigma):
    """Cholesky of the reduced KKT matrix K = P + σI + AᵀρA."""
    K = P + sigma * jnp.eye(P.shape[-1], dtype=P.dtype)
    K = K + A.T @ (rho_vec[:, None] * A)
    return jnp.linalg.cholesky(K)


def prepare(P, q, A, l, u, settings: ADMMSettings = ADMMSettings(),
            scaling: Optional[Scaling] = None) -> QPData:
    """Scale the problem and factorise the reduced KKT matrix.

    If ``scaling`` is given it is reused (OSQP computes equilibration once at
    setup and keeps it across `update_A`/`update_bounds` calls; the MPC does
    the same across ticks so the constant Hessian keeps a constant scaling).
    """
    if scaling is None:
        P, q, A, l, u, scaling = ruiz_equilibration(
            P, q, A, l, u, settings.scaling_iters)
    else:
        d, e, c = scaling
        P = c * d[:, None] * P * d[None, :]
        q = c * d * q
        A = e[:, None] * A * d[None, :]
        l = e * l
        u = e * u
    rho_vec = rho_vector(l, u, settings)
    chol_K = factorize(P, A, rho_vec, settings.sigma)
    return QPData(P, q, A, l, u, rho_vec, chol_K, scaling)


def _cho_solve(chol_K, b):
    t = jax.lax.linalg.triangular_solve(
        chol_K, b[..., None], left_side=True, lower=True)
    s = jax.lax.linalg.triangular_solve(
        chol_K, t, left_side=True, lower=True, transpose_a=True)
    return s[..., 0]


def _iterate(data: QPData, settings: ADMMSettings, x, z, y):
    """One over-relaxed ADMM iteration (OSQP alg. 1)."""
    P, q, A, l, u, rho, chol_K = (
        data.P, data.q, data.A, data.l, data.u, data.rho_vec, data.chol_K)
    sigma, alpha = settings.sigma, settings.alpha
    rhs = sigma * x - q + A.T @ (rho * z - y)
    x_t = _cho_solve(chol_K, rhs)
    z_t = A @ x_t
    x_new = alpha * x_t + (1.0 - alpha) * x
    z_relax = alpha * z_t + (1.0 - alpha) * z
    z_unproj = z_relax + y / rho
    z_new = jnp.clip(z_unproj, l, u)
    y_new = rho * (z_unproj - z_new)
    return x_new, z_new, y_new


def _residuals(data: QPData, x, z, y):
    """Unscaled primal/dual residual inf-norms + scale factors for eps."""
    d, e, c = data.scaling
    Ax = data.A @ x
    pri = jnp.max(jnp.abs((Ax - z) / e))
    Px = data.P @ x
    Aty = data.A.T @ y
    dua = jnp.max(jnp.abs((Px + data.q + Aty) / d)) / c
    # relative scalings (unscaled norms)
    pri_scale = jnp.maximum(jnp.max(jnp.abs(Ax / e)), jnp.max(jnp.abs(z / e)))
    dua_scale = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Px / d)), jnp.max(jnp.abs(Aty / d))),
        jnp.max(jnp.abs(data.q / d))) / c
    return pri, dua, pri_scale, dua_scale


def _infeasibility_certificates(data: QPData, dx, dy, settings: ADMMSettings):
    """OSQP primal/dual infeasibility checks on the iterate deltas."""
    d, e, c = data.scaling
    # primal infeasibility: dy is a certificate
    dy_un = dy * e / c
    norm_dy = jnp.max(jnp.abs(dy_un))
    eps_p = settings.eps_pinf * jnp.maximum(norm_dy, 1e-30)
    Atdy = jnp.max(jnp.abs((data.A.T @ dy) / d)) / c
    u_un, l_un = data.u / e, data.l / e
    support = (jnp.sum(u_un * jnp.maximum(dy_un, 0.0))
               + jnp.sum(l_un * jnp.minimum(dy_un, 0.0)))
    pinf = (Atdy <= eps_p) & (support <= -eps_p) & (norm_dy > 1e-30)
    # dual infeasibility: dx is a certificate
    dx_un = dx * d
    norm_dx = jnp.max(jnp.abs(dx_un))
    eps_d = settings.eps_dinf * jnp.maximum(norm_dx, 1e-30)
    Pdx = jnp.max(jnp.abs((data.P @ dx) / d)) / c
    qdx = jnp.sum(data.q * dx) / c
    Adx = (data.A @ dx) / e
    big = settings.inf_bound * 0.9
    upper_ok = jnp.all(jnp.where(data.u / e < big, Adx <= eps_d, True))
    lower_ok = jnp.all(jnp.where(data.l / e > -big, Adx >= -eps_d, True))
    dinf = ((Pdx <= eps_d) & (qdx <= -eps_d) & upper_ok & lower_ok
            & (norm_dx > 1e-30))
    return pinf, dinf


def polish(data: QPData, settings: ADMMSettings, x, z, y):
    """Active-set polish (OSQP `polish.c`), batch-safe via row masking.

    Builds the regularised KKT system on the active rows (y<0 → lower active,
    y>0 → upper active; equality rows always active) with inactive rows
    replaced by δ·ν=0 equations, then a fixed number of iterative-refinement
    steps. Falls back to the ADMM iterate when polishing increases the
    residuals.
    """
    n = data.P.shape[-1]
    m = data.A.shape[-2]
    dt = data.P.dtype
    delta = jnp.asarray(settings.delta_polish, dt)
    eq = (data.u - data.l) < settings.eq_tol
    low_active = (y < 0.0) | eq
    up_active = (y > 0.0) | eq
    active = low_active | up_active
    b_act = jnp.where(y < 0.0, data.l, data.u)
    b_act = jnp.where(eq, data.u, b_act)
    A_masked = jnp.where(active[:, None], data.A, 0.0)
    rhs = jnp.concatenate([-data.q, jnp.where(active, b_act, 0.0)])

    K = jnp.zeros((n + m, n + m), dt)
    K = K.at[:n, :n].set(data.P + delta * jnp.eye(n, dtype=dt))
    K = K.at[:n, n:].set(A_masked.T)
    K = K.at[n:, :n].set(A_masked)
    K = K.at[n:, n:].set(-delta * jnp.eye(m, dtype=dt))

    lu, piv = jax.scipy.linalg.lu_factor(K)
    sol = jax.scipy.linalg.lu_solve((lu, piv), rhs)

    def refine(sol, _):
        # iterative refinement against the UNregularised KKT operator
        r_top = -data.q - (data.P @ sol[:n] + A_masked.T @ sol[n:])
        r_bot = jnp.where(active, b_act, 0.0) - A_masked @ sol[:n]
        dsol = jax.scipy.linalg.lu_solve((lu, piv), jnp.concatenate([r_top, r_bot]))
        return sol + dsol, None

    sol, _ = jax.lax.scan(refine, sol, None, length=settings.polish_refine_iters)
    x_p = sol[:n]
    y_p = jnp.where(active, sol[n:], 0.0)
    z_p = jnp.clip(data.A @ x_p, data.l, data.u)

    pri0, dua0, _, _ = _residuals(data, x, z, y)
    pri1, dua1, _, _ = _residuals(data, x_p, z_p, y_p)
    better = (pri1 + dua1) < (pri0 + dua0)
    pick = lambda a, b: jnp.where(better, a, b)
    return pick(x_p, x), pick(z_p, z), pick(y_p, y)


def solve_prepared(data: QPData, settings: ADMMSettings = ADMMSettings(),
                   x0=None, y0=None) -> QPSolution:
    """Run ADMM on prepared data with a fixed iteration count (`lax.scan`).

    Warm-start vectors ``x0, y0`` are in *unscaled* units (as stored across
    MPC ticks); pass None for cold start.
    """
    n = data.P.shape[-1]
    m = data.A.shape[-2]
    dt = data.P.dtype
    d, e, c = data.scaling
    x = jnp.zeros((n,), dt) if x0 is None else x0 / d
    y = jnp.zeros((m,), dt) if y0 is None else y0 * c / e
    # warm starts are carried across 200 Hz ticks even when a solve fails —
    # sanitize so one non-finite iterate cannot poison every later tick
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    y = jnp.where(jnp.isfinite(y), y, 0.0)
    z = jnp.clip(data.A @ x, data.l, data.u)

    def segment(data_k, x, z, y, pinf, dinf, length):
        def body(carry, _):
            x, z, y, pinf, dinf = carry
            x_n, z_n, y_n = _iterate(data_k, settings, x, z, y)
            p, dn = _infeasibility_certificates(
                data_k, x_n - x, y_n - y, settings)
            return (x_n, z_n, y_n, pinf | p, dinf | dn), None
        (x, z, y, pinf, dinf), _ = jax.lax.scan(
            body, (x, z, y, pinf, dinf), None, length=length)
        return x, z, y, pinf, dinf

    # staged adaptive rho (OSQP adaption rule, refactorising K at static
    # iteration marks so vmapped lanes stay in lockstep)
    marks = [i for i in settings.rho_update_iters if i < settings.max_iter]
    bounds = [0] + marks + [settings.max_iter]
    pinf = jnp.asarray(False)
    dinf = jnp.asarray(False)
    rho_scalar = jnp.asarray(settings.rho, dt)
    data_k = data
    for seg_idx in range(len(bounds) - 1):
        length = bounds[seg_idx + 1] - bounds[seg_idx]
        x, z, y, pinf, dinf = segment(data_k, x, z, y, pinf, dinf, length)
        if seg_idx < len(bounds) - 2:
            pri, dua, pri_s, dua_s = _residuals(data_k, x, z, y)
            ratio = jnp.sqrt((pri / jnp.maximum(pri_s, 1e-12))
                             / jnp.maximum(dua / jnp.maximum(dua_s, 1e-12), 1e-12))
            new_rho = jnp.clip(rho_scalar * ratio, settings.rho_min,
                               settings.rho_max)
            tol = settings.adaptive_rho_tolerance
            update = (ratio > tol) | (ratio < 1.0 / tol)
            rho_scalar = jnp.where(update, new_rho, rho_scalar)
            rho_vec = rho_vector(data.l, data.u, settings, rho_scalar)
            chol = factorize(data.P, data.A, rho_vec, settings.sigma)
            data_k = data._replace(rho_vec=rho_vec, chol_K=chol)

    if settings.polish:
        x, z, y = polish(data, settings, x, z, y)

    pri, dua, pri_s, dua_s = _residuals(data, x, z, y)
    eps_pri = settings.eps_abs + settings.eps_rel * pri_s
    eps_dua = settings.eps_abs + settings.eps_rel * dua_s
    solved = (pri <= eps_pri) & (dua <= eps_dua)
    inacc = (pri <= 10.0 * eps_pri) & (dua <= 10.0 * eps_dua)
    status = jnp.where(
        pinf, PRIMAL_INFEASIBLE,
        jnp.where(dinf, DUAL_INFEASIBLE,
                  jnp.where(solved, SOLVED,
                            jnp.where(inacc, SOLVED_INACCURATE, MAX_ITER_REACHED))))
    return QPSolution(
        x=x * d, y=y * e / c, z=z / e,
        status=status.astype(jnp.int32),
        iterations=jnp.asarray(settings.max_iter, jnp.int32),
        pri_res=pri, dua_res=dua)


def solve(P, q, A, l, u, settings: ADMMSettings = ADMMSettings(),
          x0=None, y0=None, scaling: Optional[Scaling] = None) -> QPSolution:
    """Convenience one-shot: prepare + solve. vmap-able end to end."""
    data = prepare(P, q, A, l, u, settings, scaling)
    return solve_prepared(data, settings, x0, y0)


def solve_adaptive(P, q, A, l, u, settings: ADMMSettings = ADMMSettings(),
                   x0=None, y0=None, scaling: Optional[Scaling] = None,
                   check_every: int = 25) -> QPSolution:
    """Early-exit variant (`lax.while_loop`) for the real-time single-solve
    path: checks convergence every ``check_every`` iterations and stops as
    soon as the OSQP termination criterion holds."""
    data = prepare(P, q, A, l, u, settings, scaling)
    n, m = data.P.shape[-1], data.A.shape[-2]
    dt = data.P.dtype
    d, e, c = data.scaling
    x = jnp.zeros((n,), dt) if x0 is None else x0 / d
    y = jnp.zeros((m,), dt) if y0 is None else y0 * c / e
    # warm starts are carried across 200 Hz ticks even when a solve fails —
    # sanitize so one non-finite iterate cannot poison every later tick
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    y = jnp.where(jnp.isfinite(y), y, 0.0)
    z = jnp.clip(data.A @ x, data.l, data.u)

    def cond(state):
        x, z, y, rho_s, chol, it, done = state
        return (~done) & (it < settings.max_iter)

    def body(state):
        x, z, y, rho_s, chol, it, done = state
        rho_vec = rho_vector(data.l, data.u, settings, rho_s)
        data_k = data._replace(rho_vec=rho_vec, chol_K=chol)
        def inner(carry, _):
            x, z, y = carry
            return _iterate(data_k, settings, x, z, y), None
        (x, z, y), _ = jax.lax.scan(inner, (x, z, y), None, length=check_every)
        pri, dua, pri_s, dua_s = _residuals(data, x, z, y)
        done = ((pri <= settings.eps_abs + settings.eps_rel * pri_s)
                & (dua <= settings.eps_abs + settings.eps_rel * dua_s))
        # OSQP-style rho adaptation between checks
        ratio = jnp.sqrt((pri / jnp.maximum(pri_s, 1e-12))
                         / jnp.maximum(dua / jnp.maximum(dua_s, 1e-12), 1e-12))
        tol = settings.adaptive_rho_tolerance
        update = ((ratio > tol) | (ratio < 1.0 / tol)) & (~done)
        rho_new = jnp.where(
            update, jnp.clip(rho_s * ratio, settings.rho_min, settings.rho_max),
            rho_s)
        chol = jnp.where(
            update,
            factorize(data.P, data.A,
                      rho_vector(data.l, data.u, settings, rho_new),
                      settings.sigma),
            chol)
        return (x, z, y, rho_new, chol, it + check_every, done)

    x, z, y, _, _, iters, done = jax.lax.while_loop(
        cond, body,
        (x, z, y, jnp.asarray(settings.rho, dt), data.chol_K,
         jnp.asarray(0, jnp.int32), jnp.asarray(False)))

    if settings.polish:
        x, z, y = polish(data, settings, x, z, y)
    pri, dua, pri_s, dua_s = _residuals(data, x, z, y)
    solved = ((pri <= settings.eps_abs + settings.eps_rel * pri_s)
              & (dua <= settings.eps_abs + settings.eps_rel * dua_s))
    inacc = ((pri <= 10.0 * (settings.eps_abs + settings.eps_rel * pri_s))
             & (dua <= 10.0 * (settings.eps_abs + settings.eps_rel * dua_s)))
    status = jnp.where(solved, SOLVED,
                       jnp.where(inacc, SOLVED_INACCURATE, MAX_ITER_REACHED))
    return QPSolution(x=x * d, y=y * e / c, z=z / e,
                      status=status.astype(jnp.int32), iterations=iters,
                      pri_res=pri, dua_res=dua)
