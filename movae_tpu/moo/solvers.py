"""Small fixed-shape solvers for multi-objective gradient aggregation.

All solvers operate on the m×m Gramian ``G = J @ J.T`` of the per-objective
Jacobian (m = number of objectives, 2..5 in this framework) and run entirely
inside ``jax.jit`` with static shapes — the TPU-native replacement for the
reference's host-side quadprog / scipy solvers
(/root/reference/utils/torchmoo/nupgrad.py:122-126, mgda.py:245-266).

Key design points:
  * The dual-cone projection QP ``min_{mu>=0} (u+mu)^T G (u+mu)`` is solved
    *exactly* by enumerating all 2^m active sets (m<=5 -> at most 32 masked
    m×m linear solves), rather than iteratively — bitwise-deterministic,
    branch-free, and trivially vmappable over rows (UPGrad projects one row
    per objective).
  * Frank–Wolfe min-norm-point runs as a ``lax.while_loop`` with the same
    stopping rule as the reference (mgda.py:245-266).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Gramian normalizations / regularizations (mgda.py:274-367, nupgrad.py:14-34,
# 129-158)
# ---------------------------------------------------------------------------

def normalize_gramian_l2(G: Array, eps: float = 1e-20) -> Array:
    """G[i,j] / (||g_i||*||g_j||) — as if each gradient were unit-norm
    (mgda.py:274-285, nupgrad.py:14-24)."""
    norms = jnp.sqrt(jnp.clip(jnp.diag(G), min=eps))
    return G / (norms[:, None] * norms[None, :])


def normalize_gramian_loss(G: Array, losses: Array, eps: float = 1e-20) -> Array:
    """G[i,j] / (loss_i * loss_j) (mgda.py:319-341)."""
    l = jnp.clip(losses.astype(G.dtype), min=eps)
    return G / (l[:, None] * l[None, :])


def normalize_gramian_loss_plus(G: Array, losses: Array, eps: float = 1e-20) -> Array:
    """G[i,j] / (loss_i*||g_i|| * loss_j*||g_j||) (mgda.py:343-367)."""
    l = jnp.clip(losses.astype(G.dtype), min=eps)
    norms = jnp.sqrt(jnp.clip(jnp.diag(G), min=eps))
    c = l * norms
    return G / (c[:, None] * c[None, :])


def normalize_gramian_min_l2(G: Array, eps: float) -> Array:
    """Scale every gradient down to the minimum L2 norm: G <- D G D with
    D = diag(a_min / a_k) (nupgrad.py:129-158)."""
    diag = jnp.diag(G)
    norms = jnp.sqrt(jnp.clip(diag, min=eps))
    nonzero = norms > eps
    big = jnp.where(nonzero, norms, jnp.inf)
    min_norm = jnp.min(big)
    scale = jnp.where(nonzero, min_norm / norms, 0.0)
    out = G * (scale[:, None] * scale[None, :])
    return jnp.where(jnp.any(nonzero), out, jnp.zeros_like(G))


def regularize_gramian_diag(G: Array, eps: float) -> Array:
    """Add eps to the diagonal for strict positive definiteness
    (nupgrad.py:27-34)."""
    return G + jnp.eye(G.shape[0], dtype=G.dtype) * eps


def regularize_gramian_eigen(G: Array, min_eigenvalue_eps: float) -> Array:
    """Clamp eigenvalues below ``min_eigenvalue_eps`` (StableMGDA,
    mgda.py:287-317)."""
    evals, V = jnp.linalg.eigh(G)
    evals = jnp.clip(evals, min=min_eigenvalue_eps)
    return (V * evals[None, :]) @ V.T


# ---------------------------------------------------------------------------
# Frank–Wolfe min-norm point (MGDA, Sener & Koltun Alg. 2; mgda.py:221-272)
# ---------------------------------------------------------------------------

def frank_wolfe_minnorm(G: Array, epsilon: float = 1e-5,
                        max_iters: int = 250) -> Tuple[Array, Array, Array]:
    """Min-norm point in the convex hull of the gradients, from the Gramian.

    Returns ``(alpha, iters, gamma)``; stopping rule matches the reference:
    stop after the update when the step size gamma drops below epsilon.
    """
    m = G.shape[0]
    alpha0 = jnp.full((m,), 1.0 / m, dtype=G.dtype)

    def cond(carry):
        _, i, gamma = carry
        return jnp.logical_and(i < max_iters, gamma >= epsilon)

    def body(carry):
        alpha, i, _ = carry
        Ga = G @ alpha
        t = jnp.argmin(Ga)
        e_t = jax.nn.one_hot(t, m, dtype=G.dtype)
        a = alpha @ (G @ e_t)
        b = alpha @ Ga
        c = e_t @ (G @ e_t)
        gamma = jnp.where(c <= a, 1.0,
                          jnp.where(b <= a, 0.0, (b - a) / (b + c - 2.0 * a)))
        alpha = (1.0 - gamma) * alpha + gamma * e_t
        return alpha, i + 1, gamma

    alpha, iters, gamma = jax.lax.while_loop(
        cond, body, (alpha0, jnp.array(0, jnp.int32), jnp.array(jnp.inf, G.dtype))
    )
    return alpha, iters, gamma


# ---------------------------------------------------------------------------
# Exact dual-cone projection QP by active-set enumeration
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _all_masks(m: int) -> np.ndarray:
    """(2^m, m) binary matrix of all support sets."""
    masks = np.zeros((2 ** m, m), dtype=np.float32)
    for s in range(2 ** m):
        for i in range(m):
            masks[s, i] = (s >> i) & 1
    return masks


def dual_cone_project_weights(u: Array, G: Array) -> Array:
    """Exact solution of ``min_{mu >= 0} (u+mu)^T G (u+mu)``; returns
    ``w = u + mu``.

    ``w^T J`` is then the Euclidean projection of ``u^T J`` onto the dual
    cone ``{x : J x >= 0}`` of the gradient rows — the primitive behind
    UPGrad / NUPGrad / PNUPGrad / DualProj (the reference delegates to the
    quadprog active-set solver, nupgrad.py:122-126).

    KKT: for a support S (mu_S > 0), ``G_SS mu_S = -(G u)_S``; feasibility
    requires mu_S >= 0 and the reduced gradient on the complement
    ``(G(u+mu))_{S^c} >= 0``. We solve all 2^m masked systems, score
    feasibility violations, and pick the feasible candidate with the lowest
    objective. Exact for any PSD G (ties broken by objective).
    """
    m = G.shape[0]
    masks = jnp.asarray(_all_masks(m), dtype=G.dtype)  # (2^m, m)
    Gu = G @ u
    tr = jnp.trace(G)
    # feasibility tolerances must match each constraint's scale: mu lives in
    # weight space (O(1) regardless of gradient norms), the reduced gradient
    # G(u+mu) in squared-gradient space (O(trace G)). A single trace-scaled
    # tol would accept mu = -u (w = 0, objective 0) as "feasible" whenever
    # trace(G) > ~1e6 — collapsing the UPGrad/DualProj update to a no-op on
    # large-norm Gramians.
    tol_mu = 1e-6 * (1.0 + jnp.sum(jnp.abs(u)))
    tol_g = 1e-6 * (tr + 1.0)

    def solve_mask(s):
        # Masked system: A = s_i s_j G_ij + (1-s_i) delta_ij ; b = -s * Gu
        A = G * (s[:, None] * s[None, :]) + jnp.diag(1.0 - s)
        b = -s * Gu
        mu = jax.scipy.linalg.solve(A, b, assume_a="pos")
        mu = mu * s
        w = u + mu
        Gw = G @ w
        # violations: mu_S < 0, or reduced gradient < 0 off-support
        viol_mu = jnp.sum(jnp.clip(-mu, min=0.0))
        viol_g = jnp.sum((1.0 - s) * jnp.clip(-Gw, min=0.0))
        obj = w @ Gw
        bad = jnp.logical_or(
            jnp.any(jnp.isnan(mu)),
            jnp.logical_or(viol_mu > tol_mu, viol_g > tol_g))
        score = jnp.where(bad, jnp.inf, obj)
        return w, score

    ws, scores = jax.vmap(solve_mask)(masks)
    best = jnp.argmin(scores)
    w_best = ws[best]
    # numerical fallback: if everything failed, keep u (no projection)
    return jnp.where(jnp.isfinite(scores[best]), w_best, u)


def project_weight_rows(U: Array, G: Array) -> Array:
    """Project each row of U (one weighted objective per row) onto the dual
    cone; returns the matrix W of projected weight rows (torchjd
    ``project_weights`` equivalent)."""
    return jax.vmap(lambda u: dual_cone_project_weights(u, G))(U)


def cagrad_exact(G: Array, c: float) -> Array:
    """Exact CAGrad weights (Liu et al. 2021; torchjd CAGrad — the
    reference builds it with c=1.0, main.py:1218).

    Solves ``min_{w in simplex} F(w) = w^T G g0 + sqrt(phi) ||g_w||`` with
    ``phi = c^2 g0^T G g0`` by support enumeration, then returns
    ``alpha = g0 + (sqrt(phi)/||g_w||) w`` (no 1/(1+c^2) rescale — the
    upstream torchjd convention, see the anchored docs example in
    tests/test_refharness.py).

    On a support S the KKT stationarity of the restricted problem reads
    ``b_S + s (G y)_S = nu 1`` with ``y = w/||g_w||``, ``y^T G y = 1`` —
    eliminating y gives a scalar quadratic in nu:
    ``nu^2 (1^T G_SS^-1 1) - 2 nu (1^T G_SS^-1 b_S) + b_S^T G_SS^-1 b_S
    = s^2``. Both roots of every nonempty support are evaluated through
    the TRUE objective F at their (feasibility-masked) w, and the argmin
    taken: every candidate is a feasible point (F >= F*) and the true
    support's minimizing root attains F* exactly, so the enumeration is
    exact for any PSD G — including the severely scale-split Gramians
    (diag ratios ~1e6 between reconstruction and codebook objectives)
    where fixed-iteration mirror descent stalls far from the optimum
    (the r4 lockstep study caught exactly that)."""
    m = G.shape[0]
    # scale normalization for solve conditioning: F scales uniformly by
    # 1/kappa under G -> G/kappa, so the argmin (and alpha) are invariant
    kappa = jnp.clip(jnp.max(jnp.abs(G)), min=1e-30)
    Gn = (G / kappa).astype(jnp.float32)
    g0 = jnp.full((m,), 1.0 / m, Gn.dtype)
    b = Gn @ g0
    phi = jnp.clip(g0 @ b, min=1e-30)
    s = c * jnp.sqrt(phi)
    masks = jnp.asarray(_all_masks(m)[1:], Gn.dtype)  # nonempty supports
    tol = 1e-6

    def solve_mask(sm):
        # tiny on-support ridge: a task with an exactly-zero Gramian row
        # (e.g. the embedding loss under the feature-Jacobian path, whose
        # gradient lives entirely in the codebook "task params") makes the
        # masked system singular — yet such a task's singleton support IS
        # the optimum (F = 0 there); the ridge keeps the solve finite and
        # the exact F evaluation still ranks the candidate correctly
        A = (Gn * (sm[:, None] * sm[None, :]) + jnp.diag(1.0 - sm)
             + 1e-12 * jnp.diag(sm))
        bS = sm * b
        x1 = jax.scipy.linalg.solve(A, sm, assume_a="pos")
        xb = jax.scipy.linalg.solve(A, bS, assume_a="pos")
        A11 = sm @ x1
        A1b = sm @ xb
        Abb = bS @ xb
        disc = A1b * A1b - A11 * (Abb - s * s)
        sq = jnp.sqrt(jnp.clip(disc, min=0.0))
        denom = jnp.where(A11 > 0, A11, 1.0)

        def cand(nu):
            # y_S = (1/s) G_SS^-1 (nu 1 - b_S), expressed via x1/xb
            y = sm * (nu * x1 - xb) / jnp.clip(s, min=1e-30)
            sy = jnp.sum(y)
            w = y / jnp.where(jnp.abs(sy) > 1e-12, sy, 1.0)
            gww = jnp.clip(w @ Gn @ w, min=1e-30)
            F = w @ b + s * jnp.sqrt(gww)
            bad = jnp.logical_or(
                jnp.logical_or(disc < -tol, sy <= 1e-12),
                jnp.logical_or(jnp.any(y < -tol),
                               jnp.logical_or(A11 <= 0,
                                              jnp.any(jnp.isnan(w)))))
            return w, jnp.where(bad, jnp.inf, F)

        wa, Fa = cand((A1b + sq) / denom)
        wb, Fb = cand((A1b - sq) / denom)
        take_a = Fa <= Fb
        return (jnp.where(take_a, wa, wb),
                jnp.where(take_a, Fa, Fb))

    ws, Fs = jax.vmap(solve_mask)(masks)
    best = jnp.argmin(Fs)
    # numerical fallback (all-zero G etc.): w = g0
    w = jnp.where(jnp.isfinite(Fs[best]), ws[best], g0)
    gw_norm = jnp.sqrt(jnp.clip(w @ Gn @ w, min=0.0))
    # ||g_w|| ~ 0 (w supported on zero-gradient tasks): lam*g_w -> 0 in
    # gradient space whatever lam is — return lam = 0 so the logged alpha
    # stays finite instead of s/eps (the update direction is identical)
    lam = jnp.where(gw_norm > 1e-9 * s, s / jnp.clip(gw_norm, min=1e-30),
                    0.0)
    return g0 + lam * w


# ---------------------------------------------------------------------------
# Eigen balance transform (AlignedMTL; aligned_mtl.py:104-133)
# ---------------------------------------------------------------------------

def balance_transformation(G: Array, scale_mode: str = "min") -> Array:
    """B = sqrt(scale) * V Sigma^{-1/2} V^T over the significant rank of G.

    scale: smallest kept eigenvalue ("min"), median ("median") or mean
    ("rmse") — matching the reference modes (aligned_mtl.py:121-127).
    Returns the identity when rank is 0.
    """
    m = G.shape[0]
    evals, V = jnp.linalg.eigh(G)  # ascending
    tol = jnp.max(evals) * m * jnp.finfo(G.dtype).eps
    keep = evals > tol
    rank = jnp.sum(keep.astype(jnp.int32))

    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, evals, 1.0)), 0.0)

    kept_vals = jnp.where(keep, evals, jnp.inf)
    min_kept = jnp.min(kept_vals)
    mean_kept = jnp.sum(jnp.where(keep, evals, 0.0)) / jnp.maximum(rank, 1)
    # median over kept: evals ascending, kept are the top `rank` entries
    med_idx = m - rank + (rank - 1) // 2  # lower median of the kept block
    median_kept = evals[jnp.clip(med_idx, 0, m - 1)]

    if scale_mode == "min":
        scale = min_kept
    elif scale_mode == "median":
        scale = median_kept
    elif scale_mode == "rmse":
        scale = mean_kept
    else:
        raise ValueError(f"Invalid scale_mode={scale_mode!r}")

    B = jnp.sqrt(scale) * (V * inv_sqrt[None, :]) @ V.T
    return jnp.where(rank > 0, B, jnp.eye(m, dtype=G.dtype))
