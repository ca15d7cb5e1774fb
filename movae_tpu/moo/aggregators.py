"""Gramian-level multi-objective aggregators.

Each aggregator maps the per-objective Gramian ``G = J J^T`` (plus, for some,
the current losses / an rng key / carried state) to a weight vector ``alpha``;
the update direction is then ``g = alpha^T J`` computed by the gradient
engine. This is the weight-space formulation of the reference's aggregator
stack (torchjd ``GramianWeightedAggregator`` + /root/reference/utils/torchmoo)
— pure functions compiled into the jitted train step, with no host-side
QP/scipy round-trips.

Aggregators provided (reference dispatch: main.py:1191-1244):
  sum, mean/jd_sum, upgrad, nupgrad, pnupgrad, dualproj, pcgrad, mgda
  (+ _ln/_gn/_lgn norm variants and the stable eigen-regularized form),
  aligned_mtl (+ _median/_rmse), cagrad, imtlg, nashmtl, comfort.

Deviations from the reference, by design:
  * The dual-cone QPs (upgrad family, dualproj) are solved exactly via
    active-set enumeration instead of quadprog — same optimum.
  * CAGrad's simplex problem uses fixed-iteration mirror descent instead of
    scipy.minimize; NashMTL uses a fixed-point iteration instead of cvxpy —
    both converge to the same stationary points for these tiny (m<=5)
    problems and keep the step jit-compatible.
  * PNUPGrad's per-step Bernoulli draw and PCGrad's task shuffling consume
    an explicit jax rng key instead of global torch randomness.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from movae_tpu.moo import solvers

Array = jax.Array

AGGREGATOR_NAMES = (
    "sum", "jd_sum", "mean", "upgrad", "nupgrad", "pnupgrad", "dualproj",
    "pcgrad", "mgda", "mgda_ln", "mgda_gn", "mgda_lgn", "aligned_mtl",
    "aligned_mtl_min", "amtl", "amtl_min", "aligned_mtl_median",
    "aligned_mtl_rmse", "cagrad", "imtlg", "nashmtl", "comfort",
)


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    """Static aggregator configuration (hashable; closed over by jit)."""

    name: str = "sum"
    num_objectives: int = 2
    # shared epsilons (main.py:1513-1530)
    norm_eps: float = 1e-4
    reg_eps: float = 1e-4
    # MGDA (main.py:1531-1551)
    mgda_norm_type: str = "none"  # none | l2 | loss | loss+
    mgda_epsilon: float = 1e-5
    mgda_max_iters: int = 250
    mgda_stable: bool = False
    mgda_min_eigenvalue_eps: float = 1e-10
    # AlignedMTL
    scale_mode: str = "min"
    pref_vector: Optional[Tuple[float, ...]] = None
    # CAGrad
    cagrad_c: float = 1.0
    cagrad_iters: int = 60
    # NashMTL (main.py:1219-1220)
    nashmtl_update_every: int = 1
    nashmtl_optim_niter: int = 20
    # COMFORT beta schedule (comfort.py:26-65; main.py:1566-1569)
    comfort_beta_k: float = 1.0
    comfort_beta_a: float = 1.0
    comfort_beta_l: float = 0.01
    comfort_beta_u: float = 1.0

    @property
    def is_sum(self) -> bool:
        return self.name in ("sum", None)

    def pref(self) -> Array:
        m = self.num_objectives
        if self.pref_vector is None:
            return jnp.full((m,), 1.0 / m, dtype=jnp.float32)
        v = jnp.asarray(self.pref_vector, dtype=jnp.float32)
        if v.shape != (m,):
            raise ValueError(f"pref_vector must have length {m}, got {v.shape}")
        return v


def init_state(cfg: AggregatorConfig) -> Dict[str, Array]:
    """Per-aggregator carried state, stored in the train state pytree."""
    m = cfg.num_objectives
    if cfg.name == "nashmtl":
        return {
            "nash_alpha": jnp.ones((m,), jnp.float32),
            "nash_step": jnp.zeros((), jnp.int32),
        }
    return {}


def comfort_beta(cfg: AggregatorConfig, epoch: Array, total_epochs: int) -> Array:
    """Beta-VAE style epoch schedule l->u (comfort.py:26-65). ``epoch`` is the
    1-based epoch index as a traced scalar."""
    k, a = cfg.comfort_beta_k, cfg.comfort_beta_a
    l, u = cfg.comfort_beta_l, cfg.comfort_beta_u
    if total_epochs <= 1:
        return jnp.asarray(u, jnp.float32)
    progress = (epoch.astype(jnp.float32) - 1.0) / float(total_epochs - 1)
    progress = jnp.clip(progress, 0.0, 1.0) ** a
    if k <= 0:
        f = progress
    else:
        f = (1.0 - jnp.exp(-k * progress)) / (1.0 - math.exp(-k))
    return jnp.clip(l + (u - l) * f, l, u)


# ---------------------------------------------------------------------------
# Individual weightings (G -> alpha)
# ---------------------------------------------------------------------------

def _upgrad_alpha(G: Array, w: Array, reg_eps: float) -> Array:
    """UPGrad: project each weighted row onto the dual cone; sum
    (torchjd UPGrad; oracle nupgrad.py:55-62)."""
    Gr = solvers.regularize_gramian_diag(G, reg_eps)
    U = jnp.diag(w)
    W = solvers.project_weight_rows(U, Gr)
    return jnp.sum(W, axis=0)


def _nupgrad_alpha(G: Array, w: Array, norm_eps: float, reg_eps: float) -> Array:
    """NUPGrad: min-L2-normalized Gramian, then UPGrad projection
    (nupgrad.py:122-126)."""
    Gn = solvers.regularize_gramian_diag(
        solvers.normalize_gramian_min_l2(G, norm_eps), reg_eps)
    W = solvers.project_weight_rows(jnp.diag(w), Gn)
    return jnp.sum(W, axis=0)


def _pnupgrad_alpha(G: Array, w: Array, key: Array, norm_eps: float,
                    reg_eps: float, prob: float = 0.5) -> Array:
    """PNUPGrad: with prob 0.5 use pairwise-L2-normalized Gramian, else
    min-norm-normalized (pnupgrad.py:127-134)."""
    use_pairwise = jax.random.uniform(key) < prob
    Gn = jnp.where(
        use_pairwise,
        solvers.normalize_gramian_l2(G, norm_eps),
        solvers.normalize_gramian_min_l2(G, norm_eps),
    )
    Gn = solvers.regularize_gramian_diag(Gn, reg_eps)
    W = solvers.project_weight_rows(jnp.diag(w), Gn)
    return jnp.sum(W, axis=0)


def _dualproj_alpha(G: Array, w: Array, reg_eps: float) -> Array:
    """DualProj: project the mean gradient onto the dual cone."""
    Gr = solvers.regularize_gramian_diag(G, reg_eps)
    return solvers.dual_cone_project_weights(w, Gr)


def _mgda_alpha(G: Array, losses: Optional[Array], cfg: AggregatorConfig,
                norm_type: Optional[str] = None) -> Array:
    norm_type = norm_type if norm_type is not None else cfg.mgda_norm_type
    if norm_type == "l2":
        G = solvers.normalize_gramian_l2(G)
    elif norm_type == "loss":
        G = solvers.normalize_gramian_loss(G, losses)
    elif norm_type == "loss+":
        G = solvers.normalize_gramian_loss_plus(G, losses)
    if cfg.mgda_stable:
        G = solvers.regularize_gramian_eigen(G, cfg.mgda_min_eigenvalue_eps)
    alpha, _, _ = solvers.frank_wolfe_minnorm(G, cfg.mgda_epsilon,
                                              cfg.mgda_max_iters)
    return alpha


def _aligned_mtl_alpha(G: Array, w: Array, scale_mode: str) -> Array:
    B = solvers.balance_transformation(G, scale_mode)
    return B @ w


def _pcgrad_alpha(G: Array, key: Array) -> Array:
    """PCGrad in weight space: per task, subtract conflicting projections of
    the other tasks in random order (Yu et al. 2020)."""
    m = G.shape[0]
    diag = jnp.clip(jnp.diag(G), min=1e-20)

    def project_task(i, key_i):
        perm = jax.random.permutation(key_i, m)
        w0 = jax.nn.one_hot(i, m, dtype=G.dtype)

        def body(k, w):
            j = perm[k]
            skip = j == i
            d = (G @ w)[j]  # g_i' . g_j
            coef = jnp.where(jnp.logical_or(skip, d >= 0), 0.0, d / diag[j])
            return w - coef * jax.nn.one_hot(j, m, dtype=G.dtype)

        return jax.lax.fori_loop(0, m, body, w0)

    keys = jax.random.split(key, m)
    W = jax.vmap(project_task)(jnp.arange(m), keys)
    return jnp.sum(W, axis=0)


def _cagrad_alpha(G: Array, cfg: AggregatorConfig) -> Array:
    """CAGrad (Liu et al. 2021), c=1.0 in the reference (main.py:1218).

    Exact support-enumeration solve of min_{w in simplex}
    w^T G w0 + sqrt(phi) * sqrt(w^T G w), phi = c^2 * w0^T G w0; returns
    alpha = w0 + (sqrt(phi)/||g_w||) * w (solvers.cagrad_exact — replaced
    the r1 fixed-iteration mirror descent, which stalled on the
    scale-split VQ Gramians; ``cagrad_iters`` is retained in the config
    for compatibility but unused)."""
    return solvers.cagrad_exact(G, cfg.cagrad_c)


def _imtlg_alpha(G: Array) -> Array:
    """IMTL-G (Liu et al. 2021): impartial projections — closed form from the
    Gramian. alpha s.t. g^T u_i is equal for all unit task directions u_i."""
    m = G.shape[0]
    norms = jnp.sqrt(jnp.clip(jnp.diag(G), min=1e-20))
    # D[t] = g_1 - g_{t+2}, U[t] = u_1 - u_{t+2}  (t = 0..m-2), in weight space
    # <g_1 - g_t, g_1/||g_1|| - g_t/||g_t||> etc. all come from G and norms.
    e1 = jax.nn.one_hot(0, m, dtype=G.dtype)
    D = e1[None, :] - jnp.eye(m, dtype=G.dtype)[1:]          # (m-1, m)
    Uw = (e1 / norms[0])[None, :] - (jnp.eye(m, dtype=G.dtype)[1:]
                                     / norms[1:, None])      # (m-1, m)
    # g_1 U^T  (1, m-1)  and  D U^T  (m-1, m-1), all via the Gramian
    g1U = (e1 @ G) @ Uw.T
    DU = (D @ G) @ Uw.T
    # alpha_{2:}^T (D U^T) = g_1 U^T  =>  (D U^T)^T alpha_{2:} = (g_1 U^T)^T
    A = DU.T + 1e-12 * jnp.eye(m - 1, dtype=G.dtype)
    rest = jnp.linalg.solve(A, g1U)
    # one step of iterative refinement: f32 solves of ill-conditioned small
    # systems otherwise leave ~1% residual in the equal-projection property
    rest = rest + jnp.linalg.solve(A, g1U - A @ rest)
    alpha1 = 1.0 - jnp.sum(rest)
    return jnp.concatenate([alpha1[None], rest])


def _nashmtl_solve(G: Array, niter: int) -> Array:
    """NashMTL (Navon et al. 2022): the Nash-bargaining weights solve
    ``alpha > 0`` with ``(G alpha)_i = 1 / alpha_i`` — the first-order
    conditions of the convex program ``min 0.5 a^T G a - sum_i log a_i``
    (the reference solves a sequential cvxpy approximation of the same
    conditions). Solved here with a damped Newton iteration: the Hessian
    ``H = G + diag(1/a^2)`` is positive definite even for singular G, and a
    fractional-to-boundary step cap keeps ``a`` strictly positive. Unlike a
    multiplicative fixed point, this converges on *conflicting*-gradient
    Gramians (negative off-diagonals) too."""
    m = G.shape[0]
    # scale for conditioning; if a solves for Gn = G/s then a/sqrt(s)
    # solves for G (the KKT system pins the scale — no renormalization)
    s = jnp.clip(jnp.max(jnp.abs(G)), min=1e-12)
    # relative ridge: a zero Gramian row (feature-Jacobian path: a task
    # whose gradient lives wholly in its task params) makes G a = 1/a
    # unsolvable (a_i -> inf, caught by the r4 lockstep study at 2e9
    # weight deltas); 1e-8*max|G| bounds it identically on both sides of
    # the refharness shim (same ridge there)
    Gn = G / s + 1e-8 * jnp.eye(m, dtype=G.dtype)

    def body(_, a):
        grad = Gn @ a - 1.0 / a
        H = Gn + jnp.diag(1.0 / (a * a))
        step = jnp.linalg.solve(H, grad)
        ratio = jnp.where(step > 0, step / a, 0.0)
        t = jnp.minimum(1.0, 0.99 / jnp.clip(jnp.max(ratio), min=1e-12))
        return jnp.clip(a - t * step, min=1e-8)

    # start at the decoupled solution a_i = 1/sqrt(Gn_ii): near-zero
    # Gramian rows solve to a_i ~ 1/sqrt(ridge) ~ 1e4 in normalized units,
    # which the growth-capped Newton cannot reach from a = 1 within the
    # reference's optim_niter=20 (r4 lockstep finding); from this init it
    # converges in a handful of iterations on every tested Gramian
    a0 = 1.0 / jnp.sqrt(jnp.clip(jnp.diag(Gn), min=1e-12))
    a = jax.lax.fori_loop(0, niter, body, a0.astype(G.dtype))
    return a / jnp.sqrt(s)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def compute_weights(
    cfg: AggregatorConfig,
    G: Array,
    losses: Array,
    key: Array,
    state: Dict[str, Array],
    beta: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Map Gramian -> alpha. Returns (alpha, new_state).

    ``G`` is float32 (m, m); ``losses`` the weighted component losses;
    ``beta`` the COMFORT schedule value for this step (traced scalar).
    """
    name = cfg.name.lower()
    m = cfg.num_objectives
    G = G.astype(jnp.float32)
    w = cfg.pref()

    if name == "sum":
        return jnp.ones((m,), jnp.float32), state
    if name in ("jd_sum",):
        return jnp.ones((m,), jnp.float32), state
    if name == "mean":
        # fixed 1/m, ignoring pref_weights: the reference dispatch builds
        # torchjd Mean() with no pref_vector (main.py:1191-1244); weighted
        # preferences act through the UPGrad-family aggregators instead
        return jnp.full((m,), 1.0 / m, jnp.float32), state
    if name == "upgrad":
        return _upgrad_alpha(G, w, cfg.reg_eps), state
    if name == "nupgrad":
        return _nupgrad_alpha(G, w, cfg.norm_eps, cfg.reg_eps), state
    if name == "pnupgrad":
        return _pnupgrad_alpha(G, w, key, cfg.norm_eps, cfg.reg_eps), state
    if name == "dualproj":
        return _dualproj_alpha(G, w, cfg.reg_eps), state
    if name == "pcgrad":
        return _pcgrad_alpha(G, key), state
    if name == "mgda":
        return _mgda_alpha(G, losses, cfg, cfg.mgda_norm_type), state
    if name == "mgda_ln":
        return _mgda_alpha(G, losses, cfg, "l2"), state
    if name == "mgda_gn":
        return _mgda_alpha(G, losses, cfg, "loss"), state
    if name == "mgda_lgn":
        return _mgda_alpha(G, losses, cfg, "loss+"), state
    if name in ("aligned_mtl", "aligned_mtl_min", "amtl", "amtl_min"):
        return _aligned_mtl_alpha(G, w, "min"), state
    if name == "aligned_mtl_median":
        return _aligned_mtl_alpha(G, w, "median"), state
    if name == "aligned_mtl_rmse":
        return _aligned_mtl_alpha(G, w, "rmse"), state
    if name == "cagrad":
        return _cagrad_alpha(G, cfg), state
    if name == "imtlg":
        return _imtlg_alpha(G), state
    if name == "nashmtl":
        step = state["nash_step"]
        refresh = (step % max(cfg.nashmtl_update_every, 1)) == 0
        new_alpha = jnp.where(
            refresh, _nashmtl_solve(G, cfg.nashmtl_optim_niter),
            state["nash_alpha"])
        return new_alpha, {"nash_alpha": new_alpha, "nash_step": step + 1}
    if name == "comfort":
        if beta is None:
            beta = jnp.asarray(cfg.comfort_beta_u, jnp.float32)
        a_mgda = _mgda_alpha(G, losses, cfg, cfg.mgda_norm_type)
        a_up = _upgrad_alpha(G, cfg.pref(), cfg.reg_eps)
        return (1.0 - beta) * a_mgda + beta * a_up, state
    raise ValueError(f"Aggregator {cfg.name} not supported")


def gradient_similarity(G: Array, alpha: Array) -> Array:
    """Cosine similarity between the aggregated and the mean gradient,
    computed Gramian-side (reference hook print_gd_similarity,
    main.py:94-122)."""
    m = G.shape[0]
    w0 = jnp.full((m,), 1.0 / m, dtype=G.dtype)
    num = alpha @ G @ w0
    den = jnp.sqrt(jnp.clip(alpha @ G @ alpha, min=1e-20)) * jnp.sqrt(
        jnp.clip(w0 @ G @ w0, min=1e-20))
    return num / den
