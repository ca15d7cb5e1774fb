"""Public torchjd.aggregation surface used by the reference
(main.py:18-31). UPGrad follows the UPGrad paper / torchjd docs exactly
(anchored on the published docstring example in tests/test_refharness.py);
PCGrad/DualProj/IMTLG/CAGrad/NashMTL follow their papers — CAGrad and
NashMTL use scipy solvers rather than torchjd's cvxpy/quadprog internals,
so their iterates may differ in ulps from upstream torchjd (documented
here because equivalence studies should prefer the anchored aggregators).
"""

from __future__ import annotations

from typing import Literal, Optional

import numpy as np
import torch
from torch import Tensor

from ._aggregator_bases import (Aggregator, GramianWeightedAggregator,
                                WeightedAggregator)
from ._mean import Mean, MeanWeighting
from ._utils.dual_cone import project_weights
from ._utils.non_differentiable import raise_non_differentiable_error
from ._utils.pref_vector import (pref_vector_to_str_suffix,
                                 pref_vector_to_weighting)
from ._weighting_bases import PSDMatrix, Weighting

__all__ = ["Aggregator", "GramianWeightedAggregator", "WeightedAggregator",
           "Weighting", "PSDMatrix", "Mean", "MeanWeighting", "Sum",
           "UPGrad", "DualProj", "PCGrad", "IMTLG", "CAGrad", "NashMTL"]


def _regularize(gramian: Tensor, eps: float) -> Tensor:
    return gramian + eps * torch.eye(gramian.shape[0], dtype=gramian.dtype,
                                     device=gramian.device)


class _SumWeighting(Weighting[Tensor]):
    def forward(self, matrix: Tensor) -> Tensor:
        return torch.ones(matrix.shape[0], dtype=matrix.dtype,
                          device=matrix.device)


class Sum(WeightedAggregator):
    def __init__(self):
        super().__init__(_SumWeighting())


class _UPGradWrapper(Weighting[PSDMatrix]):
    """Each weighted row projected onto the dual cone of all rows, then
    summed (mean weighting => mean of projections, the paper's pi_J)."""

    def __init__(self, weighting: Weighting[PSDMatrix], norm_eps: float,
                 reg_eps: float, solver: str):
        super().__init__()
        self.weighting = weighting
        self.norm_eps = norm_eps
        self.reg_eps = reg_eps
        self.solver = solver

    def forward(self, gramian: Tensor) -> Tensor:
        U = torch.diag(self.weighting(gramian))
        G = _regularize(gramian, self.reg_eps)
        W = project_weights(U, G, self.solver)
        return torch.sum(W, dim=0)


class UPGrad(GramianWeightedAggregator):
    def __init__(self, pref_vector: Optional[Tensor] = None,
                 norm_eps: float = 0.0001, reg_eps: float = 0.0001,
                 solver: Literal["quadprog"] = "quadprog"):
        weighting = pref_vector_to_weighting(pref_vector,
                                             default=MeanWeighting())
        self._pref_vector = pref_vector
        super().__init__(_UPGradWrapper(weighting, norm_eps, reg_eps,
                                        solver))
        self.register_full_backward_pre_hook(raise_non_differentiable_error)

    def __str__(self) -> str:
        return f"UPGrad{pref_vector_to_str_suffix(self._pref_vector)}"


class _DualProjWrapper(Weighting[PSDMatrix]):
    """Project the (weighted-mean) gradient onto the dual cone of the rows
    (Gradient Episodic Memory projection)."""

    def __init__(self, weighting: Weighting[PSDMatrix], norm_eps: float,
                 reg_eps: float, solver: str):
        super().__init__()
        self.weighting = weighting
        self.norm_eps = norm_eps
        self.reg_eps = reg_eps
        self.solver = solver

    def forward(self, gramian: Tensor) -> Tensor:
        u = self.weighting(gramian)
        G = _regularize(gramian, self.reg_eps)
        return project_weights(u, G, self.solver)


class DualProj(GramianWeightedAggregator):
    def __init__(self, pref_vector: Optional[Tensor] = None,
                 norm_eps: float = 0.0001, reg_eps: float = 0.0001,
                 solver: Literal["quadprog"] = "quadprog"):
        weighting = pref_vector_to_weighting(pref_vector,
                                             default=MeanWeighting())
        self._pref_vector = pref_vector
        super().__init__(_DualProjWrapper(weighting, norm_eps, reg_eps,
                                          solver))
        self.register_full_backward_pre_hook(raise_non_differentiable_error)

    def __str__(self) -> str:
        return f"DualProj{pref_vector_to_str_suffix(self._pref_vector)}"


class _PCGradWrapper(Weighting[PSDMatrix]):
    """PCGrad (Yu et al. 2020): each task gradient is sequentially
    projected away from the tasks it conflicts with, in random order;
    the projected gradients are summed. Expressed on the Gramian: the
    running gradient is J.T @ w and conflicts are read off G @ w."""

    def forward(self, gramian: Tensor) -> Tensor:
        m = gramian.shape[0]
        total = torch.zeros(m, dtype=gramian.dtype, device=gramian.device)
        for i in range(m):
            w = torch.zeros(m, dtype=gramian.dtype, device=gramian.device)
            w[i] = 1.0
            order = torch.randperm(m)
            for j in order:
                if j == i:
                    continue
                dot = gramian[j] @ w
                if dot < 0:
                    e_j = torch.zeros(m, dtype=gramian.dtype,
                                      device=gramian.device)
                    e_j[j] = 1.0
                    w = w - (dot / gramian[j, j].clamp(min=1e-12)) * e_j
            total = total + w
        return total


class PCGrad(GramianWeightedAggregator):
    def __init__(self):
        super().__init__(_PCGradWrapper())
        self.register_full_backward_pre_hook(raise_non_differentiable_error)


class _IMTLGWrapper(Weighting[PSDMatrix]):
    """IMTL-G (Liu et al. 2021): weights such that the aggregated gradient
    has equal projection onto every task's unit gradient; closed form on
    the Gramian, weights rescaled to sum to 1."""

    def forward(self, gramian: Tensor) -> Tensor:
        m = gramian.shape[0]
        if m == 1:
            return torch.ones(1, dtype=gramian.dtype, device=gramian.device)
        d = torch.sqrt(torch.diagonal(gramian).clamp(min=1e-12))
        # rows of D: g_1 - g_i ; rows of U: g_1/|g_1| - g_i/|g_i| (i >= 2)
        # alpha_{2:} = g_1 U^T (D U^T)^{-1}; expressed via the Gramian
        g1U = gramian[0, 0] / d[0] - gramian[0, 1:] / d[1:]          # (m-1,)
        # M[j-1, i-1] = (g_1 - g_j) . (u_1 - u_i), via the Gramian:
        #   G[0,0]/d_0 - G[0,i]/d_i - G[j,0]/d_0 + G[j,i]/d_i
        DUt = (gramian[0:1, 0:1] / d[0] - gramian[1:, 0:1] / d[0]
               - gramian[0:1, 1:] / d[1:] + gramian[1:, 1:] / d[1:])
        alpha_rest = torch.linalg.solve(DUt.T, g1U)
        alpha = torch.cat([1.0 - alpha_rest.sum(dim=0, keepdim=True),
                           alpha_rest])
        return alpha / alpha.sum().clamp(min=1e-12)


class IMTLG(GramianWeightedAggregator):
    def __init__(self):
        super().__init__(_IMTLGWrapper())
        self.register_full_backward_pre_hook(raise_non_differentiable_error)


class _CAGradWrapper(Weighting[PSDMatrix]):
    """CAGrad (Liu et al. 2021): d = g_0 + g_w where w solves
    min_w g_w.T g_0 + sqrt(phi) ||g_w||, phi = c^2 ||g_0||^2, w on the
    simplex; solved with scipy SLSQP on the Gramian."""

    def __init__(self, c: float, norm_eps: float):
        super().__init__()
        self.c = c
        self.norm_eps = norm_eps

    def forward(self, gramian: Tensor) -> Tensor:
        from scipy.optimize import minimize

        G = gramian.detach().cpu().double().numpy()
        m = G.shape[0]
        g0 = np.full(m, 1.0 / m)
        gg = float(g0 @ G @ g0)
        sqrt_phi = self.c * np.sqrt(max(gg, 1e-30))

        def obj(w):
            return float(w @ G @ g0 + sqrt_phi * np.sqrt(max(w @ G @ w,
                                                             1e-30)))

        # deterministic multistart: a single SLSQP start from g0 misses the
        # boundary optima of scale-split Gramians (verified against
        # support-enumeration + multistart oracles) — start from the
        # uniform point, every vertex, and every edge midpoint, keep the
        # best. The optimum, not any one solver trajectory, defines CAGrad.
        starts = [g0] + [np.eye(m)[i] for i in range(m)]
        for i in range(m):
            for j in range(i + 1, m):
                e = np.zeros(m)
                e[i] = e[j] = 0.5
                starts.append(e)
        best = None
        for w0 in starts:
            res = minimize(obj, w0, bounds=[(0.0, 1.0)] * m,
                           constraints={"type": "eq",
                                        "fun": lambda w: w.sum() - 1.0},
                           method="SLSQP",
                           options={"ftol": 1e-16, "maxiter": 500})
            if best is None or res.fun < best.fun:
                best = res
        w = best.x
        gw_norm = np.sqrt(max(w @ G @ w, 0.0))
        # w supported on zero-gradient tasks => lam*g_w == 0 regardless of
        # lam; report lam = 0 so weights stay finite (same rule as
        # movae_tpu solvers.cagrad_exact)
        lam = (sqrt_phi / gw_norm if gw_norm > 1e-9 * sqrt_phi else 0.0)
        # NOTE: no 1/(1+c^2) rescale — torchjd returns g_0 + lam*g_w
        # directly (docs example J=[[-4,1,1],[6,1,1]], c=0.5 ->
        # [0.1835, 1.2041, 1.2041]); the CAGrad paper's optional rescale
        # is not applied upstream, and movae_tpu's _cagrad_alpha matches.
        weights = g0 + lam * w
        return torch.as_tensor(weights, dtype=gramian.dtype,
                               device=gramian.device)


class CAGrad(GramianWeightedAggregator):
    def __init__(self, c: float = 0.5, norm_eps: float = 0.0001):
        super().__init__(_CAGradWrapper(c, norm_eps))
        self.register_full_backward_pre_hook(raise_non_differentiable_error)


class _NashMTLWrapper(Weighting[PSDMatrix]):
    """NashMTL (Navon et al. 2022): alpha >= 0 with G alpha = 1/alpha
    (bargaining first-order conditions), refreshed every
    ``update_weights_every`` calls; solved with scipy least_squares in
    softplus space (torchjd uses cvxpy's sequential relaxation)."""

    def __init__(self, n_tasks: int, update_weights_every: int,
                 optim_niter: int):
        super().__init__()
        self.n_tasks = n_tasks
        self.update_weights_every = max(int(update_weights_every), 1)
        self.optim_niter = optim_niter
        self._calls = 0
        self.register_buffer("_weights", torch.ones(n_tasks))

    def forward(self, gramian: Tensor) -> Tensor:
        if self._calls % self.update_weights_every == 0:
            from scipy.optimize import least_squares

            G = gramian.detach().cpu().double().numpy()
            # RELATIVE ridge: a task whose Gramian row is exactly zero
            # (feature-Jacobian path) makes G a = 1/a unsolvable (a_i ->
            # inf); 1e-8*max|G| keeps the bargaining problem well-posed at
            # every gradient scale while perturbing real tasks by <=1e-8
            # relative (movae_tpu solvers._nashmtl_solve applies the same)
            G = G + 1e-8 * max(np.abs(G).max(), 1e-300) * np.eye(G.shape[0])

            def resid(log_a):
                a = np.exp(log_a)
                return G @ a - 1.0 / a

            # decoupled-solution init (a_i = 1/sqrt(G_ii)): near-zero rows
            # live at a ~ 1e6 where a zeros start stalls the trust region
            # (same init as movae_tpu's _nashmtl_solve)
            x0 = -0.5 * np.log(np.clip(np.diag(G), 1e-300, None))
            sol = least_squares(resid, x0, max_nfev=50 * self.optim_niter,
                                xtol=1e-15, ftol=1e-15, gtol=1e-15)
            self._weights = torch.as_tensor(np.exp(sol.x),
                                            dtype=gramian.dtype)
        self._calls += 1
        return self._weights.to(dtype=gramian.dtype, device=gramian.device)


class NashMTL(GramianWeightedAggregator):
    def __init__(self, n_tasks: int, update_weights_every: int = 1,
                 optim_niter: int = 20):
        super().__init__(_NashMTLWrapper(n_tasks, update_weights_every,
                                         optim_niter))
        self.register_full_backward_pre_hook(raise_non_differentiable_error)
