"""Dual-cone weight projection (torchjd.aggregation._utils.dual_cone).

Given a Gramian G = J @ J.T and a matrix U whose rows are weight vectors
u, project each gradient J.T @ u onto the dual cone D = {d : J d >= 0}:

    proj_D(J.T u) = J.T (u + mu*),
    mu* = argmin_{mu >= 0} (u + mu).T G (u + mu)

(Moreau decomposition against the polar cone {-J.T mu : mu >= 0}). With a
Cholesky factor G = L L.T the inner problem is the non-negative least
squares  min_{mu>=0} ||L.T mu - (-L.T u)||^2, solved by scipy's
Lawson-Hanson NNLS — an implementation deliberately independent of
movae_tpu's JAX active-set QP (moo/solvers.py), so the cross-framework
equivalence study pits two unrelated solvers against each other.

Used by the reference's NUPGrad/PNUPGrad (utils/torchmoo/nupgrad.py:126)
and by this shim's UPGrad/DualProj."""

from __future__ import annotations

import numpy as np
import torch
from scipy.optimize import nnls


def _cholesky(G: np.ndarray) -> np.ndarray:
    jitter = 0.0
    for _ in range(8):
        try:
            return np.linalg.cholesky(G + jitter * np.eye(G.shape[0]))
        except np.linalg.LinAlgError:
            jitter = max(jitter * 10.0, 1e-12 * max(np.trace(G), 1.0))
    raise np.linalg.LinAlgError("Gramian not PSD even after jitter")


def project_weights(U: torch.Tensor, G: torch.Tensor,
                    solver: str = "quadprog") -> torch.Tensor:
    """Row-wise dual-cone projection; returns W with rows u + mu*(u)."""
    del solver  # single (exact) backend
    G_np = G.detach().cpu().double().numpy()
    U_np = U.detach().cpu().double().numpy()
    squeeze = U_np.ndim == 1
    if squeeze:
        U_np = U_np[None, :]
    Lt = _cholesky(G_np).T
    W = np.empty_like(U_np)
    for i, u in enumerate(U_np):
        mu, _ = nnls(Lt, -Lt @ u)
        W[i] = u + mu
    if squeeze:
        W = W[0]
    return torch.as_tensor(W, dtype=G.dtype, device=G.device)
