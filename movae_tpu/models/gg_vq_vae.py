"""Gradient-Guided VQ-VAE (versions v1-v8).

Rebuild of the reference GGVQVAE (/root/reference/models/gg_vq_vae.py:13-272):
VQ-VAE + ``gradient_guided_loss`` (edge-weighted pixel MSE) and, for v2-v8,
an ``edge_matching_loss`` selected by version (gg_vq_vae.py:65-89 — see the
dispatch table in movae_tpu.ops.sobel).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from movae_tpu.models.base import LambdaWeights
from movae_tpu.models.vq_vae import VQVAE
from movae_tpu.ops import sobel

Array = jax.Array


class GGVQVAE(VQVAE):
    version: str = "v1"
    # objective/lambda order follows the reference dict-insertion order
    # (gg_vq_vae.py:63-89): reconstruction, embedding, commitment,
    # gradient_guided[, edge_matching] — positional lambda lists, the
    # aggregator task indices, and task_i_weight logging all depend on it
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("embedding_loss", 1.0),
        ("commitment_loss", 0.25),
        ("gradient_guided_loss", 1.0),
    )

    @property
    def objective_names(self) -> Tuple[str, ...]:
        emb = () if self.vq_ema else ("embedding_loss",)
        base = ("reconstruction_loss", *emb, "commitment_loss",
                "gradient_guided_loss")
        if self.version == "v1":
            return base
        return base + ("edge_matching_loss",)

    def _extra_loss(self, key: str, x: Array, outputs: Dict[str, Any]):
        if key == "gradient_guided_loss":
            return sobel.edge_weighted_pixel_loss(x, outputs["recons"])
        if key == "edge_matching_loss":
            fn = sobel.GG_VQVAE_EDGE_FNS[self.version]
            return fn(x, outputs["recons"])
        raise KeyError(key)
