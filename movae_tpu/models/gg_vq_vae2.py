"""Gradient-Guided VQ-VAE-2.

Rebuild of the reference GGVQVAE2 (/root/reference/models/gg_vq_vae2.py:
14-208): VQ-VAE-2 + gradient_guided_loss + edge_matching_loss (the GG-VQ-VAE
"v3" pair: edge-weighted pixel MSE + smooth-L1 on gradient magnitudes;
explicit 5-term loss at gg_vq_vae2.py:131-161).
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from movae_tpu.models.base import LambdaWeights
from movae_tpu.models.vq_vae2 import VQVAE2
from movae_tpu.ops import sobel

Array = jax.Array


class GGVQVAE2(VQVAE2):
    version: str = "v3"
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("commitment_loss", 1.0),
        ("embedding_loss", 0.25),
        ("gradient_guided_loss", 1.0),
        ("edge_matching_loss", 1.0),
    )

    @property
    def objective_names(self):
        emb = () if self.vq_ema else ("embedding_loss",)
        return ("reconstruction_loss", "commitment_loss", *emb,
                "gradient_guided_loss", "edge_matching_loss")

    def _extra_loss(self, key: str, x: Array, outputs: Dict[str, Any]):
        if key == "gradient_guided_loss":
            return sobel.edge_weighted_pixel_loss(x, outputs["recons"])
        if key == "edge_matching_loss":
            fn = sobel.GG_VQVAE_EDGE_FNS.get(self.version,
                                             sobel.edge_matching_magnitude)
            return fn(x, outputs["recons"])
        raise KeyError(key)
