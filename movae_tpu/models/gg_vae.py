"""Gradient-Guided VAE: VAE + Sobel edge objectives.

Rebuild of the reference GGVAE (/root/reference/models/gg_vae.py:12-252):
adds ``gradient_guided_loss`` (edge-weighted pixel MSE) and
``edge_matching_loss`` (version-dispatched, gg_vae.py:57-63) to the VAE's
reconstruction + KL decomposition. Arch names gg_vae, gg_vae_v{2,3,5,6}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from movae_tpu import objectives as obj_lib
from movae_tpu.models.base import LambdaWeights
from movae_tpu.models.vae import VAE
from movae_tpu.ops import sobel

Array = jax.Array


class GGVAE(VAE):
    edge_matching_version: int = 1
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("kld_loss", 0.00025),
        ("gradient_guided_loss", 1.0),
        ("edge_matching_loss", 1.0),
    )

    objective_names = (
        "reconstruction_loss", "kld_loss", "gradient_guided_loss",
        "edge_matching_loss")
    feature_names = ("mu", "log_var")

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        recons = outputs["recons"]
        edge_fn = sobel.GG_VAE_EDGE_FNS.get(self.edge_matching_version,
                                            sobel.edge_matching_magnitude)
        return {
            "reconstruction_loss":
                lw["reconstruction_loss"] * self._recon_fn()(x, recons),
            "kld_loss": lw["kld_loss"] * obj_lib.kl_divergence(
                outputs["mu"], outputs["log_var"]),
            "gradient_guided_loss":
                lw["gradient_guided_loss"]
                * sobel.edge_weighted_pixel_loss(x, recons),
            "edge_matching_loss":
                lw["edge_matching_loss"] * edge_fn(x, recons),
        }
