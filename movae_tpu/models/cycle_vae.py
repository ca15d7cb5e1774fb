"""Cycle VAE: reconstruction + latent cycle consistency (no KLD).

Rebuild of /root/reference/models/cycle_vae.py:22-87: a second branch draws
``z_prior ~ N(0, I)``, decodes it, re-encodes, and penalizes
``||z_prior - mu_gen||^2`` (sum over latents, mean over batch).
``feature_names = None`` (cycle_vae.py:35).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from movae_tpu.models.base import LambdaWeights
from movae_tpu.models.vae import VAE

Array = jax.Array


def cycle_loss(z_prior: Array, mu_gen: Array) -> Array:
    return jnp.mean(jnp.sum(jnp.square(z_prior - mu_gen), axis=1))


class CycleVAE(VAE):
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("cycle_loss", 0.00025),
    )

    objective_names = ("reconstruction_loss", "cycle_loss")
    feature_names = None

    def __call__(self, x: Array, train: bool = False) -> Dict[str, Any]:
        mu, log_var = self.encode(x, train=train)
        z = self.reparameterize(mu, log_var)
        recons = self.decode(z, train=train)
        z_prior = jax.random.normal(self.make_rng("sample"),
                                    (x.shape[0], self.latent_dim), jnp.float32)
        x_gen = self.decode(z_prior, train=train)
        mu_gen, log_var_gen = self.encode(x_gen, train=train)
        return {"recons": recons, "mu": mu, "log_var": log_var, "z": z,
                "z_prior": z_prior, "x_gen": x_gen, "mu_gen": mu_gen,
                "log_var_gen": log_var_gen}

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        recon = self._recon_fn()(x, outputs["recons"])
        cyc = cycle_loss(outputs["z_prior"], outputs["mu_gen"])
        return {
            "reconstruction_loss": lw["reconstruction_loss"] * recon,
            "cycle_loss": lw["cycle_loss"] * cyc,
        }
