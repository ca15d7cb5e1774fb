"""Recursive-KL VAE: the KL term is computed on the re-encoded
reconstruction ``enc(dec(enc(x)))``, with a linear 0->lambda anneal over
``recursive_kld_anneal_steps`` (rebuild of
/root/reference/models/recursive_kl_vae.py:29-104).

``feature_names = None`` — all parameters are shared, so the MTL engine uses
the full-parameter Jacobian path (recursive_kl_vae.py:52-54).
The anneal counter lives in the ``batch_stats`` collection (the torch
version uses a class-level global, recursive_kl_vae.py:41, 89-94).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from movae_tpu import objectives as obj_lib
from movae_tpu.models.base import LambdaWeights
from movae_tpu.models.vae import VAE

Array = jax.Array


class RecursiveKLVAE(VAE):
    recursive_kld_anneal_steps: int = 25000
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("recursive_kld_loss", 0.00025),
    )

    objective_names = ("reconstruction_loss", "recursive_kld_loss")
    feature_names = None

    def setup(self):
        super().setup()
        self.num_iter = self.variable("batch_stats", "num_iter",
                                      lambda: jnp.zeros((), jnp.float32))

    def __call__(self, x: Array, train: bool = False) -> Dict[str, Any]:
        mu, log_var = self.encode(x, train=train)
        z = self.reparameterize(mu, log_var)
        recons = self.decode(z, train=train)
        mu_hat, log_var_hat = self.encode(recons, train=train)
        return {"recons": recons, "mu": mu, "log_var": log_var, "z": z,
                "mu_hat": mu_hat, "log_var_hat": log_var_hat,
                "is_training": train}

    def _anneal(self, training: bool) -> Array:
        if training and not self.is_initializing():
            self.num_iter.value = self.num_iter.value + 1.0
        return jnp.where(jnp.asarray(training),
                         jnp.minimum(self.num_iter.value
                                     / self.recursive_kld_anneal_steps, 1.0),
                         1.0)

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        recon = self._recon_fn()(x, outputs["recons"])
        rec_kld = obj_lib.kl_divergence(outputs["mu_hat"],
                                        outputs["log_var_hat"])
        anneal = self._anneal(bool(outputs.get("is_training", False)))
        return {
            "reconstruction_loss": lw["reconstruction_loss"] * recon,
            "recursive_kld_loss":
                anneal * lw["recursive_kld_loss"] * rec_kld,
        }
