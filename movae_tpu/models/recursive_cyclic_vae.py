"""Recursive-Cyclic VAE: reconstruction + annealed recursive KL + latent
cycle consistency (rebuild of
/root/reference/models/recursive_cyclic_vae.py:95-205).

``feature_names = None`` — the three objectives share encoder+decoder with
no clean head split, so Jacobians are taken w.r.t. all parameters
(recursive_cyclic_vae.py:117-120, with the Jacobian-sparsity rationale in
the reference docstring at lines 32-47).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from movae_tpu import objectives as obj_lib
from movae_tpu.models.base import LambdaWeights
from movae_tpu.models.cycle_vae import cycle_loss
from movae_tpu.models.vae import VAE

Array = jax.Array


class RecursiveCyclicVAE(VAE):
    recursive_kld_anneal_steps: int = 25000
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("recursive_kld_loss", 0.00025),
        ("cycle_loss", 0.00025),
    )

    objective_names = ("reconstruction_loss", "recursive_kld_loss",
                       "cycle_loss")
    feature_names = None

    def setup(self):
        super().setup()
        self.num_iter = self.variable("batch_stats", "num_iter",
                                      lambda: jnp.zeros((), jnp.float32))

    def __call__(self, x: Array, train: bool = False) -> Dict[str, Any]:
        # Branch A: reconstruction + recursive KL
        mu, log_var = self.encode(x, train=train)
        z = self.reparameterize(mu, log_var)
        recons = self.decode(z, train=train)
        mu_hat, log_var_hat = self.encode(recons, train=train)
        # Branch B: latent cycle consistency
        z_prior = jax.random.normal(self.make_rng("sample"),
                                    (x.shape[0], self.latent_dim), jnp.float32)
        x_gen = self.decode(z_prior, train=train)
        mu_gen, log_var_gen = self.encode(x_gen, train=train)
        return {"recons": recons, "mu": mu, "log_var": log_var, "z": z,
                "mu_hat": mu_hat, "log_var_hat": log_var_hat,
                "z_prior": z_prior, "x_gen": x_gen, "mu_gen": mu_gen,
                "log_var_gen": log_var_gen, "is_training": train}

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        recon = self._recon_fn()(x, outputs["recons"])
        rec_kld = obj_lib.kl_divergence(outputs["mu_hat"],
                                        outputs["log_var_hat"])
        cyc = cycle_loss(outputs["z_prior"], outputs["mu_gen"])

        training = bool(outputs.get("is_training", False))
        if training and not self.is_initializing():
            self.num_iter.value = self.num_iter.value + 1.0
        anneal = jnp.where(jnp.asarray(training),
                           jnp.minimum(self.num_iter.value
                                       / self.recursive_kld_anneal_steps, 1.0),
                           1.0)
        return {
            "reconstruction_loss": lw["reconstruction_loss"] * recon,
            "recursive_kld_loss": anneal * lw["recursive_kld_loss"] * rec_kld,
            "cycle_loss": lw["cycle_loss"] * cyc,
        }
