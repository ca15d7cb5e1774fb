"""Beta-TC-VAE: total-correlation-decomposed ELBO (4 objectives).

Rebuild of the reference BetaTCVAE (/root/reference/models/betatc_vae.py:
12-391): k4-s2 conv encoder -> fc(256) -> mu/log_var, ConvTranspose decoder,
and the minibatch-stratified importance-weighted decomposition of the ELBO
into reconstruction + mutual-information + total-correlation + dimension-wise
KL terms (betatc_vae.py:262-296, after YannDubs/disentangling-vae), with the
linear KLD anneal over ``anneal_steps`` tracked in the mutable
``batch_stats`` collection (the torch version uses a class-level counter,
betatc_vae.py:298-302).

Objectives: reconstruction_loss, mi_loss, tc_loss, kld. Features: mu,
log_var (betatc_vae.py:80).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from movae_tpu import objectives as obj_lib
from movae_tpu.models.base import (
    LambdaWeights,
    MOVAEModel,
    resolve_activation,
)

Array = jax.Array


def log_density_gaussian(x: Array, mu: Array, logvar: Array) -> Array:
    norm = -0.5 * (math.log(2 * math.pi) + logvar)
    return norm - 0.5 * jnp.square(x - mu) * jnp.exp(-logvar)


class BetaTCVAE(MOVAEModel):
    latent_dim: int = 128
    input_size: int = 32
    in_channels: int = 3
    hidden_dims: Tuple[int, ...] = (32, 32, 32, 32)
    anneal_steps: int = 200
    dataset_size: Optional[int] = 50000
    recons_activation: str = "tanh"
    recons_objective: str = "mse"
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0), ("mi_loss", 1.0), ("tc_loss", 1.0),
        ("kld", 0.00256),
    )
    dtype: Any = jnp.float32
    perceptual_fn: Optional[Any] = None

    objective_names = ("reconstruction_loss", "mi_loss",
                                        "tc_loss", "kld")
    feature_names = ("mu", "log_var")

    @property
    def spatial_dim(self) -> int:
        return self.input_size // (2 ** len(self.hidden_dims))

    @property
    def encoder_output_size(self) -> int:
        return self.hidden_dims[-1] * self.spatial_dim ** 2

    def setup(self):
        hd = tuple(self.hidden_dims)
        self.enc_convs = [
            nn.Conv(h, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name=f"enc_conv_{i}")
            for i, h in enumerate(hd)
        ]
        self.fc = nn.Dense(256, dtype=self.dtype, name="fc")
        self.fc_mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_mu")
        self.fc_var = nn.Dense(self.latent_dim, dtype=self.dtype,
                               name="fc_var")
        self.decoder_input = nn.Dense(self.encoder_output_size,
                                      dtype=self.dtype, name="decoder_input")
        rev = tuple(reversed(hd))
        self.dec_deconvs = [
            nn.ConvTranspose(rev[i + 1], (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), dtype=self.dtype,
                             name=f"dec_deconv_{i}")
            for i in range(len(rev) - 1)
        ]
        self.final_deconv = nn.ConvTranspose(rev[-1], (3, 3), strides=(2, 2),
                                             padding=((1, 2), (1, 2)),
                                             dtype=self.dtype,
                                             name="final_deconv")
        self.final_conv = nn.Conv(self.in_channels, (3, 3), padding="SAME",
                                  dtype=self.dtype, name="final_conv")
        # KLD anneal counter (betatc_vae.py:298-302 uses a class-level
        # counter; here it is carried in the batch_stats collection)
        self.num_iter = self.variable("batch_stats", "num_iter",
                                      lambda: jnp.zeros((), jnp.float32))

    def encode(self, x: Array, train: bool = False):
        h = x.astype(self.dtype)
        for conv in self.enc_convs:
            h = nn.leaky_relu(conv(h), negative_slope=0.01)
        h = h.reshape((h.shape[0], -1))
        h = self.fc(h)
        return (self.fc_mu(h).astype(jnp.float32),
                self.fc_var(h).astype(jnp.float32))

    def decode(self, z: Array, train: bool = False) -> Array:
        s = self.spatial_dim
        h = self.decoder_input(z.astype(self.dtype))
        h = h.reshape((z.shape[0], s, s, self.hidden_dims[-1]))
        for deconv in self.dec_deconvs:
            h = nn.leaky_relu(deconv(h), negative_slope=0.01)
        h = nn.leaky_relu(self.final_deconv(h), negative_slope=0.01)
        h = self.final_conv(h)
        return resolve_activation(self.recons_activation)(h).astype(
            jnp.float32)

    def reparameterize(self, mu: Array, log_var: Array) -> Array:
        std = jnp.exp(0.5 * log_var)
        eps = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        return mu + eps * std

    def trunk(self, x: Array, train: bool = False):
        mu, log_var = self.encode(x, train=train)
        return (mu, log_var), None

    def heads(self, features, aux, x: Array, train: bool = False
              ) -> Dict[str, Any]:
        mu, log_var = features
        z = self.reparameterize(mu, log_var)
        recons = self.decode(z, train=train)
        return {"recons": recons, "mu": mu, "log_var": log_var, "z": z,
                "is_training": train}

    def __call__(self, x: Array, train: bool = False):
        features, aux = self.trunk(x, train=train)
        return self.heads(features, aux, x, train=train)

    def _recon_fn(self):
        fn, _ = obj_lib.get_recon_obj_and_activation(
            self.recons_objective, self.recons_activation)
        return fn

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        recons, mu = outputs["recons"], outputs["mu"]
        log_var, z = outputs["log_var"], outputs["z"]
        b, d = z.shape
        dataset_size = float(self.dataset_size or 50000)

        recons_loss = self._recon_fn()(x, recons)
        log_q_zx = jnp.sum(log_density_gaussian(z, mu, log_var), axis=1)
        log_p_z = jnp.sum(log_density_gaussian(z, jnp.zeros_like(z),
                                               jnp.zeros_like(z)), axis=1)

        mat = log_density_gaussian(z[:, None, :], mu[None, :, :],
                                   log_var[None, :, :])  # (B, B, D)

        # minibatch stratified importance weights (betatc_vae.py:273-289).
        # NB: torch's ``view(-1)[::B]`` / ``[1::B]`` address columns 0 and 1
        # of the BxB matrix, not the diagonal — replicated faithfully.
        strat = (dataset_size - b + 1) / (dataset_size * (b - 1))
        iw = jnp.full((b, b), 1.0 / (b - 1), jnp.float32)
        iw = iw.at[:, 0].set(1.0 / dataset_size)
        iw = iw.at[:, 1].set(strat)
        iw = iw.at[b - 2, 0].set(strat)
        mat = mat + jnp.log(iw)[:, :, None]

        log_q_z = jax.scipy.special.logsumexp(jnp.sum(mat, axis=2), axis=1)
        log_prod_q_z = jnp.sum(jax.scipy.special.logsumexp(mat, axis=1),
                               axis=1)

        mi_loss = jnp.mean(log_q_zx - log_q_z)
        tc_loss = jnp.mean(log_q_z - log_prod_q_z)
        kld_loss = jnp.mean(log_prod_q_z - log_p_z)

        # linear KLD anneal, counter carried in batch_stats
        # (betatc_vae.py:298-302)
        training = bool(outputs.get("is_training", False))
        if training and not self.is_initializing():
            self.num_iter.value = self.num_iter.value + 1.0
        anneal = jnp.where(
            jnp.asarray(training),
            jnp.minimum(self.num_iter.value / self.anneal_steps, 1.0), 1.0)

        return {
            "reconstruction_loss": lw["reconstruction_loss"] * recons_loss,
            "mi_loss": lw["mi_loss"] * mi_loss,
            "tc_loss": lw["tc_loss"] * tc_loss,
            "kld": lw["kld"] * anneal * kld_loss,
        }

    def sample(self, num_samples: int) -> Array:
        z = jax.random.normal(self.make_rng("sample"),
                              (num_samples, self.latent_dim), jnp.float32)
        return self.decode(z, train=False)
