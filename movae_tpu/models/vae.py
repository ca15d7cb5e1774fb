"""Vanilla VAE with a decomposed (reconstruction, KL) objective.

TPU-native re-design of the reference VAE (/root/reference/models/vae.py:28-285):
same capability surface — stride-2 conv encoder over ``hidden_dims`` with
norm + LeakyReLU, linear mu/log_var heads, mirrored ConvTranspose decoder
with a final conv + activation, reparameterized sampling — expressed as a
pure Flax module in NHWC layout with rng streams instead of implicit torch
randomness.

Objectives: ``reconstruction_loss``, ``kld_loss`` (vae.py:49).
Features (shared-trunk boundary for MTL): ``mu``, ``log_var`` (vae.py:51).
"""

from __future__ import annotations

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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact accumulation semantics (torch
    nn.BatchNorm2d, used by the reference VAE encoder/decoder,
    vae.py:77-117): normalization uses the BIASED batch variance, but the
    running variance accumulates the UNBIASED one (factor n/(n-1)).
    flax.linen.BatchNorm accumulates the biased variance, which leaves a
    ~1/n relative drift in running_var after in-framework training — an
    eval-mode-only deviation, but it shows up as a parameter-state delta in
    cross-framework studies (scripts/equivalence_study.py). Variance is
    computed two-pass (E[(x-mean)^2]) like torch, not E[x^2]-E[x]^2.

    ``momentum`` follows the flax keep-fraction convention
    (0.9 == torch momentum 0.1). batch_stats names match flax
    ('mean'/'var') so checkpoints and torch_export mappings are unchanged.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = False) -> Array:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


class VAE(MOVAEModel):
    latent_dim: int = 128
    input_size: int = 32
    in_channels: int = 3
    hidden_dims: Tuple[int, ...] = (32, 64, 128, 256, 512)
    layer_norm: str = "batch"
    recons_activation: str = "tanh"
    recons_objective: str = "mse"
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("kld_loss", 0.00025),
    )
    dtype: Any = jnp.float32
    # bound (inputs, recons) -> loss using frozen VGG features; set by the
    # registry when recons_objective == "perceptual" (objectives.py:35-42)
    perceptual_fn: Optional[Any] = None

    objective_names = ("reconstruction_loss", "kld_loss")
    feature_names = ("mu", "log_var")

    @property
    def spatial_dim(self) -> int:
        return self.input_size // (2 ** len(self.hidden_dims))

    @property
    def encoder_output_size(self) -> int:
        return self.hidden_dims[-1] * self.spatial_dim * self.spatial_dim

    def setup(self):
        # Torch-exact geometry (enables bit-exact torch checkpoint import,
        # utils/torch_import.py): the reference encoder convs are k3 s2 p1
        # (vae.py:122-124) = symmetric (1,1) padding, whereas flax "SAME"
        # at even input sizes pads only the high side; the reference
        # decoder deconvs are ConvTranspose k3 s2 p1 output_padding1
        # (vae.py:150-156) = flax conv_transpose padding ((1,2),(1,2))
        # (verified exact vs torch in tests/test_torch_import.py).
        hd = tuple(self.hidden_dims)
        self.enc_convs = [
            nn.Conv(h, kernel_size=(3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"enc_conv_{i}")
            for i, h in enumerate(hd)
        ]
        self.enc_norms = self._make_norms(len(hd), "enc_norm")
        self.mu_head = nn.Dense(self.latent_dim, dtype=self.dtype, name="mu")
        self.logvar_head = nn.Dense(self.latent_dim, dtype=self.dtype, name="log_var")

        self.decoder_input = nn.Dense(self.encoder_output_size, dtype=self.dtype,
                                      name="decoder_input")
        rev = tuple(reversed(hd))
        self.dec_deconvs = [
            nn.ConvTranspose(rev[i + 1], kernel_size=(3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), dtype=self.dtype,
                             name=f"dec_deconv_{i}")
            for i in range(len(rev) - 1)
        ]
        self.dec_norms = self._make_norms(len(rev) - 1, "dec_norm")
        self.final_deconv = nn.ConvTranspose(rev[-1], kernel_size=(3, 3),
                                             strides=(2, 2),
                                             padding=((1, 2), (1, 2)),
                                             dtype=self.dtype,
                                             name="final_deconv")
        self.final_norms = self._make_norms(1, "final_norm")
        self.final_conv = nn.Conv(self.in_channels, kernel_size=(3, 3), padding="SAME",
                                  dtype=self.dtype, name="final_conv")

    def _make_norms(self, n: int, prefix: str):
        kind = (self.layer_norm or "none").lower()
        if kind == "batch":
            return [TorchBatchNorm(momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype,
                                   name=f"{prefix}_{i}") for i in range(n)]
        if kind == "layer":
            return [nn.LayerNorm(dtype=self.dtype, name=f"{prefix}_{i}")
                    for i in range(n)]
        if kind == "none":
            return [None] * n
        raise ValueError(f"Layer norm {kind} not supported")

    def _apply_norm(self, norm, h: Array, train: bool) -> Array:
        if norm is None:
            return h
        if isinstance(norm, (nn.BatchNorm, TorchBatchNorm)):
            return norm(h, use_running_average=not train)
        return norm(h)

    # --- encoder / trunk ----------------------------------------------------
    def encode(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        h = x.astype(self.dtype)
        for conv, norm in zip(self.enc_convs, self.enc_norms):
            h = conv(h)
            h = self._apply_norm(norm, h, train)
            h = nn.leaky_relu(h, negative_slope=0.01)
        h = h.reshape((h.shape[0], -1))
        mu = self.mu_head(h).astype(jnp.float32)
        log_var = self.logvar_head(h).astype(jnp.float32)
        return mu, log_var

    def trunk(self, x: Array, train: bool = False):
        mu, log_var = self.encode(x, train=train)
        return (mu, log_var), None

    # --- decoder / heads ------------------------------------------------------
    def reparameterize(self, mu: Array, log_var: Array) -> Array:
        std = jnp.exp(0.5 * log_var)
        eps = jax.random.normal(self.make_rng("sample"), std.shape, dtype=std.dtype)
        return mu + eps * std

    def decode(self, z: Array, train: bool = False) -> Array:
        s = self.spatial_dim
        h = self.decoder_input(z.astype(self.dtype))
        h = h.reshape((z.shape[0], s, s, self.hidden_dims[-1]))
        for deconv, norm in zip(self.dec_deconvs, self.dec_norms):
            h = deconv(h)
            h = self._apply_norm(norm, h, train)
            h = nn.leaky_relu(h, negative_slope=0.01)
        h = self.final_deconv(h)
        h = self._apply_norm(self.final_norms[0], h, train)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = self.final_conv(h)
        act = resolve_activation(self.recons_activation)
        return act(h).astype(jnp.float32)

    def heads(self, features, aux, x: Array, train: bool = False) -> Dict[str, Any]:
        mu, log_var = features
        z = self.reparameterize(mu, log_var)
        recons = self.decode(z, train=train)
        return {"recons": recons, "mu": mu, "log_var": log_var, "z": z}

    # --- losses ---------------------------------------------------------------
    def _recon_fn(self):
        if self.recons_objective.lower() == "perceptual":
            if self.perceptual_fn is None:
                raise ValueError(
                    "recons_objective='perceptual' requires perceptual_fn "
                    "(built by the registry from movae_tpu.metrics.vgg)")
            return self.perceptual_fn
        fn, _ = obj_lib.get_recon_obj_and_activation(
            self.recons_objective, self.recons_activation
        )
        return fn

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        recon = self._recon_fn()(x, outputs["recons"])
        kld = obj_lib.kl_divergence(outputs["mu"], outputs["log_var"])
        return {
            "reconstruction_loss": lw["reconstruction_loss"] * recon,
            "kld_loss": lw["kld_loss"] * kld,
        }

    # --- generation -------------------------------------------------------------
    def sample(self, num_samples: int) -> Array:
        z = jax.random.normal(self.make_rng("sample"),
                              (num_samples, self.latent_dim), dtype=jnp.float32)
        return self.decode(z, train=False)
