"""VQ-VAE with decomposed (reconstruction, embedding, commitment) objectives.

TPU-native rebuild of the reference VQVAE
(/root/reference/models/vq_vae.py:148-528): k4-s2 conv downsample per hidden
dim, a k3 conv, ``num_residual_layers`` residual blocks (k3 + k1), a 1x1
projection to the embedding dim, the fused vector-quantizer
(movae_tpu.ops.vq — Pallas on TPU), and the mirrored decoder. The codebook is
loss-based exactly as the reference (embedding + commitment MSEs, vq_vae.py:
51-52; no EMA by default — EMA is available via
``movae_tpu.ops.vq.ema_codebook_update``).

Objectives: reconstruction_loss, embedding_loss, commitment_loss
(vq_vae.py:185). Features: ``encoding`` — the pre-quantization latents
(vq_vae.py:187), so the MTL feature path pulls the aggregated cotangent back
through the encoder only.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from movae_tpu import objectives as obj_lib
from movae_tpu.models.base import LambdaWeights, MOVAEModel, resolve_activation
from movae_tpu.ops import vq as vq_ops

Array = jax.Array


class ResidualLayer(nn.Module):
    """k3 conv -> ReLU -> k1 conv residual block (vq_vae.py:127-145)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # reference order: conv k3 -> ReLU -> conv k1 (vq_vae.py:136-141);
        # torch-forward-exactness pinned by tests/test_torch_import.py
        h = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv3")(x)
        h = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(nn.relu(h))
        return x + h


class Codebook(nn.Module):
    """Learnable codebook; init U(-1/K, 1/K) (vq_vae.py:24-25).

    ``ema=True`` switches to the EMA-maintained codebook of van den Oord
    2017 (appendix A.1): the codebook moves to the mutable ``batch_stats``
    collection (it is state, not a gradient parameter) together with the
    EMA cluster counts and embedding sums; :meth:`apply_ema` performs the
    decay update in-step. The reference is loss-based only (vq_vae.py:51-52)
    — this is the documented extension (BASELINE.md)."""

    num_embeddings: int
    embedding_dim: int
    ema: bool = False
    ema_decay: float = 0.99
    # dead-code restart: codes whose EMA cluster count decays below the
    # threshold are re-seeded from random batch latents (standard remedy for
    # EMA codebook collapse; the loss-based reference has no analog)
    ema_restart_threshold: float = 0.01

    def setup(self):
        k = self.num_embeddings

        def init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32,
                                      -1.0 / k, 1.0 / k)

        if self.ema:
            self.embedding_var = self.variable(
                "batch_stats", "embedding",
                lambda: init(self.make_rng("params"),
                             (k, self.embedding_dim)))
            self.cluster_var = self.variable(
                "batch_stats", "cluster_size",
                lambda: jnp.zeros((k,), jnp.float32))
            self.ema_embed_var = self.variable(
                "batch_stats", "ema_embed",
                lambda: jnp.array(self.embedding_var.value))
        else:
            self.embedding = self.param("embedding", init,
                                        (k, self.embedding_dim))

    def _emb(self) -> Array:
        return self.embedding_var.value if self.ema else self.embedding

    def __call__(self) -> Array:
        return self._emb()

    def embed_code(self, code: Array) -> Array:
        return jnp.take(self._emb(), code, axis=0)

    def apply_ema(self, z_flat: Array, inds: Array):
        """EMA decay update from this batch's assignments (train only),
        plus dead-code restart."""
        if not self.ema or self.is_initializing():
            return
        z_flat = jax.lax.stop_gradient(z_flat.astype(jnp.float32))
        new_cb, new_cluster, new_sum = vq_ops.ema_codebook_update(
            self.embedding_var.value, self.cluster_var.value,
            self.ema_embed_var.value, z_flat,
            jax.lax.stop_gradient(inds), decay=self.ema_decay)
        if self.ema_restart_threshold > 0:
            rows = jax.random.randint(self.make_rng("sample"),
                                      (self.num_embeddings,), 0,
                                      z_flat.shape[0])
            seeds = z_flat[rows]
            dead = new_cluster < self.ema_restart_threshold
            new_cb = jnp.where(dead[:, None], seeds, new_cb)
            new_sum = jnp.where(dead[:, None], seeds, new_sum)
            new_cluster = jnp.where(dead, 1.0, new_cluster)
        self.embedding_var.value = new_cb
        self.cluster_var.value = new_cluster
        self.ema_embed_var.value = new_sum


class VQVAE(MOVAEModel):
    in_channels: int = 3
    embedding_dim: int = 64
    num_embeddings: int = 512
    hidden_dims: Tuple[int, ...] = (128, 256)
    num_residual_layers: int = 2
    input_size: int = 64
    recons_activation: str = "tanh"
    recons_objective: str = "mse"
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("embedding_loss", 1.0),
        ("commitment_loss", 0.25),
    )
    dtype: Any = jnp.float32
    use_pallas_vq: Optional[bool] = None
    perceptual_fn: Optional[Any] = None
    vq_ema: bool = False
    vq_ema_decay: float = 0.99

    feature_names = ("encoding",)

    @property
    def objective_names(self) -> Tuple[str, ...]:
        if self.vq_ema:
            # EMA maintains the codebook; the embedding loss has no gradient
            # path and is dropped from the objective vector
            return ("reconstruction_loss", "commitment_loss")
        return ("reconstruction_loss", "embedding_loss", "commitment_loss")

    @property
    def latent_spatial_dim(self) -> int:
        return self.input_size // (2 ** len(self.hidden_dims))

    def setup(self):
        hd = tuple(self.hidden_dims)
        self.enc_convs = [
            nn.Conv(h, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name=f"enc_conv_{i}")
            for i, h in enumerate(hd)
        ]
        self.enc_mid = nn.Conv(hd[-1], (3, 3), padding="SAME",
                               dtype=self.dtype, name="enc_mid")
        self.enc_res = [
            ResidualLayer(hd[-1], dtype=self.dtype, name=f"enc_res_{i}")
            for i in range(self.num_residual_layers)
        ]
        self.enc_proj = nn.Conv(self.embedding_dim, (1, 1), dtype=self.dtype,
                                name="enc_proj")
        self.vq = Codebook(self.num_embeddings, self.embedding_dim,
                           ema=self.vq_ema, ema_decay=self.vq_ema_decay,
                           name="vq")

        self.dec_in = nn.Conv(hd[-1], (3, 3), padding="SAME",
                              dtype=self.dtype, name="dec_in")
        self.dec_res = [
            ResidualLayer(hd[-1], dtype=self.dtype, name=f"dec_res_{i}")
            for i in range(self.num_residual_layers)
        ]
        rev = tuple(reversed(hd))
        self.dec_deconvs = [
            nn.ConvTranspose(rev[i + 1], (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name=f"dec_deconv_{i}")
            for i in range(len(rev) - 1)
        ]
        self.dec_final = nn.ConvTranspose(self.in_channels, (4, 4),
                                          strides=(2, 2), padding="SAME",
                                          dtype=self.dtype, name="dec_final")

    # --- encoder / decoder -------------------------------------------------
    def encode(self, x: Array, train: bool = False) -> Array:
        h = x.astype(self.dtype)
        for conv in self.enc_convs:
            h = nn.leaky_relu(conv(h), negative_slope=0.01)
        h = nn.leaky_relu(self.enc_mid(h), negative_slope=0.01)
        for res in self.enc_res:
            h = res(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.leaky_relu(self.enc_proj(h), negative_slope=0.01)
        return h.astype(jnp.float32)

    def decode(self, z: Array, train: bool = False) -> Array:
        h = nn.leaky_relu(self.dec_in(z.astype(self.dtype)),
                          negative_slope=0.01)
        for res in self.dec_res:
            h = res(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        for deconv in self.dec_deconvs:
            h = nn.leaky_relu(deconv(h), negative_slope=0.01)
        h = self.dec_final(h)
        act = resolve_activation(self.recons_activation)
        return act(h).astype(jnp.float32)

    # --- trunk / heads ------------------------------------------------------
    def trunk(self, x: Array, train: bool = False):
        encoding = self.encode(x, train=train)
        return (encoding,), None

    def heads(self, features, aux, x: Array, train: bool = False
              ) -> Dict[str, Any]:
        (encoding,) = features
        vq_out = vq_ops.vector_quantize(encoding, self.vq(),
                                        use_pallas=self.use_pallas_vq)
        if self.vq_ema and train:
            self.vq.apply_ema(encoding.reshape(-1, self.embedding_dim),
                              vq_out["encoding_inds"])
        recons = self.decode(vq_out["quantized"], train=train)
        return {
            "recons": recons,
            "quantized_inputs": vq_out["quantized"],
            "encoding": encoding,
            "commitment_loss": vq_out["commitment"],
            "embedding_loss": vq_out["embedding"],
            "encoding_inds": vq_out["encoding_inds"],
        }

    # --- losses ------------------------------------------------------------
    def _recon_fn(self):
        if self.recons_objective.lower() == "perceptual":
            return self.perceptual_fn
        fn, _ = obj_lib.get_recon_obj_and_activation(
            self.recons_objective, self.recons_activation)
        return fn

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        out = {}
        for key in self.objective_names:
            if key == "embedding_loss":
                v = outputs["embedding_loss"]
            elif key == "commitment_loss":
                v = outputs["commitment_loss"]
            elif key == "reconstruction_loss":
                v = self._recon_fn()(x, outputs["recons"])
            else:
                v = self._extra_loss(key, x, outputs)
            out[key] = lw[key] * v
        return out

    def _extra_loss(self, key, x, outputs):  # hook for GG variants
        raise KeyError(key)

    # --- code extraction & generation ----------------------------------------
    def get_code_indices(self, x: Array) -> Array:
        """Discrete code grid for prior training (vq_vae.py:393-423)."""
        encoding = self.encode(x, train=False)
        b, h, w, d = encoding.shape
        _, inds = vq_ops.vq_lookup(encoding.reshape(-1, d), self.vq(),
                                   use_pallas=self.use_pallas_vq)
        return inds.reshape(b, h, w)

    def decode_code(self, code: Array) -> Array:
        """code (B, h, w) int -> images."""
        q = self.vq.embed_code(code)
        return self.decode(q, train=False)

    def sample(self, num_samples: int) -> Array:
        """Uniform-random codebook sampling (vq_vae.py:425-478); proper
        sampling uses a trained prior (movae_tpu.models.pixelcnn)."""
        s = self.latent_spatial_dim
        code = jax.random.randint(self.make_rng("sample"),
                                  (num_samples, s, s), 0, self.num_embeddings)
        return self.decode_code(code)
