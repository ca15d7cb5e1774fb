"""Import reference MO-VAE *torch* checkpoints into this framework.

A user of the reference (`rkhosrowshahi/MO-VAE`) has trained checkpoints
saved by ``torch.save`` — ``final_checkpoint.pth`` payloads
(``{model_state_dict, args, ...}``, reference main.py:1422-1437) and prior
checkpoints ``best_prior.pth``/``final_prior.pth``
(``{model_state_dict, epoch, loss}``, main.py:1037-1047). This module maps
those state_dicts onto our flax parameter trees so existing reference runs
carry over losslessly:

  * torch Conv2d OIHW -> flax HWIO (transpose),
  * torch ConvTranspose2d (I,O,kh,kw) -> flax conv_transpose HWIO with the
    spatial taps flipped,
  * torch Linear (out,in) -> flax Dense (in,out),
  * torch 1x1 Conv2d used as a projection -> flax Dense,
  * BatchNorm weight/bias -> scale/bias, running stats -> batch_stats.

Every transform is verified **bit-exact** against torch forward passes in
tests/test_torch_import.py (torch-CPU is an environment dependency); the
flax VAE-family modules use torch-exact explicit conv paddings for this
reason (models/vae.py setup note).

Supported archs: vae, gg_vae*, betatc_vae, recursive_kl_vae, cycle_vae,
recursive_cyclic_vae, sphere_encoder, vq_vae, gg_vq_vae*, vq_vae2,
gg_vq_vae2, and the priors (pixelcnn / pixelsnail / hierarchical_*).
Layer counts are inferred from the state_dict keys; unconsumed keys (other
than known non-parameter buffers: conv masks, sobel filters, BN counters)
are a hard error, as is an unexpectedly missing key — imports are strict,
never silent-partial.

The module is torch-free: callers hand it a ``{name: np.ndarray}`` dict
(see :func:`load_torch_state_dict`, which uses torch only to deserialize).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

# state_dict entries that are buffers/bookkeeping, not parameters:
# masked-conv masks (pixelcnn_prior.py:25-54), sobel filter buffers
# (gg_vae.py:44-54, gg_vq_vae.py:57-60), BatchNorm step counters.
_IGNORE = re.compile(r"(\.mask$|sobel|num_batches_tracked$"
                     r"|\.pe$|rotary\.inv_freq$)")


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> flax ConvTranspose (kh,kw,I,O)
    with both spatial axes flipped (verified exact: torch conv_transpose is
    the conv adjoint = fractionally-strided correlation with flipped taps,
    while lax.conv_transpose(transpose_kernel=False) applies the kernel
    unflipped)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _lin_w(w: np.ndarray) -> np.ndarray:
    """torch Linear (out,in) -> flax Dense (in,out)."""
    return np.transpose(w)


def _c1x1_dense_w(w: np.ndarray) -> np.ndarray:
    """torch 1x1 Conv2d (O,I,1,1) used as a pointwise projection -> flax
    Dense kernel (I,O) (PixelSNAIL attention projections,
    pixelcnn_prior.py:103-106)."""
    return np.transpose(w[:, :, 0, 0])


class TorchImportError(ValueError):
    pass


class _Importer:
    """Consumes a flat torch state_dict into flax params/batch_stats flat
    dicts, erroring on any missing or (at finish) unconsumed key."""

    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = {k: np.asarray(v) for k, v in state.items()}
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.bstats: Dict[Tuple[str, ...], np.ndarray] = {}

    def has(self, tkey: str) -> bool:
        return tkey in self.state

    def _take(self, tkey: str) -> np.ndarray:
        if tkey not in self.state:
            raise TorchImportError(f"missing torch key: {tkey}")
        return self.state.pop(tkey)

    def _put(self, fpath: str, value: np.ndarray):
        self.params[tuple(fpath.split("/"))] = np.asarray(value, np.float32)

    def conv(self, tprefix: str, fpath: str, bias: bool = True):
        self._put(fpath + "/kernel", _conv_w(self._take(tprefix + ".weight")))
        if bias:
            self._put(fpath + "/bias", self._take(tprefix + ".bias"))

    def convT(self, tprefix: str, fpath: str, bias: bool = True):
        self._put(fpath + "/kernel",
                  _convT_w(self._take(tprefix + ".weight")))
        if bias:
            self._put(fpath + "/bias", self._take(tprefix + ".bias"))

    def dense(self, tprefix: str, fpath: str, bias: bool = True):
        self._put(fpath + "/kernel", _lin_w(self._take(tprefix + ".weight")))
        if bias:
            self._put(fpath + "/bias", self._take(tprefix + ".bias"))

    def dense_from_flat(self, tprefix: str, fpath: str, c: int, s: int):
        """torch Linear consuming a Flatten of a (C,S,S) feature map; our
        modules flatten NHWC -> (S,S,C), so the input columns are
        permuted accordingly."""
        w = self._take(tprefix + ".weight")  # (out, C*S*S)
        w = w.reshape(w.shape[0], c, s, s).transpose(0, 2, 3, 1).reshape(
            w.shape[0], -1)
        self._put(fpath + "/kernel", _lin_w(w))
        self._put(fpath + "/bias", self._take(tprefix + ".bias"))

    def dense_to_flat(self, tprefix: str, fpath: str, c: int, s: int):
        """torch Linear whose output is unflattened to (C,S,S); ours
        reshapes to (S,S,C), so output rows AND bias are permuted."""
        w = self._take(tprefix + ".weight")  # (C*S*S, in)
        w = w.reshape(c, s, s, -1).transpose(1, 2, 0, 3).reshape(
            -1, w.shape[1])
        self._put(fpath + "/kernel", _lin_w(w))
        b = self._take(tprefix + ".bias").reshape(c, s, s).transpose(
            1, 2, 0).reshape(-1)
        self._put(fpath + "/bias", b)

    def conv1x1_as_dense(self, tprefix: str, fpath: str):
        self._put(fpath + "/kernel",
                  _c1x1_dense_w(self._take(tprefix + ".weight")))
        self._put(fpath + "/bias", self._take(tprefix + ".bias"))

    def embedding(self, tkey: str, fpath: str):
        self._put(fpath, self._take(tkey))

    def norm(self, tprefix: str, fpath: str):
        """BatchNorm2d / LayerNorm: weight->scale, bias->bias; running
        stats (if present) -> batch_stats."""
        self._put(fpath + "/scale", self._take(tprefix + ".weight"))
        self._put(fpath + "/bias", self._take(tprefix + ".bias"))
        if self.has(tprefix + ".running_mean"):
            self.bstats[tuple((fpath + "/mean").split("/"))] = np.asarray(
                self._take(tprefix + ".running_mean"), np.float32)
            self.bstats[tuple((fpath + "/var").split("/"))] = np.asarray(
                self._take(tprefix + ".running_var"), np.float32)

    def count(self, pattern: str) -> int:
        return count_keys(self.state, pattern)

    def finish(self):
        left = [k for k in self.state if not _IGNORE.search(k)]
        if left:
            raise TorchImportError(
                f"unconsumed torch keys (unknown structure): {sorted(left)[:10]}"
                + (f" (+{len(left) - 10} more)" if len(left) > 10 else ""))
        from flax import traverse_util

        return (traverse_util.unflatten_dict(self.params),
                traverse_util.unflatten_dict(self.bstats))


# ---------------------------------------------------------------------------
# Arch mappers. Layer counts are inferred from the keys themselves.
# ---------------------------------------------------------------------------

def _norm_kind(im: _Importer, probe: str) -> str:
    if im.has(probe + ".running_mean"):
        return "batch"
    if im.has(probe + ".weight"):
        return "layer"
    return "none"


def _map_vae(im: _Importer, latent_heads: bool = True):
    """Reference VAE backbone (vae.py:116-175): encoder Sequentials of
    (Conv k3s2p1, norm, LeakyReLU), Flatten, mu/log_var Linears,
    decoder_input, decoder = Unflatten + (ConvT k3s2p1op1, norm, LeakyReLU),
    final_layer = (ConvT, norm, LeakyReLU, Conv k3, activation)."""
    H = im.count("encoder.{}.0.weight")
    if H == 0:
        raise TorchImportError("no encoder.<i>.0.weight keys: not a "
                               "reference VAE-family state_dict")
    norm = _norm_kind(im, "encoder.0.1")
    # flatten geometry: torch flattens NCHW -> (C,S,S); we flatten NHWC
    c = int(im.state[f"encoder.{H - 1}.0.weight"].shape[0])
    head = ("mu" if im.has("mu.weight")
            else "encoder_proj" if im.has("encoder_proj.weight")
            else "decoder_input")
    if not im.has(f"{head}.weight"):
        raise TorchImportError(f"missing torch key: {head}.weight")
    flat_key = ("decoder_input" if head == "decoder_input" else head)
    w = im.state[f"{flat_key}.weight"]
    flat = int(w.shape[0] if flat_key == "decoder_input" else w.shape[1])
    s = int(round((flat // c) ** 0.5))
    for i in range(H):
        im.conv(f"encoder.{i}.0", f"enc_conv_{i}")
        if norm != "none":
            im.norm(f"encoder.{i}.1", f"enc_norm_{i}")
    if latent_heads:
        im.dense_from_flat("mu", "mu", c, s)
        im.dense_from_flat("log_var", "log_var", c, s)
    im.dense_to_flat("decoder_input", "decoder_input", c, s)
    for i in range(H - 1):
        im.convT(f"decoder.{1 + i}.0", f"dec_deconv_{i}")
        if norm != "none":
            im.norm(f"decoder.{1 + i}.1", f"dec_norm_{i}")
    im.convT("final_layer.0", "final_deconv")
    if norm != "none":
        im.norm("final_layer.1", "final_norm_0")
    im.conv("final_layer.3", "final_conv")


def _map_sphere_encoder(im: _Importer):
    """SphereEncoder (sphere_encoder.py:75-107): VAE backbone with
    mu/log_var deleted and a single encoder_proj Linear."""
    H = im.count("encoder.{}.0.weight")
    c = int(im.state[f"encoder.{H - 1}.0.weight"].shape[0])
    flat = int(im.state["encoder_proj.weight"].shape[1])
    s = int(round((flat // c) ** 0.5))
    _map_vae(im, latent_heads=False)
    im.dense_from_flat("encoder_proj", "encoder_proj", c, s)


def _map_betatc(im: _Importer):
    """BetaTCVAE (betatc_vae.py:99-168): (Conv k4s2p1, LeakyReLU) encoder,
    fc->fc_mu/fc_var heads, plain decoder Sequential (no Unflatten module),
    final_layer = (ConvT, LeakyReLU, Conv, activation)."""
    H = im.count("encoder.{}.0.weight")
    c = int(im.state[f"encoder.{H - 1}.0.weight"].shape[0])
    flat = int(im.state["fc.weight"].shape[1])
    s = int(round((flat // c) ** 0.5))
    for i in range(H):
        im.conv(f"encoder.{i}.0", f"enc_conv_{i}")
    im.dense_from_flat("fc", "fc", c, s)
    im.dense("fc_mu", "fc_mu")
    im.dense("fc_var", "fc_var")
    im.dense_to_flat("decoder_input", "decoder_input", c, s)
    # KLD anneal counter lives in batch_stats here (reference uses a
    # class-level counter, betatc_vae.py:298-302); a fresh import starts
    # fully annealed-out at 0 like a fresh reference instance
    im.bstats[("num_iter",)] = np.zeros((), np.float32)
    for i in range(H - 1):
        im.convT(f"decoder.{i}.0", f"dec_deconv_{i}")
    im.convT("final_layer.0", "final_deconv")
    im.conv("final_layer.2", "final_conv")


def _map_vqvae(im: _Importer):
    """VQVAE (vq_vae.py:229-303): k4s2p1 downsamples, k3 mid conv,
    ResidualLayers (bias-free k3+k1, vq_vae.py:136-141), 1x1 projection,
    codebook, mirrored decoder."""
    # count() over encoder.<i>.0.weight covers the H k4 downsamples AND the
    # k3 mid conv (consecutive Sequential indices), so it returns H+1
    H = im.count("encoder.{}.0.weight")
    # residual count: decoder indices 1..R hold ResidualLayers
    R = 0
    while im.has(f"decoder.{1 + R}.resblock.0.weight"):
        R += 1
    # encoder: H downsamples, then mid conv at H, residuals at H+1..H+R,
    # LeakyReLU at H+1+R, projection at H+2+R (vq_vae.py:229-258)
    for i in range(H - 1):
        im.conv(f"encoder.{i}.0", f"enc_conv_{i}")
    im.conv(f"encoder.{H - 1}.0", "enc_mid")
    for r in range(R):
        im.conv(f"encoder.{H + r}.resblock.0", f"enc_res_{r}/conv3",
                bias=False)
        im.conv(f"encoder.{H + r}.resblock.2", f"enc_res_{r}/conv1",
                bias=False)
    im.conv(f"encoder.{H + 1 + R}.0", "enc_proj")
    im.embedding("vq_layer.embedding.weight", "vq/embedding")
    im.conv("decoder.0.0", "dec_in")
    for r in range(R):
        im.conv(f"decoder.{1 + r}.resblock.0", f"dec_res_{r}/conv3",
                bias=False)
        im.conv(f"decoder.{1 + r}.resblock.2", f"dec_res_{r}/conv1",
                bias=False)
    D = 0
    while im.has(f"decoder.{2 + R + D}.0.weight"):
        D += 1
    for i in range(D - 1):
        im.convT(f"decoder.{2 + R + i}.0", f"dec_deconv_{i}")
    im.convT(f"decoder.{2 + R + D - 1}.0", "dec_final")


def _map_rosinality_encoder(im: _Importer, tname: str, fname: str,
                            stride: int):
    """vq_vae2.py Encoder (vq_vae2.py:31-56): stride4 = convs at blocks
    0,2,4; stride2 = convs at blocks 0,2; then ResBlocks (conv.1 k3,
    conv.3 k1)."""
    if stride == 4:
        im.conv(f"{tname}.blocks.0", f"{fname}/down1")
        im.conv(f"{tname}.blocks.2", f"{fname}/down2")
        im.conv(f"{tname}.blocks.4", f"{fname}/mid")
        base = 5
    else:
        im.conv(f"{tname}.blocks.0", f"{fname}/down1")
        im.conv(f"{tname}.blocks.2", f"{fname}/mid")
        base = 3
    r = 0
    while im.has(f"{tname}.blocks.{base + r}.conv.1.weight"):
        im.conv(f"{tname}.blocks.{base + r}.conv.1", f"{fname}/res_{r}/conv3")
        im.conv(f"{tname}.blocks.{base + r}.conv.3", f"{fname}/res_{r}/conv1")
        r += 1


def _map_rosinality_decoder(im: _Importer, tname: str, fname: str,
                            stride: int):
    """vq_vae2.py Decoder (vq_vae2.py:62-100): k3 conv, ResBlocks, ReLU,
    then one (stride2) or two (stride4) ConvT k4s2p1."""
    im.conv(f"{tname}.blocks.0", f"{fname}/in")
    r = 0
    while im.has(f"{tname}.blocks.{1 + r}.conv.1.weight"):
        im.conv(f"{tname}.blocks.{1 + r}.conv.1", f"{fname}/res_{r}/conv3")
        im.conv(f"{tname}.blocks.{1 + r}.conv.3", f"{fname}/res_{r}/conv1")
        r += 1
    if stride == 4:
        im.convT(f"{tname}.blocks.{r + 2}", f"{fname}/up1")
        im.convT(f"{tname}.blocks.{r + 4}", f"{fname}/up2")
    else:
        im.convT(f"{tname}.blocks.{r + 2}", f"{fname}/up1")


def _map_vqvae2(im: _Importer):
    """VQVAE2 (vq_vae2.py:190-206), rosinality layout with both
    ``quantize_t``/``vq_top`` alias spellings accepted
    (train_prior_vqvae2.py load_vqvae2 tolerance)."""
    _map_rosinality_encoder(im, "enc_b", "enc_b", stride=4)
    _map_rosinality_encoder(im, "enc_t", "enc_t", stride=2)
    im.conv("quantize_conv_t", "quantize_conv_t")
    top_key = ("quantize_t.embedding.weight"
               if im.has("quantize_t.embedding.weight")
               else "vq_top.embedding.weight")
    im.embedding(top_key, "vq_top/embedding")
    _map_rosinality_decoder(im, "dec_t", "dec_t", stride=2)
    im.conv("quantize_conv_b", "quantize_conv_b")
    bot_key = ("quantize_b.embedding.weight"
               if im.has("quantize_b.embedding.weight")
               else "vq_bottom.embedding.weight")
    im.embedding(bot_key, "vq_bottom/embedding")
    im.convT("upsample_t", "upsample_t")
    _map_rosinality_decoder(im, "dec", "dec", stride=4)


def _map_vit_block(im: _Importer, t: str, f: str):
    """TransformerBlock (sphere_encoder_vit.py:170-190): pre-LN, fused-qkv
    RoPE attention (identical qkv reshape + interleaved rotation in both
    frameworks), 2-layer GELU MLP."""
    im.norm(f"{t}.norm1", f"{f}/norm1")
    im.dense(f"{t}.attn.qkv", f"{f}/attn/qkv")
    im.dense(f"{t}.attn.proj", f"{f}/attn/proj")
    im.norm(f"{t}.norm2", f"{f}/norm2")
    # mlp Sequential = [Linear, GELU, Dropout, Linear, Dropout]
    # (sphere_encoder_vit.py:179-185): the second Linear is index 3
    # (r4 fix — index 2 is the Dropout; caught by the sphere-ViT
    # cross-framework lockstep's strict weight sync)
    im.dense(f"{t}.mlp.0", f"{f}/mlp1")
    im.dense(f"{t}.mlp.3", f"{f}/mlp2")


def _map_mixer(im: _Importer, t: str, f: str):
    """MLPMixer (sphere_encoder_vit.py:193-232): RMSNorm (weight only) +
    token-mix / channel-mix Linear pairs, trailing RMSNorm."""
    b = 0
    while im.has(f"{t}.blocks.{b}.norm1.weight"):
        im._put(f"{f}/block_{b}/norm1/weight",
                im._take(f"{t}.blocks.{b}.norm1.weight"))
        im.dense(f"{t}.blocks.{b}.token_mix.0", f"{f}/block_{b}/tok1")
        im.dense(f"{t}.blocks.{b}.token_mix.2", f"{f}/block_{b}/tok2")
        im._put(f"{f}/block_{b}/norm2/weight",
                im._take(f"{t}.blocks.{b}.norm2.weight"))
        im.dense(f"{t}.blocks.{b}.channel_mix.0", f"{f}/block_{b}/ch1")
        im.dense(f"{t}.blocks.{b}.channel_mix.2", f"{f}/block_{b}/ch2")
        b += 1
    im._put(f"{f}/norm/weight", im._take(f"{t}.norm.weight"))


def _map_sphere_vit(im: _Importer):
    """SphereEncoderViT (sphere_encoder_vit.py:235-320)."""
    im.conv("patch_embed_enc.proj", "patch_embed_enc")
    i = 0
    while im.has(f"blocks_enc.{i}.norm1.weight"):
        _map_vit_block(im, f"blocks_enc.{i}", f"enc_block_{i}")
        i += 1
    _map_mixer(im, "mixer_enc", "mixer_enc")
    im._put("norm_enc/weight", im._take("norm_enc.weight"))
    im.dense("latent_proj_enc", "latent_proj_enc")
    im.dense("latent_proj_dec", "latent_proj_dec")
    im._put("norm_dec_in/weight", im._take("norm_dec_in.weight"))
    _map_mixer(im, "mixer_dec", "mixer_dec")
    i = 0
    while im.has(f"blocks_dec.{i}.norm1.weight"):
        _map_vit_block(im, f"blocks_dec.{i}", f"dec_block_{i}")
        i += 1
    im.norm("norm_dec_out", "norm_dec_out")
    im.dense("head_dec", "head_dec")


def _map_gated_res(im: _Importer, tprefix: str, fprefix: str):
    im.conv(f"{tprefix}.conv1", f"{fprefix}/conv1")
    im.conv(f"{tprefix}.conv2", f"{fprefix}/conv2")
    im.conv(f"{tprefix}.conv_gate", f"{fprefix}/conv_gate")
    im.conv(f"{tprefix}.conv_feature", f"{fprefix}/conv_feature")


def _map_pixelcnn(im: _Importer, t: str = "", f: str = ""):
    """PixelCNN prior (pixelcnn_prior.py:262-290). ``t``/``f`` prefixes
    support the hierarchical sub-priors."""
    im.embedding(f"{t}embedding.weight", f"{f}embedding/embedding")
    im.conv(f"{t}conv_in", f"{f}conv_in")
    l = 0
    while im.has(f"{t}res_blocks.{l}.conv1.weight"):
        _map_gated_res(im, f"{t}res_blocks.{l}", f"{f}res_{l}")
        l += 1
    im.conv(f"{t}conv_out.1", f"{f}out1")
    im.conv(f"{t}conv_out.3", f"{f}out2")


def _map_pixelsnail(im: _Importer, t: str = "", f: str = ""):
    """PixelSNAIL prior (pixelcnn_prior.py:175-200): PixelSNAILBlocks of
    GatedResBlocks + CausalAttention2d (1x1-conv projections -> Dense)."""
    im.embedding(f"{t}embedding.weight", f"{f}embedding/embedding")
    im.conv(f"{t}conv_in", f"{f}conv_in")
    b = 0
    while im.has(f"{t}blocks.{b}.out_conv.weight"):
        r = 0
        while im.has(f"{t}blocks.{b}.res_blocks.{r}.conv1.weight"):
            _map_gated_res(im, f"{t}blocks.{b}.res_blocks.{r}",
                           f"{f}block_{b}/res_{r}")
            r += 1
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            im.conv1x1_as_dense(f"{t}blocks.{b}.attention.{proj}",
                                f"{f}block_{b}/attention/{proj}")
        im.conv(f"{t}blocks.{b}.out_conv", f"{f}block_{b}/out_conv")
        b += 1
    im.conv(f"{t}conv_out.1", f"{f}out1")
    im.conv(f"{t}conv_out.3", f"{f}out2")


def _map_hierarchical(im: _Importer):
    """HierarchicalPixelCNN / HierarchicalPixelSNAIL
    (pixelcnn_prior.py:352-480): top prior (attention variant sniffed from
    the keys), top-code embedding + ConvT upsample, bottom PixelCNN."""
    if im.has("prior_top.blocks.0.out_conv.weight"):
        _map_pixelsnail(im, "prior_top.", "prior_top/")
    else:
        _map_pixelcnn(im, "prior_top.", "prior_top/")
    im.embedding("embedding_top.weight", "embedding_top/embedding")
    im.convT("upsample_top", "upsample_top")
    _map_pixelcnn(im, "prior_bottom.", "prior_bottom/")


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

_VAE_FAMILY = ("vae", "gg_vae", "gg_vae_v2", "gg_vae_v3", "gg_vae_v5",
               "gg_vae_v6", "recursive_kl_vae", "cycle_vae",
               "recursive_cyclic_vae")


def _mapper_for(arch: str):
    a = arch.lower()
    if a in _VAE_FAMILY:
        return _map_vae
    if a == "sphere_encoder":
        return _map_sphere_encoder
    if a == "sphere_encoder_vit":
        return _map_sphere_vit
    if a == "betatc_vae":
        return _map_betatc
    if a == "vq_vae" or a.startswith("gg_vq_vae_v") or a == "gg_vq_vae":
        return _map_vqvae
    if a in ("vq_vae2", "gg_vq_vae2"):
        return _map_vqvae2
    if a == "pixelcnn":
        return _map_pixelcnn
    if a == "pixelsnail":
        return _map_pixelsnail
    if a in ("hierarchical_pixelcnn", "hierarchical_pixelsnail"):
        return _map_hierarchical
    raise TorchImportError(f"torch import not supported for arch '{arch}'")


def import_torch_state_dict(state: Dict[str, np.ndarray], arch: str
                            ) -> Tuple[Dict, Dict]:
    """Map a reference torch ``state_dict`` (as numpy arrays) for ``arch``
    onto (params, batch_stats) flax trees. Strict: raises TorchImportError
    on missing or unconsumed keys."""
    im = _Importer(state)
    _mapper_for(arch)(im)
    return im.finish()


def count_keys(mapping, pattern: str) -> int:
    """Number of consecutive indices i (from 0) for which
    ``pattern.format(i)`` is a key of ``mapping``."""
    i = 0
    while pattern.format(i) in mapping:
        i += 1
    return i


def prior_from_state(state: Dict[str, np.ndarray], arch: str,
                     num_heads: int = 8):
    """Build the flax prior module whose config matches a reference prior
    state_dict — shapes/counts inferred from the keys, the same way
    train_prior_vqvae.py infers K/D from the codebook
    (train_prior_vqvae.py:169-173). ``num_heads`` is NOT shape-inferrable
    (the q/k/v projections are full-width); callers with a VQ-run args
    echo should pass its ``pixelsnail_num_heads``."""
    from movae_tpu.models.pixelcnn import (HierarchicalPixelCNN,
                                           HierarchicalPixelSNAIL, PixelCNN,
                                           PixelSNAIL)

    def count(pat):
        return count_keys(state, pat)

    arch = arch.lower()
    if arch in ("hierarchical_pixelcnn", "hierarchical_pixelsnail"):
        k, d = state["embedding_top.weight"].shape
        hc = state["prior_bottom.conv_in.weight"].shape[0]
        nb = count("prior_bottom.res_blocks.{}.conv1.weight")
        if arch == "hierarchical_pixelsnail":
            nt = count("prior_top.blocks.{}.out_conv.weight")
            nr = count("prior_top.blocks.0.res_blocks.{}.conv1.weight")
            return HierarchicalPixelSNAIL(
                num_embeddings=k, embedding_dim=d, hidden_channels=hc,
                num_blocks_top=nt, num_res_blocks_per_layer=nr,
                num_heads=num_heads, num_layers_bottom=nb)
        # the reference hierarchical PixelCNN shares one num_layers between
        # the two levels (pixelcnn_prior.py:370-390), as does ours
        nt = count("prior_top.res_blocks.{}.conv1.weight")
        if nt != nb:
            raise TorchImportError(
                f"hierarchical_pixelcnn with top/bottom layer counts "
                f"{nt}/{nb}: the reference constructor cannot produce this")
        return HierarchicalPixelCNN(
            num_embeddings=k, embedding_dim=d, hidden_channels=hc,
            num_layers=nb)
    k, d = state["embedding.weight"].shape
    hc = state["conv_in.weight"].shape[0]
    if arch == "pixelsnail":
        nb = count("blocks.{}.out_conv.weight")
        nr = count("blocks.0.res_blocks.{}.conv1.weight")
        return PixelSNAIL(num_embeddings=k, embedding_dim=d,
                          hidden_channels=hc, num_blocks=nb,
                          num_res_blocks_per_layer=nr, num_heads=num_heads)
    nl = count("res_blocks.{}.conv1.weight")
    return PixelCNN(num_embeddings=k, embedding_dim=d, hidden_channels=hc,
                    num_layers=nl)


def sniff_prior_arch(state: Dict[str, np.ndarray]) -> str:
    """Identify a reference prior state_dict from its keys (the prior
    checkpoints carry no args echo, main.py:1037-1047). Returns '' if the
    layout is not a prior."""
    if "prior_top.embedding.weight" in state:
        return ("hierarchical_pixelsnail"
                if "prior_top.blocks.0.out_conv.weight" in state
                else "hierarchical_pixelcnn")
    if "embedding.weight" in state and "conv_in.weight" in state:
        return ("pixelsnail" if "blocks.0.out_conv.weight" in state
                else "pixelcnn")
    return ""


def load_reference_checkpoint(path: str, arch: str = None) -> Dict[str, Any]:
    """Load a reference torch ``.pth`` checkpoint file and return it as
    this framework's checkpoint payload
    (``{"model_state_dict": {"params", "batch_stats"}, "args", ...}``) —
    the drop-in hook behind ``train/checkpoint.load_checkpoint`` accepting
    ``.pth`` paths directly."""
    state, meta = load_torch_state_dict(path)
    saved_args = dict(meta.get("args") or {})
    arch = (arch or saved_args.get("arch") or sniff_prior_arch(state)
            or "").lower()
    if not arch:
        raise TorchImportError(
            f"{path} has no 'args' echo and no recognizable prior layout; "
            "import it with scripts/import_torch_checkpoint.py "
            "--arch <arch>")
    params, bstats = import_torch_state_dict(state, arch)
    out: Dict[str, Any] = {
        "model_state_dict": {"params": params, "batch_stats": bstats},
        "args": saved_args,
    }
    if arch in ("pixelcnn", "pixelsnail", "hierarchical_pixelcnn",
                "hierarchical_pixelsnail"):
        # echo the shape-inferrable prior hyperparameters so build_prior
        # reconstructs the right module without CLI flags (num_heads is not
        # shape-inferrable; it comes from the VQ-run args echo / CLI)
        cfg = prior_from_state(state, arch)
        prior_args = {
            "prior_type": ("pixelsnail" if "pixelsnail" in arch
                           else "pixelcnn"),
            # distinct key so the echo wins over the VQ model's D in
            # build_prior without shadowing the VQ args' embedding_dim
            "prior_embedding_dim": cfg.embedding_dim,
            "pixelcnn_hidden_channels": cfg.hidden_channels,
        }
        if "pixelsnail" in arch:
            prior_args["pixelsnail_num_blocks"] = getattr(
                cfg, "num_blocks", getattr(cfg, "num_blocks_top", 8))
            prior_args["pixelsnail_num_res_blocks"] = (
                cfg.num_res_blocks_per_layer)
        if arch.startswith("hierarchical"):
            prior_args["pixelcnn_num_layers"] = getattr(
                cfg, "num_layers_bottom", getattr(cfg, "num_layers", 15))
        elif arch == "pixelcnn":
            prior_args["pixelcnn_num_layers"] = cfg.num_layers
        out["prior_args"] = prior_args
    for k in ("epoch", "train_losses", "eval_losses", "best_eval_loss",
              "loss"):
        if k in meta:
            out[k] = meta[k]
    return out


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """torch.load a reference checkpoint file; returns (state_dict as
    numpy, the remaining payload metadata e.g. the echoed ``args``)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = payload.get("model_state_dict", payload)
    meta = {k: v for k, v in payload.items() if k != "model_state_dict"}
    return ({k: v.detach().cpu().numpy() for k, v in state.items()},
            meta)
