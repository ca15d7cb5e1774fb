"""Export flax checkpoints back to reference-torch ``state_dict`` layout.

The inverse of utils/torch_import.py: a model trained here can be handed
back to the torch reference (or any torch tooling) as a
``final_checkpoint.pth``-shaped payload. Every transform is the exact
inverse of the import transform, and tests/test_torch_export.py asserts
``import(export(params)) == params`` bit-exactly for every supported arch
— the two layout descriptions can never drift apart silently.

Not exported: non-parameter buffers the reference keeps in its state_dict
(masked-conv masks, sobel filters, BN ``num_batches_tracked``); torch's
``load_state_dict(strict=False)`` — the reference's own restore mode
(evaluate.py:34-73) — accepts their absence.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from movae_tpu.utils import torch_import as ti


def _inv_conv_w(k: np.ndarray) -> np.ndarray:
    """flax HWIO -> torch Conv2d OIHW."""
    return np.transpose(k, (3, 2, 0, 1))


def _inv_convT_w(k: np.ndarray) -> np.ndarray:
    """flax ConvTranspose (kh,kw,I,O) flipped -> torch (I,O,kh,kw)."""
    return np.ascontiguousarray(np.transpose(k[::-1, ::-1], (2, 3, 0, 1)))


def _inv_lin_w(k: np.ndarray) -> np.ndarray:
    return np.transpose(k)


def _inv_dense_as_1x1(k: np.ndarray) -> np.ndarray:
    return np.transpose(k)[:, :, None, None]


class _Exporter:
    """Mirror of torch_import._Importer: the same mapper vocabulary, but
    each call reads the flax leaf and emits the torch key."""

    def __init__(self, params: Dict, bstats: Dict):
        from flax import traverse_util

        self.params = {"/".join(k): np.asarray(v) for k, v in
                       traverse_util.flatten_dict(params).items()}
        self.bstats = {"/".join(k): np.asarray(v) for k, v in
                       traverse_util.flatten_dict(bstats or {}).items()}
        self.state: Dict[str, np.ndarray] = {}

    def _get(self, fpath: str) -> np.ndarray:
        if fpath not in self.params:
            raise ti.TorchImportError(f"missing flax leaf: {fpath}")
        return self.params.pop(fpath)

    # mapper vocabulary ----------------------------------------------------
    def fhas(self, fpath: str) -> bool:
        return fpath in self.params

    def fcount(self, pattern: str) -> int:
        return ti.count_keys(self.params, pattern)

    def conv(self, tprefix: str, fpath: str, bias: bool = True):
        self.state[tprefix + ".weight"] = _inv_conv_w(
            self._get(fpath + "/kernel"))
        if bias:
            self.state[tprefix + ".bias"] = self._get(fpath + "/bias")

    def convT(self, tprefix: str, fpath: str, bias: bool = True):
        self.state[tprefix + ".weight"] = _inv_convT_w(
            self._get(fpath + "/kernel"))
        if bias:
            self.state[tprefix + ".bias"] = self._get(fpath + "/bias")

    def dense(self, tprefix: str, fpath: str, bias: bool = True):
        self.state[tprefix + ".weight"] = _inv_lin_w(
            self._get(fpath + "/kernel"))
        if bias:
            self.state[tprefix + ".bias"] = self._get(fpath + "/bias")

    def dense_from_flat(self, tprefix: str, fpath: str, c: int, s: int):
        k = _inv_lin_w(self._get(fpath + "/kernel"))  # (out, s*s*c)
        k = k.reshape(k.shape[0], s, s, c).transpose(0, 3, 1, 2).reshape(
            k.shape[0], -1)
        self.state[tprefix + ".weight"] = k
        self.state[tprefix + ".bias"] = self._get(fpath + "/bias")

    def dense_to_flat(self, tprefix: str, fpath: str, c: int, s: int):
        k = _inv_lin_w(self._get(fpath + "/kernel"))  # (s*s*c, in)
        k = k.reshape(s, s, c, -1).transpose(2, 0, 1, 3).reshape(
            -1, k.shape[1])
        self.state[tprefix + ".weight"] = k
        b = self._get(fpath + "/bias").reshape(s, s, c).transpose(
            2, 0, 1).reshape(-1)
        self.state[tprefix + ".bias"] = b

    def conv1x1_as_dense(self, tprefix: str, fpath: str):
        self.state[tprefix + ".weight"] = _inv_dense_as_1x1(
            self._get(fpath + "/kernel"))
        self.state[tprefix + ".bias"] = self._get(fpath + "/bias")

    def embedding(self, tkey: str, fpath: str):
        self.state[tkey] = self._get(fpath)

    def norm(self, tprefix: str, fpath: str):
        self.state[tprefix + ".weight"] = self._get(fpath + "/scale")
        self.state[tprefix + ".bias"] = self._get(fpath + "/bias")
        if fpath + "/mean" in self.bstats:
            self.state[tprefix + ".running_mean"] = self.bstats.pop(
                fpath + "/mean")
            self.state[tprefix + ".running_var"] = self.bstats.pop(
                fpath + "/var")
            self.state[tprefix + ".num_batches_tracked"] = np.zeros(
                (), np.int64)

    def finish(self) -> Dict[str, np.ndarray]:
        left = sorted(self.params)
        if left:
            raise ti.TorchImportError(
                f"unexported flax leaves (unknown structure): {left[:10]}")
        return self.state


# ---------------------------------------------------------------------------
# per-arch exporters (layouts cite the same reference lines as the import
# mappers; the round-trip test keeps both directions consistent)
# ---------------------------------------------------------------------------

def _flat_geom(ex: _Exporter, last_conv: str, head: str) -> Tuple[int, int]:
    c = int(ex.params[last_conv + "/kernel"].shape[3])
    flat = int(ex.params[head + "/kernel"].shape[0])
    return c, int(round((flat // c) ** 0.5))


def _export_vae(ex: _Exporter, latent_heads: bool = True):
    H = ex.fcount("enc_conv_{}/kernel")
    norm = ("batch" if "enc_norm_0/mean" in ex.bstats
            else "layer" if ex.fhas("enc_norm_0/scale") else "none")
    head = "mu" if ex.fhas("mu/kernel") else "encoder_proj"
    c, s = _flat_geom(ex, f"enc_conv_{H - 1}", head)
    for i in range(H):
        ex.conv(f"encoder.{i}.0", f"enc_conv_{i}")
        if norm != "none":
            ex.norm(f"encoder.{i}.1", f"enc_norm_{i}")
    if latent_heads:
        ex.dense_from_flat("mu", "mu", c, s)
        ex.dense_from_flat("log_var", "log_var", c, s)
    ex.dense_to_flat("decoder_input", "decoder_input", c, s)
    for i in range(H - 1):
        ex.convT(f"decoder.{1 + i}.0", f"dec_deconv_{i}")
        if norm != "none":
            ex.norm(f"decoder.{1 + i}.1", f"dec_norm_{i}")
    ex.convT("final_layer.0", "final_deconv")
    if norm != "none":
        ex.norm("final_layer.1", "final_norm_0")
    ex.conv("final_layer.3", "final_conv")


def _export_sphere(ex: _Exporter):
    H = ex.fcount("enc_conv_{}/kernel")
    c, s = _flat_geom(ex, f"enc_conv_{H - 1}", "encoder_proj")
    _export_vae(ex, latent_heads=False)
    ex.dense_from_flat("encoder_proj", "encoder_proj", c, s)


def _export_betatc(ex: _Exporter):
    H = ex.fcount("enc_conv_{}/kernel")
    c, s = _flat_geom(ex, f"enc_conv_{H - 1}", "fc")
    for i in range(H):
        ex.conv(f"encoder.{i}.0", f"enc_conv_{i}")
    ex.dense_from_flat("fc", "fc", c, s)
    ex.dense("fc_mu", "fc_mu")
    ex.dense("fc_var", "fc_var")
    ex.dense_to_flat("decoder_input", "decoder_input", c, s)
    for i in range(H - 1):
        ex.convT(f"decoder.{i}.0", f"dec_deconv_{i}")
    ex.convT("final_layer.0", "final_deconv")
    ex.conv("final_layer.2", "final_conv")
    ex.bstats.pop("num_iter", None)


def _export_vqvae(ex: _Exporter):
    H = ex.fcount("enc_conv_{}/kernel")
    R = ex.fcount("enc_res_{}/conv3/kernel")
    for i in range(H):
        ex.conv(f"encoder.{i}.0", f"enc_conv_{i}")
    ex.conv(f"encoder.{H}.0", "enc_mid")
    for r in range(R):
        ex.conv(f"encoder.{H + 1 + r}.resblock.0", f"enc_res_{r}/conv3",
                bias=False)
        ex.conv(f"encoder.{H + 1 + r}.resblock.2", f"enc_res_{r}/conv1",
                bias=False)
    ex.conv(f"encoder.{H + 2 + R}.0", "enc_proj")
    ex.embedding("vq_layer.embedding.weight", "vq/embedding")
    # EMA-codebook runs carry extra stats with no torch counterpart
    ex.bstats.pop("vq/cluster_size", None)
    ex.bstats.pop("vq/ema_embed", None)
    ex.conv("decoder.0.0", "dec_in")
    for r in range(R):
        ex.conv(f"decoder.{1 + r}.resblock.0", f"dec_res_{r}/conv3",
                bias=False)
        ex.conv(f"decoder.{1 + r}.resblock.2", f"dec_res_{r}/conv1",
                bias=False)
    D = ex.fcount("dec_deconv_{}/kernel") + 1
    for i in range(D - 1):
        ex.convT(f"decoder.{2 + R + i}.0", f"dec_deconv_{i}")
    ex.convT(f"decoder.{2 + R + D - 1}.0", "dec_final")


def _export_ros_encoder(ex: _Exporter, tname: str, fname: str, stride: int):
    if stride == 4:
        ex.conv(f"{tname}.blocks.0", f"{fname}/down1")
        ex.conv(f"{tname}.blocks.2", f"{fname}/down2")
        ex.conv(f"{tname}.blocks.4", f"{fname}/mid")
        base = 5
    else:
        ex.conv(f"{tname}.blocks.0", f"{fname}/down1")
        ex.conv(f"{tname}.blocks.2", f"{fname}/mid")
        base = 3
    R = ex.fcount(fname + "/res_{}/conv3/kernel")
    for r in range(R):
        ex.conv(f"{tname}.blocks.{base + r}.conv.1", f"{fname}/res_{r}/conv3")
        ex.conv(f"{tname}.blocks.{base + r}.conv.3", f"{fname}/res_{r}/conv1")


def _export_ros_decoder(ex: _Exporter, tname: str, fname: str, stride: int):
    ex.conv(f"{tname}.blocks.0", f"{fname}/in")
    R = ex.fcount(fname + "/res_{}/conv3/kernel")
    for r in range(R):
        ex.conv(f"{tname}.blocks.{1 + r}.conv.1", f"{fname}/res_{r}/conv3")
        ex.conv(f"{tname}.blocks.{1 + r}.conv.3", f"{fname}/res_{r}/conv1")
    if stride == 4:
        ex.convT(f"{tname}.blocks.{R + 2}", f"{fname}/up1")
        ex.convT(f"{tname}.blocks.{R + 4}", f"{fname}/up2")
    else:
        ex.convT(f"{tname}.blocks.{R + 2}", f"{fname}/up1")


def _export_vqvae2(ex: _Exporter):
    _export_ros_encoder(ex, "enc_b", "enc_b", 4)
    _export_ros_encoder(ex, "enc_t", "enc_t", 2)
    ex.conv("quantize_conv_t", "quantize_conv_t")
    ex.embedding("quantize_t.embedding.weight", "vq_top/embedding")
    _export_ros_decoder(ex, "dec_t", "dec_t", 2)
    ex.conv("quantize_conv_b", "quantize_conv_b")
    ex.embedding("quantize_b.embedding.weight", "vq_bottom/embedding")
    ex.convT("upsample_t", "upsample_t")
    _export_ros_decoder(ex, "dec", "dec", 4)
    for side in ("vq_top", "vq_bottom"):
        ex.bstats.pop(f"{side}/cluster_size", None)
        ex.bstats.pop(f"{side}/ema_embed", None)


def _export_vit_block(ex: _Exporter, t: str, f: str):
    ex.norm(f"{t}.norm1", f"{f}/norm1")
    ex.dense(f"{t}.attn.qkv", f"{f}/attn/qkv")
    ex.dense(f"{t}.attn.proj", f"{f}/attn/proj")
    ex.norm(f"{t}.norm2", f"{f}/norm2")
    # second Linear of the block MLP is Sequential index 3 (Dropout at 2,
    # sphere_encoder_vit.py:179-185; r4 fix, see torch_import twin)
    ex.dense(f"{t}.mlp.0", f"{f}/mlp1")
    ex.dense(f"{t}.mlp.3", f"{f}/mlp2")


def _export_mixer(ex: _Exporter, t: str, f: str):
    B = ex.fcount(f + "/block_{}/norm1/weight")
    for b in range(B):
        ex.state[f"{t}.blocks.{b}.norm1.weight"] = ex._get(
            f"{f}/block_{b}/norm1/weight")
        ex.dense(f"{t}.blocks.{b}.token_mix.0", f"{f}/block_{b}/tok1")
        ex.dense(f"{t}.blocks.{b}.token_mix.2", f"{f}/block_{b}/tok2")
        ex.state[f"{t}.blocks.{b}.norm2.weight"] = ex._get(
            f"{f}/block_{b}/norm2/weight")
        ex.dense(f"{t}.blocks.{b}.channel_mix.0", f"{f}/block_{b}/ch1")
        ex.dense(f"{t}.blocks.{b}.channel_mix.2", f"{f}/block_{b}/ch2")
    ex.state[f"{t}.norm.weight"] = ex._get(f"{f}/norm/weight")


def _export_sphere_vit(ex: _Exporter):
    ex.conv("patch_embed_enc.proj", "patch_embed_enc")
    for i in range(ex.fcount("enc_block_{}/norm1/scale")):
        _export_vit_block(ex, f"blocks_enc.{i}", f"enc_block_{i}")
    _export_mixer(ex, "mixer_enc", "mixer_enc")
    ex.state["norm_enc.weight"] = ex._get("norm_enc/weight")
    ex.dense("latent_proj_enc", "latent_proj_enc")
    ex.dense("latent_proj_dec", "latent_proj_dec")
    ex.state["norm_dec_in.weight"] = ex._get("norm_dec_in/weight")
    _export_mixer(ex, "mixer_dec", "mixer_dec")
    for i in range(ex.fcount("dec_block_{}/norm1/scale")):
        _export_vit_block(ex, f"blocks_dec.{i}", f"dec_block_{i}")
    ex.norm("norm_dec_out", "norm_dec_out")
    ex.dense("head_dec", "head_dec")


def _export_gated_res(ex: _Exporter, tprefix: str, fprefix: str):
    ex.conv(f"{tprefix}.conv1", f"{fprefix}/conv1")
    ex.conv(f"{tprefix}.conv2", f"{fprefix}/conv2")
    ex.conv(f"{tprefix}.conv_gate", f"{fprefix}/conv_gate")
    ex.conv(f"{tprefix}.conv_feature", f"{fprefix}/conv_feature")


def _export_pixelcnn(ex: _Exporter, t: str = "", f: str = ""):
    ex.embedding(f"{t}embedding.weight", f"{f}embedding/embedding")
    ex.conv(f"{t}conv_in", f"{f}conv_in")
    L = ex.fcount(f + "res_{}/conv1/kernel")
    for l in range(L):
        _export_gated_res(ex, f"{t}res_blocks.{l}", f"{f}res_{l}")
    ex.conv(f"{t}conv_out.1", f"{f}out1")
    ex.conv(f"{t}conv_out.3", f"{f}out2")


def _export_pixelsnail(ex: _Exporter, t: str = "", f: str = ""):
    ex.embedding(f"{t}embedding.weight", f"{f}embedding/embedding")
    ex.conv(f"{t}conv_in", f"{f}conv_in")
    B = ex.fcount(f + "block_{}/out_conv/kernel")
    for b in range(B):
        R = ex.fcount(f + f"block_{b}/res_" + "{}/conv1/kernel")
        for r in range(R):
            _export_gated_res(ex, f"{t}blocks.{b}.res_blocks.{r}",
                              f"{f}block_{b}/res_{r}")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            ex.conv1x1_as_dense(f"{t}blocks.{b}.attention.{proj}",
                                f"{f}block_{b}/attention/{proj}")
        ex.conv(f"{t}blocks.{b}.out_conv", f"{f}block_{b}/out_conv")
    ex.conv(f"{t}conv_out.1", f"{f}out1")
    ex.conv(f"{t}conv_out.3", f"{f}out2")


def _export_hierarchical(ex: _Exporter):
    if ex.fhas("prior_top/block_0/out_conv/kernel"):
        _export_pixelsnail(ex, "prior_top.", "prior_top/")
    else:
        _export_pixelcnn(ex, "prior_top.", "prior_top/")
    ex.embedding("embedding_top.weight", "embedding_top/embedding")
    ex.convT("upsample_top", "upsample_top")
    _export_pixelcnn(ex, "prior_bottom.", "prior_bottom/")


def _exporter_for(arch: str):
    a = arch.lower()
    if a in ti._VAE_FAMILY:
        return _export_vae
    if a == "sphere_encoder":
        return _export_sphere
    if a == "sphere_encoder_vit":
        return _export_sphere_vit
    if a == "betatc_vae":
        return _export_betatc
    if a == "vq_vae" or a.startswith("gg_vq_vae_v") or a == "gg_vq_vae":
        return _export_vqvae
    if a in ("vq_vae2", "gg_vq_vae2"):
        return _export_vqvae2
    if a == "pixelcnn":
        return _export_pixelcnn
    if a == "pixelsnail":
        return _export_pixelsnail
    if a in ("hierarchical_pixelcnn", "hierarchical_pixelsnail"):
        return _export_hierarchical
    raise ti.TorchImportError(f"torch export not supported for arch "
                              f"'{arch}'")


def export_torch_state_dict(params: Dict, batch_stats: Dict, arch: str
                            ) -> Dict[str, np.ndarray]:
    """Map flax (params, batch_stats) for ``arch`` to a reference-torch
    state_dict (numpy values). Strict: every flax leaf must be consumed."""
    ex = _Exporter(params, batch_stats)
    _exporter_for(arch)(ex)
    return ex.finish()
