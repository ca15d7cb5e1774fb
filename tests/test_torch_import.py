"""torch checkpoint import (utils/torch_import.py).

Numerical ground truth: torch mirrors of the reference module structures
(vae.py:116-175, vq_vae.py:127-303) are built with torch.nn here, their
state_dicts imported, and the flax forwards compared against the torch
forwards — this pins the conv/convT/linear/BN transforms AND the flax
modules' torch-exact paddings. Structure-only round-trips cover the larger
archs (vq_vae2, priors) whose transforms are the same verified primitives.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _import(state_np, arch):
    from movae_tpu.utils.torch_import import import_torch_state_dict

    return import_torch_state_dict(state_np, arch)


def _np_state(module):
    return {k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# torch mirrors of the reference structures (built from SURVEY/reference
# citations; hand-written, not copied)
# ---------------------------------------------------------------------------

class TorchRefVAE(tnn.Module):
    """Reference VAE structure (vae.py:116-175), batch-norm variant."""

    def __init__(self, in_ch=3, hidden=(8, 16), latent=16, size=32):
        super().__init__()
        spatial = size // (2 ** len(hidden))
        flat = hidden[-1] * spatial * spatial
        mods, c = [], in_ch
        for h in hidden:
            mods.append(tnn.Sequential(
                tnn.Conv2d(c, h, 3, stride=2, padding=1),
                tnn.BatchNorm2d(h), tnn.LeakyReLU()))
            c = h
        mods.append(tnn.Flatten())
        self.encoder = tnn.Sequential(*mods)
        self.mu = tnn.Linear(flat, latent)
        self.log_var = tnn.Linear(flat, latent)
        self.decoder_input = tnn.Linear(latent, flat)
        rev = list(reversed(hidden))
        dmods = [tnn.Unflatten(1, (hidden[-1], spatial, spatial))]
        for i in range(len(rev) - 1):
            dmods.append(tnn.Sequential(
                tnn.ConvTranspose2d(rev[i], rev[i + 1], 3, stride=2,
                                    padding=1, output_padding=1),
                tnn.BatchNorm2d(rev[i + 1]), tnn.LeakyReLU()))
        self.decoder = tnn.Sequential(*dmods)
        self.final_layer = tnn.Sequential(
            tnn.ConvTranspose2d(rev[-1], rev[-1], 3, stride=2, padding=1,
                                output_padding=1),
            tnn.BatchNorm2d(rev[-1]), tnn.LeakyReLU(),
            tnn.Conv2d(rev[-1], in_ch, 3, padding=1), tnn.Tanh())

    def encode(self, x):
        h = self.encoder(x)
        return self.mu(h), self.log_var(h)

    def decode(self, z):
        return self.final_layer(self.decoder(self.decoder_input(z)))


class TorchRefResidualLayer(tnn.Module):
    """vq_vae.py:127-145."""

    def __init__(self, c):
        super().__init__()
        self.resblock = tnn.Sequential(
            tnn.Conv2d(c, c, 3, padding=1, bias=False), tnn.ReLU(True),
            tnn.Conv2d(c, c, 1, bias=False))

    def forward(self, x):
        return x + self.resblock(x)


class TorchRefVQ(tnn.Module):
    """vq_vae.py:11-64 (lookup only; losses not needed for the forward)."""

    def __init__(self, k, d):
        super().__init__()
        self.embedding = tnn.Embedding(k, d)

    def forward(self, z):  # z: (B, D, H, W)
        b, d, h, w = z.shape
        zf = z.permute(0, 2, 3, 1).reshape(-1, d)
        dist = (zf.pow(2).sum(1, keepdim=True)
                + self.embedding.weight.pow(2).sum(1)
                - 2 * zf @ self.embedding.weight.t())
        inds = dist.argmin(1)
        q = self.embedding(inds).view(b, h, w, d).permute(0, 3, 1, 2)
        return z + (q - z).detach(), inds


class TorchRefVQVAE(tnn.Module):
    """vq_vae.py:229-303."""

    def __init__(self, in_ch=3, hidden=(8, 16), k=32, d=8, r=2):
        super().__init__()
        mods, c = [], in_ch
        for h in hidden:
            mods.append(tnn.Sequential(
                tnn.Conv2d(c, h, 4, stride=2, padding=1), tnn.LeakyReLU()))
            c = h
        mods.append(tnn.Sequential(
            tnn.Conv2d(c, c, 3, stride=1, padding=1), tnn.LeakyReLU()))
        mods += [TorchRefResidualLayer(c) for _ in range(r)]
        mods.append(tnn.LeakyReLU())
        mods.append(tnn.Sequential(tnn.Conv2d(c, d, 1), tnn.LeakyReLU()))
        self.encoder = tnn.Sequential(*mods)
        self.vq_layer = TorchRefVQ(k, d)
        dmods = [tnn.Sequential(tnn.Conv2d(d, c, 3, stride=1, padding=1),
                                tnn.LeakyReLU())]
        dmods += [TorchRefResidualLayer(c) for _ in range(r)]
        dmods.append(tnn.LeakyReLU())
        rev = list(reversed(hidden))
        for i in range(len(rev) - 1):
            dmods.append(tnn.Sequential(
                tnn.ConvTranspose2d(rev[i], rev[i + 1], 4, stride=2,
                                    padding=1), tnn.LeakyReLU()))
        dmods.append(tnn.Sequential(
            tnn.ConvTranspose2d(rev[-1], in_ch, 4, stride=2, padding=1),
            tnn.Tanh()))
        self.decoder = tnn.Sequential(*dmods)

    def forward(self, x):
        z = self.encoder(x)
        q, inds = self.vq_layer(z)
        return self.decoder(q), inds


# ---------------------------------------------------------------------------
# numerical-exactness tests
# ---------------------------------------------------------------------------

def test_vae_import_forward_matches_torch():
    from movae_tpu.models import get_network

    tm = TorchRefVAE()
    tm.eval()
    with torch.no_grad():  # non-trivial BN stats
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean += torch.randn_like(m.running_mean) * 0.1
                m.running_var *= 1.3
    params, bstats = _import(_np_state(tm), "vae")

    args = dict(arch="vae", latent_dim=16, hidden_dims=(8, 16),
                batch_size=4, dataset_size=64, layer_norm="batch",
                recons_activation="tanh")
    fm = get_network(32, 3, args)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_mu, t_lv = tm.encode(torch.tensor(x))
        z = torch.randn(2, 16)
        t_rec = tm.decode(z)

    variables = {"params": params, "batch_stats": bstats}
    f_mu, f_lv = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False, method="encode")
    np.testing.assert_allclose(np.asarray(f_mu), t_mu.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_lv), t_lv.numpy(),
                               rtol=1e-4, atol=1e-4)
    f_rec = fm.apply(variables, jnp.asarray(z.numpy()), train=False,
                     method="decode")
    np.testing.assert_allclose(
        np.asarray(f_rec), t_rec.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)


def test_vqvae_import_forward_matches_torch():
    from movae_tpu.models import get_network

    tm = TorchRefVQVAE()
    tm.eval()
    params, bstats = _import(_np_state(tm), "vq_vae")

    args = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                hidden_dims=(8, 16), num_residual_layers=2, batch_size=4,
                dataset_size=64, recons_activation="tanh")
    fm = get_network(32, 3, args)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_rec, t_inds = tm(torch.tensor(x))

    out = fm.apply({"params": params, "batch_stats": bstats},
                   jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
                   rngs={"sample": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(
        np.asarray(out["encoding_inds"]).reshape(-1), t_inds.numpy())
    np.testing.assert_allclose(
        np.asarray(out["recons"]), t_rec.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# structural round-trips (key layout + shape coverage) for the larger archs
# ---------------------------------------------------------------------------

def test_vqvae2_import_structure_and_shapes():
    from flax import traverse_util

    from movae_tpu.models import get_network, init_model

    args = dict(arch="vq_vae2", hidden_dims=(8, 16), batch_size=4,
                dataset_size=64, embedding_dim=8, num_embeddings=32,
                num_residual_layers=2)
    fm = get_network(32, 3, args)
    expect, _ = init_model(fm, jax.random.PRNGKey(0), 32, 3, batch_size=2)
    flat_expect = {"/".join(k): v.shape
                   for k, v in traverse_util.flatten_dict(expect).items()}

    # synthesize the torch state_dict by inverting the expected flax shapes
    # along the true reference key layout (vq_vae2.py:31-100, 190-206)
    state = {}
    rng = np.random.default_rng(0)

    def t_conv(shape_hwio):  # invert _conv_w
        kh, kw, i, o = shape_hwio
        return rng.normal(size=(o, i, kh, kw)).astype(np.float32)

    def t_convT(shape_hwio):  # invert _convT_w
        kh, kw, i, o = shape_hwio
        return rng.normal(size=(i, o, kh, kw)).astype(np.float32)

    flax_of_torch = {
        "enc_b.blocks.0": "enc_b/down1", "enc_b.blocks.2": "enc_b/down2",
        "enc_b.blocks.4": "enc_b/mid",
        "enc_b.blocks.5.conv.1": "enc_b/res_0/conv3",
        "enc_b.blocks.5.conv.3": "enc_b/res_0/conv1",
        "enc_b.blocks.6.conv.1": "enc_b/res_1/conv3",
        "enc_b.blocks.6.conv.3": "enc_b/res_1/conv1",
        "enc_t.blocks.0": "enc_t/down1", "enc_t.blocks.2": "enc_t/mid",
        "enc_t.blocks.3.conv.1": "enc_t/res_0/conv3",
        "enc_t.blocks.3.conv.3": "enc_t/res_0/conv1",
        "enc_t.blocks.4.conv.1": "enc_t/res_1/conv3",
        "enc_t.blocks.4.conv.3": "enc_t/res_1/conv1",
        "quantize_conv_t": "quantize_conv_t",
        "dec_t.blocks.0": "dec_t/in",
        "dec_t.blocks.1.conv.1": "dec_t/res_0/conv3",
        "dec_t.blocks.1.conv.3": "dec_t/res_0/conv1",
        "dec_t.blocks.2.conv.1": "dec_t/res_1/conv3",
        "dec_t.blocks.2.conv.3": "dec_t/res_1/conv1",
        "dec_t.blocks.4": ("dec_t/up1", "convT"),
        "quantize_conv_b": "quantize_conv_b",
        "upsample_t": ("upsample_t", "convT"),
        "dec.blocks.0": "dec/in",
        "dec.blocks.1.conv.1": "dec/res_0/conv3",
        "dec.blocks.1.conv.3": "dec/res_0/conv1",
        "dec.blocks.2.conv.1": "dec/res_1/conv3",
        "dec.blocks.2.conv.3": "dec/res_1/conv1",
        "dec.blocks.4": ("dec/up1", "convT"),
        "dec.blocks.6": ("dec/up2", "convT"),
    }
    for tkey, spec in flax_of_torch.items():
        fpath, kind = (spec if isinstance(spec, tuple) else (spec, "conv"))
        kshape = flat_expect[fpath + "/kernel"]
        state[tkey + ".weight"] = (t_convT(kshape) if kind == "convT"
                                   else t_conv(kshape))
        state[tkey + ".bias"] = rng.normal(
            size=flat_expect[fpath + "/bias"]).astype(np.float32)
    state["quantize_t.embedding.weight"] = rng.normal(
        size=flat_expect["vq_top/embedding"]).astype(np.float32)
    state["quantize_b.embedding.weight"] = rng.normal(
        size=flat_expect["vq_bottom/embedding"]).astype(np.float32)

    params, bstats = _import(state, "vq_vae2")
    got = {"/".join(k): v.shape
           for k, v in traverse_util.flatten_dict(params).items()}
    assert got == flat_expect
    assert bstats == {}


@pytest.mark.parametrize("prior", ["pixelcnn", "pixelsnail",
                                   "hierarchical_pixelsnail"])
def test_prior_import_structure_and_shapes(prior):
    from flax import traverse_util

    from movae_tpu.models.pixelcnn import (HierarchicalPixelSNAIL, PixelCNN,
                                           PixelSNAIL)

    rng = np.random.default_rng(2)
    if prior == "pixelcnn":
        fm = PixelCNN(num_embeddings=32, embedding_dim=8,
                      hidden_channels=16, num_layers=2)
        init_args = (jnp.zeros((2, 4, 4), jnp.int32),)
    elif prior == "pixelsnail":
        fm = PixelSNAIL(num_embeddings=32, embedding_dim=8,
                        hidden_channels=16, num_blocks=2,
                        num_res_blocks_per_layer=2, num_heads=2)
        init_args = (jnp.zeros((2, 4, 4), jnp.int32),)
    else:
        fm = HierarchicalPixelSNAIL(num_embeddings=32, embedding_dim=8,
                                    hidden_channels=16, num_blocks_top=2,
                                    num_res_blocks_per_layer=2, num_heads=2,
                                    num_layers_bottom=2)
        init_args = (jnp.zeros((2, 2, 2), jnp.int32),
                     jnp.zeros((2, 4, 4), jnp.int32))
    expect = fm.init(jax.random.PRNGKey(0), *init_args)["params"]
    flat_expect = {"/".join(k): v.shape
                   for k, v in traverse_util.flatten_dict(expect).items()}

    def add_conv(state, tkey, fpath, bias=True):
        kh, kw, i, o = flat_expect[fpath + "/kernel"]
        state[tkey + ".weight"] = rng.normal(size=(o, i, kh, kw)).astype(
            np.float32)
        state[tkey + ".mask"] = np.ones((o, i, kh, kw), np.float32)
        if bias:
            state[tkey + ".bias"] = rng.normal(size=(o,)).astype(np.float32)

    def add_plain_conv(state, tkey, fpath):
        kh, kw, i, o = flat_expect[fpath + "/kernel"]
        state[tkey + ".weight"] = rng.normal(size=(o, i, kh, kw)).astype(
            np.float32)
        state[tkey + ".bias"] = rng.normal(size=(o,)).astype(np.float32)

    def add_dense_as_1x1(state, tkey, fpath):
        i, o = flat_expect[fpath + "/kernel"]
        state[tkey + ".weight"] = rng.normal(size=(o, i, 1, 1)).astype(
            np.float32)
        state[tkey + ".bias"] = rng.normal(size=(o,)).astype(np.float32)

    def add_pixelcnn(state, t="", f=""):
        state[f"{t}embedding.weight"] = rng.normal(
            size=flat_expect[f"{f}embedding/embedding"]).astype(np.float32)
        add_conv(state, f"{t}conv_in", f"{f}conv_in")
        l = 0
        while f"{f}res_{l}/conv1/kernel" in flat_expect:
            add_plain_conv(state, f"{t}res_blocks.{l}.conv1",
                           f"{f}res_{l}/conv1")
            add_conv(state, f"{t}res_blocks.{l}.conv2", f"{f}res_{l}/conv2")
            add_plain_conv(state, f"{t}res_blocks.{l}.conv_gate",
                           f"{f}res_{l}/conv_gate")
            add_plain_conv(state, f"{t}res_blocks.{l}.conv_feature",
                           f"{f}res_{l}/conv_feature")
            l += 1
        add_plain_conv(state, f"{t}conv_out.1", f"{f}out1")
        add_plain_conv(state, f"{t}conv_out.3", f"{f}out2")

    def add_pixelsnail(state, t="", f=""):
        state[f"{t}embedding.weight"] = rng.normal(
            size=flat_expect[f"{f}embedding/embedding"]).astype(np.float32)
        add_conv(state, f"{t}conv_in", f"{f}conv_in")
        b = 0
        while f"{f}block_{b}/out_conv/kernel" in flat_expect:
            r = 0
            while f"{f}block_{b}/res_{r}/conv1/kernel" in flat_expect:
                add_plain_conv(state, f"{t}blocks.{b}.res_blocks.{r}.conv1",
                               f"{f}block_{b}/res_{r}/conv1")
                add_conv(state, f"{t}blocks.{b}.res_blocks.{r}.conv2",
                         f"{f}block_{b}/res_{r}/conv2")
                add_plain_conv(state,
                               f"{t}blocks.{b}.res_blocks.{r}.conv_gate",
                               f"{f}block_{b}/res_{r}/conv_gate")
                add_plain_conv(state,
                               f"{t}blocks.{b}.res_blocks.{r}.conv_feature",
                               f"{f}block_{b}/res_{r}/conv_feature")
                r += 1
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                add_dense_as_1x1(state, f"{t}blocks.{b}.attention.{proj}",
                                 f"{f}block_{b}/attention/{proj}")
            add_plain_conv(state, f"{t}blocks.{b}.out_conv",
                           f"{f}block_{b}/out_conv")
            b += 1
        add_plain_conv(state, f"{t}conv_out.1", f"{f}out1")
        add_plain_conv(state, f"{t}conv_out.3", f"{f}out2")

    state = {}
    if prior == "pixelcnn":
        add_pixelcnn(state)
    elif prior == "pixelsnail":
        add_pixelsnail(state)
    else:
        add_pixelsnail(state, "prior_top.", "prior_top/")
        state["embedding_top.weight"] = rng.normal(
            size=flat_expect["embedding_top/embedding"]).astype(np.float32)
        kh, kw, i, o = flat_expect["upsample_top/kernel"]
        state["upsample_top.weight"] = rng.normal(size=(i, o, kh, kw)).astype(
            np.float32)
        state["upsample_top.bias"] = rng.normal(size=(o,)).astype(np.float32)
        add_pixelcnn(state, "prior_bottom.", "prior_bottom/")

    from flax import traverse_util
    params, _ = _import(state, prior)
    got = {"/".join(k): v.shape
           for k, v in traverse_util.flatten_dict(params).items()}
    assert got == flat_expect


def test_import_is_strict():
    from movae_tpu.utils.torch_import import (TorchImportError,
                                              import_torch_state_dict)

    tm = TorchRefVAE()
    state = _np_state(tm)
    state["mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(TorchImportError, match="unconsumed"):
        import_torch_state_dict(state, "vae")

    state = _np_state(tm)
    del state["mu.weight"]
    with pytest.raises(TorchImportError, match="missing"):
        import_torch_state_dict(state, "vae")

    with pytest.raises(TorchImportError, match="not supported"):
        import_torch_state_dict(_np_state(tm), "no_such_arch")


def test_import_cli_end_to_end(tmp_path):
    """scripts/import_torch_checkpoint.py converts a reference-layout .pth
    into an orbax checkpoint that load_checkpoint round-trips."""
    import subprocess
    import sys

    tm = TorchRefVQVAE()
    pth = tmp_path / "final_checkpoint.pth"
    torch.save({"model_state_dict": tm.state_dict(),
                "epoch": 7,
                "args": {"arch": "vq_vae", "embedding_dim": 8,
                         "num_embeddings": 32, "hidden_dims": [8, 16],
                         "num_residual_layers": 2, "input_size": 32,
                         "recons_activation": "tanh"}}, pth)
    out = tmp_path / "imported"
    import os
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "scripts/import_torch_checkpoint.py",
         "--torch_ckpt", str(pth), "--out", str(out)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]

    from movae_tpu.train import checkpoint as ckpt_lib
    payload = ckpt_lib.load_checkpoint(str(out))
    assert payload["epoch"] == 7
    assert payload["args"]["arch"] == "vq_vae"
    got = payload["model_state_dict"]["params"]
    np.testing.assert_allclose(
        np.asarray(got["vq"]["embedding"]),
        tm.vq_layer.embedding.weight.detach().numpy())


def test_load_checkpoint_accepts_pth(tmp_path):
    """train/checkpoint.load_checkpoint imports reference .pth files
    directly, so evaluate.py --model_path .../*.pth works unchanged."""
    from movae_tpu.train import checkpoint as ckpt_lib

    tm = TorchRefVQVAE()
    pth = tmp_path / "final_checkpoint.pth"
    torch.save({"model_state_dict": tm.state_dict(), "epoch": 3,
                "args": {"arch": "vq_vae", "embedding_dim": 8,
                         "num_embeddings": 32, "hidden_dims": [8, 16],
                         "num_residual_layers": 2, "input_size": 32}}, pth)
    payload = ckpt_lib.load_checkpoint(str(pth))
    assert payload["epoch"] == 3
    assert payload["args"]["arch"] == "vq_vae"
    np.testing.assert_allclose(
        np.asarray(payload["model_state_dict"]["params"]["vq"]["embedding"]),
        tm.vq_layer.embedding.weight.detach().numpy())


def test_find_prior_loads_torch_pth(tmp_path):
    """evaluate._find_prior picks up reference torch prior checkpoints at
    their reference paths (main.py:1039-1047) and imports them."""
    import importlib

    rng = np.random.default_rng(5)
    k, d, hc, L = 32, 8, 16, 2
    state = {}

    def conv(t, o, i, kh, kw, mask=False):
        state[t + ".weight"] = torch.tensor(
            rng.normal(size=(o, i, kh, kw)).astype(np.float32))
        state[t + ".bias"] = torch.tensor(
            rng.normal(size=(o,)).astype(np.float32))
        if mask:
            state[t + ".mask"] = torch.ones(o, i, kh, kw)

    state["embedding.weight"] = torch.tensor(
        rng.normal(size=(k, d)).astype(np.float32))
    conv("conv_in", hc, d, 7, 7, mask=True)
    for l in range(L):
        conv(f"res_blocks.{l}.conv1", hc // 2, hc, 1, 1)
        conv(f"res_blocks.{l}.conv2", hc // 2, hc // 2, 3, 3, mask=True)
        conv(f"res_blocks.{l}.conv_gate", hc, hc // 2, 1, 1)
        conv(f"res_blocks.{l}.conv_feature", hc, hc // 2, 1, 1)
    conv("conv_out.1", hc, hc, 1, 1)
    conv("conv_out.3", k, hc, 1, 1)

    ckpt_dir = tmp_path / "run" / "pixelcnn_prior" / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    torch.save({"model_state_dict": state, "epoch": 1, "loss": 2.0},
               ckpt_dir / "best_prior.pth")

    ev = importlib.import_module("evaluate")
    from types import SimpleNamespace

    class FakeVQ:
        num_embeddings = k

    model_path = tmp_path / "run" / "checkpoints" / "final_checkpoint.pth"
    model_path.parent.mkdir(parents=True)
    model_path.touch()
    prior = ev._find_prior(str(model_path), FakeVQ(),
                           SimpleNamespace(arch="vq_vae"))
    assert prior is not None and not prior["hierarchical"]
    from movae_tpu.models.pixelcnn import PixelCNN
    assert isinstance(prior["model"], PixelCNN)
    assert prior["model"].num_layers == L
    assert prior["model"].hidden_channels == hc


def test_load_checkpoint_sniffs_prior_pth(tmp_path):
    """A reference prior .pth (no args echo, main.py:1037-1047) is
    auto-sniffed from its key layout and loads through load_checkpoint
    with a shape-inferred prior_args echo build_prior understands."""
    from movae_tpu.train import checkpoint as ckpt_lib
    from movae_tpu.train.prior import build_prior
    from types import SimpleNamespace

    rng = np.random.default_rng(6)
    k, d, hc, L = 32, 8, 16, 3
    state = {}

    def conv(t, o, i, kh, kw):
        state[t + ".weight"] = torch.tensor(
            rng.normal(size=(o, i, kh, kw)).astype(np.float32))
        state[t + ".bias"] = torch.tensor(
            rng.normal(size=(o,)).astype(np.float32))

    state["embedding.weight"] = torch.tensor(
        rng.normal(size=(k, d)).astype(np.float32))
    conv("conv_in", hc, d, 7, 7)
    for l in range(L):
        conv(f"res_blocks.{l}.conv1", hc // 2, hc, 1, 1)
        conv(f"res_blocks.{l}.conv2", hc // 2, hc // 2, 3, 3)
        conv(f"res_blocks.{l}.conv_gate", hc, hc // 2, 1, 1)
        conv(f"res_blocks.{l}.conv_feature", hc, hc // 2, 1, 1)
    conv("conv_out.1", hc, hc, 1, 1)
    conv("conv_out.3", k, hc, 1, 1)
    pth = tmp_path / "best_prior.pth"
    torch.save({"model_state_dict": state, "epoch": 2, "loss": 1.5}, pth)

    payload = ckpt_lib.load_checkpoint(str(pth))
    assert payload["prior_args"]["prior_type"] == "pixelcnn"
    assert payload["prior_args"]["prior_embedding_dim"] == d
    assert payload["prior_args"]["pixelcnn_num_layers"] == L
    assert payload["prior_args"]["pixelcnn_hidden_channels"] == hc
    model = build_prior(SimpleNamespace(**payload["prior_args"]), k, False)
    expect = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 4), jnp.int32))["params"]
    from flax import traverse_util
    got = {kk: v.shape for kk, v in traverse_util.flatten_dict(
        payload["model_state_dict"]["params"]).items()}
    want = {kk: v.shape
            for kk, v in traverse_util.flatten_dict(expect).items()}
    assert got == want


class TorchRefBetaTC(tnn.Module):
    """Reference BetaTCVAE structure (betatc_vae.py:99-168)."""

    def __init__(self, in_ch=3, hidden=(8, 16), latent=6, size=32):
        super().__init__()
        spatial = size // (2 ** len(hidden))
        flat = hidden[-1] * spatial * spatial
        mods, c = [], in_ch
        for h in hidden:
            mods.append(tnn.Sequential(
                tnn.Conv2d(c, h, 4, stride=2, padding=1), tnn.LeakyReLU()))
            c = h
        self.encoder = tnn.Sequential(*mods)
        self.fc = tnn.Linear(flat, 256)
        self.fc_mu = tnn.Linear(256, latent)
        self.fc_var = tnn.Linear(256, latent)
        self.decoder_input = tnn.Linear(latent, flat)
        rev = list(reversed(hidden))
        dmods = []
        for i in range(len(rev) - 1):
            dmods.append(tnn.Sequential(
                tnn.ConvTranspose2d(rev[i], rev[i + 1], 3, stride=2,
                                    padding=1, output_padding=1),
                tnn.LeakyReLU()))
        self.decoder = tnn.Sequential(*dmods)
        self.final_layer = tnn.Sequential(
            tnn.ConvTranspose2d(rev[-1], rev[-1], 3, stride=2, padding=1,
                                output_padding=1),
            tnn.LeakyReLU(),
            tnn.Conv2d(rev[-1], in_ch, 3, padding=1), tnn.Tanh())
        self._c, self._s = hidden[-1], spatial

    def encode(self, x):
        h = torch.flatten(self.encoder(x), start_dim=1)
        h = self.fc(h)
        return self.fc_mu(h), self.fc_var(h)

    def decode(self, z):
        h = self.decoder_input(z).view(-1, self._c, self._s, self._s)
        return self.final_layer(self.decoder(h))


def test_betatc_import_forward_matches_torch():
    from movae_tpu.models import get_network

    tm = TorchRefBetaTC()
    tm.eval()
    params, bstats = _import(_np_state(tm), "betatc_vae")

    args = dict(arch="betatc_vae", latent_dim=6, hidden_dims=(8, 16),
                batch_size=4, dataset_size=64, recons_activation="tanh")
    fm = get_network(32, 3, args)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_mu, t_lv = tm.encode(torch.tensor(x))
        z = torch.randn(2, 6)
        t_rec = tm.decode(z)

    variables = {"params": params, "batch_stats": bstats}
    f_mu, f_lv = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False, method="encode")
    np.testing.assert_allclose(np.asarray(f_mu), t_mu.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_lv), t_lv.numpy(),
                               rtol=1e-4, atol=1e-4)
    f_rec = fm.apply(variables, jnp.asarray(z.numpy()), train=False,
                     method="decode")
    np.testing.assert_allclose(
        np.asarray(f_rec), t_rec.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)


class TorchRosResBlock(tnn.Module):
    """vq_vae2.py:13-28."""

    def __init__(self, c, ch):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.ReLU(), tnn.Conv2d(c, ch, 3, padding=1),
            tnn.ReLU(True), tnn.Conv2d(ch, c, 1))

    def forward(self, x):
        return x + self.conv(x)


class TorchRosEncoder(tnn.Module):
    """vq_vae2.py:31-56."""

    def __init__(self, in_c, c, n_res, res_ch, stride):
        super().__init__()
        if stride == 4:
            blocks = [tnn.Conv2d(in_c, c // 2, 4, stride=2, padding=1),
                      tnn.ReLU(True),
                      tnn.Conv2d(c // 2, c, 4, stride=2, padding=1),
                      tnn.ReLU(True),
                      tnn.Conv2d(c, c, 3, padding=1)]
        else:
            blocks = [tnn.Conv2d(in_c, c // 2, 4, stride=2, padding=1),
                      tnn.ReLU(True),
                      tnn.Conv2d(c // 2, c, 3, padding=1)]
        blocks += [TorchRosResBlock(c, res_ch) for _ in range(n_res)]
        blocks.append(tnn.ReLU(True))
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class TorchRosDecoder(tnn.Module):
    """vq_vae2.py:62-100 (output_activation none/tanh)."""

    def __init__(self, in_c, out_c, c, n_res, res_ch, stride, act="none"):
        super().__init__()
        blocks = [tnn.Conv2d(in_c, c, 3, padding=1)]
        blocks += [TorchRosResBlock(c, res_ch) for _ in range(n_res)]
        blocks.append(tnn.ReLU(True))
        if stride == 4:
            blocks += [tnn.ConvTranspose2d(c, c // 2, 4, stride=2, padding=1),
                       tnn.ReLU(True),
                       tnn.ConvTranspose2d(c // 2, out_c, 4, stride=2,
                                           padding=1)]
        else:
            blocks.append(tnn.ConvTranspose2d(c, out_c, 4, stride=2,
                                              padding=1))
        if act == "tanh":
            blocks.append(tnn.Tanh())
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class TorchRefVQVAE2(tnn.Module):
    """vq_vae2.py:190-242 (forward mirrors encode/decode wiring)."""

    def __init__(self, in_ch=3, hidden=(8, 16), k=32, d=8, r=2, res_ch=32):
        super().__init__()
        c = hidden[0]
        self.enc_b = TorchRosEncoder(in_ch, c, r, res_ch, 4)
        self.enc_t = TorchRosEncoder(c, c, r, res_ch, 2)
        self.quantize_conv_t = tnn.Conv2d(c, d, 1)
        self.quantize_t = TorchRefVQ(k, d)
        self.dec_t = TorchRosDecoder(d, d, c, r, res_ch, 2)
        self.quantize_conv_b = tnn.Conv2d(d + c, d, 1)
        self.quantize_b = TorchRefVQ(k, d)
        self.upsample_t = tnn.ConvTranspose2d(d, d, 4, stride=2, padding=1)
        self.dec = TorchRosDecoder(d + d, in_ch, c, r, res_ch, 4, "tanh")

    def forward(self, x):
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        qt, inds_t = self.quantize_t(self.quantize_conv_t(enc_t))
        dec_t = self.dec_t(qt)
        qb_in = self.quantize_conv_b(torch.cat([dec_t, enc_b], 1))
        qb, inds_b = self.quantize_b(qb_in)
        up_t = self.upsample_t(qt)
        rec = self.dec(torch.cat([up_t, qb], 1))
        return rec, inds_t, inds_b


def test_vqvae2_import_forward_matches_torch():
    from movae_tpu.models import get_network

    tm = TorchRefVQVAE2()
    tm.eval()
    params, bstats = _import(_np_state(tm), "vq_vae2")

    args = dict(arch="vq_vae2", embedding_dim=8, num_embeddings=32,
                hidden_dims=(8, 16), num_residual_layers=2, batch_size=4,
                dataset_size=64, recons_activation="tanh")
    fm = get_network(32, 3, args)

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_rec, t_it, t_ib = tm(torch.tensor(x))

    out = fm.apply({"params": params, "batch_stats": bstats},
                   jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
                   rngs={"sample": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(
        np.asarray(out["encoding_inds_top"]).reshape(-1), t_it.numpy())
    np.testing.assert_array_equal(
        np.asarray(out["encoding_inds_bottom"]).reshape(-1), t_ib.numpy())
    np.testing.assert_allclose(
        np.asarray(out["recons"]), t_rec.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)


def test_gg_vae_import_ignores_sobel_buffers():
    """GG models register sobel filter buffers (gg_vae.py:44-54); the
    importer skips them and maps the VAE backbone."""
    tm = TorchRefVAE()
    state = _np_state(tm)
    state["sobel_x"] = np.zeros((1, 1, 3, 3), np.float32)
    state["sobel_y"] = np.zeros((1, 1, 3, 3), np.float32)
    params, _ = _import(state, "gg_vae_v3")
    assert "enc_conv_0" in params and "final_conv" in params


def test_main_resume_from_torch_pth(tmp_path):
    """main.py --resume <reference .pth> fine-tunes a reference-trained
    checkpoint (load_checkpoint's torch hook feeds the resume path)."""
    import os
    import subprocess
    import sys

    tm = TorchRefVQVAE()
    pth = tmp_path / "final_checkpoint.pth"
    torch.save({"model_state_dict": tm.state_dict(), "epoch": 1,
                "args": {"arch": "vq_vae"}}, pth)
    proc = subprocess.run(
        [sys.executable, "main.py", "--dataset", "synthetic-32-48",
         "--epochs", "2", "--batch_size", "16", "--arch", "vq_vae",
         "--embedding_dim", "8", "--num_embeddings", "32",
         "--hidden_dims", "8", "16", "--num_residual_layers", "2",
         "--aggregator", "sum", "--skip_pixelcnn", "--skip_final_metrics",
         "--save_freq", "99", "--eval_freq", "99", "--seed", "3",
         "--save_path", str(tmp_path / "logs"), "--resume", str(pth)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"Resumed from {pth} at epoch 2" in proc.stdout


def test_prior_from_state_hierarchical_pixelcnn():
    """Regression (r2 code review): prior_from_state crashed for
    hierarchical_pixelcnn by passing num_layers_bottom, which only the
    SNAIL variant accepts; the reference shares one num_layers between
    levels (pixelcnn_prior.py:370-390)."""
    from movae_tpu.models.pixelcnn import HierarchicalPixelCNN
    from movae_tpu.utils.torch_import import prior_from_state

    rng = np.random.default_rng(9)
    k, d, hc, L = 32, 8, 16, 2
    state = {}

    def conv(t, o, i, kh, kw):
        state[t + ".weight"] = rng.normal(size=(o, i, kh, kw)).astype(
            np.float32)
        state[t + ".bias"] = rng.normal(size=(o,)).astype(np.float32)

    def pcnn(t, cin):
        state[f"{t}embedding.weight"] = rng.normal(size=(k, d)).astype(
            np.float32)
        conv(f"{t}conv_in", hc, cin, 7, 7)
        for l in range(L):
            conv(f"{t}res_blocks.{l}.conv1", hc // 2, hc, 1, 1)
            conv(f"{t}res_blocks.{l}.conv2", hc // 2, hc // 2, 3, 3)
            conv(f"{t}res_blocks.{l}.conv_gate", hc, hc // 2, 1, 1)
            conv(f"{t}res_blocks.{l}.conv_feature", hc, hc // 2, 1, 1)
        conv(f"{t}conv_out.1", hc, hc, 1, 1)
        conv(f"{t}conv_out.3", k, hc, 1, 1)

    pcnn("prior_top.", d)
    state["embedding_top.weight"] = rng.normal(size=(k, d)).astype(
        np.float32)
    state["upsample_top.weight"] = rng.normal(size=(d, d, 4, 4)).astype(
        np.float32)
    state["upsample_top.bias"] = rng.normal(size=(d,)).astype(np.float32)
    pcnn("prior_bottom.", 2 * d)

    model = prior_from_state(state, "hierarchical_pixelcnn")
    assert isinstance(model, HierarchicalPixelCNN)
    assert model.num_layers == L
    # and the import itself consumes every key into the expected tree
    from movae_tpu.utils.torch_import import import_torch_state_dict
    params, _ = import_torch_state_dict(state, "hierarchical_pixelcnn")
    expect = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 2), jnp.int32),
                        jnp.zeros((1, 4, 4), jnp.int32))["params"]
    from flax import traverse_util
    got = {"/".join(kk): v.shape
           for kk, v in traverse_util.flatten_dict(params).items()}
    want = {"/".join(kk): v.shape
            for kk, v in traverse_util.flatten_dict(expect).items()}
    assert got == want
