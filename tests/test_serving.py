"""AOT serving export (movae_tpu/serving.py): artifacts must reload with
just jax and reproduce the live model's outputs exactly.

The reference has no serving layer (SURVEY §1); these tests pin the
beyond-parity contract: weights-baked StableHLO export, symbolic batch
for the image/code functions, prior-driven sample export, and
checkpoint-level export without dataset files."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movae_tpu.models import get_network, init_model
from movae_tpu.serving import (export_serving, load_manifest, load_serving)


def _tiny_vq(arch="vq_vae"):
    args = dict(arch=arch, embedding_dim=8, num_embeddings=32,
                hidden_dims=(8, 16), num_residual_layers=1, batch_size=8,
                dataset_size=64, latent_dim=16)
    model = get_network(16, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 16, 3,
                            batch_size=2)
    return model, params, bs


def test_export_roundtrip_matches_live_model(tmp_path):
    model, params, bs = _tiny_vq()
    out = str(tmp_path / "art")
    man = export_serving(model, params, bs, out, platforms=("cpu",),
                        sample_batch=2, image_batch=4, input_size=16)
    assert set(man["functions"]) == {"reconstruct", "encode_codes",
                                     "decode_codes", "sample"}
    fns = load_serving(out)

    x = np.random.default_rng(0).integers(
        0, 256, (4, 16, 16, 3)).astype(np.uint8)
    variables = {"params": params, "batch_stats": bs}
    xf = jnp.asarray(x, jnp.float32) / 255.0
    live = model.apply(variables, xf, train=False,
                       rngs={"sample": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(0)})["recons"]
    np.testing.assert_allclose(np.asarray(fns["reconstruct"](x)),
                               np.asarray(live), rtol=1e-5, atol=1e-6)

    codes = fns["encode_codes"](x)
    live_codes = model.apply(variables, xf, method="get_code_indices")
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.asarray(live_codes))
    dec = fns["decode_codes"](codes)
    live_dec = model.apply(variables, jnp.asarray(codes),
                           method="decode_code")
    np.testing.assert_allclose(np.asarray(dec), np.asarray(live_dec),
                               rtol=1e-5, atol=1e-6)

    key = jax.random.PRNGKey(7)
    s = fns["sample"](key)
    live_s = model.apply(variables, 2, method="sample",
                         rngs={"sample": key, "dropout": key})
    np.testing.assert_allclose(np.asarray(s), np.asarray(live_s),
                               rtol=1e-5, atol=1e-6)


def test_symbolic_batch_serves_any_batch(tmp_path):
    model, params, bs = _tiny_vq()
    out = str(tmp_path / "art")
    man = export_serving(model, params, bs, out, platforms=("cpu",),
                        sample_batch=2, image_batch=4, input_size=16)
    for name in ("reconstruct", "encode_codes", "decode_codes"):
        assert man["functions"][name]["symbolic_batch"], name
    fns = load_serving(out)
    for b in (1, 3, 7):
        x = np.zeros((b, 16, 16, 3), np.uint8)
        assert fns["reconstruct"](x).shape == (b, 16, 16, 3)
        assert fns["encode_codes"](x).shape[0] == b


def test_hierarchical_code_pair_export(tmp_path):
    model, params, bs = _tiny_vq("vq_vae2")
    out = str(tmp_path / "art")
    export_serving(model, params, bs, out, platforms=("cpu",),
                   sample_batch=2, image_batch=2, input_size=16)
    fns = load_serving(out)
    x = np.zeros((2, 16, 16, 3), np.uint8)
    ct, cb = fns["encode_codes"](x)
    assert ct.shape[0] == cb.shape[0] == 2 and cb.shape[1] > ct.shape[1]
    imgs = fns["decode_codes"](ct, cb)
    assert imgs.shape == (2, 16, 16, 3)


def test_prior_driven_sample_export(tmp_path):
    from movae_tpu.models.pixelcnn import PixelCNN, sample_prior

    model, params, bs = _tiny_vq()
    prior_model = PixelCNN(num_embeddings=32, embedding_dim=8,
                           hidden_channels=8, num_layers=2)
    s = model.latent_spatial_dim
    z = jnp.zeros((2, s, s), jnp.int32)
    pp = prior_model.init({"params": jax.random.PRNGKey(1)}, z,
                          train=False)["params"]
    prior = {"model": prior_model, "params": pp, "hierarchical": False}
    out = str(tmp_path / "art")
    export_serving(model, params, bs, out, platforms=("cpu",), prior=prior,
                   sample_batch=2, image_batch=2, input_size=16)
    fns = load_serving(out)
    key = jax.random.PRNGKey(5)
    got = np.asarray(fns["sample"](key))
    codes = sample_prior(prior_model, pp, key, 2, s, s)
    want = np.asarray(model.apply({"params": params, "batch_stats": bs},
                                  codes, method="decode_code"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_checkpoint_without_dataset_files(tmp_path):
    """export_checkpoint rebuilds the model from the checkpoint args alone
    (dataset_input_size from the NAME — no data files needed)."""
    from movae_tpu.serving import export_checkpoint
    from movae_tpu.train import checkpoint as ckpt_lib

    model, params, bs = _tiny_vq()
    ckpt = str(tmp_path / "ckpt" / "final_checkpoint")
    ckpt_lib.save_checkpoint(ckpt, {
        "epoch": 1,
        "model_state_dict": {"params": params, "batch_stats": bs},
        "args": dict(arch="vq_vae", dataset="synthetic-16-8",
                     embedding_dim=8, num_embeddings=32,
                     hidden_dims=[8, 16], num_residual_layers=1,
                     batch_size=8, dataset_size=64, latent_dim=16)})
    out = str(tmp_path / "art")
    man = export_checkpoint(ckpt, out, platforms=("cpu",), sample_batch=2,
                            with_prior=False)
    assert man["input_size"] == 16 and man["arch"] == "vq_vae"
    fns = load_serving(out)
    x = np.zeros((2, 16, 16, 3), np.uint8)
    got = np.asarray(fns["reconstruct"](x))
    variables = {"params": params, "batch_stats": bs}
    want = np.asarray(model.apply(
        variables, jnp.zeros((2, 16, 16, 3), jnp.float32), train=False,
        rngs={"sample": jax.random.PRNGKey(0),
              "dropout": jax.random.PRNGKey(0)})["recons"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hierarchical_prior_sample_export(tmp_path):
    from movae_tpu.models.pixelcnn import (HierarchicalPixelCNN,
                                           sample_hierarchical)

    model, params, bs = _tiny_vq("vq_vae2")
    st = model.latent_spatial_dim_top
    sb = model.latent_spatial_dim_bottom
    prior_model = HierarchicalPixelCNN(num_embeddings=32, embedding_dim=8,
                                       hidden_channels=8, num_layers=2)
    zt = jnp.zeros((2, st, st), jnp.int32)
    zb = jnp.zeros((2, sb, sb), jnp.int32)
    pp = prior_model.init({"params": jax.random.PRNGKey(1)}, zt, zb,
                          train=False)["params"]
    prior = {"model": prior_model, "params": pp, "hierarchical": True}
    out = str(tmp_path / "art")
    export_serving(model, params, bs, out, platforms=("cpu",), prior=prior,
                   sample_batch=2, image_batch=2, input_size=16)
    fns = load_serving(out)
    key = jax.random.PRNGKey(9)
    got = np.asarray(fns["sample"](key))
    ct, cb = sample_hierarchical(prior_model, pp, key, 2, (st, st),
                                 (sb, sb))
    want = np.asarray(model.apply({"params": params, "batch_stats": bs},
                                  ct, cb, method="decode_code"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_data_parallel_export_matches_unsharded(tmp_path):
    """data_parallel=8: the image/code artifacts are SPMD over the 8-device
    mesh (manifest nr_devices), accept plain host arrays through the
    loader's placement wrapper, serve any multiple-of-8 batch via the
    symbolic 8*b dim, and agree with the unsharded artifact exactly."""
    model, params, bs = _tiny_vq()
    plain_dir = str(tmp_path / "plain")
    dp_dir = str(tmp_path / "dp")
    export_serving(model, params, bs, plain_dir, platforms=("cpu",),
                   sample_batch=2, image_batch=4, input_size=16)
    man = export_serving(model, params, bs, dp_dir, platforms=("cpu",),
                         data_parallel=8, sample_batch=2, image_batch=4,
                         input_size=16)
    for name in ("reconstruct", "encode_codes", "decode_codes"):
        assert man["functions"][name]["nr_devices"] == 8, name
        assert man["functions"][name]["symbolic_batch"], name
    assert man["functions"]["sample"]["nr_devices"] == 1

    plain = load_serving(plain_dir)
    dp = load_serving(dp_dir)
    for b in (8, 24):
        x = np.random.default_rng(b).integers(
            0, 256, (b, 16, 16, 3)).astype(np.uint8)
        np.testing.assert_allclose(np.asarray(dp["reconstruct"](x)),
                                   np.asarray(plain["reconstruct"](x)),
                                   rtol=1e-5, atol=1e-6)
        codes_dp = np.asarray(dp["encode_codes"](x))
        np.testing.assert_array_equal(codes_dp,
                                      np.asarray(plain["encode_codes"](x)))
        np.testing.assert_allclose(np.asarray(dp["decode_codes"](codes_dp)),
                                   np.asarray(plain["decode_codes"](codes_dp)),
                                   rtol=1e-5, atol=1e-6)
    key = jax.random.PRNGKey(2)
    np.testing.assert_allclose(np.asarray(dp["sample"](key)),
                               np.asarray(plain["sample"](key)),
                               rtol=1e-5, atol=1e-6)
    # non-multiple batches must fail with the real contract, not a
    # symbolic-shape refinement error
    with pytest.raises(ValueError, match="multiple of 8"):
        dp["reconstruct"](np.zeros((12, 16, 16, 3), np.uint8))


def test_int8_quantized_export(tmp_path):
    """--quantize int8: kernels stored as int8 + per-output-channel scales,
    dequantized in-graph — artifacts shrink ~4x, outputs stay close, the
    VQ codebook stays float (its argmin decides discrete codes)."""
    from flax import traverse_util

    from movae_tpu.serving import dequantize_params, quantize_params

    args = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                hidden_dims=(32, 64), num_residual_layers=1, batch_size=8,
                dataset_size=64, latent_dim=16)
    model = get_network(32, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3,
                            batch_size=2)

    q = quantize_params(params)
    qpaths = {"/".join(map(str, p)) for p
              in traverse_util.flatten_dict(q) if p[-1] == "_q8"}
    assert qpaths  # conv/dense kernels quantized
    assert not any("embedding" in p for p in qpaths)  # codebook float
    # rounding bound: |W - deq(W)| <= scale/2 per output channel
    dq = dequantize_params(q)
    errs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, dq))
    assert max(errs) < 0.01

    d_f = str(tmp_path / "f32")
    d_q = str(tmp_path / "int8")
    man_f = export_serving(model, params, bs, d_f, platforms=("cpu",),
                           sample_batch=2, image_batch=4, input_size=32)
    man_q = export_serving(model, params, bs, d_q, platforms=("cpu",),
                           sample_batch=2, image_batch=4, input_size=32,
                           quantize="int8")
    assert man_q["quantize"] == "int8" and man_f["quantize"] is None
    ratio = (man_q["functions"]["reconstruct"]["bytes"]
             / man_f["functions"]["reconstruct"]["bytes"])
    assert ratio < 0.5, ratio  # int8 constants dominate the artifact

    f_f, f_q = load_serving(d_f), load_serving(d_q)
    x = np.random.default_rng(0).integers(
        0, 256, (4, 32, 32, 3)).astype(np.uint8)
    r_f = np.asarray(f_f["reconstruct"](x))
    r_q = np.asarray(f_q["reconstruct"](x))
    assert np.abs(r_f - r_q).max() < 0.02
    s = model.latent_spatial_dim
    codes = np.random.default_rng(1).integers(
        0, 32, (4, s, s)).astype(np.int32)
    d_out_f = np.asarray(f_f["decode_codes"](codes))
    d_out_q = np.asarray(f_q["decode_codes"](codes))
    assert np.abs(d_out_f - d_out_q).max() < 0.02

    with pytest.raises(ValueError, match="quantize"):
        export_serving(model, params, bs, str(tmp_path / "bad"),
                       platforms=("cpu",), input_size=32, quantize="int4")


def test_http_artifact_server(tmp_path):
    """scripts/serve_artifacts.py: the exported artifact dir serves over
    HTTP with .npy bodies — health, manifest, reconstruct, encode/decode,
    sample, and a clean 400 on contract violations."""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "serve_artifacts", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "serve_artifacts.py"))
    sa = ilu.module_from_spec(spec)
    spec.loader.exec_module(sa)

    model, params, bs = _tiny_vq()
    art = str(tmp_path / "art")
    export_serving(model, params, bs, art, platforms=("cpu",),
                   sample_batch=2, image_batch=4, input_size=16)
    httpd = sa.serve(art, "127.0.0.1", 0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=30) as r:
            return r.read()

    def post(path, body=b""):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.read()

    try:
        h = json.loads(get("/healthz"))
        assert h["ok"] and "reconstruct" in h["functions"]
        assert json.loads(get("/manifest"))["functions"]

        x = np.random.default_rng(0).integers(
            0, 256, (2, 16, 16, 3)).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, x)
        recon = np.load(io.BytesIO(post("/reconstruct", buf.getvalue())))
        assert recon.shape == (2, 16, 16, 3) and np.isfinite(recon).all()

        codes = np.load(io.BytesIO(post("/encode_codes", buf.getvalue())))
        cbuf = io.BytesIO()
        np.save(cbuf, codes)
        dec = np.load(io.BytesIO(post("/decode_codes", cbuf.getvalue())))
        assert dec.shape == (2, 16, 16, 3)

        s = np.load(io.BytesIO(post("/sample?seed=3")))
        assert s.shape[0] == 2 and np.isfinite(np.asarray(s)).all()

        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/nosuchfn", b"")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/reconstruct", b"not-an-npy")
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        t.join(timeout=10)
