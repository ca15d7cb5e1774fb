"""flax -> torch export (utils/torch_export.py): for every supported arch,
``import(export(params)) == params`` bit-exactly — the export and import
layout descriptions cannot drift apart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _roundtrip(arch, params, bstats):
    from movae_tpu.utils.torch_export import export_torch_state_dict
    from movae_tpu.utils.torch_import import import_torch_state_dict

    state = export_torch_state_dict(params, bstats, arch)
    params2, bstats2 = import_torch_state_dict(state, arch)

    from flax import traverse_util

    a = traverse_util.flatten_dict(params)
    b = traverse_util.flatten_dict(params2)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg="/".join(k))
    return bstats2


MODEL_CASES = [
    ("vae", dict(latent_dim=16, hidden_dims=(8, 16), layer_norm="batch")),
    ("vae", dict(latent_dim=16, hidden_dims=(8, 16), layer_norm="none")),
    ("betatc_vae", dict(latent_dim=6, hidden_dims=(8, 16))),
    ("vq_vae", dict(embedding_dim=8, num_embeddings=32,
                    hidden_dims=(8, 16), num_residual_layers=2)),
    ("vq_vae2", dict(embedding_dim=8, num_embeddings=32,
                     hidden_dims=(8, 16), num_residual_layers=2)),
    ("sphere_encoder", dict(latent_dim=16, hidden_dims=(8, 16))),
    ("sphere_encoder_vit", dict(latent_dim=128, vit_embed_dim=16,
                                vit_depth=2, vit_num_heads=2,
                                patch_size=4, vit_mixer_depth=1)),
]


@pytest.mark.parametrize("arch,extra", MODEL_CASES,
                         ids=[f"{a}-{i}" for i, (a, _) in
                              enumerate(MODEL_CASES)])
def test_model_export_import_roundtrip(arch, extra):
    from movae_tpu.models import get_network, init_model

    args = dict(arch=arch, batch_size=4, dataset_size=64, **extra)
    model = get_network(32, 3, args)
    params, bstats = init_model(model, jax.random.PRNGKey(0), 32, 3,
                                batch_size=2)
    bstats2 = _roundtrip(arch, params, bstats)
    if arch == "vae" and extra.get("layer_norm") == "batch":
        from flax import traverse_util

        a = traverse_util.flatten_dict(bstats)
        b = traverse_util.flatten_dict(bstats2)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


@pytest.mark.parametrize("prior", ["pixelcnn", "pixelsnail",
                                   "hierarchical_pixelcnn",
                                   "hierarchical_pixelsnail"])
def test_prior_export_import_roundtrip(prior):
    from movae_tpu.models.pixelcnn import (HierarchicalPixelCNN,
                                           HierarchicalPixelSNAIL, PixelCNN,
                                           PixelSNAIL)

    if prior == "pixelcnn":
        m = PixelCNN(num_embeddings=32, embedding_dim=8, hidden_channels=16,
                     num_layers=2)
        ia = (jnp.zeros((1, 4, 4), jnp.int32),)
    elif prior == "pixelsnail":
        m = PixelSNAIL(num_embeddings=32, embedding_dim=8,
                       hidden_channels=16, num_blocks=2,
                       num_res_blocks_per_layer=2, num_heads=2)
        ia = (jnp.zeros((1, 4, 4), jnp.int32),)
    elif prior == "hierarchical_pixelcnn":
        m = HierarchicalPixelCNN(num_embeddings=32, embedding_dim=8,
                                 hidden_channels=16, num_layers=2)
        ia = (jnp.zeros((1, 2, 2), jnp.int32),
              jnp.zeros((1, 4, 4), jnp.int32))
    else:
        m = HierarchicalPixelSNAIL(num_embeddings=32, embedding_dim=8,
                                   hidden_channels=16, num_blocks_top=2,
                                   num_res_blocks_per_layer=2, num_heads=2,
                                   num_layers_bottom=2)
        ia = (jnp.zeros((1, 2, 2), jnp.int32),
              jnp.zeros((1, 4, 4), jnp.int32))
    params = m.init(jax.random.PRNGKey(1), *ia)["params"]
    _roundtrip(prior, params, {})


def test_export_strict_on_unknown_leaves():
    from movae_tpu.utils.torch_export import export_torch_state_dict
    from movae_tpu.utils.torch_import import TorchImportError

    with pytest.raises(TorchImportError, match="not supported"):
        export_torch_state_dict({}, {}, "no_such_arch")


def test_export_loads_into_real_torch_module():
    """The exported state_dict loads into an actual torch mirror with
    strict key checking (minus non-parameter buffers) and reproduces the
    flax forward."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from test_torch_import import TorchRefVQVAE

    from movae_tpu.models import get_network, init_model
    from movae_tpu.utils.torch_export import export_torch_state_dict

    args = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                hidden_dims=(8, 16), num_residual_layers=2, batch_size=4,
                dataset_size=64, recons_activation="tanh")
    fm = get_network(32, 3, args)
    params, bstats = init_model(fm, jax.random.PRNGKey(2), 32, 3,
                                batch_size=2)
    state = export_torch_state_dict(params, bstats, "vq_vae")

    tm = TorchRefVQVAE()
    missing, unexpected = tm.load_state_dict(
        {k: torch.tensor(v) for k, v in state.items()}, strict=False)
    assert not unexpected
    assert not missing
    tm.eval()

    rng = np.random.default_rng(3)
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
