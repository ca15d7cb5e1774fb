"""Pipeline tests: run_training end-to-end in-process, prior stage, code
cache, checkpoint roundtrip."""

import os
from types import SimpleNamespace

import jax
import numpy as np
import pytest


def small_args(tmp_path, **kw):
    d = dict(
        seed=3, dataset="synthetic-16-32", data_dir="./data",
        save_path=str(tmp_path), epochs=1, batch_size=8, aggregator="upgrad",
        arch="vae", layer_norm="batch", latent_dim=8, hidden_dims=[8, 16],
        num_residual_layers=1, recons_objective="mse", recons_activation=None,
        loss_weights=None, pref_weights=None, optimizer="adam", momentum=0.9,
        max_grad_norm=1.0, lr=1e-3, wd=0.0, scheduler="cosine",
        scheduler_lr_min=0.0, scheduler_gamma=0.1, scheduler_milestones=None,
        embedding_dim=8, num_embeddings=32, anneal_steps=10,
        recursive_kld_anneal_steps=10, hv_ref=None, num_vis_samples=2,
        save_freq=1, eval_freq=1, use_wandb=False, max_fid_samples=8,
        max_gen_metrics_samples=8, prior_type="pixelcnn", skip_pixelcnn=True,
        pixelcnn_epochs=1, pixelcnn_hidden_channels=16, pixelcnn_num_layers=2,
        pixelcnn_lr=3e-4, pixelcnn_temperature=1.0, pixelsnail_num_blocks=1,
        pixelsnail_num_res_blocks=1, pixelsnail_num_heads=2,
        pixelsnail_dropout=0.0, prior_use_lmdb_codes=True,
        prior_force_extract_codes=False, normalize_inputs=True,
        use_perceptual=False, log_every=1, skip_final_metrics=True,
        compute_dtype="float32",
    )
    d.update(kw)
    return SimpleNamespace(**d)


def test_run_training_vae(tmp_path):
    from movae_tpu.train.loop import run_training

    results = run_training(small_args(tmp_path))
    root = results["save_root"]
    assert os.path.exists(os.path.join(root, "checkpoints",
                                       "final_checkpoint", "args.json"))
    assert os.path.exists(os.path.join(root, "wandb_local", "history.jsonl"))
    figs = os.listdir(os.path.join(root, "figures", "generated"))
    assert any(f.endswith(".pdf") for f in figs)
    assert len(results["eval_losses"]) == 1
    assert np.isfinite(results["eval_losses"][0]["total_loss"])


def test_run_training_and_prior_vqvae(tmp_path):
    from movae_tpu.train.loop import run_training
    from movae_tpu.train.prior import train_prior

    args = small_args(tmp_path, arch="vq_vae", aggregator="sum",
                      skip_pixelcnn=False)
    results = run_training(args)
    prior = train_prior(results, args)
    assert prior is not None and not prior["hierarchical"]
    root = results["save_root"]
    assert os.path.exists(os.path.join(root, "pixelcnn_prior", "checkpoints",
                                       "final_prior", "meta.json"))
    # code cache written
    cache_dirs = os.listdir(os.path.join(root, "codes_cache"))
    assert len(cache_dirs) == 1
    # second call must hit the cache
    prior2 = train_prior(results, args)
    assert prior2 is not None

    # prior-driven generation produces images
    from movae_tpu.train.final_metrics import generate_samples
    imgs = generate_samples(results["model"], results["state"], args, prior,
                            jax.random.PRNGKey(0), 4, batch=4)
    assert imgs.shape == (4, 16, 16, 3)
    assert np.isfinite(imgs).all()


def test_checkpoint_roundtrip(tmp_path):
    from movae_tpu.train import checkpoint as ckpt_lib

    payload = {
        "epoch": 3,
        "model_state_dict": {"params": {"w": np.ones((2, 2), np.float32)}},
        "args": {"arch": "vae", "latent_dim": 8},
        "train_losses": [{"total_loss": 1.0}],
        "eval_losses": [],
        "best_eval_loss": 0.5,
    }
    path = ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), payload)
    loaded = ckpt_lib.load_checkpoint(path)
    assert loaded["epoch"] == 3
    assert loaded["args"]["arch"] == "vae"
    np.testing.assert_array_equal(loaded["model_state_dict"]["params"]["w"],
                                  np.ones((2, 2)))


def test_code_cache_roundtrip(tmp_path):
    from movae_tpu.utils.codes_cache import CodeCache, CodeLoader

    cache = CodeCache(str(tmp_path / "cc"))
    codes = np.arange(5 * 4 * 4, dtype=np.int32).reshape(5, 4, 4)
    cache.write({"codes": codes})
    assert cache.exists()
    levels = cache.open()
    np.testing.assert_array_equal(np.asarray(levels["codes"]), codes)
    loader = CodeLoader(levels, batch_size=2, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0][0]["codes"].shape == (2, 4, 4)
    assert batches[-1][1] == 1  # n_valid of the padded final batch


def test_loader_static_shapes():
    from movae_tpu.data import Loader, get_dataset

    train, test, size = get_dataset("synthetic-16-20")
    loader = Loader(train, 8, shuffle=True, seed=1)
    shapes = [(img.shape, n) for img, _, n in loader]
    assert all(s == (8, 16, 16, 3) for s, _ in shapes)
    assert [n for _, n in shapes] == [8, 8, 4]
    # epoch reshuffles
    first = next(iter(loader))[0]
    second = next(iter(loader))[0]
    assert not np.allclose(first, second)


def test_raw_loader_matches_float_loader():
    """uint8 hot-loop batches + in-jit preprocess == host-float batches."""
    import jax.numpy as jnp

    from movae_tpu.data import Loader, get_dataset
    from movae_tpu.train.step import preprocess_batch

    for normalize in (False, True):
        train, _, _ = get_dataset("synthetic-16-20", normalize=normalize)
        f_batches = [b for b, _, _ in Loader(train, 8, shuffle=True, seed=3)]
        r_batches = [b for b, _, _ in Loader(train, 8, shuffle=True, seed=3,
                                             raw=True)]
        assert all(b.dtype == np.uint8 for b in r_batches)
        for fb, rb in zip(f_batches, r_batches):
            on_device = np.asarray(preprocess_batch(jnp.asarray(rb),
                                                    normalize))
            np.testing.assert_allclose(on_device, fb, atol=1e-6)


def test_resume_from_last_checkpoint(tmp_path):
    """Mid-training resume: restores params/opt-state/step from
    last_checkpoint and continues at the next epoch."""
    from movae_tpu.train.loop import run_training

    args = small_args(tmp_path, epochs=2)
    results = run_training(args)
    last = os.path.join(results["save_root"], "checkpoints",
                        "last_checkpoint")
    assert os.path.exists(last)
    assert len(results["train_losses"]) == 2

    args2 = small_args(tmp_path, epochs=2, resume=last)
    results2 = run_training(args2)
    # resumed run starts at epoch 2 -> trains exactly one epoch
    assert len(results2["train_losses"]) == 1
    assert np.isfinite(results2["eval_losses"][-1]["total_loss"])
    assert int(results2["state"].step) > int(
        np.asarray(results["state"].step)) // 2


def test_process_sharded_loader_partitions_global_stream():
    """Union of per-process loader slices == the single-process batch stream
    (multi-host input sharding, exercised host-side)."""
    from movae_tpu.data import Loader, get_dataset

    train, _, _ = get_dataset("synthetic-16-40")
    full = [idx_set for idx_set in _loader_index_stream(
        Loader(train, 8, shuffle=True, seed=7))]
    shards = [list(_loader_index_stream(
        Loader(train, 4, shuffle=True, seed=7, process_index=p,
               process_count=2))) for p in (0, 1)]
    assert len(shards[0]) == len(full)
    for step, whole in enumerate(full):
        merged = shards[0][step] | shards[1][step]
        assert merged == whole


def _loader_index_stream(loader):
    """Recover the per-batch sample-index sets by fingerprinting images."""
    ds = loader.dataset
    finger = {ds.images[i].tobytes(): i for i in range(len(ds.images))}
    ds2 = type(ds)(ds.images, ds.labels)  # no flip/normalize: raw gather
    loader.dataset = ds2
    loader.raw = True
    for imgs, _labels, n_valid in loader:
        yield {finger[im.tobytes()] for im in imgs[:n_valid]}


def test_run_training_with_model_partitions(tmp_path):
    """--model_partitions 2 on the 8-device CPU mesh: tensor-parallel
    training end-to-end through run_training."""
    import jax as _jax

    from movae_tpu.train.loop import run_training

    args = small_args(tmp_path, model_partitions=2, batch_size=8,
                      hidden_dims=[16, 32], latent_dim=16)
    results = run_training(args)
    assert np.isfinite(results["eval_losses"][0]["total_loss"])
    # at least one param leaf is actually split over the 'model' axis
    shardings = [l.sharding for l in
                 _jax.tree_util.tree_leaves(results["state"].params)]
    assert any("model" in str(s.spec) for s in shardings)


def test_loader_pad_with_dataset_smaller_than_batch():
    """Wrap padding must fill the full static batch even when the dataset
    has fewer samples than the pad needs (np.resize cycles the order)."""
    from movae_tpu.data import ArrayDataset, Loader

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 8, 8, 3), dtype=np.uint8)
    ds = ArrayDataset(imgs, normalize=False)
    batches = list(Loader(ds, batch_size=16, shuffle=True, seed=3))
    assert len(batches) == 1
    x, _y, n_valid = batches[0]
    assert x.shape == (16, 8, 8, 3)
    assert n_valid == 5


def test_reconstruction_panel_single_image(tmp_path):
    """num_vis_samples=1 must still produce the two-row panel (squeezed
    matplotlib axes used to IndexError and silently kill all figures)."""
    from movae_tpu.train import figures as fig_lib

    x = np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    png = fig_lib.save_reconstruction_panel(x, x, str(tmp_path / "p.pdf"))
    assert os.path.exists(png)


def test_evaluate_excludes_tail_padding():
    """evaluate() slices the loader's wrap padding off the tail batch (to a
    multiple of the data-axis size) and weights batch means by n_valid."""
    import jax
    import jax.numpy as jnp

    from movae_tpu.data import ArrayDataset, Loader
    from movae_tpu.parallel.mesh import DataParallel
    from movae_tpu.train.loop import evaluate

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (20, 8, 8, 3), dtype=np.uint8)
    ds = ArrayDataset(imgs, normalize=False)
    loader = Loader(ds, batch_size=16, shuffle=False, raw=True)
    parallel = DataParallel()
    nd = parallel.mesh.shape["data"]

    seen = []

    def eval_fn(params, batch_stats, batch, rng):
        seen.append(batch.shape[0])
        return {"total_loss": jnp.mean(batch.astype(jnp.float32))}, {}, {}

    class S:
        params = {}
        batch_stats = {}

    meters, _ = evaluate(eval_fn, S(), loader, parallel,
                         jax.random.PRNGKey(0), [])
    # first batch full (16); tail has 4 valid -> padded copy sliced to the
    # next multiple of the data axis, not the full static 16
    expected_tail = ((4 + nd - 1) // nd) * nd
    assert seen == [16, expected_tail]
    # batch means weighted by n_valid
    m1 = float(np.mean(imgs[:16].astype(np.float32)))
    # tail rows = the 4 valid images + wrap padding from the start of the
    # order, sliced to the data-axis multiple
    tail = np.concatenate([imgs[16:20], imgs[:expected_tail - 4]])
    m2 = float(np.mean(tail.astype(np.float32)))
    want = (16 * m1 + 4 * m2) / 20
    assert meters["total_loss"].avg == pytest.approx(want, rel=1e-5)


def test_load_vqvae_without_dataset_files(tmp_path):
    """Offline generators rebuild the model from the checkpoint alone when
    the dataset files are missing (need_data=False); the prior trainer
    (need_data=True) still gets the clear FileNotFoundError."""
    import jax

    from movae_tpu.models import get_network, init_model
    from movae_tpu.train import checkpoint as ckpt_lib
    from train_prior_vqvae import load_vqvae

    args = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                hidden_dims=[8, 16], num_residual_layers=1, batch_size=4,
                dataset="cifar10", dataset_size=50000)
    model = get_network(32, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    ck = str(tmp_path / "ck")
    ckpt_lib.save_checkpoint(ck, {
        "epoch": 1,
        "model_state_dict": {"params": jax.device_get(params),
                             "batch_stats": jax.device_get(bs)},
        "args": args})

    nodata = str(tmp_path / "nodata")
    with pytest.raises(FileNotFoundError):
        load_vqvae(ck, data_dir=nodata)

    model2, p2, _bs2, a2, train_ds, test_ds = load_vqvae(
        ck, data_dir=nodata, need_data=False)
    assert train_ds is None and test_ds is None
    assert model2.input_size == 32          # from dataset_input_size
    assert model2.num_embeddings == 32      # inferred from the codebook
    assert a2.dataset_size == 50000
