"""GB-scale archive-ingestion rehearsal (r4 VERDICT Next #5).

The real-dataset decode paths (`_hf_images` / `_load_celeba_folder` /
`_ensure_celeba`, mirroring reference utils/utils.py:111-142, 239-422)
were fixture-tested only at KB scale; real archives are env-blocked
(zero egress). A locally SYNTHESIZED archive is not blocked — this script
builds GB-scale archives and pushes them through the REAL ingestion code:

1. **celeba arm**: synthesizes a torchvision-layout CelebA
   (``img_align_celeba.zip`` of 178x218 JPEGs + ``list_eval_partition.txt``),
   serves it from a ``file://`` mirror so the reference-shaped
   ``_ensure_celeba`` download + zip-extraction path runs UNMODIFIED (the
   real ``urllib.request.urlretrieve`` handles file:// URLs; only the
   mirror URL constant and the network probe are pointed at it), then
   ``get_dataset('celeba')`` -> crop-148/resize-64 decode sweep ->
   memmapped archive. A SECOND ``get_dataset`` call must hit the memmap
   (no decode sweep), and a short VAE training run consumes the loader.

2. **hf-parquet arm**: synthesizes an HF-style parquet shard set with an
   encoded-JPEG image column (``datasets`` library), routes ``_hf_load``
   (the 2-line hub-fetch boundary) at the local shards, and runs the REAL
   ``_hf_images`` decode-once-memmap path at 256px via
   ``get_dataset('celeba-hq')``, with the same second-run cache-hit check
   and a loader sweep.

Reports decode throughput (MB/s of archive bytes, img/s) and cache-hit
timings as JSON. ``--target_gb`` sizes each arm (default 1.0); the
in-suite test runs the same machinery at MB scale.

Usage:
  python scripts/archive_ingestion_rehearsal.py --target_gb 1.0 \
      --json /tmp/archive_rehearsal.json
"""

from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import time
import zipfile

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "_MOVAE_EQUIV_REEXEC"):
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["_MOVAE_EQUIV_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _noise_jpeg(rng, w, h, quality=92) -> bytes:
    """High-entropy JPEG (noise compresses poorly -> realistic GB scale
    from a bounded image count)."""
    from PIL import Image

    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


# ------------------------------------------------------------- celeba arm

def build_celeba_mirror(mirror_dir: str, target_bytes: int,
                        seed: int = 0) -> dict:
    """img_align_celeba.zip (178x218 JPEGs, ZIP_STORED — JPEG payloads
    don't deflate) + list_eval_partition.txt, sized to ~target_bytes."""
    os.makedirs(mirror_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    zip_path = os.path.join(mirror_dir, "img_align_celeba.zip")
    t0 = time.time()
    n = 0
    lines = []
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        while zf.fp.tell() < target_bytes:
            n += 1
            name = f"{n:06d}.jpg"
            zf.writestr(f"img_align_celeba/{name}",
                        _noise_jpeg(rng, 178, 218))
            # reference split ids: 0 train / 1 valid / 2 test
            lines.append(f"{name} {0 if n % 10 < 8 else (1 if n % 10 == 8 else 2)}")
    with open(os.path.join(mirror_dir, "list_eval_partition.txt"),
              "w") as f:
        f.write("\n".join(lines) + "\n")
    size = os.path.getsize(zip_path)
    return dict(n_images=n, zip_bytes=size,
                build_s=round(time.time() - t0, 2))


def run_celeba_arm(work: str, target_bytes: int) -> dict:
    import movae_tpu.data as data

    mirror = os.path.join(work, "celeba_mirror")
    data_dir = os.path.join(work, "celeba_data")
    os.makedirs(data_dir, exist_ok=True)
    info = build_celeba_mirror(mirror, target_bytes)
    print(f"[celeba] mirror built: {info}", flush=True)

    # Point the REAL _ensure_celeba at the local mirror: urlretrieve
    # handles file:// natively; only the URL constant and the socket probe
    # are redirected — download, .part atomic rename, zip extraction and
    # the layout validation all run unmodified.
    orig_mirror, orig_probe = data._CELEBA_MIRROR, data._network_available
    data._CELEBA_MIRROR = "file://" + mirror + "/"
    data._network_available = lambda *a, **k: True
    try:
        t0 = time.time()
        train_ds, test_ds, input_size = data.get_dataset("celeba", data_dir)
        cold_s = time.time() - t0
    finally:
        data._CELEBA_MIRROR, data._network_available = (orig_mirror,
                                                        orig_probe)

    assert input_size == 64
    n_train = len(train_ds)
    # decode throughput over the whole sweep (train+test memmaps built)
    total = info["zip_bytes"]
    out = dict(**info, cold_ingest_s=round(cold_s, 2),
               decode_mb_s=round(total / 1e6 / cold_s, 1),
               decode_img_s=round(info["n_images"] / cold_s, 1),
               n_train=n_train, input_size=input_size)

    # second run must serve the memmap without a decode sweep
    cache_dir = os.path.join(data_dir, "movae_cache")
    mtimes = {f: os.path.getmtime(os.path.join(cache_dir, f))
              for f in os.listdir(cache_dir)}
    t0 = time.time()
    train2, _test2, _ = data.get_dataset("celeba", data_dir)
    warm_s = time.time() - t0
    assert {f: os.path.getmtime(os.path.join(cache_dir, f))
            for f in os.listdir(cache_dir)} == mtimes, (
        "warm get_dataset rebuilt the memmap")
    assert len(train2) == n_train
    out["warm_ingest_s"] = round(warm_s, 3)
    out["warm_speedup"] = round(cold_s / max(warm_s, 1e-9), 1)

    # training consumes the memmap-backed dataset (uint8 raw hot path)
    out["train"] = _short_train(train_ds, input_size, steps=10)
    return out


# ---------------------------------------------------------- hf parquet arm

def build_parquet_shards(shard_dir: str, target_bytes: int, num_shards: int,
                         img_px: int, seed: int = 1) -> dict:
    """HF-style parquet shards with an encoded-JPEG Image column + labels,
    sized to ~target_bytes across shards, plus a small validation shard."""
    import datasets as hfd

    os.makedirs(shard_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    per_probe = len(_noise_jpeg(rng, img_px, img_px))
    n = max(num_shards, int(target_bytes / per_probe))
    per_shard = (n + num_shards - 1) // num_shards
    paths, total = [], 0
    feats = hfd.Features({"image": hfd.Image(), "label": hfd.Value("int64")})
    for s in range(num_shards):
        count = min(per_shard, n - s * per_shard)
        if count <= 0:
            break
        rows = {"image": [{"bytes": _noise_jpeg(rng, img_px, img_px),
                           "path": f"{s}_{i}.jpg"} for i in range(count)],
                "label": rng.integers(0, 10, count).tolist()}
        ds = hfd.Dataset.from_dict(rows, features=feats)
        p = os.path.join(shard_dir, f"train-{s:05d}-of-{num_shards:05d}"
                         ".parquet")
        ds.to_parquet(p)
        paths.append(p)
        total += os.path.getsize(p)
    # small validation split (celeba-hq consumes train+validation)
    rows = {"image": [{"bytes": _noise_jpeg(rng, img_px, img_px),
                       "path": f"v_{i}.jpg"} for i in range(64)],
            "label": rng.integers(0, 10, 64).tolist()}
    vpath = os.path.join(shard_dir, "validation-00000.parquet")
    hfd.Dataset.from_dict(rows, features=feats).to_parquet(vpath)
    return dict(n_images=n, shards=len(paths), shard_bytes=total,
                build_s=round(time.time() - t0, 2), train_paths=paths,
                validation_paths=[vpath])


def run_hf_arm(work: str, target_bytes: int, img_px: int = 256) -> dict:
    import movae_tpu.data as data

    shard_dir = os.path.join(work, "hf_shards")
    data_dir = os.path.join(work, "hf_data")
    os.makedirs(data_dir, exist_ok=True)
    info = build_parquet_shards(shard_dir, target_bytes, num_shards=8,
                                img_px=img_px)
    print(f"[hf] shards built: n={info['n_images']} "
          f"bytes={info['shard_bytes']}", flush=True)

    # Route the hub-fetch boundary (_hf_load, a 2-line load_dataset call)
    # at the local shards; _hf_images' decode/transform/memmap pipeline
    # runs unmodified on the REAL `datasets` parquet reader.
    files = {"train": info["train_paths"],
             "validation": info["validation_paths"]}
    orig = data._hf_load

    def local_hf_load(repo, split):
        import datasets as hfd

        return hfd.load_dataset("parquet", data_files=files, split=split)

    data._hf_load = local_hf_load
    try:
        t0 = time.time()
        train_ds, test_ds, input_size = data.get_dataset("celeba-hq",
                                                         data_dir)
        cold_s = time.time() - t0
        assert input_size == 256
        n_train = len(train_ds)

        cache_dir = os.path.join(data_dir, "movae_cache")
        mtimes = {f: os.path.getmtime(os.path.join(cache_dir, f))
                  for f in os.listdir(cache_dir)}
        t0 = time.time()
        train2, _t2, _ = data.get_dataset("celeba-hq", data_dir)
        warm_s = time.time() - t0
        assert {f: os.path.getmtime(os.path.join(cache_dir, f))
                for f in os.listdir(cache_dir)} == mtimes, (
            "warm get_dataset rebuilt the memmap")
        assert len(train2) == n_train
    finally:
        data._hf_load = orig

    out = dict({k: v for k, v in info.items()
                if not k.endswith("_paths")},
               cold_ingest_s=round(cold_s, 2),
               decode_mb_s=round(info["shard_bytes"] / 1e6 / cold_s, 1),
               decode_img_s=round(info["n_images"] / cold_s, 1),
               warm_ingest_s=round(warm_s, 3),
               warm_speedup=round(cold_s / max(warm_s, 1e-9), 1),
               n_train=n_train, input_size=input_size)

    # loader sweep over the memmap (the 256px hot-path gather; training at
    # 256px on this 1-core host is exercised by the celeba arm at 64px)
    from movae_tpu.data import Loader

    loader = Loader(train_ds, batch_size=16, shuffle=True, raw=True)
    t0 = time.time()
    seen = 0
    for imgs, _labels, n_valid in loader:
        assert imgs.dtype == np.uint8 and imgs.shape[1:] == (256, 256, 3)
        seen += n_valid
    out["loader_sweep_s"] = round(time.time() - t0, 2)
    out["loader_img_s"] = round(seen / max(time.time() - t0, 1e-9), 1)
    return out


def _short_train(train_ds, input_size: int, steps: int) -> dict:
    """A few real train-step updates consuming the memmap-backed loader."""
    import jax
    import jax.numpy as jnp

    from movae_tpu.data import Loader
    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    args = dict(arch="vae", latent_dim=16, hidden_dims=[8, 16],
                batch_size=16, dataset_size=len(train_ds),
                recons_objective="mse")
    model = get_network(input_size, 3, args)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size, 3,
                                batch_size=2)
    cfg = AggregatorConfig(name="sum",
                           num_objectives=len(model.objective_names))
    state = TrainState.create(model.apply, params, bstats,
                              build_optimizer("adam", 1e-3),
                              init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 1, steps))
    loader = Loader(train_ds, batch_size=16, shuffle=True, raw=True)
    rng = jax.random.PRNGKey(1)
    losses = []
    t0 = time.time()
    for i, (imgs, _labels, _nv) in enumerate(loader):
        if i >= steps:
            break
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, jnp.asarray(imgs), sub)
        losses.append(float(metrics["total_loss"]))
    return dict(steps=len(losses), first_loss=losses[0],
                last_loss=losses[-1], train_s=round(time.time() - t0, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target_gb", type=float, default=1.0,
                    help="archive size per arm")
    ap.add_argument("--arms", nargs="+", default=["celeba", "hf"],
                    choices=["celeba", "hf"])
    ap.add_argument("--work", default="/tmp/archive_rehearsal")
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthesized archives (default: delete "
                         "after the run to reclaim disk)")
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()

    target = int(opts.target_gb * 1e9)
    os.makedirs(opts.work, exist_ok=True)
    results = {}
    try:
        if "celeba" in opts.arms:
            results["celeba"] = run_celeba_arm(opts.work, target)
            print(json.dumps(results["celeba"], indent=2), flush=True)
        if "hf" in opts.arms:
            results["hf_parquet"] = run_hf_arm(opts.work, target)
            print(json.dumps(results["hf_parquet"], indent=2), flush=True)
    finally:
        if not opts.keep:
            shutil.rmtree(opts.work, ignore_errors=True)

    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(dict(target_gb=opts.target_gb, results=results), f,
                      indent=2)
        print(f"wrote {opts.json}")


if __name__ == "__main__":
    main()
