"""Scaled end-to-end gFID equivalence probe (VERDICT r3 item 3).

The r3 mini-probe (equivalence_study.py --gfid) proved indistinguishability
at toy scale but its torch-vs-torch control band was 11-27%. This probe
raises the statistical power (findings in BENCH.md "gFID equivalence probe
v2/v3": the band is RUN-TO-RUN TRAINING variance; convergence drives
absolute gFID toward the estimator floor, so relative bands cannot reach
single-digit % on a toy task — what the probe DOES establish is that the
cross-framework delta sits inside both frameworks' own
innocuous-perturbation bands at every scale tested, with mixed signs):

* acceptance-#3 SHAPE: VQ-VAE trained with a multi-objective aggregator,
  then a PixelCNN prior over its frozen codes, samples drawn THROUGH the
  prior and decoded (reference main.py:695-887, 1054-1085);
* >= 2048 samples and a 2048-image train set (vs 256/256 in r3);
* >= 3 torch-vs-torch control arms (reshuffled batch streams, fresh prior
  seeds) so the band itself is estimated from 3 deltas;
* feature extraction ON-CHIP (phase "score") — 5 arms x 2048 images
  through the inception tower is minutes on the TPU, hours on this
  single-core host.

Two phases because numerics training must run on the host CPU while
scoring wants the chip (CLAUDE.md "forcing CPU" notes):

  # phase 1: trains all arms on CPU, dumps sample sets (~1-2 h)
  python scripts/gfid_probe.py --phase train --out /tmp/gfid_probe
  # phase 2: run with the tunnel up, scores on the TPU
  python scripts/gfid_probe.py --phase score --out /tmp/gfid_probe \
      --json EQUIVALENCE_GFID.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SIZE = 16
ARCH = "vq_vae"
AGG = "upgrad"
N_SAMPLES = 2048
DATA_N = 2048
# r4 v2: the 600-step/4-epoch v1 run left every arm ~3600x above the FID
# estimator floor (split-real gfid 1.7e-8 vs arm gfid 3-6e-5) but with
# 11-47% RUN-TO-RUN training variance between torch controls — the models
# were far from converged, so an innocuous batch reshuffle moved gFID as
# much as a framework swap. Longer training tightens every arm onto the
# same attractor; a movae-side control makes the band symmetric.
TRAIN_STEPS = 3000
PRIOR_EPOCHS = 12
PRIOR_HC = 32
PRIOR_NL = 5
CONTROLS = 3
MOVAE_CONTROLS = 1


def _force_cpu_reexec():
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
            "_MOVAE_EQUIV_REEXEC"):
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["_MOVAE_EQUIV_REEXEC"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)


def make_data(seed, steps):
    from movae_tpu.data import _synthetic
    import equivalence_study as eq

    imgs, _ = _synthetic(SIZE, DATA_N)
    x = imgs.astype(np.float32) / 127.5 - 1.0
    order = np.random.default_rng(seed)
    return x, [x[order.integers(0, DATA_N, eq.BATCH)]
               for _ in range(steps)]


def prior_args(hc=None, nl=None):
    return argparse.Namespace(
        arch=ARCH, dataset="gfid-probe", dataset_size=DATA_N, batch_size=64,
        num_workers=0, seed=0, prior_type="pixelcnn",
        pixelcnn_epochs=PRIOR_EPOCHS,
        pixelcnn_hidden_channels=hc or PRIOR_HC,
        pixelcnn_num_layers=nl or PRIOR_NL, pixelcnn_lr=3e-4,
        pixelcnn_temperature=1.0, prior_use_lmdb_codes=False,
        prior_sample_every=0, input_size=SIZE, kv_cache_dtype="int8",
    )


def movae_arm(batches, x, steps, prior_epochs, sample_seed=9,
              hc=None, nl=None):
    import equivalence_study as eq
    import jax
    import jax.numpy as jnp

    from movae_tpu.parallel.mesh import DataParallel, make_mesh
    from movae_tpu.train import final_metrics
    from movae_tpu.train.prior import train_prior

    mv = eq.run_movae(ARCH, AGG, steps, "adam", batches)
    model, params, bstats = mv["_flax"]
    state = types.SimpleNamespace(params=params, batch_stats=bstats)

    get_codes = jax.jit(lambda xb: model.apply(
        {"params": params, "batch_stats": bstats}, xb,
        method="get_code_indices"))
    codes = np.concatenate([np.asarray(get_codes(jnp.asarray(x[i:i + 256])))
                            for i in range(0, len(x), 256)])
    s = model.latent_spatial_dim
    levels = {"codes": codes.reshape(len(x), s, s).astype(np.int32)}

    pargs = prior_args(hc, nl)
    pargs.pixelcnn_epochs = prior_epochs
    with tempfile.TemporaryDirectory() as td:
        results = dict(model=model, state=state, save_root=td,
                       parallel=DataParallel(make_mesh()), train_loader=None,
                       prior_levels=levels)
        prior = train_prior(results, pargs)

    samples = final_metrics.generate_samples(
        model, state, pargs, prior, jax.random.PRNGKey(sample_seed),
        N_SAMPLES, batch=256)
    return mv, np.asarray(samples, np.float32)


def torch_arm(batches, x, init_sd, arm_seed, steps, prior_epochs,
              hc=None, nl=None):
    import equivalence_study as eq
    import refharness
    ref_main = refharness.activate()
    import torch

    th = eq.run_torch(ARCH, AGG, steps, "adam", batches, init_sd)
    net = th["_net"]

    # image loader over the full train set (the reference's on-the-fly
    # code path calls net.get_code_indices per batch, main.py:1016-1023);
    # prior init + sampling draws come from the torch global seed
    torch.manual_seed(1234 + arm_seed)
    loader = [(torch.tensor(x[i:i + 64].transpose(0, 3, 1, 2)),
               torch.zeros(1)) for i in range(0, len(x), 64)]
    pargs = prior_args(hc, nl)
    pargs.pixelcnn_epochs = prior_epochs
    with tempfile.TemporaryDirectory() as td:
        prior = ref_main.train_pixelcnn_prior(net, loader, "cpu", pargs, td)

    outs = []
    with torch.no_grad():
        for i in range(0, N_SAMPLES, 256):
            s = ref_main.generate_samples_vq_with_prior(
                net, prior, min(256, N_SAMPLES - i), "cpu")
            outs.append(s.numpy().transpose(0, 2, 3, 1))
    return np.concatenate(outs).astype(np.float32)


def phase_train(out_dir, steps, prior_epochs, hc=None, nl=None):
    _force_cpu_reexec()
    from movae_tpu.utils.hostfp import fingerprinted_cache_dir
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          fingerprinted_cache_dir("/tmp/jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.makedirs(out_dir, exist_ok=True)

    x, batches0 = make_data(0, steps)
    np.save(os.path.join(out_dir, "real.npy"), x)

    print(f"== movae arm ({ARCH}:{AGG}, {steps} steps + "
          f"{prior_epochs}-epoch prior) ==", flush=True)
    mv, samples = movae_arm(batches0, x, steps, prior_epochs,
                            hc=hc, nl=nl)
    np.save(os.path.join(out_dir, "movae.npy"), samples)

    for c in range(1, MOVAE_CONTROLS + 1):
        print(f"== movae control {c} (reshuffled batches) ==", flush=True)
        _, batches_c = make_data(100 + c, steps)
        _, s = movae_arm(batches_c, x, steps, prior_epochs,
                         sample_seed=9 + c, hc=hc, nl=nl)
        np.save(os.path.join(out_dir, f"movae_ctl{c}.npy"), s)

    print("== torch arm (same init, same batches) ==", flush=True)
    np.save(os.path.join(out_dir, "torch.npy"),
            torch_arm(batches0, x, mv["init_sd"], 0, steps,
                      prior_epochs, hc=hc, nl=nl))

    for c in range(1, CONTROLS + 1):
        print(f"== torch control {c} (reshuffled batches) ==", flush=True)
        _, batches_c = make_data(c, steps)
        np.save(os.path.join(out_dir, f"torch_ctl{c}.npy"),
                torch_arm(batches_c, x, mv["init_sd"], c, steps,
                          prior_epochs, hc=hc, nl=nl))

    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(dict(arch=ARCH, agg=AGG, size=SIZE, n_samples=N_SAMPLES,
                       data_n=DATA_N, train_steps=steps,
                       prior_epochs=prior_epochs, controls=CONTROLS,
                       movae_controls=MOVAE_CONTROLS,
                       prior_hc=hc or PRIOR_HC, prior_nl=nl or PRIOR_NL), f)
    print(f"train phase done -> {out_dir}")


def phase_score(out_dir, json_out):
    # NO cpu forcing: the feature tower runs on whatever backend is live
    # (the chip through the tunnel, in this environment)
    import jax

    from movae_tpu.metrics.features import (extract_inception_features,
                                            fid_from_features,
                                            kid_from_features)

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    real = np.load(os.path.join(out_dir, "real.npy"))
    arms = (["movae", "torch"]
            + [f"movae_ctl{c}"
               for c in range(1, meta.get("movae_controls", 0) + 1)]
            + [f"torch_ctl{c}" for c in range(1, meta["controls"] + 1)])

    print(f"scoring on backend={jax.default_backend()} "
          f"({len(arms)} arms x {meta['n_samples']})", flush=True)
    f_real = extract_inception_features(real, batch_size=256).astype(
        np.float64)
    scores = {}
    for name in arms:
        s = np.load(os.path.join(out_dir, f"{name}.npy"))
        f = extract_inception_features(s, batch_size=256).astype(np.float64)
        scores[name] = dict(gfid=float(fid_from_features(f_real, f)),
                            kid=float(kid_from_features(f_real, f, seed=0)))
        print(name, scores[name], flush=True)

    def rel(a, b):
        return float(abs(a - b) / max(abs(b), 1e-12))

    out = dict(meta, scores=scores)
    for metric in ("gfid", "kid"):
        out[f"rel_{metric}_delta"] = rel(scores["movae"][metric],
                                         scores["torch"][metric])
        out[f"rel_{metric}_controls"] = [
            rel(scores[f"torch_ctl{c}"][metric], scores["torch"][metric])
            for c in range(1, meta["controls"] + 1)]
        out[f"rel_{metric}_movae_controls"] = [
            rel(scores[f"movae_ctl{c}"][metric], scores["movae"][metric])
            for c in range(1, meta.get("movae_controls", 0) + 1)]
    print(json.dumps(out, indent=2))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {json_out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["train", "score"], required=True)
    ap.add_argument("--out", default="/tmp/gfid_probe")
    ap.add_argument("--json", default=None)
    ap.add_argument("--train_steps", type=int, default=TRAIN_STEPS)
    ap.add_argument("--prior_epochs", type=int, default=PRIOR_EPOCHS)
    ap.add_argument("--prior_hc", type=int, default=None,
                    help="prior hidden channels (small = deliberately "
                         "under-powered prior -> stable capacity-limited "
                         "gFID gap)")
    ap.add_argument("--prior_nl", type=int, default=None)
    ap.add_argument("--size", type=int, default=None,
                    help="image size for a larger probe rung (v4: 32px — "
                         "the largest trainable scale on this host; the "
                         "16px default reproduces the v2/v3 rungs)")
    opts = ap.parse_args()
    if opts.size:
        global SIZE
        SIZE = opts.size
        import equivalence_study as eq

        eq.SIZE = opts.size
    if opts.phase == "train":
        phase_train(opts.out, opts.train_steps, opts.prior_epochs,
                    hc=opts.prior_hc, nl=opts.prior_nl)
    else:
        phase_score(opts.out, opts.json)


if __name__ == "__main__":
    main()
