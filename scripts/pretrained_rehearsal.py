#!/usr/bin/env python3
"""Pretrained-metric-weights drop-in dress rehearsal (VERDICT r3 item 5).

The real torchvision checkpoints cannot enter this zero-egress
environment, but every step a user takes to install them CAN be rehearsed
end to end with torchvision-architecture state_dicts saved from the
torch-side oracle mirrors (tests/test_metric_tower_oracle.py — identical
keys/shapes to torchvision's inception_v3 / vgg16):

  1. save random-init state_dict ``.pth`` files (stand-ins for the
     downloaded checkpoints) + torch-side expected FID/KID/IS/LPIPS on a
     fixed image set,
  2. convert them with the SHIPPED CLI
     (scripts/convert_metric_weights.py --inception_sd/--vgg_sd),
  3. in a fresh process with ``MOVAE_INCEPTION_WEIGHTS`` /
     ``MOVAE_VGG16_WEIGHTS`` pointing at the converted files, compute the
     same metrics through the production surfaces
     (metrics.features InceptionTower / extract_inception_features /
     fid/kid/IS, metrics.vgg load_params + make_lpips_fn) on the live
     backend (the chip, when the tunnel is up),
  4. assert torch-vs-flax agreement THROUGH THE CONVERTED FILES.

One command:
    python scripts/pretrained_rehearsal.py --out /tmp/rehearsal \
        --json REHEARSAL.json

Reference metric surface being mirrored: utils/metrics.py:360-914.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_IMG = 96
SIZE = 32
FID_DIMS = 16   # slice keeps the 96-sample covariance full-rank (the
                # equivalence claim is pipeline-level, not estimator-level)
IS_SPLITS = 4


def _cpu_env():
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    env.pop("_MOVAE_EQUIV_REEXEC", None)
    return env


def make_images(out_dir):
    import numpy as np

    rng = np.random.default_rng(11)
    real = rng.uniform(-1, 1, (N_IMG, SIZE, SIZE, 3)).astype(np.float32)
    fake = np.clip(real + 0.3 * rng.standard_normal(real.shape), -1,
                   1).astype(np.float32)
    np.save(os.path.join(out_dir, "real.npy"), real)
    np.save(os.path.join(out_dir, "fake.npy"), fake)
    return real, fake


# ------------------------------------------------------------- stage: torch
# Runs CPU-forced (it imports movae_tpu scoring formulas, which import jax).

def stage_torch(out_dir):
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import test_metric_tower_oracle as oracle
    from movae_tpu.metrics.features import (fid_from_features,
                                            inception_score_from_probs,
                                            kid_from_features)

    real, fake = make_images(out_dir)

    tm = oracle.TInception3()
    oracle._randomize(tm, 20260820)
    torch.save(tm.state_dict(), os.path.join(out_dir, "inception_sd.pth"))

    tv = oracle.tnn.Sequential()
    layers, cin = [], 3
    for ch in (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M"):
        if ch == "M":
            layers.append(oracle.tnn.MaxPool2d(2, 2))
        else:
            layers += [oracle.tnn.Conv2d(cin, ch, 3, padding=1),
                       oracle.tnn.ReLU()]
            cin = ch
    tv.features = oracle.tnn.Sequential(*layers)
    oracle._randomize(tv, 20260821)
    torch.save(tv.state_dict(), os.path.join(out_dir, "vgg_sd.pth"))

    def tower(x):
        with torch.no_grad():
            # r5: TInception3.forward returns logits only (torchvision
            # eval surface, refharness/towers.py); the oracle pair comes
            # from features_and_logits
            f, l = tm.features_and_logits(oracle._torch_inception_preprocess(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
        return f.numpy().astype(np.float64), l.numpy()

    fr, lr = tower(real)
    ff, _ = tower(fake)
    probs = np.asarray(torch.softmax(torch.from_numpy(lr), dim=-1))
    is_mean, _ = inception_score_from_probs(probs, splits=IS_SPLITS)
    expected = dict(
        fid=float(fid_from_features(fr[:, :FID_DIMS], ff[:, :FID_DIMS])),
        kid=float(kid_from_features(fr, ff, seed=0)),
        inception_score=float(is_mean),
        lpips=float(oracle._torch_lpips(tv.features, real, fake)),
    )
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump(expected, f, indent=2)
    print("torch-side expected:", json.dumps(expected), flush=True)


# ------------------------------------------------------------- stage: score
# Runs with MOVAE_*_WEIGHTS set, on the live backend.

def stage_score(out_dir):
    import jax
    import numpy as np

    from movae_tpu.metrics.features import (InceptionTower,
                                            extract_inception_features,
                                            fid_from_features,
                                            inception_score_from_probs,
                                            kid_from_features)
    from movae_tpu.metrics.vgg import load_params, make_lpips_fn

    assert os.environ.get("MOVAE_INCEPTION_WEIGHTS"), "env var not set"
    assert os.environ.get("MOVAE_VGG16_WEIGHTS"), "env var not set"

    real = np.load(os.path.join(out_dir, "real.npy"))
    fake = np.load(os.path.join(out_dir, "fake.npy"))
    print(f"scoring on backend={jax.default_backend()}", flush=True)

    # the production env-var path: default tower singleton + module fns
    fr, lr = InceptionTower.get().extract(real, batch_size=32,
                                          want_logits=True)
    ff = extract_inception_features(fake, batch_size=32)
    fr64, ff64 = fr.astype(np.float64), ff.astype(np.float64)
    ex = np.exp(lr - lr.max(axis=-1, keepdims=True))
    probs = ex / ex.sum(axis=-1, keepdims=True)
    is_mean, _ = inception_score_from_probs(probs, splits=IS_SPLITS)
    got = dict(
        fid=float(fid_from_features(fr64[:, :FID_DIMS],
                                    ff64[:, :FID_DIMS])),
        kid=float(kid_from_features(fr64, ff64, seed=0)),
        inception_score=float(is_mean),
        lpips=float(make_lpips_fn(load_params())(real, fake)),
        backend=jax.default_backend(),
    )
    with open(os.path.join(out_dir, "got.json"), "w") as f:
        json.dump(got, f, indent=2)
    print("flax-side got:", json.dumps(got), flush=True)


# ---------------------------------------------------------------- orchestrate

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/pretrained_rehearsal")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu_score", action="store_true",
                    help="force the scoring stage onto the host CPU too "
                         "(tunnel down / CI)")
    ap.add_argument("--stage", choices=["torch", "score"], default=None,
                    help=argparse.SUPPRESS)
    opts = ap.parse_args()
    os.makedirs(opts.out, exist_ok=True)

    if opts.stage == "torch":
        return stage_torch(opts.out)
    if opts.stage == "score":
        return stage_score(opts.out)

    me = os.path.abspath(__file__)

    def run(cmd, env):
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, env=env, check=True)

    # 1. torch-side state_dicts + expected metrics (CPU-forced: imports
    #    the shared scoring formulas, which import jax)
    run([sys.executable, me, "--stage", "torch", "--out", opts.out],
        _cpu_env())

    # 2. the SHIPPED converter CLI, file-in -> npz-out
    run([sys.executable, os.path.join(REPO, "scripts",
                                      "convert_metric_weights.py"),
         "--out_dir", opts.out,
         "--inception_sd", os.path.join(opts.out, "inception_sd.pth"),
         "--vgg_sd", os.path.join(opts.out, "vgg_sd.pth")],
        _cpu_env())

    # 3. env-var -> merge_pretrained -> metrics, on the live backend
    env = _cpu_env() if opts.cpu_score else dict(os.environ)
    env["MOVAE_INCEPTION_WEIGHTS"] = os.path.join(opts.out,
                                                  "inception_v3.npz")
    env["MOVAE_VGG16_WEIGHTS"] = os.path.join(opts.out, "vgg16.npz")
    run([sys.executable, me, "--stage", "score", "--out", opts.out], env)

    # 4. compare
    with open(os.path.join(opts.out, "expected.json")) as f:
        expected = json.load(f)
    with open(os.path.join(opts.out, "got.json")) as f:
        got = json.load(f)
    report = dict(n_images=N_IMG, size=SIZE, fid_dims=FID_DIMS,
                  backend=got.pop("backend", "?"), expected=expected,
                  got=got, rel_delta={})
    ok = True
    for k, want in expected.items():
        rel = abs(got[k] - want) / max(abs(want), 1e-12)
        report["rel_delta"][k] = rel
        # ~94 stacked convs of accumulation drift; the oracle tests bound
        # the same comparison at 1-2e-2 on CPU — allow 5e-2 for the chip's
        # different f32 conv accumulation order
        if rel > 5e-2:
            ok = False
        print(f"{k:16s} expected {want:12.6g}  got {got[k]:12.6g}  "
              f"rel {rel:.2e}", flush=True)
    report["ok"] = ok
    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {opts.json}")
    if not ok:
        raise SystemExit("dress rehearsal FAILED: deltas above tolerance")
    print("dress rehearsal OK: env-var -> converted-file -> "
          "merge_pretrained -> metrics path verified against torch")


if __name__ == "__main__":
    main()
