"""Cross-framework EVAL-pipeline equivalence study (r4 VERDICT Next #1).

The per-run pipeline's training segments (stage-1 epochs, stage-2 prior)
and the samplers are lockstep-proven; this study closes the last segment:
the reference's eval loop and final-metrics pass, run UNMODIFIED from an
identical checkpoint on both sides:

- ``evaluate`` — test losses + exact codebook-usage union across batches
  (/root/reference/main.py:238-331) vs movae_tpu.train.loop.evaluate;
- ``evaluate_with_recon_metrics`` — single-pass losses + rFID/PSNR/SSIM/
  LPIPS (main.py:376-463) through WEIGHT-SYNCED metric towers: the
  refharness torchvision shim serves seeded-random mirror towers
  (``MOVAE_REFHARNESS_TOWER_SEED``) and the SAME state_dicts are converted
  into the flax towers (``MOVAE_INCEPTION_WEIGHTS``/``MOVAE_VGG16_WEIGHTS``)
  — the exact trick tests/test_metric_tower_oracle.py anchors;
- hypervolume at the reference's eval call sites (main.py:659-692;
  evaluate.py:82-106) — our WFG recursion vs the reference's pymoo call
  (which the shim delegates back to us) vs an INDEPENDENT brute-force
  inclusion-exclusion oracle computed here, de-circularizing the shim;
- checkpoint reload: the movae checkpoint is saved (orbax) and reloaded
  through our evaluate.py loader, AND exported to a reference-format
  ``.pth`` that the reference evaluate.py's own ``load_model_from_
  checkpoint`` (evaluate.py:20-79) consumes; both reloads must reproduce
  the in-memory eval losses exactly, and the reference's
  ``print_results_table`` (evaluate.py:132-207) is exercised on the result.

The 2048-dim FID at n=48 is rank-deficient (sqrtm noise-amplified), so
alongside the raw rFID delta the study reports an 8-dim FID computed from
each framework's OWN feature extractor + Fréchet formula (reference
``extract_inception_features``/``fid_from_features``, metrics.py:618-679)
— full-rank, hence a tight cross-framework check — plus the raw feature
agreement on identical images.

Usage:
  python scripts/eval_equivalence_study.py \
      --configs vq_vae:sum vq_vae2:sum gg_vq_vae:sum vae:upgrad \
      --steps 20 --json EQUIVALENCE_EVAL.json
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

# Numerics study: force host CPU (axon sitecustomize pins the TPU plugin at
# interpreter start; re-exec with the env scrubbed, same pattern as
# scripts/equivalence_study.py).
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "_MOVAE_EQUIV_REEXEC"):
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["_MOVAE_EQUIV_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "scripts")):
    if p not in sys.path:
        sys.path.insert(0, p)

from movae_tpu.utils.hostfp import fingerprinted_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      fingerprinted_cache_dir("/tmp/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# Weight-synced towers: ONE seed drives both sides. Must be set before the
# reference's lpips/calculate_fid first construct a shim tower, and the
# converted npz env vars before movae's metric modules first build theirs.
TOWER_SEED = 20260820
os.environ["MOVAE_REFHARNESS_TOWER_SEED"] = str(TOWER_SEED)

import numpy as np  # noqa: E402

import equivalence_study as eq  # noqa: E402  (scripts/ sibling)

EVAL_N = 48
EVAL_BATCH = 8


class _ListLoader:
    """Minimal Loader-shaped iterator over pre-built float batches (the
    movae eval fns read batch_size/process_count/dataset; all batches are
    full so the ragged-tail path is inert)."""

    def __init__(self, arrays):
        self.arrays = arrays
        self.batch_size = arrays[0].shape[0]
        self.process_count = 1
        self.process_index = 0
        self.dataset = [None] * sum(len(a) for a in arrays)

    def __len__(self):
        return len(self.arrays)

    def __iter__(self):
        for a in self.arrays:
            yield a, np.zeros(len(a), np.int64), len(a)


def build_eval_batches(seed=99):
    rng = np.random.default_rng(seed)
    return [rng.uniform(-1, 1,
                        (EVAL_BATCH, eq.SIZE, eq.SIZE, 3)).astype(np.float32)
            for _ in range(EVAL_N // EVAL_BATCH)]


def hv_inclusion_exclusion(points, ref):
    """Independent exact HV oracle: inclusion-exclusion over point subsets
    (no shared structure with movae_tpu.metrics.hv's WFG recursion)."""
    pts = np.asarray(points, np.float64).reshape(-1, len(ref))
    ref = np.asarray(ref, np.float64)
    pts = pts[np.all(pts < ref, axis=1)]
    total = 0.0
    for r in range(1, len(pts) + 1):
        sign = 1.0 if r % 2 == 1 else -1.0
        for subset in itertools.combinations(range(len(pts)), r):
            corner = np.max(pts[list(subset)], axis=0)
            total += sign * float(np.prod(np.maximum(ref - corner, 0.0)))
    return total


def setup_movae_towers(tmp_dir):
    """Convert the SAME seeded torch tower weights the shim serves into the
    flax towers and point the env vars at them."""
    from refharness.towers import build_inception_v3, build_vgg16

    from movae_tpu.metrics.inception import (
        convert_torch_weights as conv_inception)
    from movae_tpu.metrics.vgg import convert_torch_weights as conv_vgg

    inc_npz = os.path.join(tmp_dir, "inception_sync.npz")
    vgg_npz = os.path.join(tmp_dir, "vgg_sync.npz")
    conv_inception(build_inception_v3(TOWER_SEED).state_dict(), inc_npz)
    # the shim's vgg16() serves build_vgg16(seed + 1) — separate weight
    # stream from the inception tower; mirror it exactly
    conv_vgg(build_vgg16(TOWER_SEED + 1).state_dict(), vgg_npz)
    os.environ["MOVAE_INCEPTION_WEIGHTS"] = inc_npz
    os.environ["MOVAE_VGG16_WEIGHTS"] = vgg_npz


# ---------------------------------------------------------------- movae side

def movae_eval(arch, mv, eval_batches, ckpt_dir):
    import jax
    from types import SimpleNamespace

    from movae_tpu.metrics import features as feat_lib
    from movae_tpu.metrics.hv import build_hv_indicator
    from movae_tpu.parallel.mesh import DataParallel
    from movae_tpu.train import checkpoint as ckpt_lib
    from movae_tpu.train.final_metrics import evaluate_recon_metrics
    from movae_tpu.train.loop import evaluate as evaluate_losses
    from movae_tpu.train.step import make_eval_step

    model, params, bstats = mv["_flax"]
    state = SimpleNamespace(params=params, batch_stats=bstats)
    loader = _ListLoader(eval_batches)
    eval_fn = jax.jit(make_eval_step(model))
    meters, _ = evaluate_losses(eval_fn, state, loader, DataParallel(),
                                jax.random.PRNGKey(11),
                                model.objective_names)
    losses = {k: float(m.avg) for k, m in meters.items()}

    hv_ind = build_hv_indicator(model.objective_names, None)
    point = np.array([[losses[k] for k in model.objective_names]])
    hv = float(hv_ind(point)) if hv_ind is not None else None

    recon = evaluate_recon_metrics(model, state, loader,
                                   jax.random.PRNGKey(12),
                                   max_samples=EVAL_N)

    # tight full-rank FID check: own extractor + Fréchet on 8 dims
    from movae_tpu.train.final_metrics import collect_recons
    real2, recs, _ = collect_recons(model, state, loader,
                                    jax.random.PRNGKey(12), EVAL_N)
    f_real = feat_lib.extract_inception_features(real2)
    f_rec = feat_lib.extract_inception_features(recs)
    fid8 = float(feat_lib.fid_from_features(f_real[:, :8], f_rec[:, :8]))

    # checkpoint reload through our evaluate.py loader (synthetic dataset
    # only supplies input_size/dataset_size; the eval stream is shared)
    args_ns = SimpleNamespace(**eq.model_args(arch))
    args_ns.dataset = f"synthetic-{eq.SIZE}-64"
    args_ns.data_dir = ckpt_dir
    ckpt_lib.save_checkpoint(ckpt_dir + "/final_checkpoint", {
        "epoch": 1,
        "model_state_dict": {"params": params, "batch_stats": bstats},
        "args": vars(args_ns)})
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "movae_evaluate", os.path.join(REPO, "evaluate.py"))
    movae_evaluate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(movae_evaluate)
    (model2, params2, bstats2, _a, _tr, _te,
     _n) = movae_evaluate.load_model_from_checkpoint(
        ckpt_dir + "/final_checkpoint")
    state2 = SimpleNamespace(params=params2, batch_stats=bstats2)
    meters2, _ = evaluate_losses(jax.jit(make_eval_step(model2)), state2,
                                 _ListLoader(eval_batches), DataParallel(),
                                 jax.random.PRNGKey(11),
                                 model2.objective_names)
    reload_delta = max(abs(float(meters2[k].avg) - losses[k])
                       for k in losses)
    movae_evaluate.print_results_table(
        {f"eval/{k}": v for k, v in losses.items()})

    return dict(losses=losses, hv=hv, recon=recon, fid8=fid8,
                f_real=f_real, objective_names=list(model.objective_names),
                reload_max_loss_delta=reload_delta)


# ---------------------------------------------------------------- torch side

def torch_eval(arch, final_sd, eval_batches, pth_path, vq_args=None):
    import refharness

    ref_main = refharness.activate()
    import torch
    import models as ref_models  # noqa: F401
    from models import get_network as ref_get_network
    from utils.metrics import extract_inception_features, fid_from_features

    args = argparse.Namespace(**eq.model_args(arch), max_grad_norm=None,
                              use_wandb=False, max_fid_samples=EVAL_N)
    net = ref_get_network(eq.SIZE, 3, args, device="cpu")
    missing, unexpected = net.load_state_dict(
        {k: torch.tensor(v) for k, v in final_sd.items()}, strict=False)
    bad = ([k for k in missing if "num_batches_tracked" not in k
            and not k.startswith(("vq_top.", "vq_bottom.", "sobel_"))
            and not k.endswith((".pe", "rotary.inv_freq"))]
           + list(unexpected))
    if bad:
        raise SystemExit(f"weight-sync key mismatch vs reference net: {bad}")
    net.eval()

    loader = [(torch.tensor(b.transpose(0, 3, 1, 2)),
               torch.zeros(len(b))) for b in eval_batches]

    # reference evaluate (losses + exact codebook-usage union)
    meters = ref_main.evaluate(net, loader, "cpu", args)
    losses_a = {k: float(m.avg) for k, m in meters.items()}

    # reference single-pass eval + recon metrics through the shim towers
    meters2, recon = ref_main.evaluate_with_recon_metrics(
        net, loader, "cpu", args)
    losses_b = {k: float(m.avg) for k, m in meters2.items()}

    # tight 8-dim FID via the reference's own shared-feature path
    real_t = torch.cat([b for b, _ in loader])
    with torch.no_grad():
        rec_t = torch.cat([net(b)["recons"] for b, _ in loader])
    f_real = extract_inception_features(real_t, device="cpu")
    f_rec = extract_inception_features(rec_t, device="cpu")
    fid8 = float(fid_from_features(f_real[:, :8], f_rec[:, :8]))

    # reference evaluate.py: HV indicator + reload + results table
    import evaluate as ref_eval  # resolves to /root/reference/evaluate.py

    objective_keys = list(net.objectives.keys())
    hv_ind = ref_eval.build_hv_indicator(objective_keys)
    hv = None
    if hv_ind is not None:
        pt = np.array([[losses_a[k] for k in objective_keys]])
        hv = float(hv_ind(pt))

    # export the SAME weights as a reference-format .pth and reload it
    # through the reference's own load_model_from_checkpoint. get_dataset
    # is scope-patched to supply input_size only — real dataset ingestion
    # is env-blocked and fixture-tested elsewhere; every other line
    # (torch.load, Args reconstruction, get_network, load_state_dict) runs
    # unmodified (reference evaluate.py:20-79).
    torch.save({"model_state_dict": net.state_dict(), "args": vars(args),
                "epoch": 1}, pth_path)
    orig_get_dataset = ref_eval.get_dataset
    ref_eval.get_dataset = lambda *a, **k: (None, None, eq.SIZE)
    try:
        net3, _ckpt_args = ref_eval.load_model_from_checkpoint(
            pth_path, "cifar10", arch, "cpu")
    finally:
        ref_eval.get_dataset = orig_get_dataset
    meters3 = ref_main.evaluate(net3, loader, "cpu", args)
    reload_delta = max(abs(float(meters3[k].avg) - losses_a[k])
                       for k in losses_a)

    gen_stub = {k: float("nan") for k in
                ("gfid", "inception_score_mean", "inception_score_std",
                 "kid")}
    ref_eval.print_results_table(meters2, recon, gen_stub, hv_value=hv)

    return dict(losses=losses_a, losses_single_pass=losses_b, hv=hv,
                recon=recon, fid8=fid8, f_real=f_real.astype(np.float64),
                objective_names=objective_keys,
                reload_max_loss_delta=reload_delta)


# ---------------------------------------------------------------- comparison

def rel(a, b, eps=1e-12):
    if a is None or b is None:
        return None
    if isinstance(a, float) and isinstance(b, float) and (
            np.isnan(a) and np.isnan(b)):
        return 0.0
    return float(abs(a - b) / max(abs(b), eps))


def compare(arch, agg, mv_res, th_res, steps):
    out = dict(arch=arch, aggregator=agg, steps=steps, eval_n=EVAL_N)
    keys = sorted(set(mv_res["losses"]) & set(th_res["losses"]))
    out["eval_losses"] = {
        k: dict(movae=mv_res["losses"][k], torch=th_res["losses"][k],
                rel_delta=rel(mv_res["losses"][k], th_res["losses"][k]))
        for k in keys}
    out["max_rel_loss_delta"] = max(
        v["rel_delta"] for v in out["eval_losses"].values())
    # reference invariant: evaluate() and evaluate_with_recon_metrics()
    # must agree with each other on the torch side (same loop, one pass)
    out["torch_single_vs_double_pass_max_delta"] = max(
        abs(th_res["losses"][k] - th_res["losses_single_pass"][k])
        for k in keys if k in th_res["losses_single_pass"])

    names = mv_res["objective_names"]
    point = np.array([[th_res["losses"][k] for k in names]])
    hv_oracle = hv_inclusion_exclusion(point, np.full(len(names), 1.1))
    out["hv"] = dict(movae=mv_res["hv"], torch_pymoo_shim=th_res["hv"],
                     independent_ie_oracle=hv_oracle,
                     rel_delta_cross=rel(mv_res["hv"], th_res["hv"]),
                     rel_delta_vs_oracle=rel(th_res["hv"], hv_oracle))

    key_map = dict(psnr="psnr", ssim="ssim", lpips="lpips", rfid="rfid")
    out["recon"] = {
        ours: dict(movae=float(mv_res["recon"][ours]),
                   torch=float(th_res["recon"][theirs]),
                   rel_delta=rel(float(mv_res["recon"][ours]),
                                 float(th_res["recon"][theirs])))
        for ours, theirs in key_map.items()}
    out["fid8"] = dict(movae=mv_res["fid8"], torch=th_res["fid8"],
                       rel_delta=rel(mv_res["fid8"], th_res["fid8"]))

    fa, fb = mv_res["f_real"], th_res["f_real"]
    n = min(len(fa), len(fb))
    scale = float(np.abs(fb[:n]).max())
    out["inception_feature_max_rel_delta"] = float(
        np.abs(fa[:n] - fb[:n]).max() / scale)
    out["reload"] = dict(
        movae_max_loss_delta=mv_res["reload_max_loss_delta"],
        torch_max_loss_delta=th_res["reload_max_loss_delta"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+",
                    default=["vq_vae:sum", "vq_vae2:sum", "gg_vq_vae:sum",
                             "vae:upgrad"])
    ap.add_argument("--steps", type=int, default=20,
                    help="training steps to reach a non-trivial shared "
                         "checkpoint before the eval pass")
    ap.add_argument("--optimizer", default="adam")
    ap.add_argument("--size", type=int, default=32,
                    help="image size (>=32 so the reference computes "
                         "lpips/rfid, main.py:339 min_size_for_lpips)")
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()

    eq.SIZE = opts.size
    import tempfile

    work = tempfile.mkdtemp(prefix="eval_equiv_")
    setup_movae_towers(work)

    train_batches = eq.build_batches(opts.steps)
    eval_batches = build_eval_batches()

    results = []
    for spec in opts.configs:
        arch, agg = spec.split(":")
        print(f"== eval lockstep {arch}:{agg} (train {opts.steps} steps, "
              f"eval n={EVAL_N} @ {eq.SIZE}px) ==", flush=True)
        mv = eq.run_movae(arch, agg, opts.steps, opts.optimizer,
                          train_batches)
        cdir = os.path.join(work, f"{arch}_{agg}")
        os.makedirs(cdir, exist_ok=True)
        mv_res = movae_eval(arch, mv, eval_batches, cdir)
        th_res = torch_eval(arch, mv["final_sd"], eval_batches,
                            os.path.join(cdir, "final_checkpoint.pth"))
        res = compare(arch, agg, mv_res, th_res, opts.steps)
        results.append(res)
        print(json.dumps(res, indent=2), flush=True)

    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(dict(steps=opts.steps, optimizer=opts.optimizer,
                           eval_n=EVAL_N, size=eq.SIZE,
                           tower_seed=TOWER_SEED, results=results),
                      f, indent=2)
        print(f"wrote {opts.json}")


if __name__ == "__main__":
    main()
