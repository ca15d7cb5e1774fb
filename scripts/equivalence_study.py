"""Cross-framework training-equivalence study (the r2 VERDICT's top item).

Runs the UNMODIFIED reference pipeline (/root/reference main.py
train_epoch — its real models, loss_function, backward and optimizer,
imported through refharness) and movae_tpu side by side: identical init
(flax params exported with utils/torch_export), identical batch stream,
same optimizer/aggregator hyperparameters — then compares

- the per-step loss trajectory (total + every component objective),
- the per-step aggregation weights alpha (torch weighting forward-hook vs
  this framework's task_i_weight metrics),
- the final parameter tensors.

For MTL aggregators the torch side exercises the reference's own
mtl_backward call path (main.py:186-196) — with nupgrad/aligned_mtl/mgda
the aggregator itself is also the reference's own code
(utils/torchmoo/*.py) running on the refharness torchjd base classes.

Usage:
  python scripts/equivalence_study.py --configs vq_vae:sum vq_vae:upgrad \
      --steps 50 --optimizer rmsprop --json /tmp/equiv.json

Adaptive optimizers run with eps=1e-4 on both sides (see
tests/test_torch_lockstep.py module docstring for why eps=1e-8 makes
independent implementations diverge by construction). The VAE config pins
the log_var head bias to -60 so the reparameterization noise (different
RNGs) is ~1e-13 of the signal.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# This study is a NUMERICS comparison: both sides must run on the host CPU.
# The axon sitecustomize registers the TPU plugin at interpreter startup
# whenever PALLAS_AXON_POOL_IPS is set — env edits here are too late (and
# JAX_PLATFORMS=axon from the agent env beats JAX_PLATFORM_NAME), so
# re-exec once with the axon env scrubbed, like tests/conftest.py does.
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

from movae_tpu.utils.hostfp import fingerprinted_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      fingerprinted_cache_dir("/tmp/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402

SIZE = 16
HIDDEN = (8, 16)
LATENT = 8
BATCH = 8
DATASET_SIZE = 64
LR = 1e-3
EPS = 1e-4
NORM_EPS = 1e-4
REG_EPS = 1e-4


def model_args(arch):
    extra = (dict(latent_dim=LATENT, layer_norm="batch")
             if arch in ("vae", "betatc_vae") else
             dict(embedding_dim=8, num_embeddings=32,
                  num_residual_layers=2, latent_dim=LATENT))
    return dict(arch=arch, hidden_dims=list(HIDDEN), batch_size=BATCH,
                dataset_size=DATASET_SIZE, recons_objective="mse",
                recons_activation="tanh" if arch == "vae" else None,
                **extra)


def build_batches(steps, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)
            for _ in range(steps)]


# ---------------------------------------------------------------- movae side

def run_movae(arch, agg, steps, optimizer, batches):
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step
    from movae_tpu.utils.torch_export import export_torch_state_dict

    model = get_network(SIZE, 3, model_args(arch))
    params, bstats = init_model(model, jax.random.PRNGKey(0), SIZE, 3,
                                batch_size=2)
    if arch == "vae":
        flat = traverse_util.flatten_dict(params)
        key = next(k for k in flat if "log_var" in k and k[-1] == "bias")
        flat[key] = jnp.full_like(flat[key], -60.0)
        params = traverse_util.unflatten_dict(flat)
    init_sd = {k: np.asarray(v) for k, v in
               export_torch_state_dict(params, bstats, arch).items()}

    cfg = AggregatorConfig(name=agg, norm_eps=NORM_EPS, reg_eps=REG_EPS,
                           num_objectives=len(model.objective_names))
    tx = build_optimizer(optimizer, LR, eps=EPS)
    state = TrainState.create(model.apply, params, bstats, tx,
                              init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, 1, steps))

    rng = jax.random.PRNGKey(3)
    traj = []
    for xb in batches:
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, jnp.asarray(xb), sub)
        traj.append({k: float(v) for k, v in metrics.items()
                     if np.ndim(v) == 0})
    final_sd = {k: np.asarray(v) for k, v in export_torch_state_dict(
        state.params, state.batch_stats, arch).items()}
    return dict(objective_names=list(model.objective_names), init_sd=init_sd,
                traj=traj, final_sd=final_sd,
                _flax=(model, state.params, state.batch_stats))


# ---------------------------------------------------------------- torch side

def make_reference_aggregator(agg, num_objectives):
    """Reference aggregator wiring (main.py:1191-1234), same eps flags."""
    if agg == "sum":
        return "sum", None
    import torch  # noqa: F401
    from torchjd.aggregation import IMTLG, DualProj, Mean, UPGrad
    from utils.torchmoo import MGDA, AlignedMTL, NUPGrad

    table = {
        "upgrad": lambda: UPGrad(norm_eps=NORM_EPS, reg_eps=REG_EPS),
        "mean": lambda: Mean(),
        "dualproj": lambda: DualProj(norm_eps=NORM_EPS, reg_eps=REG_EPS),
        "imtlg": lambda: IMTLG(),
        "nupgrad": lambda: NUPGrad(norm_eps=NORM_EPS, reg_eps=REG_EPS),
        "aligned_mtl": lambda: AlignedMTL(pref_vector=None),
        "mgda": lambda: MGDA(epsilon=1e-5, max_iters=250),
    }
    if agg not in table:
        raise SystemExit(f"aggregator {agg} not wired into the study")
    aggregator = table[agg]()
    captured = []
    aggregator.weighting.register_forward_hook(
        lambda _m, _inp, weights: captured.append(
            np.asarray(weights.detach().cpu(), dtype=np.float64)))
    return aggregator, captured


def run_torch(arch, agg, steps, optimizer, batches, init_sd):
    import refharness
    ref_main = refharness.activate()
    import torch
    from models import get_network as ref_get_network

    args = argparse.Namespace(**model_args(arch), max_grad_norm=None,
                              use_wandb=False)
    net = ref_get_network(SIZE, 3, args, device="cpu")
    missing, unexpected = net.load_state_dict(
        {k: torch.tensor(v) for k, v in init_sd.items()}, strict=False)
    bad = ([k for k in missing if "num_batches_tracked" not in k]
           + list(unexpected))
    if bad:
        raise SystemExit(f"weight-sync key mismatch vs reference net: {bad}")
    net.train()

    if optimizer == "adam":
        opt = torch.optim.Adam(net.parameters(), lr=LR, eps=EPS)
    elif optimizer == "rmsprop":
        opt = torch.optim.RMSprop(net.parameters(), lr=LR, alpha=0.99,
                                  eps=EPS)
    else:
        opt = torch.optim.SGD(net.parameters(), lr=LR, momentum=0.9)

    aggregator, captured = make_reference_aggregator(
        agg, len(net.objectives))

    traj, step = [], 0
    for xb in batches:
        xt = torch.tensor(xb.transpose(0, 3, 1, 2))
        if captured is not None:
            captured.clear()
        meters, step = ref_main.train_epoch(
            net, [(xt, torch.zeros(len(xt)))], opt, aggregator, step,
            "cpu", args)
        rec = {k: float(m.val) for k, m in meters.items()}
        if captured:
            for i, w in enumerate(captured[-1]):
                rec[f"task_{i}_weight"] = float(w)
        traj.append(rec)
    return dict(traj=traj,
                final_sd={k: v.detach().numpy().copy()
                          for k, v in net.state_dict().items()},
                _net=net)


# ---------------------------------------------------------------- comparison

def compare(arch, agg, mv, th, steps):
    rows, worst = [], dict(loss=0.0, comp=0.0, weight=0.0)
    names = mv["objective_names"]
    for i, (a, b) in enumerate(zip(mv["traj"], th["traj"])):
        d_loss = abs(a["total_loss"] - b["total_loss"]) / (
            abs(b["total_loss"]) + 1e-12)
        worst["loss"] = max(worst["loss"], d_loss)
        for name in names:
            if name in a and name in b:
                d = abs(a[name] - b[name]) / (abs(b[name]) + 1e-8)
                worst["comp"] = max(worst["comp"], d)
        for j in range(len(names)):
            k = f"task_{j}_weight"
            if k in a and k in b:
                worst["weight"] = max(worst["weight"], abs(a[k] - b[k]))
        rows.append(dict(step=i, movae=a["total_loss"],
                         torch=b["total_loss"], rel_delta=d_loss))

    d_param = 0.0
    for k, v in mv["final_sd"].items():
        if "num_batches_tracked" in k:
            continue
        d_param = max(d_param, float(np.max(np.abs(v - th["final_sd"][k]))))
    return dict(arch=arch, aggregator=agg, steps=steps,
                max_rel_loss_delta=worst["loss"],
                max_rel_component_delta=worst["comp"],
                max_abs_weight_delta=worst["weight"],
                final_max_param_delta=d_param,
                first_loss=rows[0], last_loss=rows[-1])


# ------------------------------------------------------------------ mini gFID

def run_gfid(arch, agg, optimizer, steps=300, n_samples=256, data_n=256):
    """Mini end-to-end generative-quality comparison (the r2 VERDICT's
    acceptance-bar probe): train BOTH frameworks on the same structured
    synthetic dataset from the same init, sample both decoders with the
    SAME z draws (isolates framework-induced weight differences from
    sampling seed noise), and score both sample sets against the train set
    through ONE shared inception tower (movae_tpu.metrics.features; random
    but fixed weights — relative gFID parity needs no torchvision weights,
    reference utils/metrics.py:360-510).

    At n_samples=256 the 2048-dim FID estimator is rank-deficient, so the
    raw relative delta is noise-amplified. Two guards make the comparison
    sound: (a) KID — the unbiased small-n metric the reference also
    computes (metrics.py:682-747) — is reported alongside; (b) a CONTROL
    arm trains the torch reference a second time with a trivially
    perturbed batch stream (data seed 1): the framework-vs-framework
    delta is judged against the delta an innocuous data reshuffle causes
    WITHIN one framework. Parity == cross-framework delta at or below the
    control band."""
    import torch

    from movae_tpu.data import _synthetic
    from movae_tpu.metrics.features import (extract_inception_features,
                                            fid_from_features,
                                            kid_from_features)

    def make_batches(seed):
        imgs, _ = _synthetic(SIZE, data_n)                 # uint8 HWC
        x = imgs.astype(np.float32) / 127.5 - 1.0
        order = np.random.default_rng(seed)
        return x, [x[order.integers(0, data_n, BATCH)]
                   for _ in range(steps)]

    real, batches = make_batches(0)
    _, batches_c1 = make_batches(1)                        # same data, new order
    _, batches_c2 = make_batches(2)

    mv = run_movae(arch, agg, steps, optimizer, batches)
    th = run_torch(arch, agg, steps, optimizer, batches, mv["init_sd"])
    th_c1 = run_torch(arch, agg, steps, optimizer, batches_c1,
                      mv["init_sd"])
    th_c2 = run_torch(arch, agg, steps, optimizer, batches_c2,
                      mv["init_sd"])

    import jax
    import jax.numpy as jnp

    z = np.random.default_rng(7).normal(
        size=(n_samples, LATENT)).astype(np.float32)

    model, params, bstats = mv["_flax"]
    decode = jax.jit(lambda zz: model.apply(
        {"params": params, "batch_stats": bstats}, zz, train=False,
        method="decode"))
    mv_samples = np.concatenate([np.asarray(decode(jnp.asarray(z[i:i + 64])))
                                 for i in range(0, n_samples, 64)])

    def torch_samples(net):
        net.eval()
        with torch.no_grad():
            return np.concatenate([
                net.decode(torch.tensor(z[i:i + 64])).numpy()
                for i in range(0, n_samples, 64)]).transpose(0, 2, 3, 1)

    th_samples = torch_samples(th["_net"])

    # f64 features for KID in THIS study only: the poly kernel's values sit
    # at 1+eps where the arm differences are below f32 resolution (measured:
    # all arms bit-identical at f32) — the pipeline's own f32 KID keeps
    # reference parity, the study needs the extra discriminative power.
    f_real = extract_inception_features(real, batch_size=64).astype(
        np.float64)
    scores = {}
    for name, s in [("movae", mv_samples), ("torch", th_samples),
                    ("torch_ctl1", torch_samples(th_c1["_net"])),
                    ("torch_ctl2", torch_samples(th_c2["_net"]))]:
        f = extract_inception_features(s, batch_size=64).astype(np.float64)
        scores[name] = dict(
            gfid=float(fid_from_features(f_real, f)),
            kid=float(kid_from_features(f_real, f, seed=0)))

    def rel(a, b):
        return float(abs(a - b) / max(abs(b), 1e-12))

    out = dict(arch=arch, aggregator=agg, steps=steps,
               n_samples=n_samples,
               sample_mae=float(np.mean(np.abs(mv_samples - th_samples))),
               scores=scores)
    for metric in ("gfid", "kid"):
        out[f"rel_{metric}_delta"] = rel(scores["movae"][metric],
                                         scores["torch"][metric])
        out[f"rel_{metric}_controls"] = [
            rel(scores[c][metric], scores["torch"][metric])
            for c in ("torch_ctl1", "torch_ctl2")]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+",
                    default=["vq_vae:sum", "vq_vae:upgrad"],
                    help="arch:aggregator pairs")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--optimizer", default="rmsprop",
                    choices=["sgd", "adam", "rmsprop"])
    ap.add_argument("--gfid", action="store_true",
                    help="mini end-to-end gFID comparison instead of the "
                         "trajectory study (vae archs only)")
    ap.add_argument("--gfid_samples", type=int, default=256)
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()

    results = []
    if opts.gfid:
        for spec in opts.configs:
            arch, agg = spec.split(":")
            print(f"== gFID {arch}:{agg} ({opts.steps} steps, "
                  f"{opts.optimizer}) ==", flush=True)
            res = run_gfid(arch, agg, opts.optimizer, steps=opts.steps,
                           n_samples=opts.gfid_samples)
            results.append(res)
            print(json.dumps(res, indent=2), flush=True)
    else:
        batches = build_batches(opts.steps)
        for spec in opts.configs:
            arch, agg = spec.split(":")
            print(f"== {arch}:{agg} ({opts.steps} steps, "
                  f"{opts.optimizer}) ==", flush=True)
            mv = run_movae(arch, agg, opts.steps, opts.optimizer, batches)
            th = run_torch(arch, agg, opts.steps, opts.optimizer, batches,
                           mv["init_sd"])
            res = compare(arch, agg, mv, th, opts.steps)
            results.append(res)
            print(json.dumps(res, indent=2), flush=True)

    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(dict(optimizer=opts.optimizer, steps=opts.steps,
                           lr=LR, eps=EPS, gfid=opts.gfid,
                           results=results), f, indent=2)
        print(f"wrote {opts.json}")


if __name__ == "__main__":
    main()
