"""Stage-2 (prior training) cross-framework lockstep study (VERDICT r3 #2).

Runs the UNMODIFIED reference ``train_pixelcnn_prior`` loop
(/root/reference/main.py:890-1051 — its real prior model, Adam + per-epoch
CosineAnnealingLR(T_max=epochs, eta_min=1e-6), grad-clip 1.0, per-epoch
best-checkpoint rule) against ``movae_tpu/train/prior.py`` from IDENTICAL
frozen VQ codes and IDENTICAL prior init, and compares

- the per-step CE trajectory,
- the per-epoch average CE (the best-checkpoint statistic),
- the best-checkpoint decision sequence (which epochs improved),
- the final prior parameters.

Controlled-equal inputs:
- codes: one synthetic spatially-correlated code set, handed to the movae
  side via ``results['prior_levels']`` (skips VQ extraction) and to the
  reference via a stub ``net.get_code_indices`` that maps loader index
  batches to the same arrays;
- batch order: the reference loader replays movae CodeLoader's per-epoch
  permutations (np.default_rng((seed, epoch)), codes_cache.py);
- init: the movae prior's params (PRNGKey(seed+1), exactly what
  _train_prior_impl derives internally) exported via utils/torch_export
  and loaded into the reference prior through a patched constructor;
- Adam eps: 1e-4 on both sides (--pixelcnn_adam_eps / a scoped
  functools.partial on the reference's optim.Adam — at the shared 1e-8
  default, sub-fp-noise gradient elements take full +-lr steps and
  independent frameworks diverge by construction, see
  tests/test_torch_lockstep.py).

Usage:
  python scripts/prior_equivalence_study.py --configs pixelcnn \
      hierarchical_pixelcnn --epochs 8 --json /tmp/prior_equiv.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import tempfile
import types

# numerics study: force host CPU (same re-exec escape as
# equivalence_study.py — in-process env edits are too late under axon)
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

K = 32           # codebook size
D = 8            # embedding dim
HC = 16          # prior hidden channels
NL = 3           # prior layers
GRID = 6         # code grid (single-level / hierarchical bottom)
GRID_T = 3       # hierarchical top grid
N = 64           # number of code samples
BS = 8
LR = 3e-4
ADAM_EPS = 1e-4
SEED = 0


def make_codes(hier: bool, seed: int = 7):
    """Spatially-correlated synthetic code grids (smoothed noise argmaxed
    into K bins — gives the prior real local structure to learn)."""
    rng = np.random.default_rng(seed)

    def grids(h, w):
        x = rng.normal(size=(N, h + 2, w + 2))
        sm = (x[:, :-2, :-2] + x[:, 1:-1, :-2] + x[:, :-2, 1:-1]
              + 2 * x[:, 1:-1, 1:-1])
        q = np.clip(((sm - sm.min()) / (np.ptp(sm) + 1e-9) * K).astype(
            np.int32), 0, K - 1)
        return q[:, :h, :w]

    if hier:
        return {"top": grids(GRID_T, GRID_T), "bottom": grids(GRID, GRID)}
    return {"codes": grids(GRID, GRID)}


def prior_args(prior_kind: str):
    hier = prior_kind.startswith("hierarchical")
    snail = "pixelsnail" in prior_kind
    return argparse.Namespace(
        arch="vq_vae2" if hier else "vq_vae",
        dataset="synthetic-prior-study", dataset_size=N, batch_size=BS,
        num_workers=0, seed=SEED,
        prior_type="pixelsnail" if snail else "pixelcnn",
        pixelcnn_epochs=0, pixelcnn_hidden_channels=HC,
        pixelcnn_num_layers=NL, pixelcnn_lr=LR, pixelcnn_temperature=1.0,
        pixelcnn_adam_eps=ADAM_EPS, prior_use_lmdb_codes=False,
        prior_sample_every=0, input_size=4 * GRID,
        # PixelSNAIL lockstep arms run dropout=0 (the reference reads
        # args.pixelsnail_dropout, main.py:927-946 — both sides
        # deterministic, attention path included)
        pixelsnail_num_blocks=2, pixelsnail_num_res_blocks=1,
        pixelsnail_num_heads=2, pixelsnail_dropout=0.0,
    )


# ---------------------------------------------------------------- movae side

def run_movae(prior_kind: str, epochs: int, levels):
    import jax

    from movae_tpu.parallel.mesh import DataParallel, make_mesh
    from movae_tpu.train import checkpoint as ckpt_lib
    from movae_tpu.train.prior import build_prior, train_prior
    from movae_tpu.utils.torch_export import export_torch_state_dict

    hier = prior_kind.startswith("hierarchical")
    args = prior_args(prior_kind)
    args.pixelcnn_epochs = epochs

    # replicate _train_prior_impl's init derivation for the export
    import jax.numpy as jnp
    prior = build_prior(args, K, hier, D)
    rng = jax.random.PRNGKey(SEED + 1)
    if hier:
        zt = jnp.zeros((2, GRID_T, GRID_T), jnp.int32)
        zb = jnp.zeros((2, GRID, GRID), jnp.int32)
        params = prior.init({"params": rng, "dropout": rng}, zt, zb,
                            train=False)["params"]
    else:
        z = jnp.zeros((2, GRID, GRID), jnp.int32)
        params = prior.init({"params": rng, "dropout": rng}, z,
                            train=False)["params"]
    arch_name = prior_kind
    init_sd = {k: np.asarray(v) for k, v in export_torch_state_dict(
        params, {}, arch_name).items()}

    trace = []
    model_stub = types.SimpleNamespace(num_embeddings=K, embedding_dim=D,
                                       input_size=4 * GRID)
    with tempfile.TemporaryDirectory() as td:
        results = dict(model=model_stub, state=None, save_root=td,
                       parallel=DataParallel(make_mesh()), train_loader=None,
                       prior_levels=levels, prior_step_trace=trace)
        train_prior(results, args)
        final = ckpt_lib.load_checkpoint(
            ckpt_lib.final_prior_path(td, args.prior_type))
    final_sd = {k: np.asarray(v) for k, v in export_torch_state_dict(
        final["model_state_dict"]["params"], {}, arch_name).items()}

    # same-params evaluation probe: CE of the FINAL movae params on one
    # fixed batch (epoch-0 order, first BS samples) — the torch side
    # evaluates the SAME state_dict on the SAME batch, isolating the pure
    # cross-framework fp-evaluation delta from training-state divergence
    order = np.random.default_rng((SEED, 0)).permutation(N)[:BS]
    fp = final["model_state_dict"]["params"]
    if hier:
        zt = jnp.asarray(levels["top"][order])
        zb = jnp.asarray(levels["bottom"][order])
        ce_same = float(prior.apply({"params": fp}, zt, zb, train=False,
                                    method="loss_function")["total_loss"])
    else:
        zz = jnp.asarray(levels["codes"][order])
        ce_same = float(prior.apply({"params": fp}, zz, train=False,
                                    method="loss_function")["total_loss"])

    spe = N // BS
    epoch_avgs = [float(np.mean(trace[e * spe:(e + 1) * spe]))
                  for e in range(epochs)]
    return dict(init_sd=init_sd, trace=trace, epoch_avgs=epoch_avgs,
                final_sd=final_sd, same_batch_ce=ce_same)


# ---------------------------------------------------------------- torch side

class _ReplayLoader:
    """Replays movae CodeLoader's per-epoch permutations as index batches
    (codes_cache.py CodeLoader: np.random.default_rng((seed, epoch)),
    epoch counter starting at 0, incremented per __iter__)."""

    def __init__(self, n, bs, seed):
        import torch
        self.torch = torch
        self.n, self.bs, self.seed = n, bs, seed
        self.epoch = 0

    def __len__(self):
        return (self.n + self.bs - 1) // self.bs

    def __iter__(self):
        order = np.random.default_rng(
            (self.seed, self.epoch)).permutation(self.n)
        self.epoch += 1
        for start in range(0, self.n, self.bs):
            yield (self.torch.tensor(order[start:start + self.bs]),
                   self.torch.zeros(1))


def run_torch(prior_kind: str, epochs: int, levels, init_sd, eval_sd=None):
    import refharness
    ref_main = refharness.activate()
    import torch

    hier = prior_kind.startswith("hierarchical")
    args = prior_args(prior_kind)
    args.pixelcnn_epochs = epochs

    class _NetStub:
        """Frozen-VQ stand-in: maps loader index batches to the shared
        code arrays (the reference's on-the-fly path calls
        net.get_code_indices per batch, main.py:1016-1023)."""
        num_embeddings = K
        embedding_dim = D
        input_size = 4 * GRID

        def eval(self):
            return self

        def parameters(self):
            return iter(())

        def get_code_indices(self, idx):
            i = idx.long().numpy()
            # the real path returns argmin indices, i.e. Long tensors
            # (vq_vae.py get_code_indices; CE requires Long targets)
            if hier:
                return {
                    "indices_top": torch.tensor(levels["top"][i]).long(),
                    "indices_bottom":
                        torch.tensor(levels["bottom"][i]).long(),
                }
            return torch.tensor(levels["codes"][i]).long()

    trace = []
    saves = []

    def patched_cls(real_cls):
        def make(**kw):
            p = real_cls(**kw)
            missing, unexpected = p.load_state_dict(
                {k: torch.tensor(v) for k, v in init_sd.items()},
                strict=False)
            # '.mask' buffers are the CONSTANT causal masks MaskedConv2d
            # registers (pixelcnn_prior.py:30-54) — nothing to sync
            bad = ([k for k in missing if not k.endswith(".mask")]
                   + list(unexpected))
            if bad:
                raise SystemExit(f"prior init key mismatch: {bad}")
            if hier:
                # per-step capture for the hierarchical path (the loop
                # reads loss_function()["total_loss"], main.py:999-1002)
                real_lf = p.loss_function

                def lf(zt, zb):
                    out = real_lf(zt, zb)
                    trace.append(float(out["total_loss"].detach()))
                    return out

                p.loss_function = lf
            return p

        return make

    real_ce = torch.nn.functional.cross_entropy

    def rec_ce(*a, **kw):
        out = real_ce(*a, **kw)
        trace.append(float(out.detach()))
        return out

    real_save = torch.save

    def rec_save(obj, path):
        if isinstance(obj, dict) and "best" in os.path.basename(path):
            saves.append(int(obj.get("epoch", -1)))
        return real_save(obj, path)

    # scoped patches: init injection, Adam eps, CE/save capture
    patches = {}
    for name in ("PixelCNN", "HierarchicalPixelCNN", "PixelSNAIL",
                 "HierarchicalPixelSNAIL"):
        patches[name] = getattr(ref_main, name)
        setattr(ref_main, name, patched_cls(patches[name]))
    real_adam = ref_main.optim.Adam
    ref_main.optim.Adam = functools.partial(torch.optim.Adam, eps=ADAM_EPS)
    if not hier:
        torch.nn.functional.cross_entropy = rec_ce
    torch.save = rec_save
    try:
        with tempfile.TemporaryDirectory() as td:
            prior = ref_main.train_pixelcnn_prior(
                _NetStub(), _ReplayLoader(N, BS, SEED), "cpu", args, td)
    finally:
        for name, real in patches.items():
            setattr(ref_main, name, real)
        ref_main.optim.Adam = real_adam
        torch.nn.functional.cross_entropy = real_ce
        torch.save = real_save

    spe = N // BS
    epoch_avgs = [float(np.mean(trace[e * spe:(e + 1) * spe]))
                  for e in range(epochs)]
    out = dict(trace=trace, epoch_avgs=epoch_avgs, best_epochs=saves,
               final_sd={k: v.detach().numpy().copy()
                         for k, v in prior.state_dict().items()})

    if eval_sd is not None:
        # same-params evaluation probe (see run_movae): load the movae
        # FINAL state into the reference prior and evaluate the same
        # fixed batch — pure fp-evaluation delta, no training divergence
        prior.load_state_dict({k: torch.tensor(v)
                               for k, v in eval_sd.items()}, strict=False)
        prior.eval()
        order = np.random.default_rng((SEED, 0)).permutation(N)[:BS]
        n_trace = len(trace)
        with torch.no_grad():
            if hier:
                # the hierarchical prior's loss_function is the
                # trace-capturing patch from training — drop its probe entry
                zt = torch.tensor(levels["top"][order]).long()
                zb = torch.tensor(levels["bottom"][order]).long()
                ce = float(prior.loss_function(zt, zb)["total_loss"])
            else:
                zz = torch.tensor(levels["codes"][order]).long()
                logits = prior(zz)
                ce = float(torch.nn.functional.cross_entropy(
                    logits.permute(0, 2, 3, 1).reshape(-1, K),
                    zz.reshape(-1)))
        del trace[n_trace:]
        out["same_batch_ce"] = ce
    return out


# ---------------------------------------------------------------- comparison

def decisions(epoch_avgs):
    best, out = float("inf"), []
    for e, v in enumerate(epoch_avgs, 1):
        if v < best:
            best = v
            out.append(e)
    return out


def compare(prior_kind, mv, th, epochs):
    assert len(mv["trace"]) == len(th["trace"]), (
        len(mv["trace"]), len(th["trace"]))
    rel = [abs(a - b) / (abs(b) + 1e-12)
           for a, b in zip(mv["trace"], th["trace"])]
    d_param = 0.0
    for k, v in mv["final_sd"].items():
        tv = th["final_sd"][k]
        mask_key = k[:-len("weight")] + "mask"
        if k.endswith(".weight") and mask_key in th["final_sd"]:
            # MaskedConv2d re-masks weight.data in each FORWARD
            # (pixelcnn_prior.py:52-54), so the torch checkpoint's
            # masked-out entries hold the last Adam step's residue —
            # forward-irrelevant; compare the causal projection
            m = th["final_sd"][mask_key]
            v, tv = v * m, tv * m
        d_param = max(d_param, float(np.max(np.abs(v - tv))))
    mv_dec = decisions(mv["epoch_avgs"])
    th_dec = decisions(th["epoch_avgs"])
    return dict(
        prior=prior_kind, epochs=epochs, steps=len(mv["trace"]),
        max_rel_ce_delta=max(rel), last_rel_ce_delta=rel[-1],
        first_ce=dict(movae=mv["trace"][0], torch=th["trace"][0]),
        last_ce=dict(movae=mv["trace"][-1], torch=th["trace"][-1]),
        epoch_avgs_movae=mv["epoch_avgs"], epoch_avgs_torch=th["epoch_avgs"],
        best_decisions_movae=mv_dec, best_decisions_torch=th_dec,
        best_decisions_torch_saved=th["best_epochs"],
        decisions_match=(mv_dec == th_dec == th["best_epochs"]),
        final_max_param_delta=d_param)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+",
                    default=["pixelcnn", "hierarchical_pixelcnn"])
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--chaos_control", type=float, default=0.0,
                    help="also run the TORCH side a second time from an "
                         "init perturbed by +-this (uniform) and report its "
                         "drift vs the unperturbed torch run — the "
                         "within-framework sensitivity band the "
                         "cross-framework CE delta must be judged against "
                         "(same arm equivalence_study.py grew in r4)")
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()

    results = []
    for kind in opts.configs:
        hier = kind.startswith("hierarchical")
        levels = make_codes(hier)
        print(f"== prior lockstep {kind} ({opts.epochs} epochs x "
              f"{N // BS} steps) ==", flush=True)
        mv = run_movae(kind, opts.epochs, levels)
        th = run_torch(kind, opts.epochs, levels, mv["init_sd"],
                       eval_sd=mv["final_sd"])
        res = compare(kind, mv, th, opts.epochs)
        if "same_batch_ce" in th:
            a, b = mv["same_batch_ce"], th["same_batch_ce"]
            res["same_params_eval"] = dict(
                ce_movae=a, ce_torch=b,
                rel_delta=abs(a - b) / (abs(b) + 1e-12))
        if opts.chaos_control > 0:
            prng = np.random.default_rng(13)
            sd2 = {k: (v + prng.uniform(-opts.chaos_control,
                                        opts.chaos_control,
                                        v.shape).astype(v.dtype)
                       if np.issubdtype(v.dtype, np.floating) else v)
                   for k, v in mv["init_sd"].items()}
            th2 = run_torch(kind, opts.epochs, levels, sd2)
            ctl = compare(kind, th2, th, opts.epochs)
            res["chaos_control"] = dict(
                perturb=opts.chaos_control,
                max_rel_ce_delta=ctl["max_rel_ce_delta"],
                last_rel_ce_delta=ctl["last_rel_ce_delta"],
                final_max_param_delta=ctl["final_max_param_delta"],
                decisions_match=(ctl["best_decisions_movae"]
                                 == ctl["best_decisions_torch"]))
        results.append(res)
        print(json.dumps(res, indent=2), flush=True)

    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(dict(lr=LR, adam_eps=ADAM_EPS, batch_size=BS,
                           n_codes=N, results=results), f, indent=2)
        print(f"wrote {opts.json}")


if __name__ == "__main__":
    main()
