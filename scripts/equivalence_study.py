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


# archs built on the conv-VAE trunk: the log_var head bias can be pinned
# to -60 so different-RNG reparameterization noise is ~1e-13 of the signal
PINNED_VAE_ARCHS = ("vae", "recursive_kl_vae", "gg_vae", "cycle_vae",
                    "recursive_cyclic_vae")
# archs whose loss depends on the reparameterization draw itself (the
# BetaTC log-density decomposition evaluates -0.5*eps^2 terms): the movae
# step's eps is captured and replayed into the torch net instead
EPS_INJECT_ARCHS = ("betatc_vae",)
# archs that draw a fresh z_prior ~ N(0,I) inside the forward (the cycle
# loss is a direct function of it, cycle_vae.py:48-52 /
# recursive_cyclic_vae.py:145-150): the movae step's draw is captured and
# replayed into the torch run via a scoped torch.randn patch
ZPRIOR_ARCHS = ("cycle_vae", "recursive_cyclic_vae")
# sphere encoders draw angle ~ U[0,a_max], s ~ U[0,0.5], e ~ N(0,I) inside
# the forward (sphere_encoder.py:203-218): the movae step's draws (exposed
# as diagnostic outputs) are replayed via scoped torch.rand/randn patches.
# The reference hard-enables its VGG perceptual term (no flag,
# models/__init__.py:90-106 + sphere_encoder.py:127). Default study mode
# forces use_perceptual=False on BOTH sides via a scoped constructor patch
# on the torch side; --sphere_perceptual instead runs the term ACTIVE with
# WEIGHT-SYNCED random VGG towers (the refharness torchvision shim's
# MOVAE_REFHARNESS_TOWER_SEED mode + the same state_dict converted into
# the flax tower) so the perceptual GRADIENT path is cross-framework-
# exercised (r4 VERDICT Missing #1).
SPHERE_ARCHS = ("sphere_encoder", "sphere_encoder_vit")
SPHERE_PERCEPTUAL = False
# comfort's beta schedule only moves across epochs: split the study's
# steps into this many virtual epochs so the blend is exercised l->u
COMFORT_EPOCHS = 5


def model_args(arch):
    if arch == "sphere_encoder":
        extra = dict(latent_dim=LATENT, use_perceptual=SPHERE_PERCEPTUAL)
    elif arch == "sphere_encoder_vit":
        # 16px / patch 2 -> 64 patches; latent must divide evenly
        extra = dict(latent_dim=64, use_perceptual=SPHERE_PERCEPTUAL,
                     patch_size=2, vit_embed_dim=32, vit_depth=2,
                     vit_num_heads=2, vit_mixer_depth=1)
    elif arch in ("vae", "betatc_vae", "recursive_kl_vae", "gg_vae",
                  "cycle_vae", "recursive_cyclic_vae"):
        extra = dict(latent_dim=LATENT, layer_norm="batch")
    else:
        extra = dict(embedding_dim=8, num_embeddings=32,
                     num_residual_layers=2, latent_dim=LATENT)
    if arch == "recursive_kl_vae":
        # the reference's DEFAULT lambda path for this arch is a live bug:
        # the registry builds {'recursive_kld_loss'} (models/__init__.py:
        # 59-63) but the base-VAE key validation runs BEFORE the rename and
        # demands {'kld_loss'} (vae.py:66-79, recursive_kl_vae.py:55-60) —
        # only the LIST form reaches training; use it on both sides
        extra["loss_weights"] = [1.0, 0.00025]
    elif arch == "cycle_vae":
        # same live-bug class: the default dict {reconstruction_loss,
        # cycle_loss} (models/__init__.py:68-69) fails the base-VAE key
        # validation; the LIST form routes [recon, 0.0] to the base and
        # lambda_weights[1] to cycle (cycle_vae.py:29-41)
        extra["loss_weights"] = [1.0, 0.00025]
    elif arch == "recursive_cyclic_vae":
        # ditto, 3 objectives (recursive_cyclic_vae.py:107-130)
        extra["loss_weights"] = [1.0, 0.00025, 0.00025]
    return dict(arch=arch, hidden_dims=list(HIDDEN), batch_size=BATCH,
                dataset_size=DATASET_SIZE, recons_objective="mse",
                recons_activation=("tanh" if arch in PINNED_VAE_ARCHS
                                   else None),
                **extra)


def derive_agg_randomness(agg, steps, m):
    """Replay material for stochastic aggregators: host-side derivation of
    the EXACT per-step draws the movae train step will make (compute_grads:
    ``rng, agg_key = split(sub)``; pcgrad: per-task permutation keys,
    pnupgrad: one uniform coin — movae_tpu/moo/aggregators.py:141-204).
    The torch side patches torch.randperm/torch.rand to replay these, so
    both frameworks keep the REFERENCE's random-order/random-coin semantics
    (pnupgrad.py:127-134; torchjd PCGrad) while drawing identically."""
    if agg not in ("pcgrad", "pnupgrad"):
        return None
    import jax

    rng = jax.random.PRNGKey(3)
    out = []
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        _, agg_key = jax.random.split(sub)
        if agg == "pcgrad":
            keys = jax.random.split(agg_key, m)
            out.append([np.asarray(jax.random.permutation(k, m))
                        for k in keys])
        else:
            out.append(float(jax.random.uniform(agg_key)))
    return out


def build_batches(steps, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)
            for _ in range(steps)]


# ---------------------------------------------------------------- movae side

def run_movae(arch, agg, steps, optimizer, batches, scheduler=None,
              sched_epochs=1, drift_every=0):
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step
    from movae_tpu.utils.torch_export import export_torch_state_dict

    model = get_network(SIZE, 3, model_args(arch))
    params, bstats = init_model(model, jax.random.PRNGKey(0), SIZE, 3,
                                batch_size=2)
    if arch in PINNED_VAE_ARCHS:
        flat = traverse_util.flatten_dict(params)
        key = next(k for k in flat if "log_var" in k and k[-1] == "bias")
        flat[key] = jnp.full_like(flat[key], -60.0)
        params = traverse_util.unflatten_dict(flat)
    init_sd = {k: np.asarray(v) for k, v in
               export_torch_state_dict(params, bstats, arch).items()}

    cfg = AggregatorConfig(name=agg, norm_eps=NORM_EPS, reg_eps=REG_EPS,
                           num_objectives=len(model.objective_names))
    # comfort: virtual epochs so comfort_beta actually schedules l->u
    # (reference sets beta per epoch via set_epoch, main.py:1290-1291);
    # an active LR scheduler defines the epoch split the same way
    if scheduler:
        total_epochs, spe = sched_epochs, max(1, steps // sched_epochs)
        lr = lr_schedule(LR, scheduler, sched_epochs, spe)
    elif agg == "comfort":
        total_epochs, spe = COMFORT_EPOCHS, max(1, steps // COMFORT_EPOCHS)
        lr = LR
    else:
        total_epochs, spe, lr = 1, steps, LR
    tx = build_optimizer(optimizer, lr, eps=EPS)
    state = TrainState.create(model.apply, params, bstats, tx,
                              init_state(cfg))
    step_fn = jax.jit(make_train_step(model, cfg, total_epochs, spe))

    capture_eps = arch in EPS_INJECT_ARCHS
    capture_zp = arch in ZPRIOR_ARCHS
    capture_sph = arch in SPHERE_ARCHS
    if capture_sph:
        # sphere forwards have no z/mu/log_var — capture the raw draws the
        # model now exposes as diagnostic outputs (angle_deg, s, e)
        @jax.jit
        def cap_sph(p, bs, x, r0):
            (_, _, outputs), _ = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                method="forward_with_losses", mutable=["batch_stats"],
                rngs={"sample": jax.random.split(r0)[0],
                      "dropout": jax.random.split(r0)[1]})
            return (outputs["angle_deg"], outputs["s"], outputs["e"],
                    outputs["sigma"])
    if capture_eps or capture_zp:
        # the in-step heads apply's make_rng("sample") folds identically to
        # a plain forward_with_losses apply (same root scope, first call on
        # the stream), so replaying the step's rng here reproduces the
        # exact eps / z_prior the step will draw; mutable updates are
        # discarded
        @jax.jit
        def cap(p, bs, x, r0):
            (_, _, outputs), _ = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                method="forward_with_losses", mutable=["batch_stats"],
                rngs={"sample": jax.random.split(r0)[0],
                      "dropout": jax.random.split(r0)[1]})
            return (outputs["z"], outputs["mu"], outputs["log_var"],
                    outputs.get("z_prior", outputs["z"]))

    rng = jax.random.PRNGKey(3)
    traj, eps_seq, zp_seq, sph_seq, snapshots = [], [], [], [], {}
    for i, xb in enumerate(batches):
        rng, sub = jax.random.split(rng)
        if capture_eps or capture_zp:
            r0 = jax.random.split(sub)[0]
            z, mu, lv, zp = cap(state.params, state.batch_stats,
                                jnp.asarray(xb), r0)
            if capture_eps:
                eps_seq.append(np.asarray((z - mu) * jnp.exp(-0.5 * lv)))
            if capture_zp:
                zp_seq.append(np.asarray(zp))
        if capture_sph:
            r0 = jax.random.split(sub)[0]
            ang, s, e, sig = cap_sph(state.params, state.batch_stats,
                                     jnp.asarray(xb), r0)
            # invert to the uniform draws the reference makes:
            # angle = rand*angle_max, s = rand*0.5 (the latter is a
            # power-of-two scale, so s/0.5*0.5 replays BIT-EXACTLY;
            # sigma = tan(angle*pi/180) is NOT exactly invertible through
            # /80*80, so the exact sigma is captured too and injected via
            # a scoped torch.tan patch — sphere_encoder.py:203-215)
            sph_seq.append((np.asarray(ang) / model.sigma_max_angle_deg,
                            np.asarray(s) / 0.5, np.asarray(e),
                            np.asarray(sig)))
        state, metrics = step_fn(state, jnp.asarray(xb), sub)
        traj.append({k: float(v) for k, v in metrics.items()
                     if np.ndim(v) == 0})
        if drift_every and (i + 1) % drift_every == 0:
            snapshots[i + 1] = {
                k: np.asarray(v) for k, v in export_torch_state_dict(
                    state.params, state.batch_stats, arch).items()}
    final_sd = {k: np.asarray(v) for k, v in export_torch_state_dict(
        state.params, state.batch_stats, arch).items()}
    return dict(objective_names=list(model.objective_names), init_sd=init_sd,
                traj=traj, final_sd=final_sd, snapshots=snapshots,
                eps_seq=eps_seq if capture_eps else None,
                zp_seq=zp_seq if capture_zp else None,
                sph_seq=sph_seq if capture_sph else None,
                _flax=(model, state.params, state.batch_stats))


# ---------------------------------------------------------------- torch side

def make_reference_aggregator(agg, num_objectives):
    """Reference aggregator wiring (main.py:1191-1244), same eps flags.
    nupgrad/pnupgrad/aligned_mtl/mgda*/comfort are the reference's OWN code
    (utils/torchmoo) on the shim torchjd bases; upgrad/pcgrad/cagrad/
    nashmtl/dualproj/imtlg/mean use the shim aggregators anchored in
    tests/test_refharness.py."""
    if agg == "sum":
        return "sum", None
    import torch  # noqa: F401
    from torchjd.aggregation import (CAGrad, IMTLG, DualProj, Mean, NashMTL,
                                     PCGrad, UPGrad)
    from utils.torchmoo import COMFORT, MGDA, AlignedMTL, NUPGrad, PNUPGrad

    table = {
        "upgrad": lambda: UPGrad(norm_eps=NORM_EPS, reg_eps=REG_EPS),
        "mean": lambda: Mean(),
        "dualproj": lambda: DualProj(norm_eps=NORM_EPS, reg_eps=REG_EPS),
        "imtlg": lambda: IMTLG(),
        "pcgrad": lambda: PCGrad(),
        "cagrad": lambda: CAGrad(c=1.0, norm_eps=NORM_EPS),
        # update_weights_every = len(train_loader) in the reference
        # (main.py:1220); the study's loaders have length 1
        "nashmtl": lambda: NashMTL(n_tasks=num_objectives,
                                   update_weights_every=1, optim_niter=20),
        "nupgrad": lambda: NUPGrad(norm_eps=NORM_EPS, reg_eps=REG_EPS),
        "pnupgrad": lambda: PNUPGrad(norm_eps=NORM_EPS, reg_eps=REG_EPS),
        "aligned_mtl": lambda: AlignedMTL(pref_vector=None),
        "mgda": lambda: MGDA(epsilon=1e-5, max_iters=250),
        "mgda_ln": lambda: MGDA(epsilon=1e-5, max_iters=250,
                                norm_type="l2"),
        "mgda_gn": lambda: MGDA(epsilon=1e-5, max_iters=250,
                                norm_type="loss"),
        "mgda_lgn": lambda: MGDA(epsilon=1e-5, max_iters=250,
                                 norm_type="loss+"),
        "comfort": lambda: COMFORT(mgda_epsilon=1e-5, mgda_max_iters=250),
    }
    if agg not in table:
        raise SystemExit(f"aggregator {agg} not wired into the study")
    aggregator = table[agg]()
    if agg == "comfort":
        # COMFORT.weighting exposes only the MGDA branch (comfort.py:148);
        # movae logs the BLENDED alpha — no comparable capture, skip it
        return aggregator, None
    captured = []
    aggregator.weighting.register_forward_hook(
        lambda _m, _inp, weights: captured.append(
            np.asarray(weights.detach().cpu(), dtype=np.float64)))
    return aggregator, captured


def run_torch(arch, agg, steps, optimizer, batches, init_sd, eps_seq=None,
              agg_draws=None, scheduler=None, sched_epochs=1,
              drift_every=0, zp_seq=None, sph_seq=None):
    import functools

    import refharness
    ref_main = refharness.activate()
    import torch
    import models as ref_models
    from models import get_network as ref_get_network

    args = argparse.Namespace(**model_args(arch), max_grad_norm=None,
                              use_wandb=False)
    sphere_patch = {}
    if arch in SPHERE_ARCHS and not SPHERE_PERCEPTUAL:
        # the reference hard-enables the VGG16 perceptual term (no flag,
        # sphere_encoder.py:127); force it off for the default lockstep —
        # the movae side runs use_perceptual=False too (model_args). With
        # --sphere_perceptual the patch is skipped: the reference
        # constructor builds its PerceptualLoss through the torchvision
        # shim's seeded tower, weight-synced with the flax side.
        for name in ("SphereEncoder", "SphereEncoderViT"):
            if hasattr(ref_models, name):
                sphere_patch[name] = getattr(ref_models, name)
                setattr(ref_models, name, functools.partial(
                    sphere_patch[name], use_perceptual=False))
    try:
        net = ref_get_network(SIZE, 3, args, device="cpu")
    finally:
        for name, cls in sphere_patch.items():
            setattr(ref_models, name, cls)
    missing, unexpected = net.load_state_dict(
        {k: torch.tensor(v) for k, v in init_sd.items()}, strict=False)
    # vq_top./vq_bottom. are ALIASES of quantize_t./quantize_b. (the same
    # module objects, reference vq_vae2.py:199-201) — loading the primary
    # keys updates them; they only appear in `missing` because state_dict
    # lists both names
    # sobel_x/sobel_y are CONSTANT filter buffers (gg_vq_vae.py:57-60) —
    # nothing to sync; movae bakes the same constants into ops/sobel.py
    # .pe / rotary.inv_freq are the ViT's CONSTANT sinusoidal-PE and RoPE
    # frequency buffers (sphere_encoder_vit.py) — nothing to sync, same
    # whitelist as torch_import._SKIP_BUFFERS
    # perceptual_loss.features.* is the FROZEN VGG tower (requires_grad
    # False, objectives.py:62-63) — synced separately via the torchvision
    # shim's tower seed, not through the model state_dict
    bad = ([k for k in missing if "num_batches_tracked" not in k
            and not k.startswith(("vq_top.", "vq_bottom.", "sobel_",
                                  "perceptual_loss."))
            and not k.endswith((".pe", "rotary.inv_freq"))]
           + list(unexpected))
    if bad:
        raise SystemExit(f"weight-sync key mismatch vs reference net: {bad}")
    net.train()

    # the reference's anneal counters are CLASS attributes (BetaTCVAE /
    # RecursiveKLVAE num_iter, betatc_vae.py:13, recursive_kl_vae.py:41):
    # a previous config's run in this process would leak its step count
    for cls in type(net).__mro__:
        if "num_iter" in vars(cls):
            cls.num_iter = 0

    if eps_seq is not None:
        # replay the movae step's reparameterization draws (instance attr
        # shadows the bound method; reference signature betatc_vae.py:206)
        eps_iter = iter([torch.tensor(e) for e in eps_seq])
        net.reparameterize = (
            lambda mu, logvar: mu + next(eps_iter) * torch.exp(0.5 * logvar))

    if optimizer == "adam":
        opt = torch.optim.Adam(net.parameters(), lr=LR, eps=EPS)
    elif optimizer == "rmsprop":
        opt = torch.optim.RMSprop(net.parameters(), lr=LR, alpha=0.99,
                                  eps=EPS)
    else:
        opt = torch.optim.SGD(net.parameters(), lr=LR, momentum=0.9)

    aggregator, captured = make_reference_aggregator(
        agg, len(net.objectives))
    if scheduler:
        spe = max(1, steps // sched_epochs)
        if scheduler == "cosine":
            # reference scheduler wiring + per-epoch stepping
            # (main.py:1180-1183, 1393-1397); eta_min defaults to 0
            sch = torch.optim.lr_scheduler.CosineAnnealingLR(
                opt, T_max=sched_epochs, eta_min=0.0)
        else:
            raise SystemExit(f"scheduler {scheduler} not wired")
    else:
        sch = None
        spe = max(1, steps // COMFORT_EPOCHS) if agg == "comfort" else steps

    traj, step, snapshots = [], 0, {}
    for i, xb in enumerate(batches):
        xt = torch.tensor(xb.transpose(0, 3, 1, 2))
        if captured is not None:
            captured.clear()
        if agg == "comfort" and i % spe == 0:
            aggregator.set_epoch(i // spe + 1,
                                 sched_epochs if scheduler
                                 else COMFORT_EPOCHS)
        orig_randperm, orig_rand = torch.randperm, torch.rand
        orig_randn = torch.randn
        if agg_draws is not None and agg == "pcgrad":
            perm_iter = iter(agg_draws[i])
            torch.randperm = (
                lambda n, _it=perm_iter: torch.tensor(next(_it)))
        elif agg_draws is not None and agg == "pnupgrad":
            coin = agg_draws[i]
            torch.rand = lambda n, _c=coin: torch.tensor([_c])
        if zp_seq is not None:
            # replay the movae step's z_prior ~ N(0,I) (the forward's only
            # other draw; reference cycle_vae.py:48 torch.randn)
            zp = torch.tensor(zp_seq[i])
            torch.randn = lambda *a, _z=zp, **kw: _z
        if sph_seq is not None:
            # replay the sphere forward's draws in call order: rand ->
            # angle (approximate — only consumed through the patched tan),
            # rand -> s (bit-exact, power-of-two scale), randn -> e;
            # torch.tan -> the exact captured sigma (the /80*80->tan chain
            # is not ulp-invertible and its noise Lyapunov-amplifies)
            ua, us, e, sig = sph_seq[i]
            rit = iter([torch.tensor(ua), torch.tensor(us)])
            torch.rand = lambda *a, _it=rit, **kw: next(_it)
            torch.randn = lambda *a, _e=torch.tensor(e), **kw: _e
            orig_tan = torch.tan
            torch.tan = lambda _x, _s=torch.tensor(sig): _s
        else:
            orig_tan = torch.tan
        try:
            meters, step = ref_main.train_epoch(
                net, [(xt, torch.zeros(len(xt)))], opt, aggregator, step,
                "cpu", args)
        finally:
            torch.randperm, torch.rand = orig_randperm, orig_rand
            torch.randn = orig_randn
            torch.tan = orig_tan
        rec = {k: float(m.val) for k, m in meters.items()}
        if captured:
            for j, w in enumerate(captured[-1]):
                rec[f"task_{j}_weight"] = float(w)
        traj.append(rec)
        if sch is not None and (i + 1) % spe == 0:
            sch.step()  # per-EPOCH stepping (main.py:1393-1397)
        if drift_every and (i + 1) % drift_every == 0:
            snapshots[i + 1] = {k: v.detach().numpy().copy()
                                for k, v in net.state_dict().items()}
    return dict(traj=traj, snapshots=snapshots,
                final_sd={k: v.detach().numpy().copy()
                          for k, v in net.state_dict().items()},
                _net=net)


# ---------------------------------------------------------------- comparison

def compare(arch, agg, mv, th, steps):
    rows, worst = [], dict(loss=0.0, comp=0.0, weight=0.0, weight_rel=0.0)
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
                # relative form: degenerate zero-Gramian-row tasks carry
                # alphas ~1/sqrt(ridge*|G|) (1e6-scale, zero gradient-space
                # influence) where absolute deltas mislead
                worst["weight_rel"] = max(
                    worst["weight_rel"],
                    abs(a[k] - b[k]) / (abs(b[k]) + 1e-6))
        rows.append(dict(step=i, movae=a["total_loss"],
                         torch=b["total_loss"], rel_delta=d_loss))

    def sd_delta(a, b):
        return max(float(np.max(np.abs(v - b[k])))
                   for k, v in a.items() if "num_batches_tracked" not in k)

    d_param = sd_delta(mv["final_sd"], th["final_sd"])
    drift = {str(s): dict(
        param_delta=sd_delta(mv["snapshots"][s], th["snapshots"][s]),
        rel_loss_delta=rows[s - 1]["rel_delta"])
        for s in sorted(mv.get("snapshots", {}))
        if s in th.get("snapshots", {})}
    out = dict(arch=arch, aggregator=agg, steps=steps,
               max_rel_loss_delta=worst["loss"],
               max_rel_component_delta=worst["comp"],
               max_abs_weight_delta=worst["weight"],
               max_rel_weight_delta=worst["weight_rel"],
               final_max_param_delta=d_param,
               first_loss=rows[0], last_loss=rows[-1])
    if drift:
        out["drift"] = drift
    return out


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
    ap.add_argument("--scheduler", default=None, choices=[None, "cosine"],
                    help="activate the per-epoch LR scheduler on both "
                         "sides (long-horizon drift study)")
    ap.add_argument("--sched_epochs", type=int, default=10,
                    help="virtual epochs the steps are split into for the "
                         "scheduler / comfort beta")
    ap.add_argument("--drift_every", type=int, default=0,
                    help="snapshot the param delta every N steps")
    ap.add_argument("--chaos_control", type=float, default=0.0,
                    help="also run the TORCH side a second time from an "
                         "init perturbed by +-this (uniform) and report "
                         "its drift vs the unperturbed torch run — the "
                         "within-framework sensitivity the cross-framework "
                         "drift must be judged against")
    ap.add_argument("--gfid", action="store_true",
                    help="mini end-to-end gFID comparison instead of the "
                         "trajectory study (vae archs only)")
    ap.add_argument("--gfid_samples", type=int, default=256)
    ap.add_argument("--sphere_perceptual", action="store_true",
                    help="run sphere configs with the reference's "
                         "hard-enabled VGG perceptual term ACTIVE through "
                         "weight-synced random towers (r4 VERDICT "
                         "Missing #1)")
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()

    if opts.sphere_perceptual:
        global SPHERE_PERCEPTUAL
        SPHERE_PERCEPTUAL = True
        # one seed drives the torch side (torchvision shim towers) and the
        # flax side (same state_dict converted to npz) — must be set
        # before any model build
        import tempfile

        from refharness.towers import build_vgg16

        from movae_tpu.metrics.vgg import convert_torch_weights

        seed = 20260820
        os.environ["MOVAE_REFHARNESS_TOWER_SEED"] = str(seed)
        vgg_npz = os.path.join(tempfile.mkdtemp(prefix="sphere_perc_"),
                               "vgg_sync.npz")
        # the shim's vgg16() serves build_vgg16(seed + 1)
        convert_torch_weights(build_vgg16(seed + 1).state_dict(), vgg_npz)
        os.environ["MOVAE_VGG16_WEIGHTS"] = vgg_npz

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
            mv = run_movae(arch, agg, opts.steps, opts.optimizer, batches,
                           scheduler=opts.scheduler,
                           sched_epochs=opts.sched_epochs,
                           drift_every=opts.drift_every)
            draws = derive_agg_randomness(agg, opts.steps,
                                          len(mv["objective_names"]))
            th = run_torch(arch, agg, opts.steps, opts.optimizer, batches,
                           mv["init_sd"], eps_seq=mv["eps_seq"],
                           zp_seq=mv["zp_seq"], sph_seq=mv["sph_seq"],
                           agg_draws=draws, scheduler=opts.scheduler,
                           sched_epochs=opts.sched_epochs,
                           drift_every=opts.drift_every)
            res = compare(arch, agg, mv, th, opts.steps)
            if opts.chaos_control > 0:
                prng = np.random.default_rng(13)
                sd2 = {k: (v + prng.uniform(-opts.chaos_control,
                                            opts.chaos_control,
                                            v.shape).astype(v.dtype)
                           if np.issubdtype(v.dtype, np.floating) else v)
                       for k, v in mv["init_sd"].items()}
                th2 = run_torch(arch, agg, opts.steps, opts.optimizer,
                                batches, sd2, eps_seq=mv["eps_seq"],
                                zp_seq=mv["zp_seq"], sph_seq=mv["sph_seq"],
                                agg_draws=draws, scheduler=opts.scheduler,
                                sched_epochs=opts.sched_epochs,
                                drift_every=opts.drift_every)
                th_as_mv = dict(objective_names=mv["objective_names"],
                                traj=th2["traj"], final_sd=th2["final_sd"],
                                snapshots=th2["snapshots"])
                ctl = compare(arch, agg, th_as_mv, th, opts.steps)
                res["chaos_control"] = dict(
                    perturb=opts.chaos_control,
                    max_rel_loss_delta=ctl["max_rel_loss_delta"],
                    final_max_param_delta=ctl["final_max_param_delta"],
                    drift=ctl.get("drift"))
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
