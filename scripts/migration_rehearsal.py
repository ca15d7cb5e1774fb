"""Cross-framework artifact migration rehearsal.

tests/test_torch_import.py proves the converters on CONSTRUCTED
reference-layout payloads; this script closes the last gap by producing
checkpoints with the REFERENCE'S OWN CODE and consuming them with this
framework's CLIs, end to end:

  1. train a tiny VQ-VAE with the movae CLI (main.py, --skip_pixelcnn);
  2. under refharness, run the reference's UNMODIFIED
     ``train_pixelcnn_prior`` loop (main.py:890-1051) against that model's
     codes — its own torch.save writes ``best_prior.pth`` /
     ``final_prior.pth`` with the reference payload
     ({epoch, model_state_dict, loss}, main.py:1037-1047);
  3. run ``generate_samples_pixelcnn_vqvae.py`` pointing --prior_path at
     the reference-written ``.pth`` (auto-imported on load) and render a
     sample grid.

A user migrating mid-project — movae VQ model, reference-trained prior —
gets working generation with no conversion step.

    python scripts/migration_rehearsal.py --out /tmp/migration_rehearsal
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    env.pop("_MOVAE_EQUIV_REEXEC", None)
    return env


def run(cmd, env):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, env=env, check=True, cwd=REPO)


def stage_ref_prior(ckpt, out_dir):
    """Runs in THIS process (CPU-forced by the caller): reference
    train_pixelcnn_prior against the movae VQ model's codes."""
    import numpy as np

    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    import types

    from movae_tpu.train.checkpoint import load_checkpoint
    from movae_tpu.models import get_network
    import refharness
    ref_main = refharness.activate()
    import torch

    payload = load_checkpoint(ckpt)
    vq_args = types.SimpleNamespace(**payload["args"])

    # codes for the synthetic train set, extracted by the movae model
    # (input_size is not part of the args echo — it derives from the data)
    from movae_tpu.data import get_dataset
    train, _, _ = get_dataset(vq_args.dataset,
                              normalize=getattr(vq_args,
                                                "normalize_inputs", False))
    imgs = train.images.astype(np.float32) / 127.5 - 1.0
    model = get_network(imgs.shape[1], 3, payload["args"])
    params = payload["model_state_dict"]["params"]
    bstats = payload["model_state_dict"].get("batch_stats", {})
    get_codes = jax.jit(lambda xb: model.apply(
        {"params": params, "batch_stats": bstats}, xb,
        method="get_code_indices"))
    codes = np.asarray(get_codes(jnp.asarray(imgs))).reshape(
        len(imgs), model.latent_spatial_dim, model.latent_spatial_dim)

    class _NetStub:
        num_embeddings = model.num_embeddings
        embedding_dim = model.embedding_dim
        input_size = model.input_size

        def eval(self):
            return self

        def parameters(self):
            return iter(())

        def get_code_indices(self, idx):
            return torch.tensor(codes[idx.long().numpy()]).long()

    loader = [(torch.arange(i, min(i + 16, len(imgs))), torch.zeros(1))
              for i in range(0, len(imgs), 16)]
    pargs = argparse.Namespace(
        arch="vq_vae", prior_type="pixelcnn", pixelcnn_epochs=2,
        pixelcnn_hidden_channels=16, pixelcnn_num_layers=2,
        pixelcnn_lr=3e-4, pixelcnn_temperature=1.0,
        prior_use_lmdb_codes=False, input_size=model.input_size,
        batch_size=16, num_workers=0, seed=0, dataset=vq_args.dataset,
        dataset_size=len(imgs))
    ref_main.train_pixelcnn_prior(_NetStub(), loader, "cpu", pargs, out_dir)
    best = os.path.join(out_dir, "pixelcnn_prior", "checkpoints",
                        "best_prior.pth")
    assert os.path.isfile(best), best
    print(f"reference-written prior: {best}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/migration_rehearsal")
    ap.add_argument("--stage", choices=["ref_prior"], default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--ckpt", default=None, help=argparse.SUPPRESS)
    opts = ap.parse_args()
    if opts.stage == "ref_prior":
        return stage_ref_prior(opts.ckpt, opts.out)

    os.makedirs(opts.out, exist_ok=True)
    env = _cpu_env()
    me = os.path.abspath(__file__)

    # 1. movae-trained VQ-VAE
    run([sys.executable, "main.py", "--dataset", "synthetic-32-64",
         "--epochs", "2", "--batch_size", "16", "--arch", "vq_vae",
         "--embedding_dim", "8", "--num_embeddings", "32",
         "--hidden_dims", "8", "16", "--aggregator", "sum",
         "--save_path", os.path.join(opts.out, "vq"),
         "--skip_pixelcnn", "--skip_final_metrics", "--seed", "11"], env)
    ckpt = glob.glob(os.path.join(
        opts.out, "vq", "*", "*", "*", "*", "*",
        "checkpoints", "final_checkpoint"))[0]

    # 2. reference-trained prior over its codes (refharness must never
    #    activate in a process that needs movae's top-level modules later,
    #    so it gets its own subprocess)
    run([sys.executable, me, "--stage", "ref_prior", "--ckpt", ckpt,
         "--out", opts.out], env)
    best = os.path.join(opts.out, "pixelcnn_prior", "checkpoints",
                        "best_prior.pth")

    # 3. movae sampling CLI fed the reference-written .pth directly
    run([sys.executable, "generate_samples_pixelcnn_vqvae.py",
         "--model_path", ckpt, "--prior_path", best,
         "--num_samples", "8", "--batch_size", "8", "--grid",
         "--out_dir", os.path.join(opts.out, "samples")], env)
    grid = os.path.join(opts.out, "samples", "samples.png")
    assert os.path.isfile(grid), grid
    print(f"migration rehearsal OK: movae VQ ckpt + reference-trained "
          f"prior .pth -> {grid}")


if __name__ == "__main__":
    main()
