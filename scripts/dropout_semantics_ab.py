"""A/B: attention-WEIGHT dropout (reference pixelcnn_prior.py:126-127)
vs attention-OUTPUT dropout (our flash-compatible approximation at long L).

VERDICT r1 item 8: the deviation at L > DENSE_ATTENTION_MAX_L was asserted,
not measured. This experiment trains two identical small PixelSNAIL priors
(same init, same data order) at an L where BOTH semantics are computable,
differing only in where dropout is applied, and reports the val-CE delta.

Data: codes extracted from a briefly-trained VQ-VAE over the deterministic
synthetic image set (structured enough for the prior to learn; random codes
would pin val-CE at log K and show nothing).

Mechanics: weight-dropout = the model's own dense path (L <= threshold);
output-dropout = the flash-path else-branch, forced by setting
``movae_tpu.models.pixelcnn.DENSE_ATTENTION_MAX_L = 0`` for arm B.

Run (TPU): python scripts/dropout_semantics_ab.py
Prints one line per arm per epoch + the final delta.
"""

import sys
import time

from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_codes(n, grid, K, seed):
    """Spatially-correlated synthetic codes: coarse random fields,
    upsampled + quantized — enough structure for a prior to learn."""
    rng = np.random.default_rng(seed)
    coarse = rng.normal(size=(n, grid // 4, grid // 4))
    up = np.repeat(np.repeat(coarse, 4, axis=1), 4, axis=2)
    # smooth with a box filter for local correlation
    up = (up + np.roll(up, 1, 1) + np.roll(up, 1, 2)
          + np.roll(np.roll(up, 1, 1), 1, 2)) / 4.0
    up = up + 0.15 * rng.normal(size=up.shape)
    edges = np.quantile(up, np.linspace(0, 1, K + 1)[1:-1])
    return np.digitize(up, edges).astype(np.int32)


def run_arm(arm, codes_tr, codes_va, grid, K, epochs, bs, dropout, seed):
    import movae_tpu.models.pixelcnn as pix
    orig = pix.DENSE_ATTENTION_MAX_L
    try:
        # arm A: dense path (attention-WEIGHT dropout, reference semantics)
        # arm B: flash path (attention-OUTPUT dropout) — since r4 this is
        # the attn_dropout_mode default, no threshold forcing needed
        model = pix.PixelSNAIL(num_embeddings=K, embedding_dim=32,
                               hidden_channels=64, num_blocks=2,
                               num_res_blocks_per_layer=1, num_heads=4,
                               dropout=dropout,
                               attn_dropout_mode=(
                                   "weights" if arm == "weights"
                                   else "output"))
        z0 = jnp.zeros((2, grid, grid), jnp.int32)
        rng = jax.random.PRNGKey(seed)
        params = model.init({"params": rng, "dropout": rng}, z0,
                            train=False)["params"]
        steps = (len(codes_tr) // bs) * epochs
        tx = optax.adam(optax.cosine_decay_schedule(3e-4, steps))
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, z, key):
            def loss_fn(p):
                out = model.apply({"params": p}, z, train=True,
                                  method="loss_function",
                                  rngs={"dropout": key})
                return out["total_loss"]
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, loss

        @jax.jit
        def val_ce(params, z):
            out = model.apply({"params": params}, z, train=False,
                              method="loss_function")
            return out["total_loss"]

        key = jax.random.PRNGKey(seed + 1)
        order_rng = np.random.default_rng(seed + 2)
        for ep in range(epochs):
            order = order_rng.permutation(len(codes_tr))
            for i in range(0, len(codes_tr) - bs + 1, bs):
                zb = jnp.asarray(codes_tr[order[i:i + bs]])
                key, sub = jax.random.split(key)
                params, opt, loss = step(params, opt, zb, sub)
            ces = [float(val_ce(params, jnp.asarray(codes_va[i:i + bs])))
                   for i in range(0, len(codes_va) - bs + 1, bs)]
            print(f"  [{arm}] epoch {ep + 1}: val CE {np.mean(ces):.4f}",
                  flush=True)
        return float(np.mean(ces))
    finally:
        pix.DENSE_ATTENTION_MAX_L = orig


def main():
    grid, K = 16, 32            # L = 256 <= 1024: both semantics computable
    epochs, bs, dropout = int(sys.argv[1]) if len(sys.argv) > 1 else 6, 64, 0.3
    codes = make_codes(4096 + 512, grid, K, seed=0)
    codes_tr, codes_va = codes[:4096], codes[4096:]
    t0 = time.time()
    results = {}
    for seed in (0, 1):
        for arm in ("weights", "output"):
            print(f"arm={arm} seed={seed}", flush=True)
            results[(arm, seed)] = run_arm(arm, codes_tr, codes_va, grid, K,
                                           epochs, bs, dropout, seed)
    wa = np.mean([results[("weights", s)] for s in (0, 1)])
    ob = np.mean([results[("output", s)] for s in (0, 1)])
    spread = max(abs(results[("weights", 0)] - results[("weights", 1)]),
                 abs(results[("output", 0)] - results[("output", 1)]))
    print(f"\nweights-dropout val CE: {wa:.4f}")
    print(f"output-dropout  val CE: {ob:.4f}")
    print(f"delta: {ob - wa:+.4f} (seed spread {spread:.4f}) "
          f"[{time.time() - t0:.0f}s]")


if __name__ == "__main__":
    main()
