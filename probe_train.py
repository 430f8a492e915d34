"""Ablation probe for the training fwd+bwd path (the 3%-MFU hunt).

Times, at the bench train envelope (B8, T=20 caption-style, 480² images,
bf16, flash attention, no dropout), each phase's fwd+bwd in isolation plus
the full step, and reports achieved TFLOP/s per phase from XLA cost
analysis. Localizes where the train path loses its MFU before any fix.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from dataclasses import replace

    from musketeer_tpu.config import ofa_base
    from musketeer_tpu.models import ofa
    from musketeer_tpu.models.resnet import resnet_forward

    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    cfg_remat = replace(cfg, remat=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)

    B, T = 8, 20
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randint(4, 50000, (B, 80)), jnp.int32)
    imgs = jnp.asarray(rng.rand(B, 480, 480, 3), jnp.float32)
    masks = jnp.ones((B,), bool)
    prev = jnp.asarray(
        np.concatenate([np.zeros((B, 1), np.int32),
                        rng.randint(4, 50000, (B, T - 1))], axis=1), jnp.int32)
    tgt = jnp.asarray(rng.randint(4, 50000, (B, T)), jnp.int32)

    def ce(logits):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    def g(loss_fn):
        def f(p, i):
            loss, grads = jax.value_and_grad(loss_fn)(p, i)
            gn = jax.tree.reduce(
                lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
                grads, jnp.float32(0.0))
            return loss, gn
        return jax.jit(f)

    variants = {}

    variants["full_fwd"] = jax.jit(
        lambda p, i: ce(ofa.forward(p, cfg, src, prev, imgs + i, masks)))

    variants["full_fwd_bwd"] = g(
        lambda p, i: ce(ofa.forward(p, cfg, src, prev, imgs + i, masks)))

    variants["full_fwd_bwd_remat"] = g(
        lambda p, i: ce(ofa.forward(p, cfg_remat, src, prev, imgs + i, masks)))

    variants["resnet_fwd_bwd"] = g(
        lambda p, i: resnet_forward(
            p["encoder"]["resnet"], (imgs + i).astype(jnp.bfloat16)
        ).astype(jnp.float32).mean())

    variants["encoder_fwd_bwd"] = g(
        lambda p, i: ofa.encode(p, cfg, src, imgs + i, masks)
        .x.astype(jnp.float32).mean())

    def feat_loss(p, i):
        enc = ofa.encode(p, cfg, src, imgs + i, masks)
        feats = ofa.decode(p, cfg, prev, enc, features_only=True)
        return feats.astype(jnp.float32).mean()

    variants["features_fwd_bwd"] = g(feat_loss)

    # CE tail alone: fixed features -> projection + CE, grad wrt params
    feats_fixed = jnp.asarray(rng.randn(B, T, 768), jnp.bfloat16)

    def tail_loss(p, i):
        w = p["embed_tokens"].astype(jnp.bfloat16)
        logits = (feats_fixed + i.astype(jnp.bfloat16)) @ w.T
        return ce(logits[..., : cfg.vocab_size])

    variants["ce_tail_fwd_bwd"] = g(tail_loss)

    _tick = [0]

    def timed(fn, iters=6, reps=3):
        np.asarray(jax.tree.leaves(fn(params, jnp.float32(0.0)))[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                _tick[0] += 1
                out = fn(params, jnp.float32(_tick[0]) * 1e-9)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    out = {}
    for name, fn in variants.items():
        s = timed(fn)
        entry = {"ms": round(s * 1e3, 1)}
        try:
            ca = fn.lower(params, jnp.float32(0.0)).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            byt = float(ca.get("bytes accessed", 0.0))
            entry["tflops"] = round(fl / 1e12, 2)
            entry["achieved_tflops_s"] = round(fl / s / 1e12, 1)
            entry["gbytes"] = round(byt / 1e9, 2)
            entry["achieved_gb_s"] = round(byt / s / 1e9, 0)
        except Exception as e:
            entry["cost_err"] = str(e)[:80]
        out[name] = entry
        print(name, entry, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
