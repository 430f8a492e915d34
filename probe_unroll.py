"""A/B probes for the train-step layer-loop strategy and bwd-kernel block_b.

Variants at the bench train envelope (B8, T=20, 480^2, bf16, flash):
  - full fwd+bwd: lax.scan layers (current) vs unroll_layers=True
  - encoder-only and resnet-only splits of the same A/B
  - bwd kernel batch-chunk block_b override (2 = current, 4 = candidate
    enabled by the D-unpadded v/do/dv streams freeing scoped VMEM)
"""

import functools
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
    import musketeer_tpu.ops.flash_attention_bwd as fab

    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    cfg_u = replace(cfg, unroll_layers=True)
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

    def variants():
        yield "full_scan", g(
            lambda p, i: ce(ofa.forward(p, cfg, src, prev, imgs + i, masks))), None
        yield "full_unroll", g(
            lambda p, i: ce(ofa.forward(p, cfg_u, src, prev, imgs + i, masks))), None
        yield "encoder_scan", g(
            lambda p, i: ofa.encode(p, cfg, src, imgs + i, masks)
            .x.astype(jnp.float32).mean()), None
        yield "encoder_unroll", g(
            lambda p, i: ofa.encode(p, cfg_u, src, imgs + i, masks)
            .x.astype(jnp.float32).mean()), None
        yield "resnet_scan", g(
            lambda p, i: resnet_forward(
                p["encoder"]["resnet"], (imgs + i).astype(jnp.bfloat16)
            ).astype(jnp.float32).mean()), None
        yield "resnet_unroll", g(
            lambda p, i: resnet_forward(
                p["encoder"]["resnet"], (imgs + i).astype(jnp.bfloat16),
                unroll=True,
            ).astype(jnp.float32).mean()), None
        # block_b override on the bwd kernel (encoder split shows it best)
        yield "encoder_scan_bb4", g(
            lambda p, i: ofa.encode(p, cfg, src, imgs + i, masks)
            .x.astype(jnp.float32).mean()), 4

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

    orig_bwd = fab._bwd
    out = {}
    for name, fn, bb in variants():
        fab._bwd = orig_bwd if bb is None else functools.partial(
            orig_bwd, block_b=bb)
        try:
            out[name] = {"ms": round(timed(fn) * 1e3, 1)}
        except Exception as e:
            out[name] = {"err": str(e)[:200]}
        finally:
            fab._bwd = orig_bwd
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
