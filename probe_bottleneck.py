"""Fused-bottleneck Pallas kernel vs XLA, per ResNet stage, on-chip.

Times the stride-1 "rest" block chain of each ResNet-101 stage (the only
blocks the kernel covers) forward-only at the inference bench shape (B16,
480² images) and fwd+bwd at the train shape (B8). The kernel's claim is
HBM-traffic reduction (both Wd-wide intermediates + the conv3 output stay
in VMEM); layer1 is the BW-bound target from the probe_train ranking.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from musketeer_tpu.models import resnet as rn
    from musketeer_tpu.ops import bottleneck as bk
    from musketeer_tpu.config import ofa_base
    from musketeer_tpu.models.ofa import init_ofa_params

    cfg = ofa_base()
    p_all = init_ofa_params(jax.random.PRNGKey(0), cfg)
    params = p_all["encoder"]["resnet"]

    rng = np.random.RandomState(0)

    def time_fn(f, *args, n=20):
        def looped(*a):
            def body(i, c):
                h = a[-1] + (c * 0.0).astype(a[-1].dtype)
                return c + f(*a[:-1], h) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        g = jax.jit(looped)
        r = np.asarray(g(*args))
        t0 = time.perf_counter()
        r = np.asarray(g(*args))
        return (time.perf_counter() - t0) / n * 1000

    out = {}
    shapes = {  # stage -> (H, W, C) at 480² input
        "layer1": (120, 120, 256),
        "layer2": (60, 60, 512),
        "layer3": (30, 30, 1024),
    }

    def rest_chain_xla(p, h):
        n = jax.tree.leaves(p["rest"])[0].shape[0]
        for i in range(n):
            h = rn._bottleneck(h, jax.tree.map(lambda a: a[i], p["rest"]), False)
        return h

    def rest_chain_fused(p, h):
        n = jax.tree.leaves(p["rest"])[0].shape[0]
        for i in range(n):
            h = bk.fused_bottleneck(h, jax.tree.map(lambda a: a[i], p["rest"]))
        return h

    # ---- forward-only, inference shape
    B = 16
    for name, (H, W, C) in shapes.items():
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        p = params[name]
        nb = jax.tree.leaves(p["rest"])[0].shape[0]

        def fsum(fn, p_, h):
            return jnp.sum(fn(p_, h).astype(jnp.float32))

        try:
            ms_f = time_fn(lambda p_, h: fsum(rest_chain_fused, p_, h), p, x)
        except Exception as e:  # Mosaic alignment etc.
            out[f"{name}_fwd"] = {"error": str(e)[:300]}
            print(name, "fused FAILED:", str(e)[:300], flush=True)
            continue
        ms_x = time_fn(lambda p_, h: fsum(rest_chain_xla, p_, h), p, x)
        out[f"{name}_fwd"] = {
            "blocks": nb, "xla_ms": round(ms_x, 3), "fused_ms": round(ms_f, 3),
            "per_block_xla": round(ms_x / nb, 3),
            "per_block_fused": round(ms_f / nb, 3),
        }
        print(name, out[f"{name}_fwd"], flush=True)

    # ---- value check on-chip (layer1, one block)
    p1 = jax.tree.map(lambda a: a[0], params["layer1"]["rest"])
    x1 = jnp.asarray(rng.randn(2, 120, 120, 256), jnp.bfloat16)
    ref = jax.jit(lambda x, p: rn._bottleneck(x, p, False))(x1, p1)
    got = jax.jit(bk.fused_bottleneck)(x1, p1)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    out["max_abs_err_layer1"] = err
    print("max_abs_err_layer1", err, flush=True)

    # ---- fwd+bwd, train shape (custom VJP recomputes via XLA: expect wash)
    B = 8
    H, W, C = shapes["layer1"]
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    cot = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    p = params["layer1"]

    for tag, chain in (("xla", rest_chain_xla), ("fused", rest_chain_fused)):
        def loss(p_, h, chain=chain):
            return jnp.sum(chain(p_, h).astype(jnp.float32) * cot)

        def step(p_, h):
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(p_, h)
            return jax.tree.reduce(
                lambda a, b: a + jnp.sum(jnp.square(b.astype(jnp.float32))),
                g, jnp.float32(0.0))

        ms = time_fn(step, p, x)
        out[f"layer1_train_{tag}"] = round(ms, 3)
        print(f"layer1_train_{tag}", round(ms, 3), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
