"""Stage-level timing of the ResNet-101 stem (train fwd+bwd, B8 480², bf16).

Splits resnet_forward into stem (conv1+bn+maxpool), layer1..layer3, each
timed fwd+bwd in isolation (random-cotangent loss so matmul grads stay
honest), plus the whole forward, unrolled + no-remat (the bench path).
Also A/Bs a space-to-depth stem reformulation candidate.
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

    params = None
    from musketeer_tpu.config import ofa_base
    from musketeer_tpu.models.ofa import init_ofa_params

    cfg = ofa_base()
    p_all = init_ofa_params(jax.random.PRNGKey(0), cfg)
    params = p_all["encoder"]["resnet"]

    B = 8
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, 480, 480, 3), jnp.bfloat16)

    def stem(p, x):
        x = rn._conv(x, p["conv1"], stride=2)
        x = jax.nn.relu(rn._bn(x, p["bn1"], False))
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    def time_fn(f, *args):
        # one dispatch, fori_loop inside (per-dispatch axon tunnel RTT is
        # ~25 ms); the LAST arg is perturbed by the carry so the body is
        # loop-VARIANT (an invariant body can be partially CSE'd/hoisted)
        def looped(*a):
            def body(i, c):
                h = a[-1] + (c * 0.0).astype(a[-1].dtype)
                return c + f(*a[:-1], h) * 1e-9
            return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))
        g = jax.jit(looped)
        r = np.asarray(g(*args))
        t0 = time.perf_counter()
        r = np.asarray(g(*args))
        return (time.perf_counter() - t0) / 20 * 1000

    out = {}

    # ---- piecewise fwd+bwd
    x0 = imgs
    feats = {}
    cur = x0
    pieces = [("stem", lambda p, h: stem(p, h))]
    for name in ("layer1", "layer2", "layer3"):
        stride = 1 if name == "layer1" else 2
        pieces.append(
            (name, lambda p, h, n=name, s=stride: rn._stage(
                h, p[n], False, stride=s, unroll=True, remat=False))
        )
    for name, f in pieces:
        r_out = jax.eval_shape(lambda p, h: f(p, h), params, cur)
        cot = jnp.asarray(rng.randn(*r_out.shape), jnp.float32)

        def loss(p, h, f=f, cot=cot):
            return jnp.sum(f(p, h).astype(jnp.float32) * cot)

        def step(p, h, loss=loss):
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, h)
            return l, jax.tree.reduce(
                lambda a, b: a + jnp.sum(jnp.square(b.astype(jnp.float32))),
                g, jnp.float32(0.0))

        ms = time_fn(lambda p, h: step(p, h)[1], params, cur)
        out[name] = {"ms": round(ms, 2), "in": list(cur.shape)}
        print(name, out[name], flush=True)
        cur = jax.jit(lambda p, h, f=f: f(p, h))(params, cur)

    # ---- whole fwd+bwd reference
    def whole(p, h):
        return rn.resnet_forward(p, h, train=False, unroll=True, remat=False)

    cot = jnp.asarray(rng.randn(B, 30, 30, 1024), jnp.float32)

    def loss_w(p, h):
        return jnp.sum(whole(p, h).astype(jnp.float32) * cot)

    def step_w(p, h):
        l, g = jax.value_and_grad(loss_w, argnums=(0, 1))(p, h)
        return jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.square(b.astype(jnp.float32))),
            g, jnp.float32(0.0))

    out["whole"] = {"ms": round(time_fn(step_w, params, imgs), 2)}
    print("whole", out["whole"], flush=True)

    def whole_r(p, h):
        return rn.resnet_forward(p, h, train=False, unroll=True, remat=True)

    def loss_wr(p, h):
        return jnp.sum(whole_r(p, h).astype(jnp.float32) * cot)

    def step_wr(p, h):
        l, g = jax.value_and_grad(loss_wr, argnums=(0, 1))(p, h)
        return jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.square(b.astype(jnp.float32))),
            g, jnp.float32(0.0))

    out["whole_remat"] = {"ms": round(time_fn(step_wr, params, imgs), 2)}
    print("whole_remat", out["whole_remat"], flush=True)

    # ---- space-to-depth stem A/B: conv 7x7/s2/Cin3 == conv 4x4-blocked
    # input [B,120,120,48] with an 8x8 kernel? Exact reformulation: pad to
    # 484? Simpler EXACT variant: stride-2 7x7 on 480² == space-to-depth(2)
    # then 4x4 conv stride 1 on [240,240,12] with kernel built from the 7x7
    # weights (7 -> pad to 8 taps, 2x2 phases). Here we time a SHAPE PROXY
    # (not weight-exact): conv 4x4 stride 1 Cin12 Cout64 on [B,240,240,12].
    w_proxy = jnp.asarray(rng.randn(4, 4, 12, 64), jnp.bfloat16) * 0.05
    imgs_s2d = imgs.reshape(B, 240, 2, 240, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, 240, 240, 12)

    def stem_s2d(w, h):
        x = jax.lax.conv_general_dilated(
            h, w, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    cot2 = jnp.asarray(rng.randn(B, 120, 120, 64), jnp.float32)

    def loss_s(w, h):
        return jnp.sum(stem_s2d(w, h).astype(jnp.float32) * cot2)

    def step_s(w, h):
        l, g = jax.value_and_grad(loss_s, argnums=(0, 1))(w, h)
        return jnp.sum(g[0].astype(jnp.float32) ** 2) + jnp.sum(
            g[1].astype(jnp.float32) ** 2)

    out["stem_s2d_proxy"] = {"ms": round(time_fn(step_s, w_proxy, imgs_s2d), 2)}
    print("stem_s2d_proxy", out["stem_s2d_proxy"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
