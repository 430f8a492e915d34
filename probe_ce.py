"""A/B probe: CE-tail cost vs a two-stage (reshape) row-reduction variant.

The r3 compiled-HLO probes showed any vocab-wide lane reduction on
[rows, 59520] runs ~30x off its HBM roofline (the vocab is the minor/lane
dim; XLA reduces across lanes).  Reshaping [R, V] -> [R, V/128, 128] and
reducing the MIDDLE axis first turns it into a fast sublane-style reduction
followed by a trivial [R, 128] lane reduce.

Variants (fwd+bwd through a real [768, V] projection so dW traffic is
included, B8 T20 bench envelope and a joint-ish 416-row shape):
  ce_base      — label_smoothed_ce as in the criterion today
  ce_twostage  — same math with two-stage reductions
Prints ms per step (fori_loop of 20 inside one dispatch, np.asarray timing).
"""

import json
import time

import numpy as np


def _run():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    V = 59520
    Vr = 59457
    D = 768
    eps = 0.1

    def row_sum2(x):
        R, Vv = x.shape
        return jnp.sum(x.reshape(R, Vv // 128, 128), axis=1).sum(axis=-1)

    def row_max2(x):
        R, Vv = x.shape
        return jnp.max(x.reshape(R, Vv // 128, 128), axis=1).max(axis=-1)

    def ce_base(logits, tgt):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, tgt[:, None], axis=1)[:, 0]
        real = jnp.arange(V) < Vr
        smooth = -jnp.sum(jnp.where(real[None, :], lp, 0.0), axis=-1)
        eps_i = eps / (Vr - 1)
        return jnp.sum((1.0 - eps - eps_i) * nll + eps_i * smooth)

    def ce_two(logits, tgt):
        w = logits.astype(jnp.float32)
        m = row_max2(w)
        e = jnp.exp(w - m[:, None])
        lse = jnp.log(row_sum2(e)) + m
        wt = jnp.take_along_axis(w, tgt[:, None], axis=1)[:, 0]
        nll = lse - wt
        real = jnp.arange(V) < Vr
        # sum over real vocab of lp = sum(real w) - Vr*lse
        sum_w = row_sum2(jnp.where(real[None, :], w, 0.0))
        smooth = Vr * lse - sum_w
        eps_i = eps / (Vr - 1)
        return jnp.sum((1.0 - eps - eps_i) * nll + eps_i * smooth)

    rng = np.random.RandomState(0)
    out = {}
    for R in (160, 416):
        h = jnp.asarray(rng.randn(R, D), jnp.bfloat16) * 0.3
        Wp = jnp.asarray(rng.randn(D, V), jnp.bfloat16) * 0.02
        tgt = jnp.asarray(rng.randint(4, 50000, (R,)), jnp.int32)

        for name, ce in (("base", ce_base), ("two", ce_two)):
            def loss(Wx, hx):
                return ce(hx @ Wx, tgt)

            gf = jax.value_and_grad(loss, argnums=(0, 1))

            def step(Wx, hx):
                def body(i, c):
                    l, (gW, gh) = gf(Wx, hx + c * 0.0)
                    return c + l * 1e-9 + jnp.sum(gh) * 1e-9
                return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))

            f = jax.jit(step)
            r = np.asarray(f(Wp, h))  # compile+run
            t0 = time.perf_counter()
            r = np.asarray(f(Wp, h))
            dt = (time.perf_counter() - t0) / 20 * 1000
            out[f"ce_{name}_R{R}"] = {"ms": round(dt, 3)}
            print(f"ce_{name}_R{R}", out[f"ce_{name}_R{R}"], flush=True)

        # numerics check (fp32 path, small)
        l1 = ce_base((h @ Wp), tgt)
        l2 = ce_two((h @ Wp), tgt)
        out[f"check_R{R}"] = {
            "base": float(l1), "two": float(l2),
            "rel": abs(float(l1 - l2)) / max(1e-9, abs(float(l1))),
        }
        print(f"check_R{R}", out[f"check_R{R}"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    _run()
