"""A/B probe: the embed-table f32 gradient round-trip.

The train step keeps ``embed_tokens`` as the fp32 master [59520, 768]
(137 MB). XLA AD for ``feats @ W.astype(bf16).T`` materializes a bf16 dW
(91 MB write) and converts it to fp32 (91 MB read + 183 MB write); the two
input-side gathers each scatter-add into their own fp32 zeros buffer
(183 MB write each) before the three grads are summed. This probe measures,
at the bench train envelope (B8, Ts80+Tt20 token streams, real projection):

  tail_base    — dense projection only, XLA AD
  tail_custom  — custom_vjp emitting dW fp32 straight from the MXU
  full_base    — projection + encoder/decoder gathers, XLA AD
  full_shared  — custom bundle: ONE backward scatters both gathers into the
                 dense dW buffer (no per-gather zeros buffers)

fori_loop'd 20x inside one dispatch, np.asarray timing.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    V, D = 59520, 768
    B, Ts, Tt = 8, 80, 20
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(V, D), jnp.float32) * 0.02
    feats = jnp.asarray(rng.randn(B, Tt, D), jnp.bfloat16) * 0.3
    src = jnp.asarray(rng.randint(4, 50000, (B, Ts)), jnp.int32)
    prev = jnp.asarray(rng.randint(4, 50000, (B, Tt)), jnp.int32)
    tgt = jnp.asarray(rng.randint(4, 50000, (B, Tt)), jnp.int32)

    def ce(logits):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    # --- custom vjp: dense projection emitting fp32 dW directly ----------
    @jax.custom_vjp
    def tied_project(f, w):
        return f @ w.astype(f.dtype).T

    def _tp_fwd(f, w):
        wb = w.astype(f.dtype)
        return f @ wb.T, (f, wb)

    def _tp_bwd(res, dl):
        f, wb = res
        df = dl @ wb
        f2 = f.reshape(-1, f.shape[-1])
        dl2 = dl.reshape(-1, dl.shape[-1])
        dW = jax.lax.dot_general(
            dl2, f2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return df, dW

    tied_project.defvjp(_tp_fwd, _tp_bwd)

    # --- custom bundle: gathers + projection, one fused backward ---------
    @jax.custom_vjp
    def embed_bundle(w, s, p, f):
        return w[s].astype(jnp.bfloat16), w[p].astype(jnp.bfloat16), \
            f @ w.astype(jnp.bfloat16).T

    def _eb_fwd(w, s, p, f):
        wb = w.astype(jnp.bfloat16)
        return (wb[s], wb[p], f @ wb.T), (wb, s, p, f)

    def _eb_bwd(res, cts):
        wb, s, p, f = res
        dxs, dxp, dl = cts
        df = dl @ wb
        f2 = f.reshape(-1, f.shape[-1])
        dl2 = dl.reshape(-1, dl.shape[-1])
        dW = jax.lax.dot_general(
            dl2, f2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dW = dW.at[s.reshape(-1)].add(
            dxs.reshape(-1, dxs.shape[-1]).astype(jnp.float32))
        dW = dW.at[p.reshape(-1)].add(
            dxp.reshape(-1, dxp.shape[-1]).astype(jnp.float32))
        return dW, None, None, df

    embed_bundle.defvjp(_eb_fwd, _eb_bwd)

    # --- implementable variant: embed_io(table, src, prev) → (xs, xp, wb).
    # wb (the bf16 table) is produced at forward START and consumed by the
    # projection at forward END — no circularity, unlike embed_bundle which
    # needs `features` as a primal input. Backward: dtable =
    # convert(dwb) with the two gather grads scattered INTO it in place —
    # one fp32 materialization total, no per-gather zeros buffers.
    @jax.custom_vjp
    def embed_io(w, s, p):
        wb = w.astype(jnp.bfloat16)
        return wb[s], wb[p], wb

    def _io_fwd(w, s, p):
        wb = w.astype(jnp.bfloat16)
        return (wb[s], wb[p], wb), (s, p)

    def _io_bwd(res, cts):
        s, p = res
        dxs, dxp, dwb = cts
        dW = dwb.astype(jnp.float32)
        dW = dW.at[s.reshape(-1)].add(
            dxs.reshape(-1, dxs.shape[-1]).astype(jnp.float32))
        dW = dW.at[p.reshape(-1)].add(
            dxp.reshape(-1, dxp.shape[-1]).astype(jnp.float32))
        return dW, None, None

    embed_io.defvjp(_io_fwd, _io_bwd)

    def tail_base(w, f):
        return ce(f @ w.astype(jnp.bfloat16).T)

    def tail_custom(w, f):
        return ce(tied_project(f, w))

    def full_base(w, f):
        xs = w[src].astype(jnp.bfloat16)
        xp = w[prev].astype(jnp.bfloat16)
        logits = f @ w.astype(jnp.bfloat16).T
        return ce(logits) + (xs.astype(jnp.float32).mean()
                             + xp.astype(jnp.float32).mean()) * 1e-3

    def full_shared(w, f):
        xs, xp, logits = embed_bundle(w, src, prev, f)
        return ce(logits) + (xs.astype(jnp.float32).mean()
                             + xp.astype(jnp.float32).mean()) * 1e-3

    def full_io(w, f):
        xs, xp, wb = embed_io(w, src, prev)
        logits = f @ wb.T
        return ce(logits) + (xs.astype(jnp.float32).mean()
                             + xp.astype(jnp.float32).mean()) * 1e-3

    out = {}
    grads = {}
    for name, fn in (("tail_base", tail_base), ("tail_custom", tail_custom),
                     ("full_base", full_base), ("full_shared", full_shared),
                     ("full_io", full_io)):
        gf = jax.value_and_grad(fn)

        def step(w, f):
            def body(i, c):
                l, gw = gf(w, f + c.astype(f.dtype) * 0.0)
                return c + l.astype(jnp.float32) * 1e-9 + gw[100, 0] * 1e-9
            return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))

        jf = jax.jit(step)
        np.asarray(jf(W, feats))
        t0 = time.perf_counter()
        np.asarray(jf(W, feats))
        dt = (time.perf_counter() - t0) / 20 * 1000
        out[name] = {"ms": round(dt, 3)}
        _, g = jax.jit(gf)(W, feats)
        grads[name] = np.asarray(g[:200])
        print(name, out[name], flush=True)

    out["tail_gdiff"] = float(
        np.abs(grads["tail_base"] - grads["tail_custom"]).max())
    out["full_gdiff"] = float(
        np.abs(grads["full_base"] - grads["full_shared"]).max())
    out["io_gdiff"] = float(
        np.abs(grads["full_base"] - grads["full_io"]).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
