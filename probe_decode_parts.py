"""Partition (R sessions/dispatch) the decode loop's ~1.6 ms/step at the bench envelope.

Times three jitted 17-step loops on the real chip (B16, beam5, ofa_base
bf16, 480² encoder output):

  model    : decode_step(features_only=True) only, fixed token feed —
             the pure decoder-stack cost (self/cross attn + FFN)
  model+prj: + fused projection kernel + candidate-block select +
             per-row top-2K (everything the beam fast path runs except
             beam bookkeeping), argmax token feed
  full     : beam_search decode (encoder subtracted) — from
             probe_infer_kernel.py (27.6 ms / 17 steps = 1.62 ms/step)

full − (model+prj) = beam bookkeeping; (model+prj) − model = projection.
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
    from musketeer_tpu.ops.topk_projection import (
        project_with_stats, select_candidate_blocks,
    )
    from musketeer_tpu.tokenization import default_vocab

    v = default_vocab()
    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)

    B, K = 16, 5
    N = B * K
    STEPS = 17
    R = 8  # sessions per dispatch: amortizes the ~27ms axon RTT
    prompt = v.encode_text(
        " what does the image describe?", append_bos=True, append_eos=True
    )
    src = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (B, 1)))
    imgs = jnp.asarray(np.random.RandomState(0).rand(B, 480, 480, 3),
                       jnp.float32)
    masks = jnp.ones((B,), bool)

    enc = jax.jit(
        lambda pr, s_, im, m, p: ofa.encode(pr, cfg, s_, im + p, m)
    )(params, src, imgs, masks, jnp.float32(0.0))
    state0 = jax.jit(
        lambda pr, e: ofa.init_decoder_state(
            pr, cfg, e, max_len=STEPS + 1, beam_size=K)
    )(params, enc)

    def strip(st):
        cache = {k_: v_ for k_, v_ in st.cache.items()
                 if k_ not in ("self_k", "self_v")}
        return st._replace(cache=cache)

    inv = strip(state0)
    kv0 = (state0.cache["self_k"], state0.cache["self_v"])

    w_proj = params["embed_tokens"].astype(jnp.bfloat16)
    nb_sel = 2 * K + 2 + (STEPS + 2 - 3 + 1)

    def timed(fn, *args, reps=4):
        r = fn(*args, jnp.float32(0.0))
        np.asarray(jax.tree.leaves(r)[0])
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            r = fn(*args, jnp.float32(i + 1.0))
            np.asarray(jax.tree.leaves(r)[0])
            best = min(best, time.perf_counter() - t0)
        return best / R

    @jax.jit
    def model_only(params, inv, kv0, seed):
        inv_b = jax.lax.optimization_barrier(inv)
        toks0 = jnp.full((N,), 5, jnp.int32)

        def body(step, carry):
            kv, acc = carry
            st = inv_b._replace(
                cache={**inv_b.cache, "self_k": kv[0], "self_v": kv[1]})
            feats, nd = ofa.decode_step(
                params, cfg, toks0 + (acc > 1e30).astype(jnp.int32),
                step, st, features_only=True)
            return ((nd.cache["self_k"], nd.cache["self_v"]),
                    acc + feats.astype(jnp.float32).sum() + seed * 1e-9)

        def sess(i, carry):
            kv, acc = carry
            return body(i % STEPS, (kv, acc))

        (_, acc) = jax.lax.fori_loop(
            0, STEPS * R, sess, (kv0, jnp.float32(0.0)))
        return acc

    @jax.jit
    def model_proj(params, inv, kv0, w_proj, seed):
        inv_b = jax.lax.optimization_barrier(inv)
        wp = jax.lax.optimization_barrier(w_proj)

        def body(step, carry):
            kv, toks, acc = carry
            st = inv_b._replace(
                cache={**inv_b.cache, "self_k": kv[0], "self_v": kv[1]})
            feats, nd = ofa.decode_step(
                params, cfg, toks, step, st, features_only=True)
            logits, bmax, Z = project_with_stats(
                feats.astype(jnp.bfloat16), wp, None,
                vocab_size=cfg.vocab_size)
            vals, ids = select_candidate_blocks(logits, bmax, nb_sel)
            sc, pos = jax.lax.top_k(
                vals.astype(jnp.float32) - Z[:, None], 2 * K)
            ntoks = jnp.take_along_axis(ids, pos[:, :1], axis=1)[:, 0]
            return ((nd.cache["self_k"], nd.cache["self_v"]),
                    ntoks.astype(jnp.int32),
                    acc + sc.sum() + seed * 1e-9)

        def sess(i, carry):
            return body(i % STEPS, carry)

        (_, _, acc) = jax.lax.fori_loop(
            0, STEPS * R, sess,
            (kv0, jnp.full((N,), 5, jnp.int32), jnp.float32(0.0)))
        return acc

    out = {}
    t = timed(model_only, params, inv, kv0)
    out["model_only_ms_per_step"] = round(t * 1e3 / STEPS, 3)
    print("model_only", out, flush=True)
    t = timed(model_proj, params, inv, kv0, w_proj)
    out["model_proj_ms_per_step"] = round(t * 1e3 / STEPS, 3)
    out["full_ms_per_step_ref"] = round(27.6 / STEPS, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
