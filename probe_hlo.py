"""Compiled-HLO cycle ranking for the train fwd+bwd step.

Compiles the bench train envelope (B8, T=20, 480^2, bf16, flash attention)
fwd+bwd, parses the TPU backend's per-fusion ``estimated_cycles`` from the
compiled HLO text, and ranks cost by (computation, source line).  Fusions
inside while-loop bodies (the layer scans) execute trip-count times; the
report groups by computation so that's visible.

Usage: python probe_hlo.py [--variant full|encoder|features] [--out /tmp/x.txt]
"""

import argparse
import collections
import json
import re
import sys


def build(variant: str):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace
    from musketeer_tpu.config import ofa_base
    from musketeer_tpu.models import ofa

    unroll = variant.endswith("_unroll")
    variant = variant.removesuffix("_unroll")
    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True,
                  unroll_layers=unroll)
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

    if variant == "full":
        loss = lambda p, i: ce(ofa.forward(p, cfg, src, prev, imgs + i, masks))
    elif variant == "encoder":
        # random-cotangent loss: a mean() loss hands every matmul a
        # constant cotangent, letting XLA degenerate dW = xᵀ·dy into a
        # rank-1 outer product — the probe would under-report matmul bwd
        r_enc = jnp.asarray(rng.randn(B, 980, 768), jnp.float32)

        def loss(p, i):
            x = ofa.encode(p, cfg, src, imgs + i, masks).x
            return jnp.sum(x.astype(jnp.float32) * r_enc[:, : x.shape[1]])
    elif variant == "features":
        r_feat = jnp.asarray(rng.randn(B, T, 768), jnp.float32)

        def loss(p, i):
            enc = ofa.encode(p, cfg, src, imgs + i, masks)
            f = ofa.decode(p, cfg, prev, enc, features_only=True)
            return jnp.sum(f.astype(jnp.float32) * r_feat)
    else:
        raise SystemExit(f"unknown variant {variant}")

    def f(p, i):
        l, grads = jax.value_and_grad(loss)(p, i)
        gn = jax.tree.reduce(
            lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
            grads, jnp.float32(0.0))
        return l, gn

    return jax.jit(f), params


FUSION_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(fusion|custom-call)\(")
CYCLES_RE = re.compile(r'"estimated_cycles":"(\d+)"')
META_RE = re.compile(
    r'metadata=\{op_name="([^"]*)"(?:.*?source_file="([^"]*)")?'
    r'(?:.*?source_line=(\d+))?')
COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->")


def rank(text: str, top: int):
    comp = "?"
    # computation -> is it inside a while body? guess from name
    by_line = collections.Counter()
    by_comp = collections.Counter()
    rows = []
    for line in text.splitlines():
        m = COMP_RE.match(line)
        if m and "{" in line:
            comp = m.group(1)
            continue
        cm = CYCLES_RE.search(line)
        if not cm:
            continue
        cycles = int(cm.group(1))
        mm = META_RE.search(line)
        op_name, sfile, sline = (mm.groups() if mm else ("?", None, None))
        key = (op_name.split("/")[-1] if op_name else "?",
               (sfile or "?").split("/")[-1], sline or "?")
        by_line[(comp, key)] += cycles
        by_comp[comp] += cycles
        rows.append((cycles, comp, key))
    print("== top computations by summed estimated_cycles ==")
    for c, v in by_comp.most_common(20):
        print(f"{v:>14,}  {c}")
    print("\n== top (computation, op, src) groups ==")
    for (comp, key), v in by_line.most_common(top):
        print(f"{v:>14,}  {comp:<42.42} {key[0]:<28.28} {key[1]}:{key[2]}")
    print("\n== top individual fusions ==")
    rows.sort(reverse=True)
    for cycles, comp, key in rows[:top]:
        print(f"{cycles:>14,}  {comp:<42.42} {key[0]:<28.28} {key[1]}:{key[2]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full")
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--from-file", default="", help="rank an existing dump")
    args = ap.parse_args()
    if args.from_file:
        rank(open(args.from_file).read(), args.top)
        return
    fn, params = build(args.variant)
    import jax.numpy as jnp
    txt = fn.lower(params, jnp.float32(0.0)).compile().as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        print(f"wrote {len(txt)} bytes to {args.out}", file=sys.stderr)
    rank(txt, args.top)


if __name__ == "__main__":
    main()
