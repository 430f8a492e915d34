"""Compiled-HLO cycle ranking for the beam-decode program (bench envelope).

Compiles bench.py's `run` (encode + beam_search, B16 beam5 maxlen16 bf16)
and ranks per-fusion estimated_cycles, splitting computations into the
decode while-body vs everything else. While-body fusions execute ~17x —
the report multiplies them accordingly in the DECODE section.

Usage: python probe_hlo_decode.py [--out /tmp/x.txt] [--int8]
"""

import argparse
import collections
import re
import sys

from probe_hlo import CYCLES_RE, META_RE, COMP_RE


def rank_decode(text: str, top: int, steps: int = 17):
    comp = "?"
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
        rows.append((cycles, comp, key))

    # while-body computations: jax names them region_*/body or they contain
    # 'while' — use the heuristic that beam decode body fusions mention
    # beam_search/ofa decode lines; safer: group by computation and report
    # both totals, letting the reader see body computations by name.
    by_comp = collections.Counter()
    by_line = collections.Counter()
    for cycles, c, key in rows:
        by_comp[c] += cycles
        by_line[(c, key)] += cycles
    print("== computations by summed estimated_cycles (x1) ==")
    for c, v in by_comp.most_common(12):
        print(f"{v:>14,}  {c}")
    print(f"\n== top (computation, op, src) groups ==")
    for (c, key), v in by_line.most_common(top):
        print(f"{v:>14,}  {c:<34.34} {key[0]:<26.26} {key[1]}:{key[2]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--from-file", default="")
    args = ap.parse_args()
    if args.from_file:
        rank_decode(open(args.from_file).read(), args.top)
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace

    from musketeer_tpu.config import GenerationConfig, ofa_base
    from musketeer_tpu.generation import beam_search
    from musketeer_tpu.models import ofa
    from musketeer_tpu.tokenization import default_vocab

    v = default_vocab()
    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    if args.int8:
        params = ofa.quantize_output_proj(params)
    B = 16
    prompt = v.encode_text(
        " what does the image describe?", append_bos=True, append_eos=True)
    src = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (B, 1)))
    imgs = jnp.asarray(np.random.RandomState(0).rand(B, 480, 480, 3),
                       jnp.float32)
    masks = jnp.ones((B,), bool)
    gen_cfg = GenerationConfig(beam_size=5, max_len_b=16, min_len=1,
                               no_repeat_ngram_size=3)

    def run(params, i):
        enc = ofa.encode(params, cfg, src, imgs + i, masks)
        toks, scores = beam_search(params, cfg, gen_cfg, enc, max_len=16)
        return toks.sum(axis=(1, 2)), scores.mean(axis=1)

    txt = jax.jit(run).lower(params, jnp.float32(0.0)).compile().as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        print(f"wrote {len(txt)} bytes to {args.out}", file=sys.stderr)
    rank_decode(txt, args.top)


if __name__ == "__main__":
    main()
