"""Standalone driver for the 9-task joint-step variants (OOM triage).

Runs ONE variant of bench.bench_joint_train's step (packed or unpacked)
once and prints the loss — used to bisect the r3e unpacked-ablation OOM
without paying for the whole bench.

Usage: python probe_joint.py [packed|unpacked] [--pad-once]
"""

import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dataclasses import replace

    from musketeer_tpu.config import (
        CriterionConfig, OptimConfig, ofa_base,
    )
    from musketeer_tpu.models import ofa
    from musketeer_tpu.training import init_train_state, make_train_step

    import bench

    variant = sys.argv[1] if len(sys.argv) > 1 else "unpacked"
    pad_once = "--pad-once" in sys.argv
    scan = "--scan" in sys.argv

    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)

    # replicate bench_joint_train's setup up to the step call
    import types
    import time

    # reuse bench's batch builder by calling bench_joint_train's internals:
    # simplest faithful path — monkeypatch timed_step to run the chosen
    # variant once.  Instead, rebuild the batches with the same code by
    # copying the closure logic: call bench.bench_joint_train but stop after
    # the first timing via a tiny iters/reps.  We need variant isolation, so
    # inline the essentials here.
    from musketeer_tpu.training.train_step import TaskBatch

    rs = np.random.RandomState(0)
    Vp = cfg.padded_vocab_size
    hi = min(50000, cfg.vocab_size - 1)
    img_size, B = 480, 2
    grid = (img_size // 16) ** 2

    def tb(B, Ts, Tt, img=False, cm=False, conf=None, code=False, spn=None):
        tgt = rs.randint(4, hi, (B, Tt)).astype(np.int32)
        tgt[:, -1] = cfg.eos
        prev = np.roll(tgt, 1, 1)
        prev[:, 0] = cfg.bos
        cmask = None
        if cm:
            m = rs.rand(B, Tt, Vp) < 0.02
            m[np.arange(B)[:, None], np.arange(Tt)[None], tgt] = True
            cmask = m
        order = None
        if spn:
            spn = min(spn, grid)
            order = np.stack(
                [rs.permutation(grid)[:spn] for _ in range(B)]
            ).astype(np.int32)
        add = lambda a: None if a is None else jnp.asarray(a)[None]
        return TaskBatch(
            src_tokens=add(rs.randint(4, hi, (B, Ts)).astype(np.int32)),
            prev_output_tokens=add(prev),
            target=add(tgt),
            patch_images=add(
                rs.rand(B, img_size, img_size, 3).astype(np.float32)
                if img else None
            ),
            patch_masks=add(np.ones(B, bool) if img else None),
            constraint_masks=add(cmask),
            conf=add(np.full(B, conf, np.float32) if conf else None),
            code_masks=add(np.ones(B, bool) if code else None),
            sample_patch_order=add(order),
        )

    batches = {
        "caption": tb(B, 80, 20, img=True, spn=196),
        "refcoco": tb(B, 80, 5, img=True),
        "vqa_gen": tb(B, 90, 90, img=True, cm=True),
        "snli_ve": tb(B, 90, 90, img=True, cm=True),
        "image_classify": tb(B, 70, 72, img=True, cm=True),
        "image_gen": tb(B, 40, 1025, code=True),
        "detection": tb(B, 70, 30, img=True, conf=2.0),
        "gigaword": tb(B, 512, 32),
        "text_infilling": tb(B, 512, 32),
    }
    cfg_j = replace(
        cfg, remat=True, unroll_layers=not scan, flash_pad_once=pad_once
    )
    crit = CriterionConfig(
        label_smoothing=0.1, use_rdrop=True,
        drop_worst_ratio=0.2, drop_worst_after=6000,
    )
    optim = OptimConfig(lr=1e-4, warmup_updates=1000, total_updates=30000)
    state = init_train_state(params, optim)
    state = state._replace(step=jnp.int32(7000))

    pack = variant == "packed"
    fn = make_train_step(
        cfg_j, crit, optim, donate=False, pack_text=pack, pack_vision=pack
    )
    t0 = time.perf_counter()
    _, out = fn(state, batches, jax.random.PRNGKey(0))
    loss = float(np.asarray(out["loss"]))
    t1 = time.perf_counter()
    _, out = fn(state, batches, jax.random.PRNGKey(1))
    loss = float(np.asarray(out["loss"]))
    dt = time.perf_counter() - t1
    print(f"{variant} pad_once={pad_once} OK loss={loss:.4f} "
          f"first={t0 and (t1 - t0):.1f}s steady={dt * 1000:.0f}ms")


if __name__ == "__main__":
    main()
