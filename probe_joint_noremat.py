"""Whole packed 9-task step with remat OFF (follow-up to probe_joint_mfu).

probe_joint_mfu measured ~49 ms of remat recompute across the groups and
every group fits HBM without remat individually — this checks whether the
WHOLE packed step does too (peak HBM is scheduler-dependent), and what it
buys. Usage: python probe_joint_noremat.py (TPU, ~10 min cold).
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dataclasses import replace

    from musketeer_tpu.config import CriterionConfig, OptimConfig, ofa_base
    from musketeer_tpu.models import ofa
    from musketeer_tpu.training import init_train_state, make_train_step
    from musketeer_tpu.utils import flops as F

    import bench

    crit = CriterionConfig(
        label_smoothing=0.1, use_rdrop=True,
        drop_worst_ratio=0.2, drop_worst_after=6000,
    )
    optim = OptimConfig(lr=1e-4, warmup_updates=1000, total_updates=30000)
    B = 2
    img = 480

    task_flops = {
        "caption": F.seq2seq_fwd_flops(ofa_base(), B, 80, 20, img_size=img, n_patches=196, rdrop=True),
        "refcoco": F.seq2seq_fwd_flops(ofa_base(), B, 80, 5, img_size=img, rdrop=True),
        "vqa_gen": F.seq2seq_fwd_flops(ofa_base(), B, 90, 90, img_size=img, rdrop=True),
        "snli_ve": F.seq2seq_fwd_flops(ofa_base(), B, 90, 90, img_size=img, rdrop=True),
        "image_classify": F.seq2seq_fwd_flops(ofa_base(), B, 70, 72, img_size=img, rdrop=True),
        "image_gen": F.seq2seq_fwd_flops(ofa_base(), B, 40, 1025, rdrop=True),
        "detection": F.seq2seq_fwd_flops(ofa_base(), B, 70, 30, img_size=img, rdrop=True),
        "gigaword": F.seq2seq_fwd_flops(ofa_base(), B, 512, 32, rdrop=True),
        "text_infilling": F.seq2seq_fwd_flops(ofa_base(), B, 512, 32, rdrop=True),
    }
    total_fl = 3.0 * sum(task_flops.values())
    PEAK = bench.V5E_BF16_PEAK_FLOPS

    def timed(step_fn, state, batches, iters=3, reps=2):
        out = step_fn(state, batches, jax.random.PRNGKey(0))[1]["loss"]
        np.asarray(out)
        prev = float("inf")
        for i in range(6):
            t0 = time.perf_counter()
            out = step_fn(state, batches, jax.random.PRNGKey(i))[1]["loss"]
            np.asarray(out)
            dt = time.perf_counter() - t0
            if abs(dt - prev) < 0.25 * max(dt, prev):
                break
            prev = dt
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                out = step_fn(state, batches, jax.random.PRNGKey(r * 7 + i))[1]
            np.asarray(out["loss"])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, float(np.asarray(out["loss"]))

    for label, remat in (("remat=False", False), ("remat=True", True)):
        cfg = replace(
            ofa_base(), dtype="bfloat16", use_flash_attention=True,
            remat=remat, unroll_layers=True,
        )
        params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
        batches, _ = bench.make_joint_batches(cfg, B=B)
        state = init_train_state(params, optim)
        state = state._replace(step=jnp.int32(7000))
        step_fn = make_train_step(cfg, crit, optim, donate=False)
        try:
            t, loss = timed(step_fn, state, batches)
            print(
                f"{label:12s} whole step {t*1e3:7.1f} ms | mfu "
                f"{total_fl/t/PEAK:.3f} | loss {loss:.3f}",
                flush=True,
            )
        except Exception as e:
            print(f"{label:12s} FAILED: {repr(e)[:160]}", flush=True)
        del params, batches, state, step_fn


if __name__ == "__main__":
    main()
