"""Decompose the joint-vs-single MFU gap (VERDICT r4 #3).

The 9-task joint step runs at mfu 0.194 while the single-task B8 step
runs at 0.222. This probe splits the joint step into its actual forward
groups (the packed step's own grouping: caption / refcoco / vqa+snli /
image_classify / image_gen / detection / gigaword+infilling) and times
each group's fwd+bwd alone under the SAME production config (remat=True,
unroll, R-Drop), plus:
  * the optimizer update (adam over the full param tree), timed alone;
  * each group again with remat=False (the per-group recompute cost —
    individually every group fits HBM);
  * the whole packed 9-task step for the sum-of-parts comparison.

Output: a per-group table (ms, analytic TFLOP, MFU, remat-off ms) that
names the biggest term in the 13% gap. Analytic-FLOPs convention
(utils/flops.py): fwd x3, R-Drop counted, no remat recompute.

Usage: python probe_joint_mfu.py  (on the TPU chip, ~10 min incl compiles)
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
    from musketeer_tpu.training.train_step import multitask_loss
    from musketeer_tpu.training.train_state import make_optimizer
    from musketeer_tpu.utils import flops as F

    import bench

    cfg = replace(
        ofa_base(), dtype="bfloat16", use_flash_attention=True,
        remat=True, unroll_layers=True,
    )
    cfg_norematt = replace(cfg, remat=False)
    crit = CriterionConfig(
        label_smoothing=0.1, use_rdrop=True,
        drop_worst_ratio=0.2, drop_worst_after=6000,
    )
    optim = OptimConfig(lr=1e-4, warmup_updates=1000, total_updates=30000)

    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    B = 2
    batches, _ = bench.make_joint_batches(cfg, B=B)

    # per-task analytic fwd FLOPs (same shapes as make_joint_batches)
    img = 480
    grid = (img // 16) ** 2
    task_flops = {
        "caption": F.seq2seq_fwd_flops(cfg, B, 80, 20, img_size=img, n_patches=196, rdrop=True),
        "refcoco": F.seq2seq_fwd_flops(cfg, B, 80, 5, img_size=img, rdrop=True),
        "vqa_gen": F.seq2seq_fwd_flops(cfg, B, 90, 90, img_size=img, rdrop=True),
        "snli_ve": F.seq2seq_fwd_flops(cfg, B, 90, 90, img_size=img, rdrop=True),
        "image_classify": F.seq2seq_fwd_flops(cfg, B, 70, 72, img_size=img, rdrop=True),
        "image_gen": F.seq2seq_fwd_flops(cfg, B, 40, 1025, rdrop=True),
        "detection": F.seq2seq_fwd_flops(cfg, B, 70, 30, img_size=img, rdrop=True),
        "gigaword": F.seq2seq_fwd_flops(cfg, B, 512, 32, rdrop=True),
        "text_infilling": F.seq2seq_fwd_flops(cfg, B, 512, 32, rdrop=True),
    }

    # the packed step's own grouping
    groups = [
        ("caption", ["caption"]),
        ("refcoco", ["refcoco"]),
        ("vqa+snli", ["vqa_gen", "snli_ve"]),
        ("image_classify", ["image_classify"]),
        ("image_gen", ["image_gen"]),
        ("detection", ["detection"]),
        ("giga+infill", ["gigaword", "text_infilling"]),
    ]

    PEAK = bench.V5E_BF16_PEAK_FLOPS
    upd = jnp.int32(7000)

    def fwd_bwd_fn(use_cfg):
        def loss_fn(p, sub, rng):
            loss, m = multitask_loss(p, use_cfg, crit, sub, rng, upd)
            return loss

        def run(p, sub, rng):
            loss, grads = jax.value_and_grad(loss_fn)(p, sub, rng)
            gn = jax.tree.reduce(
                lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))),
                grads, jnp.float32(0.0),
            )
            return loss, gn

        return jax.jit(run)

    def timed(fn, *args, iters=3, reps=2):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        # warm until two consecutive runs agree (axon post-compile stall)
        prev = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
            dt = time.perf_counter() - t0
            if abs(dt - prev) < 0.25 * max(dt, prev):
                break
            prev = dt
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # batches carry a leading accum axis; strip it for the bare loss calls
    strip = lambda tb: jax.tree.map(lambda a: a[0], tb)

    run_r = fwd_bwd_fn(cfg)
    run_n = fwd_bwd_fn(cfg_norematt)
    rng = jax.random.PRNGKey(11)

    rows = []
    sum_remat = sum_norematt = 0.0
    for label, names in groups:
        sub = {n: strip(batches[n]) for n in names}
        tr = timed(run_r, params, sub, rng)
        try:
            tn = timed(run_n, params, sub, rng)
        except Exception as e:
            tn = float("nan")
            print(f"  ({label} remat-off failed: {repr(e)[:80]})")
        fl = 3.0 * sum(task_flops[n] for n in names)
        mfu = fl / tr / PEAK
        rows.append((label, tr, tn, fl, mfu))
        sum_remat += tr
        sum_norematt += tn if np.isfinite(tn) else tr
        print(
            f"{label:16s} remat {tr*1e3:7.1f} ms | noremat "
            f"{tn*1e3:7.1f} ms | {fl/1e12:6.2f} TF | mfu {mfu:.3f}",
            flush=True,
        )

    # optimizer update alone (full param tree, zero-like grads)
    tx = make_optimizer(optim)
    opt_state = tx.init(params)

    @jax.jit
    def opt_step(p, os_):
        g = jax.tree.map(lambda a: a * 1e-6, p)  # nonzero, same tree
        import optax

        updates, os2 = tx.update(g, os_, p)
        p2 = optax.apply_updates(p, updates)
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))), p2,
            jnp.float32(0.0),
        ), os2

    t_opt = timed(lambda: opt_step(params, opt_state))
    print(f"{'optimizer':16s} {t_opt*1e3:7.1f} ms (adam over full tree)")

    # the whole production step for comparison
    state = init_train_state(params, optim)
    state = state._replace(step=jnp.int32(7000))
    step_fn = make_train_step(cfg, crit, optim, donate=False)
    t_all = timed(
        lambda: step_fn(state, batches, jax.random.PRNGKey(3))[1]["loss"]
    )
    total_fl = 3.0 * sum(task_flops.values())
    print(
        f"\nwhole step      {t_all*1e3:7.1f} ms | mfu "
        f"{total_fl/t_all/PEAK:.3f}"
    )
    print(
        f"sum of groups   {sum_remat*1e3:7.1f} ms (+opt {t_opt*1e3:.1f} => "
        f"{(sum_remat+t_opt)*1e3:.1f}); sched/stem-pack delta "
        f"{(t_all-sum_remat-t_opt)*1e3:+7.1f} ms"
    )
    print(
        f"remat recompute {1e3*(sum_remat-sum_norematt):7.1f} ms "
        f"(sum remat-on minus remat-off)"
    )
    print(
        f"no-remat mfu bound: {total_fl/(sum_norematt+t_opt)/PEAK:.3f}"
    )


if __name__ == "__main__":
    main()
