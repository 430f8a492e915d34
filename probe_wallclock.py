"""On-chip A/B of the wallclock joint stage after the uint8-direct
producer change (host normalize->requantize roundtrip removed).

Runs bench.bench_joint_wallclock exactly like the bench stage (same cfg,
cached programs) and prints the metrics dict. Usage:
python probe_wallclock.py (TPU, ~8 min warm).
"""

import json


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from dataclasses import replace

    from musketeer_tpu.config import CriterionConfig, OptimConfig, ofa_base
    from musketeer_tpu.models import ofa

    import bench

    cfg = replace(
        ofa_base(), dtype="bfloat16", use_flash_attention=True,
        remat=True, unroll_layers=True,
    )
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig(
        label_smoothing=0.1, use_rdrop=True,
        drop_worst_ratio=0.2, drop_worst_after=6000,
    )
    optim = OptimConfig(lr=1e-4, warmup_updates=1000, total_updates=30000)
    res = bench.bench_joint_wallclock(params, cfg, crit, optim, B=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
