"""bench.bench_joint_wallclock at tiny scale: the TSV-backed 7-task
loader + prefetch + train step produce a finite loss and sane metrics
(CPU smoke for the unattended TPU bench stage)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def test_bench_joint_wallclock_tiny():
    from dataclasses import replace

    import bench
    from musketeer_tpu.config import CriterionConfig, OptimConfig, ofa_tiny
    from musketeer_tpu.models import ofa

    cfg = replace(
        ofa_tiny(), embed_dim=64, ffn_dim=128, encoder_layers=1,
        decoder_layers=1, attention_heads=4, resnet_layers=(1, 1, 1),
        dtype="float32",
    )
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    out = bench.bench_joint_wallclock(
        params, cfg,
        CriterionConfig(label_smoothing=0.1),
        OptimConfig(lr=1e-4, warmup_updates=1, total_updates=10),
        B=2, img_size=32, steps=2, n_rows=8,
    )
    assert out["joint7_wallclock_step_ms"] > 0
    assert out["joint7_device_step_ms"] > 0
    assert out["joint_wallclock_samples_per_sec"] > 0
    # no ratio bound: on a contended 1-core CI host the device/wallclock
    # timing ratio is arbitrary noise (flaked at 1.5x under a concurrent
    # suite run); the ratio is a BENCH metric, the test only checks the
    # stage runs end to end with a finite loss
    assert out["joint_overlap_efficiency"] > 0
