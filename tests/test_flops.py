"""Analytic FLOPs accounting (utils/flops.py): structure + XLA cross-check.

The analytic numbers are the single MFU convention for bench.py; the
cross-checks pin them to XLA cost analysis of programs WITHOUT remat
(where XLA's count ≈ algorithmic count) so the convention stays honest.
"""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.utils import flops as F


def test_structural_monotonicity():
    from musketeer_tpu.config import ofa_base

    cfg = ofa_base()
    assert F.encoder_flops(cfg, 80) < F.encoder_flops(cfg, 160)
    assert F.encoder_flops(cfg, 80) < F.encoder_flops(cfg, 80, img_size=480)
    assert F.decoder_flops(cfg, 10, 900) < F.decoder_flops(cfg, 20, 900)
    # subsampled patches shrink transformer work but keep the ResNet
    full = F.encoder_flops(cfg, 80, img_size=480)
    sub = F.encoder_flops(cfg, 80, img_size=480, n_patches=196)
    assert F.resnet_flops(cfg.resnet_layers, 480, 480) < sub < full
    # rdrop doubles the forward
    a = F.seq2seq_fwd_flops(cfg, 2, 80, 20, img_size=480)
    b = F.seq2seq_fwd_flops(cfg, 2, 80, 20, img_size=480, rdrop=True)
    assert abs(b - 2 * a) < 1e-6 * a
    # incremental decode of T tokens costs less than teacher-forcing T
    # tokens + T full output projections would, but more than one step
    assert F.incremental_decode_flops(cfg, 16, 900) > F.incremental_decode_flops(cfg, 1, 900)


def test_resnet_flops_vs_xla():
    from musketeer_tpu.models.resnet import init_resnet, resnet_forward

    layers = (1, 1, 1)
    params = init_resnet(jax.random.PRNGKey(0), layers)
    B = 2
    imgs = jnp.asarray(np.random.RandomState(0).rand(B, 64, 64, 3), jnp.float32)
    fn = jax.jit(lambda p, x: resnet_forward(p, x))
    ca = fn.lower(params, imgs).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla = float(ca.get("flops", 0.0))
    analytic = B * F.resnet_flops(layers, 64, 64)
    assert xla > 0
    # convs dominate; BN/relu elementwise adds a little on the XLA side
    assert 0.6 < analytic / xla < 1.5, (analytic, xla)


def test_transformer_flops_vs_xla():
    """Cross-check against XLA cost analysis. unroll_layers=True is
    load-bearing: XLA's cost analysis counts a lax.scan body ONCE, not
    trip-count times, so scanned layer stacks undercount ~L× (measured:
    1-layer and 2-layer encoders report the same flops). The same defect
    is why bench MFU must come from the analytic numbers, not XLA."""
    from dataclasses import replace

    from musketeer_tpu.config import ofa_medium
    from musketeer_tpu.models import ofa

    cfg = replace(
        ofa_medium(), dtype="float32", resnet_layers=(1, 1, 1),
        unroll_layers=True,
    )
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    B, S, T = 2, 64, 16
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(4, 50000, (B, S)), jnp.int32)
    prev = jnp.asarray(rng.randint(4, 50000, (B, T)), jnp.int32)

    fn = jax.jit(lambda p, s, t: ofa.forward(p, cfg, s, t, None, None))
    ca = fn.lower(params, src, prev).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla = float(ca.get("flops", 0.0))
    analytic = B * (F.encoder_flops(cfg, S) + F.decoder_flops(cfg, T, S))
    assert xla > 0
    assert 0.7 < analytic / xla < 1.4, (analytic, xla)


def test_bench_joint_batch_builder_cpu():
    """bench.make_joint_batches: 9 reference-envelope tasks + analytic fwd
    FLOPs accumulate (CPU smoke of the bench scaffolding)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dataclasses import replace

    import bench
    from musketeer_tpu.config import ofa_tiny

    cfg = replace(
        ofa_tiny(), embed_dim=64, ffn_dim=128, encoder_layers=1,
        decoder_layers=1, attention_heads=4, resnet_layers=(1, 1, 1),
    )
    batches, fwd = bench.make_joint_batches(cfg, img_size=32, B=1, scale=0.1)
    assert len(batches) == 9
    assert fwd > 0
    assert batches["caption"].patch_images is not None
    assert batches["image_gen"].patch_images is None
    assert batches["vqa_gen"].constraint_masks is not None
