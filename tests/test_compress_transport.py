"""Compressed host→device batch transport: uint8 images + bit-packed
constraint masks must produce identical losses to the float32/bool path
(train_step.dequantize_batch is the in-step inverse of
musketeer._compress_batch)."""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.config import CriterionConfig
from musketeer_tpu.data.transforms import norm_constants, normalize
from musketeer_tpu.models import ofa
from musketeer_tpu.training.train_step import (
    TaskBatch, dequantize_batch, multitask_loss, task_loss,
)
from tests.test_model import tiny_cfg


def _mk_batches(cfg, uint8=False, seed=0):
    rng = np.random.RandomState(seed)
    B, Ts, Tt, S = 2, 8, 5, 32
    src = rng.randint(4, cfg.vocab_size - 1, (B, Ts)).astype(np.int32)
    tgt = rng.randint(4, cfg.vocab_size - 1, (B, Tt)).astype(np.int32)
    prev = np.roll(tgt, 1, -1)
    prev[:, 0] = cfg.bos
    pixels = rng.randint(0, 256, (B, S, S, 3)).astype(np.uint8)
    cm = rng.rand(B, Tt, cfg.padded_vocab_size) < 0.05
    cm[np.arange(B)[:, None], np.arange(Tt)[None], tgt] = True
    if uint8:
        imgs = jnp.asarray(pixels)
        norm = jnp.asarray(norm_constants(False))
        cms = jnp.asarray(np.packbits(cm, axis=-1, bitorder="little"))
    else:
        imgs = jnp.asarray(normalize(pixels.astype(np.float32) / 255.0, False))
        norm = None
        cms = jnp.asarray(cm)
    return TaskBatch(
        src_tokens=jnp.asarray(src),
        prev_output_tokens=jnp.asarray(prev),
        target=jnp.asarray(tgt),
        patch_images=imgs,
        patch_masks=jnp.ones((B,), bool),
        constraint_masks=cms,
        patch_norm=norm,
    )


def test_dequantize_roundtrip():
    cfg = tiny_cfg()
    a = _mk_batches(cfg, uint8=False)
    b = dequantize_batch(_mk_batches(cfg, uint8=True), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(a.patch_images), np.asarray(b.patch_images),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(a.constraint_masks), np.asarray(b.constraint_masks)
    )
    assert b.patch_norm is None


def test_task_loss_parity():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig(label_smoothing=0.1)
    up = jnp.int32(1)
    la = task_loss(params, cfg, crit, _mk_batches(cfg, uint8=False), None, up)
    lb = task_loss(params, cfg, crit, _mk_batches(cfg, uint8=True), None, up)
    np.testing.assert_allclose(
        float(la.loss), float(lb.loss), rtol=2e-5
    )


def test_multitask_vision_packing_parity():
    """Two uint8 vision tasks with DIFFERENT normalization stats must
    dequantize per-task before the shared-stem concat."""
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig(label_smoothing=0.1)
    up = jnp.int32(1)

    def pair(uint8):
        a = _mk_batches(cfg, uint8=uint8, seed=0)
        b = _mk_batches(cfg, uint8=uint8, seed=1)
        if uint8:
            b = b._replace(patch_norm=jnp.asarray(norm_constants(True)))
        else:
            # same raw pixels, imagenet stats
            rng = np.random.RandomState(1)
            rng.randint(4, cfg.vocab_size - 1, (2, 8))
            rng.randint(4, cfg.vocab_size - 1, (2, 5))
            pixels = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
            b = b._replace(patch_images=jnp.asarray(
                normalize(pixels.astype(np.float32) / 255.0, True)
            ))
        return {"t1": a, "t2": b}

    loss_f, _ = multitask_loss(params, cfg, crit, pair(False), None, up)
    loss_q, _ = multitask_loss(params, cfg, crit, pair(True), None, up)
    np.testing.assert_allclose(float(loss_f), float(loss_q), rtol=2e-5)


def test_loader_compress_roundtrip(tmp_path):
    """MusketeerDataLoader with compress_transport on/off: same step
    tensors after in-step dequantization."""
    from musketeer_tpu.tasks import MusketeerDataLoader, SubTaskSpec
    from musketeer_tpu.tokenization import default_vocab
    from tests.test_data import fake_image_b64

    vocab = default_vocab()
    p = tmp_path / "cap.tsv"
    with open(p, "w") as f:
        for i in range(4):
            f.write(f"{i}\t{fake_image_b64(32, 32)}\ta small toy {i}\n")

    def batches(compress):
        loader = MusketeerDataLoader(
            vocab,
            [SubTaskSpec("caption", str(p), batch_size=2, src_len=16,
                         tgt_len=16,
                         task_kwargs={"patch_image_size": 32})],
            description="base", compress_transport=compress,
        )
        loader.set_epoch(1)
        return next(iter(loader.epoch_iterator()))["caption"]

    raw = batches(False)
    comp = batches(True)
    assert comp.patch_images.dtype == jnp.uint8
    assert comp.patch_norm is not None
    deq = dequantize_batch(
        jax.tree.map(lambda a: a[0], comp), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(raw.patch_images[0]), np.asarray(deq.patch_images),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(raw.src_tokens), np.asarray(comp.src_tokens)
    )


def test_uint8_direct_bitexact_vs_requantize():
    """transport_uint8 builders emit raw resize pixels directly; the
    transport must be BIT-identical to the old f32-normalize →
    _compress_batch rint/clip requantize roundtrip (the requantize is
    exact: pixels start on the uint8 grid), for both plain and imagenet
    normalization stats."""
    from musketeer_tpu.data.task_data import CaptionBuilder, collate
    from musketeer_tpu.tasks.musketeer import _compress_batch
    from musketeer_tpu.tokenization import default_vocab
    from tests.test_data import fake_image_b64

    vocab = default_vocab()
    for imagenet_stats in (False, True):
        rows = [[str(i), fake_image_b64(48, 40), f"a toy {i}"] for i in range(2)]

        def build(direct):
            b = CaptionBuilder(
                vocab, split="train", patch_image_size=32,
                imagenet_stats=imagenet_stats,
            )
            b.transport_uint8 = direct
            batch = collate([b(r) for r in rows], src_len=16, tgt_len=16)
            return _compress_batch(batch, b)

        direct, requant = build(True), build(False)
        assert direct["patch_images"].dtype == np.uint8
        np.testing.assert_array_equal(
            direct["patch_images"], requant["patch_images"]
        )
        np.testing.assert_array_equal(
            direct["patch_norm"], requant["patch_norm"]
        )


def test_loader_compress_float_domain_aug(tmp_path):
    """image_classify's TRAIN pipeline ends in float-domain random erasing
    (gaussian noise in normalized space, OFF the uint8 pixel gamut — the
    inverse affine would CLIP it, measured |err| up to 2.0). The builder
    marks itself uint8_safe=False, so the loader must ship its images as
    float32 untouched while still bit-packing the constraint masks."""
    import numpy as np

    from musketeer_tpu.tasks import MusketeerDataLoader, SubTaskSpec
    from musketeer_tpu.tokenization import default_vocab
    from musketeer_tpu.training.train_step import dequantize_batch
    from tests.test_data import fake_image_b64

    vocab = default_vocab()
    p = tmp_path / "cls.tsv"
    with open(p, "w") as f:
        for i in range(4):
            f.write(f"{i}\t{fake_image_b64(64, 64)}\tabacus\n")

    def batches(compress):
        loader = MusketeerDataLoader(
            vocab,
            [SubTaskSpec("image_classify", str(p), batch_size=2, src_len=16,
                         tgt_len=8,
                         task_kwargs={"patch_image_size": 32,
                                      "answers": ["abacus", "zebra"]})],
            description="base", compress_transport=compress, seed=3,
        )
        loader.set_epoch(1)
        return next(iter(loader.epoch_iterator()))["image_classify"]

    comp = batches(True)
    # the train builder clamps erasing noise to the pixel gamut, so its
    # images DO compress (RandAugment draws from the global random stream,
    # so cross-instantiation equality can't be asserted — the contract is
    # the dtype + the gamut bound)
    assert comp.patch_images.dtype == jnp.uint8
    assert comp.patch_norm is not None
    deq = dequantize_batch(jax.tree.map(lambda a: a[0], comp), jnp.float32)
    from musketeer_tpu.data.transforms import normalize

    lo = normalize(np.zeros((3,), np.float32)) - 1e-4
    hi = normalize(np.ones((3,), np.float32)) + 1e-4
    img = np.asarray(deq.patch_images)
    assert (img >= lo).all() and (img <= hi).all()
    # constraint masks ride bit-packed; unpack restores bool of the
    # padded-vocab width with the target ids allowed
    assert comp.constraint_masks.dtype == jnp.uint8
    cm = np.asarray(deq.constraint_masks)
    tgt = np.asarray(comp.target[0])
    assert cm.shape[-1] == vocab.padded_size
    sup = tgt != vocab.pad
    assert bool(cm[np.arange(2)[:, None], np.arange(tgt.shape[1])[None], tgt][sup].all())
