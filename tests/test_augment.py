"""Augmentation ops: shape/box invariants."""

import random

import numpy as np
from PIL import Image

from musketeer_tpu.data import (
    RandAugment, horizontal_flip, large_scale_jitter, random_crop,
)


def test_randaugment_preserves_size():
    img = Image.new("RGB", (64, 48), (120, 30, 60))
    aug = RandAugment(n=2, m=9, seed=0)
    for _ in range(10):
        out = aug(img)
        assert out.size == (64, 48)


def test_horizontal_flip_boxes():
    img = Image.new("RGB", (100, 50))
    boxes = np.asarray([[10.0, 5.0, 30.0, 25.0]])
    out, fb = horizontal_flip(img, boxes)
    np.testing.assert_allclose(fb, [[70.0, 5.0, 90.0, 25.0]])
    # double flip = identity
    _, fb2 = horizontal_flip(out, fb)
    np.testing.assert_allclose(fb2, boxes)


def test_random_crop_clips_boxes():
    img = Image.new("RGB", (100, 100))
    boxes = np.asarray([[10.0, 10.0, 90.0, 90.0]])
    rng = random.Random(0)
    out, cb = random_crop(img, boxes, 50, 50, rng)
    assert out.size == (50, 50)
    assert (cb >= 0).all() and (cb <= 50).all()


def test_large_scale_jitter():
    img = Image.new("RGB", (123, 77))
    boxes = np.asarray([[10.0, 10.0, 60.0, 40.0]])
    rng = random.Random(1)
    out, jb = large_scale_jitter(img, boxes, 64, rng=rng)
    assert out.size == (64, 64)
    assert (jb >= 0).all() and (jb <= 64).all()
