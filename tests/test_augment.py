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


def test_resize_shortest_side_boxes():
    from musketeer_tpu.data.augment import resize_shortest_side

    img = Image.new("RGB", (200, 100))
    boxes = np.asarray([[20.0, 10.0, 100.0, 50.0]])
    out, rb = resize_shortest_side(img, boxes, 50)
    assert out.size == (100, 50)  # shortest side → 50, aspect kept
    np.testing.assert_allclose(rb, [[10.0, 5.0, 50.0, 25.0]])
    # max_size caps each dim independently (ref transforms.py:95-118)
    out2, _ = resize_shortest_side(img, boxes, 50, max_size=80)
    assert out2.size == (80, 50)


def test_object_center_crop_keeps_target():
    from musketeer_tpu.data.augment import object_center_crop

    img = Image.new("RGB", (200, 200))
    # box in the corner: window shifts to stay inside the image
    boxes = np.asarray([[170.0, 170.0, 190.0, 190.0]])
    out, cb = object_center_crop(img, boxes, 100, 100)
    assert out.size == (100, 100)
    # box fully inside the window, area preserved
    assert (cb >= 0).all() and (cb <= 100).all()
    w = cb[0, 2] - cb[0, 0]
    h = cb[0, 3] - cb[0, 1]
    np.testing.assert_allclose([w, h], [20.0, 20.0])


def test_detection_builder_train_flip_consistency():
    """Flipped target bins must land on the flipped box (pixel-content and
    box stay aligned through the train-time flip)."""
    from musketeer_tpu.data import DetectionBuilder
    from musketeer_tpu.tokenization import default_vocab
    from musketeer_tpu.utils.eval_utils import debin_boxes
    from tests.test_data import fake_image_b64

    v = default_vocab()
    row = ["1", fake_image_b64(64, 64), "4.0,8.0,20.0,28.0,1,dog"]
    # find seeds on both sides of the flip coin
    got = {}
    for seed in range(12):
        b = DetectionBuilder(
            v, description="base", split="train", patch_image_size=64, seed=seed
        )
        flip = b.rng.rand() < 0.5  # consumes the same draw the builder will
        b = DetectionBuilder(
            v, description="base", split="train", patch_image_size=64, seed=seed
        )
        ex = b(row)
        quad = [int(t) - v.bin_start for t in ex.target_ids[:4]]
        box = debin_boxes(
            np.asarray([[q + v.bin_start for q in quad]]), v.bin_start,
            v.num_bins, 512,
            np.asarray([ex.extras["w_resize_ratio"]]),
            np.asarray([ex.extras["h_resize_ratio"]]),
        )[0]
        got[flip] = box
        if len(got) == 2:
            break
    assert set(got) == {True, False}
    np.testing.assert_allclose(got[False], [4, 8, 20, 28], atol=1.0)
    np.testing.assert_allclose(got[True], [64 - 20, 8, 64 - 4, 28], atol=1.0)


def test_visual_grounding_builder_train_transform():
    """Train path: object-center crop keeps the box inside the patch and the
    bins decode to a box of (approximately) preserved size."""
    from musketeer_tpu.data import VisualGroundingBuilder
    from musketeer_tpu.tokenization import default_vocab
    from tests.test_data import fake_image_b64

    v = default_vocab()
    b = VisualGroundingBuilder(
        v, description="base", split="train", patch_image_size=64, seed=3
    )
    ex = b(["1", fake_image_b64(128, 96), "a thing", "30.0,20.0,70.0,60.0"])
    assert ex.patch_image.shape == (64, 64, 3)
    quad = np.asarray([int(t) - v.bin_start for t in ex.target_ids[:4]])
    assert ((0 <= quad) & (quad < v.num_bins)).all()
    box = quad / (v.num_bins - 1) * 512  # crop-frame pixels
    assert box[2] > box[0] and box[3] > box[1]
    assert (box <= 64 + 1).all()  # inside the 64px crop window


def test_large_scale_jitter():
    img = Image.new("RGB", (123, 77))
    boxes = np.asarray([[10.0, 10.0, 60.0, 40.0]])
    rng = random.Random(1)
    out, jb = large_scale_jitter(img, boxes, 64, rng=rng)
    assert out.size == (64, 64)
    assert (jb >= 0).all() and (jb <= 64).all()


def test_image_classify_train_randaug_pipeline():
    """Train split runs RandomResizedCrop→flip→jitter→RandAug→erasing (ref
    image_classify_dataset.py:68-90); eval stays the deterministic resize,
    and both emit the same (S, S, 3) patch shape."""
    from musketeer_tpu.data.task_data import ImageClassifyBuilder
    from musketeer_tpu.tokenization import default_vocab
    from tests.test_data import fake_image_b64

    v = default_vocab()
    random.seed(0)
    row = ["7", fake_image_b64(96, 80), "tiger"]
    train_b = ImageClassifyBuilder(
        v, split="train", patch_image_size=32, seed=3
    )
    eval_b = ImageClassifyBuilder(v, split="valid", patch_image_size=32)
    ex_t = train_b(row)
    ex_e = eval_b(row)
    assert ex_t.patch_image.shape == ex_e.patch_image.shape == (32, 32, 3)
    # stochastic train path ≠ deterministic eval path
    assert not np.allclose(ex_t.patch_image, ex_e.patch_image)
    # train draws differ call to call
    ex_t2 = train_b(row)
    assert not np.allclose(ex_t.patch_image, ex_t2.patch_image)
    # eval is deterministic
    np.testing.assert_allclose(ex_e.patch_image, eval_b(row).patch_image)


def test_ofa_randaug_op_list_matches_reference():
    """OFA_RANDAUG_OPS must be exactly the reference's requested aug list,
    in order (ref: image_classify_dataset.py:85-87, unify_dataset.py:211)."""
    from musketeer_tpu.data.augment import OFA_RANDAUG_OPS

    names = [op.__name__.lstrip("_") for op in OFA_RANDAUG_OPS]
    assert names == [
        "identity", "autocontrast", "equalize", "brightness", "sharpness",
        "shear_x", "shear_y", "translate_x", "translate_y", "rotate",
    ]


def test_image_text_pair_train_transform():
    """Pretrain pair builder: train = RandomResize+CenterCrop+RandAug (ref
    unify_dataset.py:208-214), eval = square resize; same output shape."""
    from musketeer_tpu.data.pretrain import ImageTextPairBuilder
    from musketeer_tpu.tokenization import default_vocab
    from tests.test_data import fake_image_b64

    v = default_vocab()
    random.seed(0)
    row = ["3", fake_image_b64(100, 60), "a dog on grass"]
    train_b = ImageTextPairBuilder(v, split="train", patch_image_size=32, seed=5)
    eval_b = ImageTextPairBuilder(v, split="valid", patch_image_size=32)
    ex_t = train_b(row)
    ex_e = eval_b(row)
    assert ex_t.patch_image.shape == ex_e.patch_image.shape == (32, 32, 3)
    assert not np.allclose(ex_t.patch_image, ex_e.patch_image)


def test_random_resized_crop_and_erasing():
    from musketeer_tpu.data.augment import random_erasing, random_resized_crop

    img = Image.new("RGB", (90, 70), (10, 200, 30))
    rng = random.Random(0)
    out = random_resized_crop(img, 48, rng=rng)
    assert out.size == (48, 48)
    arr = np.zeros((40, 40, 3), np.float32)
    erased = random_erasing(arr, p=1.0, rng=random.Random(1))
    assert erased.shape == arr.shape
    assert np.abs(erased).sum() > 0  # some pixels replaced with gaussians
    # p=0 never erases
    np.testing.assert_array_equal(random_erasing(arr, p=0.0, rng=random.Random(1)), arr)
