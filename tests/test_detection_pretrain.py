"""Detection builder/task + pretrain infilling builders + encouraging loss."""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.criterions import label_smoothed_ce
from musketeer_tpu.data import DetectionBuilder, TextInfillingBuilder
from musketeer_tpu.tasks.detection import DetectionTask
from musketeer_tpu.tokenization import default_vocab
from tests.test_data import fake_image_b64


def test_detection_builder_targets():
    v = default_vocab()
    b = DetectionBuilder(v, description="base", split="valid", patch_image_size=64)
    ex = b(["1", fake_image_b64(64, 64),
            "5.0,5.0,30.0,30.0,1,dog&&40.0,10.0,60.0,50.0,2,cat"])
    assert ex.conf == 2.0
    toks = [int(t) for t in ex.target_ids]
    bins = [t for t in toks if v.bin_start <= t < v.bin_start + 1000]
    assert len(bins) == 8  # 2 boxes x 4 coords
    text = v.decode_ids([t for t in toks if t < v.bin_start and t != v.eos])
    assert "dog" in text and "cat" in text


def test_detection_parse_boxes():
    v = default_vocab()
    task = DetectionTask(v, description="base", patch_image_size=64)
    b = task.builder("valid")
    ex = b(["1", fake_image_b64(64, 64), "5.0,5.0,30.0,30.0,1,dog"])
    groups = task.parse_boxes(
        ex.target_ids, ex.extras["w_resize_ratio"], ex.extras["h_resize_ratio"]
    )
    assert len(groups) == 1
    box, label = groups[0]
    assert label == "dog"
    np.testing.assert_allclose(box, [5, 5, 30, 30], atol=1.0)


def test_text_infilling_builder():
    v = default_vocab()
    b = TextInfillingBuilder(v, description="base", mask_ratio=0.4, seed=3)
    ex = b(["the quick brown fox jumps over the lazy dog near the river bank"])
    assert v.mask_index in ex.src_ids.tolist()
    assert v.decode_ids(ex.target_ids).startswith("the quick brown")


def test_encouraging_loss_larger_than_ce():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 3, 16), jnp.float32)
    tgt = jnp.asarray(rng.randint(4, 16, (2, 3)), jnp.int32)
    base = label_smoothed_ce(logits, tgt, epsilon=0.1)
    enc = label_smoothed_ce(logits, tgt, epsilon=0.1, encouraging_log_end=0.75)
    # bonus term is -log(1-p) based; total loss strictly larger
    assert float(enc.loss) > float(base.loss)
    assert float(enc.nll_loss) == float(base.nll_loss)
