"""Detection builder/task + pretrain infilling builders + encouraging loss."""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.criterions import label_smoothed_ce
from musketeer_tpu.data import (
    DetectionBuilder, ImageTextMatchingBuilder, PureImageBuilder,
    TextInfillingBuilder, VisualGroundingBuilder,
)
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


def test_match_detections_greedy_label_iou():
    from musketeer_tpu.utils.eval_utils import match_detections

    gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float64)
    gl = ["dog", "cat"]
    # one exact hit, one label mismatch, one low-IoU same-label miss
    pred = np.asarray(
        [[0, 0, 10, 10], [20, 20, 40, 40], [100, 100, 110, 110]], np.float64
    )
    pl = ["dog", "dog", "cat"]
    tp, npred, ngt = match_detections(pred, pl, gt, gl)
    assert (tp, npred, ngt) == (1, 3, 2)
    # each gt claimable at most once
    tp2, _, _ = match_detections(
        np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], np.float64),
        ["dog", "dog"], gt, gl,
    )
    assert tp2 == 1
    # empty prediction set
    tp3, np3, ng3 = match_detections(
        np.zeros((0, 4)), [], gt, gl
    )
    assert (tp3, np3, ng3) == (0, 0, 2)


def test_detection_evaluate_end_to_end():
    """Tiny model: evaluate returns loss + f1 metrics over a 2-row set."""
    from musketeer_tpu.models import ofa
    from tests.test_model import tiny_cfg

    v = default_vocab()
    cfg = tiny_cfg(vocab_size=59457, padded_vocab_size=59520)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    task = DetectionTask(v, description="base", patch_image_size=32)
    rows = [
        ["1", fake_image_b64(64, 64), "5.0,5.0,30.0,30.0,1,dog"],
        ["2", fake_image_b64(64, 64), "10.0,10.0,50.0,50.0,2,cat"],
    ]
    out = task.evaluate(params, cfg, rows, batch_size=2)
    assert np.isfinite(out["loss"]) and out["n"] == 2
    assert 0.0 <= out["f1@0.5"] <= 1.0
    assert 0.0 <= out["precision"] <= 1.0 and 0.0 <= out["recall"] <= 1.0


def test_text_infilling_builder():
    v = default_vocab()
    b = TextInfillingBuilder(v, description="base", mask_ratio=0.4, seed=3)
    ex = b(["the quick brown fox jumps over the lazy dog near the river bank"])
    assert v.mask_index in ex.src_ids.tolist()
    assert v.decode_ids(ex.target_ids).startswith("the quick brown")


def test_pure_image_builder():
    v = default_vocab()
    b = PureImageBuilder(v, description="base", code_image_size=16)
    codes = " ".join(str(i * 7 % 8192) for i in range(16))
    ex = b(["img1", fake_image_b64(64, 64), codes])
    assert ex.code_mask and ex.conf == 2.0 and ex.patch_mask
    S = 32  # 2 * code_image_size
    assert ex.patch_image.shape == (S, S, 3)
    # central square zeroed, corners untouched
    assert np.all(ex.patch_image[S // 4 : 3 * S // 4, S // 4 : 3 * S // 4] == 0)
    assert np.any(ex.patch_image[0, 0] != 0)
    # targets are code tokens (code range), ending with eos
    assert all(v.code_start <= t < v.bin_start for t in ex.target_ids[:-1])
    assert ex.target_ids[-1] == v.eos
    assert int(ex.target_ids[0]) == v.code_token(0)


def test_visual_grounding_builder_modes():
    v = default_vocab()
    kw = dict(description="base", patch_image_size=64, split="train")
    g = VisualGroundingBuilder(v, mode="grounding", **kw)
    ex = g(["1", fake_image_b64(64, 64), "a red thing", "5.0,5.0,30.0,30.0"])
    bins = [t for t in ex.target_ids if v.bin_start <= t < v.bin_start + 1000]
    assert len(bins) == 4
    assert "red thing" in v.decode_ids(ex.src_ids)

    rc = VisualGroundingBuilder(v, mode="region_caption", **kw)
    ex2 = rc(["1", fake_image_b64(64, 64), "a red thing", "5.0,5.0,30.0,30.0"])
    src_bins = [t for t in ex2.src_ids if v.bin_start <= t < v.bin_start + 1000]
    assert src_bins == bins  # same region, now in the source
    assert "red thing" in v.decode_ids(ex2.target_ids[:-1])


def test_image_text_matching_builder():
    v = default_vocab()
    yes = v.encode_text(" yes")[0]
    no = v.encode_text(" no")[0]
    img = fake_image_b64(64, 64)
    # all-negative and all-positive mixes
    bn = ImageTextMatchingBuilder(
        v, description="base", patch_image_size=64, p_negative=1.0, seed=1
    )
    ex = bn(["1", img, "a dog on a chair", "dog"])
    assert int(ex.target_ids[0]) == no
    assert "does the image describe" in v.decode_ids(ex.src_ids)
    assert "a dog on a chair" != v.decode_ids(ex.src_ids)  # caption perturbed
    bp = ImageTextMatchingBuilder(
        v, description="base", patch_image_size=64, p_negative=0.0
    )
    ex2 = bp(["1", img, "a dog on a chair", "dog"])
    assert int(ex2.target_ids[0]) == yes
    assert "a dog on a chair" in v.decode_ids(ex2.src_ids)
    # valid split never perturbs
    bv = ImageTextMatchingBuilder(
        v, description="base", patch_image_size=64, p_negative=1.0, split="valid"
    )
    assert int(bv(["1", img, "a dog", "dog"]).target_ids[0]) == yes


def test_encouraging_loss_smaller_than_ce():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 3, 16), jnp.float32)
    tgt = jnp.asarray(rng.randint(4, 16, (2, 3)), jnp.int32)
    base = label_smoothed_ce(logits, tgt, epsilon=0.1)
    enc = label_smoothed_ce(logits, tgt, epsilon=0.1, encouraging_log_end=0.75)
    # ref (label_smoothed_encouraging_loss.py:306-314): c_loss =
    # F.nll_loss(-bonus, tgt) = log(1-p_t) < 0 — a confidence BONUS, so the
    # encouraging total is strictly smaller than plain smoothed CE.
    assert float(enc.loss) < float(base.loss)
    assert float(enc.nll_loss) == float(base.nll_loss)


def test_encouraging_loss_torch_parity():
    """Bonus term matches a plain-torch restatement of the reference
    formula (label_smoothed_encouraging_loss.py:297-314)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    B, T, V = 2, 4, 16
    eps, log_end = 0.1, 0.75
    logits_np = rng.randn(B, T, V).astype(np.float32)
    tgt_np = rng.randint(4, V, (B, T)).astype(np.int64)

    base = label_smoothed_ce(jnp.asarray(logits_np), jnp.asarray(tgt_np), epsilon=eps)
    enc = label_smoothed_ce(
        jnp.asarray(logits_np), jnp.asarray(tgt_np), epsilon=eps,
        encouraging_log_end=log_end,
    )
    got_c_loss = float(enc.loss) - float(base.loss)

    lprobs = F.log_softmax(torch.from_numpy(logits_np).view(-1, V), dim=-1)
    target = torch.from_numpy(tgt_np).view(-1)
    probs = torch.exp(lprobs)
    bonus = torch.log(torch.clamp(1.0 - probs, min=1e-5))
    y_log_end = torch.log(torch.ones_like(probs) - log_end)
    bonus_lin = 1 / (log_end - torch.ones_like(probs)) * (probs - log_end) + y_log_end
    bonus = torch.where(probs > log_end, bonus_lin, bonus)
    c_loss = F.nll_loss(-bonus, target, reduction="sum")
    c_loss = c_loss * (1 - eps) + (eps / V) * bonus.sum()
    assert float(c_loss) < 0  # it is a bonus
    np.testing.assert_allclose(got_c_loss, float(c_loss), rtol=1e-4, atol=1e-4)


def test_drop_best_keeps_hardest():
    """drop_best keeps the largest-loss fraction (ref: encouraging loss
    :129-132); gated by drop_best_active; composes with drop_worst."""
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 6, 16), jnp.float32)
    tgt = jnp.asarray(rng.randint(4, 16, (2, 6)), jnp.int32)

    base = label_smoothed_ce(logits, tgt, epsilon=0.1)
    db = label_smoothed_ce(logits, tgt, epsilon=0.1, drop_best_ratio=0.5)
    assert int(db.ntokens) == int(base.ntokens) // 2
    # kept positions are the hardest → mean kept loss above overall mean
    assert float(db.loss) / float(db.ntokens) > float(base.loss) / float(base.ntokens)
    # equivalently: dropping best keeps MORE loss than dropping worst
    dw = label_smoothed_ce(logits, tgt, epsilon=0.1, drop_worst_ratio=0.5)
    assert float(db.loss) > float(dw.loss)

    # inactive gate = plain CE
    off = label_smoothed_ce(
        logits, tgt, epsilon=0.1, drop_best_ratio=0.5,
        drop_best_active=jnp.asarray(False),
    )
    assert float(off.loss) == float(base.loss)

    # composition: drop worst half, then best half of the rest → 1/4 kept
    both = label_smoothed_ce(
        logits, tgt, epsilon=0.1, drop_worst_ratio=0.5, drop_best_ratio=0.5
    )
    assert int(both.ntokens) == int(base.ntokens) // 4


def test_criterion_config_wires_drop_best_and_encouraging():
    from musketeer_tpu.config import CriterionConfig, ofa_tiny
    from musketeer_tpu.training.train_step import TaskBatch, task_loss
    from musketeer_tpu.models import ofa
    from dataclasses import replace

    cfg = replace(
        ofa_tiny(), embed_dim=32, ffn_dim=64, encoder_layers=1,
        decoder_layers=1, attention_heads=4, vocab_size=64,
        padded_vocab_size=64, resnet_layers=(1, 1, 1), dtype="float32",
    )
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = TaskBatch(
        src_tokens=jnp.asarray(rng.randint(4, 60, (2, 6)), jnp.int32),
        prev_output_tokens=jnp.asarray(rng.randint(4, 60, (2, 4)), jnp.int32),
        target=jnp.asarray(rng.randint(4, 60, (2, 4)), jnp.int32),
    )
    u = jnp.asarray(5, jnp.int32)
    plain = task_loss(params, cfg, CriterionConfig(), batch, None, u)
    el = task_loss(
        params, cfg,
        CriterionConfig(encouraging_log_end=0.75, drop_best_ratio=0.5),
        batch, None, u,
    )
    assert int(el.ntokens) == int(plain.ntokens) // 2
    assert np.isfinite(float(el.loss))
