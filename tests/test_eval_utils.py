"""Eval primitives: de-binning arithmetic, IoU, allcand scoring, CIDEr-D."""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.models import ofa
from musketeer_tpu.utils import (
    CiderD, box_iou_accuracy, debin_boxes, score_candidates,
)
from tests.test_model import make_batch, tiny_cfg


def test_debin_roundtrip():
    """quantize (data layer) → de-bin (eval) must recover coords within 1 bin."""
    num_bins, max_sz = 1000, 512
    bin_start = 100
    w, h = 640, 480
    patch = 480
    box = np.asarray([100.0, 50.0, 300.0, 400.0])
    w_r, h_r = patch / w, patch / h
    scaled = box * np.asarray([w_r, h_r, w_r, h_r]) / max_sz
    bins = np.round(scaled * (num_bins - 1)).astype(int)
    toks = (bins + bin_start)[None]
    out = debin_boxes(toks, bin_start, num_bins, max_sz, np.asarray([w_r]), np.asarray([h_r]))
    np.testing.assert_allclose(out[0], box, atol=max_sz / (num_bins - 1) / min(w_r, h_r))


def test_iou_accuracy():
    hyps = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    refs = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [0, 0, 10, 10]], np.float64)
    acc = box_iou_accuracy(hyps, refs)
    assert acc.tolist() == [1.0, 0.0, 0.0]  # iou 1.0, ~0.14, 0


def test_allcand_scoring_picks_forced_candidate():
    """Teach-forced scoring must prefer the candidate the logits favor.
    Construct a model-free check by comparing against manual decode calls."""
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    B, C, T = 2, 3, 5
    rng = np.random.RandomState(0)
    prev = rng.randint(4, 100, (B, C, T)).astype(np.int32)
    prev[:, :, 0] = cfg.bos
    target = np.concatenate([prev[:, :, 1:], np.full((B, C, 1), cfg.eos)], -1).astype(np.int32)
    scores = score_candidates(
        params, cfg, enc, jnp.asarray(prev), jnp.asarray(target)
    )
    assert scores.shape == (B, C)
    # manual: candidate (0,0)
    l = ofa.decode(params, cfg, jnp.asarray(prev[0:1, 0]),
                   ofa.EncoderOut(enc.x[:1], enc.padding_mask[:1], enc.pos_embed[:1]))
    lp = jax.nn.log_softmax(l.astype(jnp.float32), -1)
    manual = float(
        jnp.take_along_axis(lp[0], jnp.asarray(target[0, 0])[:, None], axis=1).sum()
    )
    np.testing.assert_allclose(float(scores[0, 0]), manual, rtol=2e-3)


def test_cider_perfect_match():
    cider = CiderD()
    gts = {"1": ["a man riding a horse", "a person on a horse"],
           "2": ["a cat sits on a mat"]}
    res_perfect = {"1": "a man riding a horse", "2": "a cat sits on a mat"}
    res_bad = {"1": "completely unrelated words here", "2": "nothing matches at all"}
    s_good, per_good = cider.compute_score(gts, res_perfect)
    s_bad, _ = cider.compute_score(gts, res_bad)
    assert s_good > s_bad
    assert s_good > 1.0  # perfect matches score high
    assert s_bad < 0.1
    assert per_good["2"] >= per_good["1"] - 5  # sanity on per-image values


def test_cider_length_penalty():
    # ≥2 docs needed: with one document every idf is log(1)=0 by definition
    cider = CiderD()
    gts = {"1": ["a man riding a horse on the beach today"],
           "2": ["two dogs playing in the snowy park outside"]}
    res_short = {"1": "a man", "2": "two dogs playing in the snowy park outside"}
    res_full = {"1": "a man riding a horse on the beach today",
                "2": "two dogs playing in the snowy park outside"}
    s_short, per_short = cider.compute_score(gts, res_short)
    s_full, per_full = cider.compute_score(gts, res_full)
    assert per_full["1"] > per_short["1"]
    assert s_full > s_short


def test_chunked_scoring_matches_full():
    from musketeer_tpu.utils.eval_utils import score_candidates

    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    B, C, T = 2, 7, 5
    rng = np.random.RandomState(4)
    prev = rng.randint(4, 100, (B, C, T)).astype(np.int32)
    prev[:, :, 0] = cfg.bos
    target = np.concatenate(
        [prev[:, :, 1:], np.full((B, C, 1), cfg.eos)], -1
    ).astype(np.int32)
    full = score_candidates(params, cfg, enc, jnp.asarray(prev), jnp.asarray(target))
    chunked = score_candidates(
        params, cfg, enc, jnp.asarray(prev), jnp.asarray(target), chunk_size=3
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=2e-3, atol=2e-3)
