"""SCST: sampling generator, reward computation, policy-gradient step."""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.config import GenerationConfig, OptimConfig
from musketeer_tpu.criterions import compute_rewards, scst_loss
from musketeer_tpu.generation import beam_search
from musketeer_tpu.models import ofa
from tests.test_model import make_batch, tiny_cfg


def test_sampling_generates_diverse_chains():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    gen_cfg = GenerationConfig(beam_size=4, max_len_b=8, min_len=2, sampling=True)
    toks, scores = beam_search(
        params, cfg, gen_cfg, enc, max_len=8, rng=jax.random.PRNGKey(1)
    )
    assert toks.shape[:2] == (2, 4)
    seqs = {tuple(np.asarray(toks[0, k])) for k in range(4)}
    assert len(seqs) > 1, "sampled chains should differ"
    # every finished row ends with eos before padding
    for k in range(4):
        seq = [int(t) for t in np.asarray(toks[0, k]) if t != cfg.pad]
        assert seq[-1] == cfg.eos


def test_sampling_topk():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    gen_cfg = GenerationConfig(
        beam_size=2, max_len_b=6, min_len=1, sampling=True, sampling_topk=3
    )
    toks, _ = beam_search(
        params, cfg, gen_cfg, enc, max_len=6, rng=jax.random.PRNGKey(2)
    )
    assert toks.shape[:2] == (2, 2)


def test_compute_rewards_baseline():
    # two images with distinct refs so idf is non-degenerate
    hyps = [
        ["a man rides a horse", "a dog", "a man rides a horse on beach"],
        ["two cats sleeping", "a man", "two cats sleeping on a sofa"],
    ]
    refs = [
        ["a man rides a horse on the beach"],
        ["two cats sleeping on a sofa"],
    ]
    adv = compute_rewards(hyps, refs)
    assert adv.shape == (2, 3)
    # per-image advantages sum to ~0 with leave-one-out baseline
    np.testing.assert_allclose(adv.sum(axis=1), [0.0, 0.0], atol=1e-4)
    # better hypo gets higher advantage than the bad one
    assert adv[0, 2] > adv[0, 1]
    assert adv[1, 2] > adv[1, 1]


def test_scst_loss_direction():
    """Positive-advantage sequences must be pushed up (loss decreases when
    their probability rises)."""
    V, T = 16, 4
    targets = jnp.asarray([[5, 6, 2, 1]], jnp.int32)
    adv = jnp.asarray([1.0])
    logits_low = jnp.zeros((1, T, V))
    logits_high = jnp.zeros((1, T, V))
    for t, tok in enumerate([5, 6, 2]):
        logits_high = logits_high.at[0, t, tok].set(5.0)
    l_low, n = scst_loss(logits_low, targets, adv)
    l_high, _ = scst_loss(logits_high, targets, adv)
    assert l_high < l_low
    assert int(n) == 3
    # negative advantage flips the direction
    l_low_n, _ = scst_loss(logits_low, targets, -adv)
    l_high_n, _ = scst_loss(logits_high, targets, -adv)
    assert l_high_n > l_low_n
