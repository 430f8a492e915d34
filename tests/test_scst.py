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


def test_scst_full_step():
    """Full SCST update: sample -> CIDEr reward -> policy-gradient step."""
    from musketeer_tpu.config import GenerationConfig, OptimConfig
    from musketeer_tpu.criterions.scst import make_scst_fns, scst_train_step
    from musketeer_tpu.training import init_train_state, make_optimizer
    from musketeer_tpu.tokenization import default_vocab
    from tests.test_data import fake_image_b64
    from musketeer_tpu.data import CaptionBuilder, collate

    vocab = default_vocab()
    cfg = tiny_cfg(vocab_size=59457, padded_vocab_size=59520)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    optim = OptimConfig(lr=1e-4, warmup_updates=1, total_updates=10)
    state = init_train_state(params, optim)
    tx = make_optimizer(optim)
    gen_cfg = GenerationConfig(beam_size=3, max_len_b=6, min_len=1, sampling=True)
    sample_fn, grad_fn = make_scst_fns(cfg, gen_cfg, tx)

    b = CaptionBuilder(vocab, description="base", split="valid", scst=True,
                       patch_image_size=32)
    exs = [b([str(i), fake_image_b64(32, 32), f"a small toy {i}&&toy {i}"])
           for i in range(2)]
    batch = collate(exs, pad_id=vocab.pad, src_len=16, tgt_len=16)
    state2, metrics = scst_train_step(
        state, vocab, sample_fn, grad_fn, batch, jax.random.PRNGKey(7), max_len=6
    )
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["scst_loss"]))
    assert "mean_reward" in metrics

    # with a hand-set nonzero advantage (random models earn ~0 CIDEr so the
    # natural advantage vanishes) the PG step must move the params
    B, K, T = 2, 3, 7
    rngs = np.random.RandomState(0)
    prev = np.full((B, K, T), vocab.pad, np.int32)
    tgt = np.full((B, K, T), vocab.pad, np.int32)
    prev[:, :, 0] = vocab.bos
    prev[:, :, 1:4] = rngs.randint(4, 50000, (B, K, 3))
    tgt[:, :, :3] = prev[:, :, 1:4]
    tgt[:, :, 3] = vocab.eos
    adv = np.ones((B, K), np.float32)
    state3, m2 = grad_fn(
        state2, jnp.asarray(batch["src_tokens"]),
        jnp.asarray(batch["patch_images"], jnp.float32),
        jnp.asarray(batch["patch_masks"]),
        jnp.asarray(prev), jnp.asarray(tgt), jnp.asarray(adv),
    )
    d = jax.tree.leaves(jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), state2.params, state3.params))
    assert max(d) > 0
