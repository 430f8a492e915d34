"""Classification head + vocab-growth surgery."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.models import ofa
from musketeer_tpu.models.heads import (
    classification_forward, grow_vocab, init_classification_head,
)
from tests.test_model import make_batch, tiny_cfg


def test_classification_head_gathers_last_token():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    head = init_classification_head(jax.random.PRNGKey(1), cfg, num_classes=3)
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    prev = jnp.asarray([[0, 7, 8, 1, 1], [0, 7, 8, 9, 10]], jnp.int32)
    feats = ofa.decode(params, cfg, prev, enc, features_only=True)
    logits = classification_forward(head, cfg, feats, prev)
    assert logits.shape == (2, 3)
    # representation is the feature at last non-pad slot: changing a PAD slot
    # of row 0 beyond its length must not change row 0's logits
    feats2 = feats.at[0, 4].set(99.0)
    logits2 = classification_forward(head, cfg, feats2, prev)
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(logits2[0]))
    # but changing the last real slot does
    feats3 = feats.at[0, 2].set(99.0)
    logits3 = classification_forward(head, cfg, feats3, prev)
    assert np.abs(np.asarray(logits[0]) - np.asarray(logits3[0])).max() > 1e-6


def test_grow_vocab_answer_averaging():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    ans = [[10, 11], [12]]
    grown = grow_vocab(params, cfg, 2, answer_token_ids=ans)
    e = np.asarray(params["embed_tokens"])
    g = np.asarray(grown["embed_tokens"])
    assert g.shape[0] % 128 == 0 and g.shape[0] >= cfg.vocab_size + 2
    np.testing.assert_allclose(g[cfg.vocab_size], (e[10] + e[11]) / 2, rtol=1e-6)
    np.testing.assert_allclose(g[cfg.vocab_size + 1], e[12], rtol=1e-6)
    # existing rows untouched
    np.testing.assert_array_equal(g[: cfg.vocab_size], e[: cfg.vocab_size])
    # model still runs with the grown table
    cfg2 = replace(cfg, vocab_size=cfg.vocab_size + 2, padded_vocab_size=g.shape[0])
    src, imgs, masks = make_batch(cfg)
    prev = jnp.full((2, 3), 5, jnp.int32)
    logits = ofa.forward(grown, cfg2, src, prev, imgs, masks)
    assert logits.shape[-1] == g.shape[0]
