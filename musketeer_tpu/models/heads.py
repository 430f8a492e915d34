"""Classification heads + checkpoint vocab-growth surgery.

ref: models/ofa/ofa.py — OFAClassificationHead (:320-368; mlp/linear pooler
over the decoder state at the last non-pad position :150-161) and
upgrade_state_dict_named's vocab growth with answer-embedding averaging
(:268-309).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

Params = Dict[str, Any]


def init_classification_head(
    key: jax.Array,
    cfg: ModelConfig,
    num_classes: int,
    inner_dim: Optional[int] = None,
    pooler_classifier: str = "mlp",
    use_two_images: bool = False,
) -> Params:
    from .ofa import _init_linear

    input_dim = cfg.embed_dim * (2 if use_two_images else 1)
    inner_dim = inner_dim or cfg.embed_dim
    ks = jax.random.split(key, 2)
    p: Params = {"pooler_classifier": pooler_classifier}
    if pooler_classifier == "mlp":
        p["dense"] = _init_linear(ks[0], input_dim, inner_dim)
        p["out_proj"] = _init_linear(ks[1], inner_dim, num_classes)
    elif pooler_classifier == "linear":
        p["out_proj"] = _init_linear(ks[1], input_dim, num_classes)
    else:
        raise NotImplementedError(pooler_classifier)
    return p


def classification_forward(
    head: Params,
    cfg: ModelConfig,
    features: jnp.ndarray,  # [B, T, d] decoder features (features_only)
    prev_output_tokens: jnp.ndarray,  # [B, T]
    dropout_rng: Optional[jax.Array] = None,
    pooler_dropout: float = 0.0,
) -> jnp.ndarray:
    """Sentence rep = feature at last non-pad position → head → [B, classes]."""
    from .ofa import _dropout, _linear

    lengths = jnp.sum(prev_output_tokens != cfg.pad, axis=1)
    idx = jnp.maximum(lengths - 1, 0)
    rep = jnp.take_along_axis(features, idx[:, None, None], axis=1)[:, 0]
    det = dropout_rng is None
    if head["pooler_classifier"] == "mlp":
        x = _dropout(rep, pooler_dropout, dropout_rng, det)
        x = jnp.tanh(_linear(head["dense"], x))
        x = _dropout(x, pooler_dropout, dropout_rng, det)
        return _linear(head["out_proj"], x)
    x = _dropout(rep, pooler_dropout, dropout_rng, det)
    return _linear(head["out_proj"], x)


def grow_vocab(
    params: Params,
    cfg: ModelConfig,
    n_new: int,
    answer_token_ids: Optional[Sequence[Sequence[int]]] = None,
    key: Optional[jax.Array] = None,
) -> Params:
    """Append rows to the tied embedding for new symbols.

    With ``answer_token_ids`` (one token-id list per new symbol) the new rows
    are the mean of the constituent-token embeddings — the reference's answer-
    embedding averaging for vocab-as-classifier finetunes (ofa.py:290-296).
    Rows land just before the layout-padding region, preserving a 128-multiple
    table. Returns a new params pytree; cfg must be updated by the caller
    (vocab_size += n_new).
    """
    embed = np.asarray(params["embed_tokens"])
    V, d = embed.shape
    new_rows = np.zeros((n_new, d), np.float32)
    if answer_token_ids is not None:
        assert len(answer_token_ids) == n_new
        for i, ids in enumerate(answer_token_ids):
            new_rows[i] = embed[np.asarray(ids)].mean(axis=0)
    else:
        rng = np.random.RandomState(0) if key is None else None
        if rng is not None:
            new_rows = rng.normal(0, d**-0.5, (n_new, d)).astype(np.float32)
        else:
            new_rows = np.asarray(
                jax.random.normal(key, (n_new, d)) * d**-0.5, np.float32
            )
    old_real = cfg.vocab_size
    grown = np.concatenate([embed[:old_real], new_rows], axis=0)
    new_padded = -(-(old_real + n_new) // 128) * 128
    if grown.shape[0] < new_padded:
        grown = np.concatenate(
            [grown, np.zeros((new_padded - grown.shape[0], d), np.float32)]
        )
    out = dict(params)
    out["embed_tokens"] = jnp.asarray(grown)
    return out
