"""Checkpoint converter round-trip: params → torch state dict → params.

Without the actual reference checkpoint in the image, the strongest check is
a bijection test: export_state_dict followed by convert_state_dict must be
the identity on every leaf, and the exported names must match the fairseq
naming scheme (spot-checked)."""

import jax
import numpy as np
import pytest

from musketeer_tpu.convert import convert_state_dict, export_state_dict
from musketeer_tpu.models import ofa
from tests.test_model import tiny_cfg


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if v is None:
            continue
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}."))
        else:
            out[f"{prefix}{k}"] = np.asarray(v)
    return out


def test_roundtrip():
    cfg = tiny_cfg(scale_attn=False)
    params = ofa.init_ofa_params(jax.random.PRNGKey(1), cfg)
    sd = export_state_dict(params, cfg)
    # fairseq naming spot checks (ref: unify_transformer.py parameter names)
    for name in [
        "encoder.embed_tokens.weight",
        "decoder.output_projection.weight",
        "encoder.layers.0.self_attn.k_proj.weight",
        "decoder.layers.1.encoder_attn.out_proj.bias",
        "encoder.embed_images.layer1.0.downsample.0.weight",
        "encoder.token_rel_pos_table_list.0.weight",
        "decoder.cross_pos_q_linear.weight",
        "decoder.code_layernorm_embedding.weight",
    ]:
        assert name in sd, name
    assert sd["encoder.embed_tokens.weight"].shape[0] == cfg.vocab_size

    params2, cfg2 = convert_state_dict(sd, cfg)
    f1, f2 = _flatten(params), _flatten(params2)
    assert set(f1) == set(f2), set(f1) ^ set(f2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=1e-6, atol=1e-7, err_msg=k)


def test_roundtrip_forward_identical():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(2), cfg)
    sd = export_state_dict(params, cfg)
    params2, _ = convert_state_dict(sd, cfg)

    from tests.test_model import make_batch
    import jax.numpy as jnp

    src, imgs, masks = make_batch(cfg)
    prev = jnp.full((2, 4), 7, jnp.int32)
    l1 = ofa.forward(params, cfg, src, prev, imgs, masks)
    l2 = ofa.forward(jax.tree.map(jnp.asarray, params2), cfg, src, prev, imgs, masks)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
