"""Fused decoder-stack kernel (ops/decode_stack.py) parity vs the XLA
incremental path: multi-step decode_step equivalence including cache
evolution, on the interpreted CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from musketeer_tpu.models import ofa
from tests.test_model import tiny_cfg


def _setup(cfg, B=2, S_src=11, beam=2, max_len=5, seed=0):
    rng = np.random.RandomState(seed)
    params = ofa.init_ofa_params(jax.random.PRNGKey(3), cfg)
    src = rng.randint(4, cfg.vocab_size - 1, (B, S_src)).astype(np.int32)
    src[0, -3:] = cfg.pad  # exercise key padding
    enc = ofa.encode(params, cfg, jnp.asarray(src), None, None)
    return params, enc


@pytest.mark.parametrize("beam", [1, 2])
def test_decode_stack_matches_xla(beam):
    cfg_ref = replace(tiny_cfg(), dtype="float32", use_flash_attention=False)
    cfg_k = replace(cfg_ref, decode_stack_kernel=True)
    B, max_len = 2, 5
    params, enc = _setup(cfg_ref, B=B)

    st_ref = ofa.init_decoder_state(params, cfg_ref, enc, max_len, beam_size=beam)
    st_k = ofa.init_decoder_state(params, cfg_k, enc, max_len, beam_size=beam)
    assert st_k.kernel_pack is not None
    assert st_k.cache["cross_k"].shape[3] % 8 == 0

    rows = B * beam
    rng = np.random.RandomState(7)
    tok = np.full((rows,), cfg_ref.bos, np.int32)
    for step in range(max_len - 1):
        t = jnp.asarray(tok)
        s = jnp.int32(step)
        logits_ref, st_ref = ofa.decode_step(params, cfg_ref, t, s, st_ref)
        logits_k, st_k = ofa.decode_step(params, cfg_k, t, s, st_k)
        np.testing.assert_allclose(
            np.asarray(logits_k), np.asarray(logits_ref),
            rtol=2e-4, atol=2e-4, err_msg=f"step {step}",
        )
        # caches stay in lockstep (the kernel writes k/v via one DUS)
        np.testing.assert_allclose(
            np.asarray(st_k.cache["self_k"]),
            np.asarray(st_ref.cache["self_k"]),
            rtol=2e-4, atol=2e-4,
        )
        tok = rng.randint(4, cfg_ref.vocab_size - 1, (rows,)).astype(np.int32)


def test_decode_stack_beam_search_tokens():
    """End-to-end beam search emits identical tokens with the kernel on."""
    from musketeer_tpu.config import GenerationConfig
    from musketeer_tpu.generation import beam_search

    cfg_ref = replace(tiny_cfg(), dtype="float32", use_flash_attention=False)
    cfg_k = replace(cfg_ref, decode_stack_kernel=True)
    params, enc = _setup(cfg_ref, B=2)
    gen = GenerationConfig(beam_size=2, max_len_b=6, min_len=1)
    toks_ref, scores_ref = beam_search(params, cfg_ref, gen, enc, max_len=6)
    toks_k, scores_k = beam_search(params, cfg_k, gen, enc, max_len=6)
    np.testing.assert_array_equal(np.asarray(toks_k), np.asarray(toks_ref))
    np.testing.assert_allclose(
        np.asarray(scores_k), np.asarray(scores_ref), rtol=1e-4, atol=1e-5
    )
