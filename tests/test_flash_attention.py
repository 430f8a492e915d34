"""Pallas attention kernel vs XLA reference, and flash model path parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from musketeer_tpu.models import ofa
from musketeer_tpu.ops import (
    attention_reference, flash_attention_bias, flash_cross_attention,
)
from tests.test_model import make_batch, tiny_cfg


def _rand(shape, seed, scale=0.1):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape) * scale, jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_kernel_matches_reference(causal):
    B, H, S, D = 2, 4, 200, 64
    q, k, v = _rand((B, H, S, D), 0), _rand((B, H, S, D), 1), _rand((B, H, S, D), 2, 1.0)
    pq, pk = _rand((B, H, S, D), 3), _rand((B, H, S, D), 4)
    rel = _rand((H, S, S), 5)
    kpad = jnp.zeros((B, S), bool).at[0, -30:].set(True)
    ref = attention_reference(q, k, v, pq, pk, rel, kpad, causal=causal)
    out = flash_attention_bias(q, k, v, pq, pk, rel, kpad, causal=causal)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_cross_kernel_matches_reference():
    B, H, T, S, D = 2, 4, 48, 200, 64
    q, pq = _rand((B, H, T, D), 0), _rand((B, H, T, D), 1)
    k, v, pk = _rand((B, H, S, D), 2), _rand((B, H, S, D), 3, 1.0), _rand((B, H, S, D), 4)
    kpad = jnp.zeros((B, S), bool).at[1, -50:].set(True)
    rel0 = jnp.zeros((H, 1, 1))
    # reference with zero rel, shapes differ (T vs S) → manual
    w = jnp.einsum("bhqd,bhkd->bhqk", q, k) + jnp.einsum("bhqd,bhkd->bhqk", pq, pk)
    w = jnp.where(kpad[:, None, None, :], -1e9, w)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(w, -1), v)
    out = flash_cross_attention(q, k, v, pq, pk, kpad)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_model_flash_parity():
    """Full model forward: use_flash_attention=True must match naive path."""
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg)
    prev = jnp.asarray(np.random.RandomState(9).randint(4, 100, (2, 6)), jnp.int32)

    logits_naive = ofa.forward(params, cfg, src, prev, imgs, masks)
    cfg_f = replace(cfg, use_flash_attention=True)
    logits_flash = ofa.forward(params, cfg_f, src, prev, imgs, masks)
    np.testing.assert_allclose(
        np.asarray(logits_naive[..., : cfg.vocab_size]),
        np.asarray(logits_flash[..., : cfg.vocab_size]),
        rtol=2e-4, atol=2e-4,
    )


def test_model_flash_parity_text_only():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, _, _ = make_batch(cfg)
    prev = jnp.asarray(np.random.RandomState(9).randint(4, 100, (2, 6)), jnp.int32)
    l1 = ofa.forward(params, cfg, src, prev)
    from dataclasses import replace as rp

    l2 = ofa.forward(params, rp(cfg, use_flash_attention=True), src, prev)
    np.testing.assert_allclose(
        np.asarray(l1[..., : cfg.vocab_size]),
        np.asarray(l2[..., : cfg.vocab_size]),
        rtol=2e-4, atol=2e-4,
    )


def test_model_flash_grads_match_naive():
    """Training gradients through the Pallas VJP must match the XLA path."""
    from dataclasses import replace as rp

    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg)
    prev = jnp.asarray(np.random.RandomState(9).randint(4, 100, (2, 6)), jnp.int32)
    tgt = jnp.roll(prev, -1, axis=1).at[:, -1].set(cfg.eos)

    def loss(params, cfg):
        logits = ofa.forward(params, cfg, src, prev, imgs, masks)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32)[..., : cfg.vocab_size])
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    from jax.flatten_util import ravel_pytree

    g1 = jax.grad(loss)(params, cfg)
    g2 = jax.grad(loss)(params, rp(cfg, use_flash_attention=True))
    flat1, _ = ravel_pytree(g1)
    flat2, _ = ravel_pytree(g2)
    scale = float(jnp.abs(flat1).max())
    assert float(jnp.abs(flat1 - flat2).max()) < 5e-4 * max(scale, 1.0), (
        float(jnp.abs(flat1 - flat2).max()), scale
    )


@pytest.mark.parametrize("B,skip_max", [(3, True), (5, False)])
def test_vjp_odd_batch_pad_rows(B, skip_max):
    """Odd batch sizes make the forward's batch pad (block_b=4) differ from
    the backward's (block_b=2): the bwd now REUSES the forward's padded
    rows via the saved residuals instead of re-padding. Those reused rows
    are fully kpad-masked; under skip_max they would be 0/0=NaN without
    the denom floor. Gradients must stay finite and match the XLA path."""
    from musketeer_tpu.ops.flash_attention_bwd import (
        flash_attention_bias_trainable,
    )

    rng = np.random.RandomState(B)
    H, S, D = 4, 130, 64
    mk = lambda sh: jnp.asarray(rng.randn(*sh) * 0.3, jnp.float32)
    q, k, v = mk((B, H, S, D)), mk((B, H, S, D)), mk((B, H, S, D))
    pq, pk = mk((B, H, S, D)), mk((B, H, S, D))
    rel = mk((H, S, S))
    kpad = jnp.zeros((B, S), bool).at[0, -11:].set(True)
    r = mk((B, H, S, D))  # random cotangent

    def f(q_, k_, v_):
        o = flash_attention_bias_trainable(
            q_, k_, v_, pq, pk, rel, kpad, False, 128, False, True, skip_max
        )
        return jnp.sum(o * r)

    def f_ref(q_, k_, v_):
        o = attention_reference(q_, k_, v_, pq, pk, rel, kpad)
        return jnp.sum(o * r)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        assert bool(jnp.all(jnp.isfinite(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_skip_max_subtract_numerics():
    """Gated fast softmax (no max-subtract): outputs must match the safe
    kernel to bf16 tolerance on REAL-SCALE activations (logit magnitudes
    like OFA's scaled q·k + rel bias, tens not hundreds)."""
    from musketeer_tpu.ops.flash_attention_bwd import (
        flash_attention_bias_trainable,
    )

    rng = np.random.RandomState(0)
    B, H, S, D = 2, 4, 160, 64
    # scale so logits land in the realistic ±30 band
    mk = lambda: jnp.asarray(rng.randn(B, H, S, D) * 0.6, jnp.float32)
    q, k, v, pq, pk = mk(), mk(), mk(), mk(), mk()
    rel = jnp.asarray(rng.randn(H, S, S) * 2.0, jnp.float32)
    kpad = jnp.zeros((B, S), bool).at[:, -7:].set(True)

    for causal in (False, True):
        safe = flash_attention_bias_trainable(
            q, k, v, pq, pk, rel, kpad, causal, 128, False, True, False
        )
        fast = flash_attention_bias_trainable(
            q, k, v, pq, pk, rel, kpad, causal, 128, False, True, True
        )
        err = float(jnp.max(jnp.abs(safe - fast)))
        assert err <= 1e-2, err  # bf16-class drift bound (VERDICT r2 gate)
        # gradients flow identically (bwd is skip_max-agnostic)
        g_safe = jax.grad(
            lambda q_: flash_attention_bias_trainable(
                q_, k, v, pq, pk, rel, kpad, causal, 128, False, True, False
            ).sum()
        )(q)
        g_fast = jax.grad(
            lambda q_: flash_attention_bias_trainable(
                q_, k, v, pq, pk, rel, kpad, causal, 128, False, True, True
            ).sum()
        )(q)
        np.testing.assert_allclose(
            np.asarray(g_safe), np.asarray(g_fast), atol=1e-2
        )


def test_bwd_lse_recompute_matches_streamed():
    """stream_lse=False (in-kernel normalizer recompute; measured-negative
    probe path, see flash_attention_bwd.BWD_STREAM_LSE) must produce the
    same gradients as the default streamed-lse path — including zero
    contributions from fully-masked batch-pad rows (B=3 pads to block_b)."""
    import musketeer_tpu.ops.flash_attention_bwd as fab

    rng = np.random.RandomState(7)
    B, H, S, D = 3, 4, 130, 64
    mk = lambda sh: jnp.asarray(rng.randn(*sh) * 0.3, jnp.float32)
    q, k, v = mk((B, H, S, D)), mk((B, H, S, D)), mk((B, H, S, D))
    pq, pk = mk((B, H, S, D)), mk((B, H, S, D))
    rel = mk((H, S, S))
    kpad = jnp.zeros((B, S), bool).at[0, -11:].set(True)
    r = mk((B, H, S, D))

    def f(q_, k_, v_):
        o = fab.flash_attention_bias_trainable(
            q_, k_, v_, pq, pk, rel, kpad, False, 128, False, True, False
        )
        return jnp.sum(o * r)

    g_stream = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    fab.BWD_STREAM_LSE = False
    try:
        g_rec = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    finally:
        fab.BWD_STREAM_LSE = True
    for a, b in zip(g_rec, g_stream):
        assert bool(jnp.all(jnp.isfinite(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("causal,has_rel", [(False, True), (True, True), (False, False)])
def test_inference_kernel_unpacked_matches_reference(causal, has_rel):
    """The unpacked/unpadded inference kernel (ops/flash_attention_infer.py
    — the custom_vjp PRIMAL) must match the XLA reference at shapes that
    are NOT tile multiples (odd B for the batch-chunk fallback, odd T/S for
    Mosaic partial tiles), with and without the rel stream."""
    from musketeer_tpu.ops.flash_attention_infer import flash_attention_inference

    B, H, T, D = 3, 4, 147, 64
    S = T if causal else 210
    q, pq = _rand((B, H, T, D), 0), _rand((B, H, T, D), 1)
    k, v = _rand((B, H, S, D), 2), _rand((B, H, S, D), 3, 1.0)
    pk = _rand((B, H, S, D), 4)
    rel = _rand((H, T, S), 5) if has_rel else None
    kpad = jnp.zeros((B, S), bool).at[0, -17:].set(True)
    out = flash_attention_inference(
        q, k, v, pq, pk, rel, kpad, causal=causal, block_q=128
    )
    if causal:
        ref = attention_reference(q, k, v, pq, pk, rel, kpad, causal=True)
    else:
        w = jnp.einsum("bhqd,bhkd->bhqk", q, k) + jnp.einsum(
            "bhqd,bhkd->bhqk", pq, pk
        )
        if rel is not None:
            w = w + rel[None]
        w = jnp.where(kpad[:, None, None, :], -1e9, w)
        ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(w, axis=-1), v)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)
