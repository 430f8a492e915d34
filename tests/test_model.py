"""Model-core invariants: shapes, masking, incremental-vs-full decode parity.

The strongest correctness check available without the reference checkpoint:
the incremental KV-cache decode path must produce bit-close logits to the
teacher-forced full forward (they share no code path for attention state).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musketeer_tpu.config import ModelConfig, ofa_tiny
from musketeer_tpu.models import ofa


def tiny_cfg(**kw) -> ModelConfig:
    from dataclasses import replace

    base = replace(
        ofa_tiny(),
        embed_dim=64,
        ffn_dim=128,
        encoder_layers=2,
        decoder_layers=2,
        attention_heads=4,
        vocab_size=200,
        padded_vocab_size=256,
        resnet_layers=(1, 1, 1),
        dtype="float32",
    )
    return replace(base, **kw)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_batch(cfg, B=2, T=8, img=32, seed=0):
    rng = np.random.RandomState(seed)
    src = rng.randint(4, cfg.vocab_size - 1, (B, T)).astype(np.int32)
    src[:, -1] = cfg.eos
    src[0, T - 3 :] = [cfg.eos, cfg.pad, cfg.pad]  # ragged lengths
    imgs = rng.randn(B, img, img, 3).astype(np.float32)
    masks = np.ones((B,), bool)
    return jnp.asarray(src), jnp.asarray(imgs), jnp.asarray(masks)


def test_encoder_shapes(tiny):
    cfg, params = tiny
    src, imgs, masks = make_batch(cfg)
    out = ofa.encode(params, cfg, src, imgs, masks)
    B, T = src.shape
    n_patches = (32 // 16) ** 2
    S = n_patches + T
    assert out.x.shape == (B, S, cfg.embed_dim)
    assert out.padding_mask.shape == (B, S)
    assert out.pos_embed.shape == (B, S, cfg.embed_dim)
    # text pads marked
    assert bool(out.padding_mask[0, -1]) and not bool(out.padding_mask[1, -1])


def test_text_only_encoder(tiny):
    cfg, params = tiny
    src, _, _ = make_batch(cfg)
    out = ofa.encode(params, cfg, src)
    assert out.x.shape == (src.shape[0], src.shape[1], cfg.embed_dim)


def test_padding_invariance(tiny):
    """Changing a padded token id must not change non-pad outputs."""
    cfg, params = tiny
    src, imgs, masks = make_batch(cfg)
    out1 = ofa.encode(params, cfg, src, imgs, masks)
    src2 = src.at[0, -1].set(17)  # pad position content change
    # keep it marked as pad? no — set pad id elsewhere: modify a pad slot
    src2 = src.at[0, -1].set(cfg.pad)  # already pad; instead perturb beyond-eos pad
    # src[0, -2:] are pad; swap one pad for another value but keep mask the same
    # can't: mask derives from token==pad. Instead check padded-position output
    # doesn't affect decoding of real positions:
    prev = jnp.full((2, 4), 5, jnp.int32).at[:, 0].set(cfg.bos)
    l1 = ofa.decode(params, cfg, prev, out1)
    # zero-out padded encoder rows; logits must be unchanged
    ex = out1.x * (1 - out1.padding_mask[:, :, None].astype(out1.x.dtype))
    out2 = ofa.EncoderOut(ex, out1.padding_mask, out1.pos_embed)
    l2 = ofa.decode(params, cfg, prev, out2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_causality(tiny):
    """Changing future target tokens must not change past logits."""
    cfg, params = tiny
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    prev = jnp.asarray(np.random.RandomState(1).randint(4, 100, (2, 6)), jnp.int32)
    l1 = ofa.decode(params, cfg, prev, enc)
    prev2 = prev.at[:, 4].set(9)
    l2 = ofa.decode(params, cfg, prev2, enc)
    np.testing.assert_allclose(
        np.asarray(l1[:, :4]), np.asarray(l2[:, :4]), rtol=1e-5, atol=1e-5
    )
    assert np.abs(np.asarray(l1[:, 4:]) - np.asarray(l2[:, 4:])).max() > 1e-6


def test_incremental_matches_full(tiny):
    """KV-cache step decode == teacher-forced full decode."""
    cfg, params = tiny
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    T = 6
    prev = jnp.asarray(np.random.RandomState(2).randint(4, 100, (2, T)), jnp.int32)
    prev = prev.at[:, 0].set(cfg.bos)

    full_logits = ofa.decode(params, cfg, prev, enc)  # [B, T, V]

    state = ofa.init_decoder_state(params, cfg, enc, max_len=T)
    inc_logits = []
    for t in range(T):
        logits_t, state = ofa.decode_step(
            params, cfg, prev[:, t], jnp.int32(t), state
        )
        inc_logits.append(logits_t)
    inc = jnp.stack(inc_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(inc), rtol=2e-4, atol=2e-4
    )


def test_incremental_matches_full_with_code_masks(tiny):
    cfg, params = tiny
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    T = 5
    prev = jnp.asarray(np.random.RandomState(3).randint(4, 100, (2, T)), jnp.int32)
    code_masks = jnp.asarray([True, False])

    full_logits = ofa.decode(params, cfg, prev, enc, code_masks=code_masks)
    state = ofa.init_decoder_state(params, cfg, enc, max_len=T, code_masks=code_masks)
    for t in range(T):
        logits_t, state = ofa.decode_step(
            params, cfg, prev[:, t], jnp.int32(t), state, code_masks=code_masks
        )
        np.testing.assert_allclose(
            np.asarray(full_logits[:, t]), np.asarray(logits_t), rtol=2e-4, atol=2e-4
        )


def test_incremental_matches_full_with_decoder_prompt():
    """Prefix-tuning KV must flow through the incremental cache identically."""
    cfg = tiny_cfg(decoder_prompt=True, decoder_prompt_length=3)
    params = ofa.init_ofa_params(jax.random.PRNGKey(1), cfg)
    # random (non-zero) prompt table so the prefix actually matters
    params["decoder"]["prompt_embedding"] = (
        jax.random.normal(
            jax.random.PRNGKey(7), params["decoder"]["prompt_embedding"].shape
        )
        * 0.1
    )
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    T = 5
    prev = jnp.asarray(np.random.RandomState(4).randint(4, 100, (2, T)), jnp.int32)
    prev = prev.at[:, 0].set(cfg.bos)

    full_logits = ofa.decode(params, cfg, prev, enc)

    state = ofa.init_decoder_state(params, cfg, enc, max_len=T)
    for t in range(T):
        logits_t, state = ofa.decode_step(
            params, cfg, prev[:, t], jnp.int32(t), state
        )
        np.testing.assert_allclose(
            np.asarray(full_logits[:, t]), np.asarray(logits_t), rtol=2e-4, atol=2e-4
        )

    # sanity: the prompt changes the distribution vs a prompt-free model
    cfg0 = tiny_cfg()
    p0 = {k: v for k, v in params.items()}
    dec0 = {k: v for k, v in params["decoder"].items() if k != "prompt_embedding"}
    p0["decoder"] = dec0
    base_logits = ofa.decode(p0, cfg0, prev, enc)
    assert np.abs(np.asarray(full_logits) - np.asarray(base_logits)).max() > 1e-4


def test_vocab_padding_masked(tiny):
    cfg, params = tiny
    src, imgs, masks = make_batch(cfg)
    enc = ofa.encode(params, cfg, src, imgs, masks)
    prev = jnp.full((2, 3), 5, jnp.int32)
    logits = ofa.decode(params, cfg, prev, enc)
    assert np.asarray(logits[..., cfg.vocab_size :]).max() <= ofa.NEG_INF


def test_int8_output_proj_close(tiny):
    """Quantized serving projection: logits close to fp, pads stay -inf,
    and the top-1 token agrees on a realistic feature scale."""
    cfg, params = tiny
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 3, cfg.embed_dim).astype(np.float32))
    base = np.asarray(ofa.output_layer(params, cfg, feats))
    q = ofa.quantize_output_proj(params)
    assert q["embed_tokens_q8"].dtype == jnp.int8
    quant = np.asarray(ofa.output_layer(q, cfg, feats))
    V = cfg.vocab_size
    # |err| <= ||f||_1 * row_scale / 2
    scale = np.asarray(q["embed_tokens_scale"])[:V].max()
    bound = np.abs(np.asarray(feats)).sum(-1).max() * scale / 2 + 1e-6
    assert np.abs(quant[..., :V] - base[..., :V]).max() <= bound
    assert quant[..., V:].max() <= ofa.NEG_INF
    # quantized argmax is near-optimal under the fp logits (exact argmax
    # equality can flip on sub-bound gaps)
    qa = quant[..., :V].argmax(-1)
    picked = np.take_along_axis(base[..., :V], qa[..., None], -1)[..., 0]
    assert (base[..., :V].max(-1) - picked).max() <= 2 * bound


def test_jit_forward(tiny):
    cfg, params = tiny
    src, imgs, masks = make_batch(cfg)
    prev = jnp.full((2, 4), 5, jnp.int32)
    f = jax.jit(lambda p, s, i, m, t: ofa.forward(p, cfg, s, t, i, m))
    logits = f(params, src, imgs, masks, prev)
    assert logits.shape == (2, 4, cfg.padded_vocab_size)
    l2 = ofa.forward(params, cfg, src, prev, imgs, masks)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(l2), rtol=1e-4, atol=1e-4)


def test_drop_path_train_vs_eval(tiny):
    """Stochastic depth: active only in training mode, identity at eval."""
    from dataclasses import replace as rp

    cfg, params = tiny
    cfg_dp = rp(cfg, encoder_drop_path_rate=0.5, decoder_drop_path_rate=0.5)
    src, imgs, masks = make_batch(cfg)
    prev = jnp.full((2, 4), 7, jnp.int32)
    # eval: identical to no-drop-path config
    l_eval = ofa.forward(params, cfg_dp, src, prev, imgs, masks)
    l_base = ofa.forward(params, cfg, src, prev, imgs, masks)
    np.testing.assert_allclose(np.asarray(l_eval), np.asarray(l_base), rtol=1e-5, atol=1e-5)
    # train: different across rng draws
    rng = jax.random.PRNGKey(0)
    l1 = ofa.forward(params, cfg_dp, src, prev, imgs, masks, rngs=rng, deterministic=False)
    l2 = ofa.forward(
        params, cfg_dp, src, prev, imgs, masks,
        rngs=jax.random.PRNGKey(1), deterministic=False,
    )
    assert np.abs(np.asarray(l1, np.float32) - np.asarray(l2, np.float32)).max() > 1e-3


def test_prefix_prompts():
    """Prefix prompt tuning: prompts change outputs; causality preserved."""
    from dataclasses import replace as rp

    cfg = tiny_cfg(encoder_prompt=True, encoder_prompt_length=4,
                   decoder_prompt=True, decoder_prompt_length=4)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    assert "prompt_embedding" in params["encoder"]
    assert params["decoder"]["prompt_embedding"].shape == (4, cfg.decoder_layers * 2 * cfg.embed_dim)
    src, imgs, masks = make_batch(cfg)
    prev = jnp.asarray(np.random.RandomState(1).randint(4, 100, (2, 6)), jnp.int32)
    l1 = ofa.forward(params, cfg, src, prev, imgs, masks)
    # zeroing prompt embeddings changes the logits
    p2 = dict(params)
    p2["encoder"] = {**params["encoder"], "prompt_embedding": jnp.zeros_like(params["encoder"]["prompt_embedding"])}
    l2 = ofa.forward(p2, cfg, src, prev, imgs, masks)
    assert np.abs(np.asarray(l1, np.float32) - np.asarray(l2, np.float32)).max() > 1e-5
    # causality still holds with decoder prompts
    prev2 = prev.at[:, 4].set(9)
    l3 = ofa.forward(params, cfg, src, prev2, imgs, masks)
    np.testing.assert_allclose(
        np.asarray(l1[:, :4], np.float32), np.asarray(l3[:, :4], np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_interpolate_position_matches_torch():
    """jax.image.resize('bilinear') == torch F.interpolate(bilinear,
    align_corners=False) — the exact op the reference applies to the image
    pos-embed grid (ref: unify_transformer.py:685-693)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    old = rng.randn(4, 4, 8).astype(np.float32)
    want = (
        F.interpolate(
            torch.from_numpy(old).permute(2, 0, 1)[None],
            size=(6, 6),
            mode="bilinear",
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    got = np.asarray(jax.image.resize(jnp.asarray(old), (6, 6, 8), "bilinear"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encode_interpolate_position():
    """interpolate_position=True resamples the trained pos grid for larger
    feature maps; output differs from bucket lookup but stays finite and
    batch-consistent."""
    cfg = tiny_cfg(interpolate_position=True, orig_patch_image_size=32)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, img=64)  # 4x4 patches > 2x2 original
    enc = ofa.encode(params, cfg, src, imgs, masks)
    assert np.isfinite(np.asarray(enc.x)).all()
    cfg0 = tiny_cfg(interpolate_position=False, orig_patch_image_size=32)
    enc0 = ofa.encode(params, cfg0, src, imgs, masks)
    assert not np.allclose(np.asarray(enc.x), np.asarray(enc0.x))


def test_full_length_image_gen_target():
    """Image-gen targets are 1024 codes + bos/eos = max_target_positions + 1;
    the decoder must handle T > max_target_positions for code batches (the
    token bucket grid extends; ref all-code batches skip the token table,
    unify_transformer.py:1520-1526)."""
    from dataclasses import replace

    cfg = tiny_cfg()
    cfg = replace(cfg, max_target_positions=32, code_image_size=48,
                  image_bucket_size=8)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    B, T = 1, 33  # max_target_positions + 1
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(4, 100, (B, 6)), jnp.int32)
    prev = jnp.asarray(rng.randint(4, 100, (B, T)), jnp.int32)
    logits = ofa.forward(
        params, cfg, src, prev, code_masks=jnp.ones((B,), bool)
    )
    assert logits.shape == (B, T, cfg.padded_vocab_size)
    assert not bool(jnp.any(jnp.isnan(logits)))


def test_all_code_flash_decode_matches_xla():
    """Static all-code flash decode (image-gen batches) must match the
    materialized-bias XLA path: image positions, code LN, image rel
    buckets (ref: unify_transformer.py:1451-1465, 1520-1526)."""
    cfg = tiny_cfg(use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(0)
    B, T = 2, 9
    src = jnp.asarray(rng.randint(4, 100, (B, 6)), jnp.int32)
    prev = jnp.asarray(rng.randint(4, 100, (B, T)), jnp.int32)
    cm = jnp.ones((B,), bool)
    enc = ofa.encode(params, cfg, src)
    flash = ofa.decode(
        params, cfg, prev, enc, code_masks=cm, code_masks_all=True
    )
    xla = ofa.decode(params, cfg, prev, enc, code_masks=cm)
    np.testing.assert_allclose(
        np.asarray(flash, np.float32), np.asarray(xla, np.float32),
        atol=2e-4, rtol=2e-4,
    )


def test_unroll_layers_matches_scan(tiny):
    """cfg.unroll_layers is a pure execution-strategy switch: forward and
    gradients must be identical to the scanned stack (incl. the unrolled
    ResNet stage loop)."""
    from dataclasses import replace

    cfg, params = tiny
    cfg_u = replace(cfg, unroll_layers=True)
    src, imgs, masks = make_batch(cfg)
    prev = jnp.asarray([[cfg.bos, 5, 6, 7], [cfg.bos, 8, 9, cfg.pad]], jnp.int32)

    def loss(p, c):
        logits = ofa.forward(p, c, src, prev, imgs, masks)
        return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-4

    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg_u)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0, g1,
    )


def test_pad_once_flash_stream_matches_xla(tiny):
    """The pad-once flash stream (sequence padded to the kernel tile before
    the layer stack, sliced after) must match the XLA attention path at an
    S that actually triggers it: img 64 -> 16 patches + T=104 text = S=120,
    which pads to 128 inside the 1.125 pad-ratio gate. Covers encoder,
    decoder cross-attn AND decoder target (T=120 → 128) pad-once, forward
    AND grads, unroll and scan."""
    from dataclasses import replace

    cfg, params = tiny
    src, imgs, masks = make_batch(cfg, T=104, img=64)
    rng = np.random.RandomState(7)
    prev = rng.randint(4, cfg.vocab_size - 1, (2, 120)).astype(np.int32)
    prev[:, 0] = cfg.bos
    prev[1, -3:] = cfg.pad  # ragged target lengths
    prev = jnp.asarray(prev)

    def loss(p, c):
        logits = ofa.forward(p, c, src, prev, imgs, masks)
        return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-4, logits

    variants = {
        "xla": cfg,
        "flash_scan": replace(cfg, use_flash_attention=True),
        "flash_unroll": replace(cfg, use_flash_attention=True, unroll_layers=True),
    }
    outs = {}
    for name, c in variants.items():
        (l, logits), g = jax.value_and_grad(loss, has_aux=True)(params, c)
        outs[name] = (np.asarray(l), np.asarray(logits), g)

    for name in ("flash_scan", "flash_unroll"):
        np.testing.assert_allclose(outs[name][0], outs["xla"][0], rtol=2e-5)
        np.testing.assert_allclose(outs[name][1], outs["xla"][1], rtol=2e-4, atol=2e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
            ),
            outs[name][2], outs["xla"][2],
        )
