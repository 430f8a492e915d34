"""OFA unified encoder-decoder transformer — functional JAX core.

TPU-first re-design of the reference model (ref: models/ofa/unify_transformer.py,
models/ofa/ofa.py, models/ofa/unify_multihead_attention.py):

- pure functions over an explicit parameter pytree (no module soup); the whole
  train/infer step jits into one XLA program,
- batch-major [B, T, C] activations (the reference is T-major),
- layers stored stacked ([L, ...] leaves) and driven by ``lax.scan`` — fast
  compiles, scan-friendly remat, and clean FSDP sharding of the leading axis,
- attention additive-bias machinery (abs-pos q·k bias + per-layer relative
  bucket biases) computed once per forward in fp32 and consumed tile-wise by
  the attention op,
- incremental decoding via a preallocated KV cache updated with
  ``lax.dynamic_update_slice`` (static shapes for XLA).

Numerics notes (must match the reference for checkpoint parity):
- attention scaling is ``(head_dim * attn_scale_factor) ** -0.5`` with
  scale_factor=2 (ref: unify_multihead_attention.py:58, ofa.py:424),
- gelu is the exact erf form (torch F.gelu),
- the encoder does NOT add positional embeddings to token embeddings
  (entangle_position_embedding=False); the decoder ALWAYS does, due to a
  truthiness quirk in the reference (`if self.entangle_position_embedding is
  not None` at unify_transformer.py:1486) that became load-bearing,
- padded encoder embeddings are zeroed before layer 0 (unify_transformer.py:894).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("musketeer_tpu.models.ofa")
_warned_once: set = set()


def _warn_once(key: str, msg: str, *args) -> None:
    if key not in _warned_once:
        _warned_once.add(key)
        logger.warning(msg, *args)

from ..config import ModelConfig
from . import positions as pos_lib
from .resnet import init_resnet, resnet_forward

Params = Dict[str, Any]

NEG_INF = -1e9  # large-negative for masking (bf16-safe)


# ---------------------------------------------------------------------------
# small functional pieces
# ---------------------------------------------------------------------------

def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _drop_path(x, rate, rng, deterministic):
    """Stochastic depth: drop the whole residual branch per sample
    (ref: unify_transformer_layer.py:19-35 DropPath). `rate` may be a traced
    per-layer scalar (linspace over depth, ref: unify_transformer.py:595)."""
    if deterministic or rng is None or rate is None:
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.uniform(rng, shape) >= rate
    return jnp.where(keep, x / jnp.maximum(1.0 - rate, 1e-6), 0.0)


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------

def _init_linear(key, din, dout, gain: float = 1.0) -> Params:
    # xavier uniform (fairseq Linear default)
    bound = gain * np.sqrt(6.0 / (din + dout))
    w = jax.random.uniform(key, (din, dout), jnp.float32, -bound, bound)
    return {"w": w, "b": jnp.zeros((dout,), jnp.float32)}


def _init_ln(d) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_embed(key, n, d, std: float | None = None) -> jnp.ndarray:
    std = std if std is not None else d ** -0.5
    return jax.random.normal(key, (n, d), jnp.float32) * std


def _init_attention(key, cfg: ModelConfig) -> Params:
    d = cfg.embed_dim
    ks = jax.random.split(key, 4)
    gain = 1.0 / np.sqrt(2.0)  # fairseq qkv_same_dim init
    p = {
        "q_proj": _init_linear(ks[0], d, d, gain),
        "k_proj": _init_linear(ks[1], d, d, gain),
        "v_proj": _init_linear(ks[2], d, d, gain),
        "out_proj": _init_linear(ks[3], d, d),
    }
    if cfg.scale_heads:
        p["c_attn"] = jnp.ones((cfg.attention_heads,), jnp.float32)
    return p


def _init_adapter(key, cfg: ModelConfig) -> Params:
    """Bottleneck adapter: down→relu→up, scaled, residual
    (ref: unify_transformer_layer.py:49-93, bert-style init std 0.02)."""
    ks = jax.random.split(key, 2)
    d, a = cfg.embed_dim, cfg.adapter_dim
    return {
        "down_proj": {
            "w": jax.random.normal(ks[0], (d, a), jnp.float32) * 0.02,
            "b": jnp.zeros((a,), jnp.float32),
        },
        "up_proj": {
            "w": jax.random.normal(ks[1], (a, d), jnp.float32) * 0.02,
            "b": jnp.zeros((d,), jnp.float32),
        },
    }


def _apply_adapter(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(_linear(p["down_proj"], x))
    return _linear(p["up_proj"], h) + x


def _init_enc_layer(key, cfg: ModelConfig) -> Params:
    d, f = cfg.embed_dim, cfg.ffn_dim
    ks = jax.random.split(key, 4)
    p = {
        "self_attn": _init_attention(ks[0], cfg),
        "self_attn_layer_norm": _init_ln(d),
        "fc1": _init_linear(ks[1], d, f),
        "fc2": _init_linear(ks[2], f, d),
        "final_layer_norm": _init_ln(d),
    }
    if cfg.scale_attn:
        p["attn_ln"] = _init_ln(d)
    if cfg.scale_fc:
        p["ffn_layernorm"] = _init_ln(f)
    if cfg.scale_resids:
        p["w_resid"] = jnp.ones((d,), jnp.float32)
    if cfg.use_adapter:
        p["adapter"] = _init_adapter(ks[3], cfg)
    return p


def _init_dec_layer(key, cfg: ModelConfig) -> Params:
    ks = jax.random.split(key, 2)
    p = _init_enc_layer(ks[0], cfg)
    p["encoder_attn"] = _init_attention(ks[1], cfg)
    p["encoder_attn_layer_norm"] = _init_ln(cfg.embed_dim)
    if cfg.scale_attn:
        p["self_attn_ln"] = p.pop("attn_ln")
        p["cross_attn_ln"] = _init_ln(cfg.embed_dim)
    return p


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_ofa_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Build the full parameter pytree for the OFA model."""
    keys = jax.random.split(key, 16)
    d = cfg.embed_dim
    V = cfg.padded_vocab_size
    # rows >= vocab_size are layout padding (128-multiple), kept zero
    embed_tokens = _init_embed(keys[0], V, d)
    embed_tokens = embed_tokens * (jnp.arange(V)[:, None] < cfg.vocab_size)
    params: Params = {
        # shared token embedding (encoder input / decoder input / output proj)
        "embed_tokens": embed_tokens,
        "encoder": {
            "layernorm_embedding": _init_ln(d),
            "patch_layernorm_embedding": _init_ln(d),
            "type_embedding": _init_embed(keys[1], 2, d),
            "embed_positions": _init_embed(keys[2], cfg.max_source_positions + 2, d),
            "embed_image_positions": _init_embed(
                keys[3], cfg.image_bucket_size**2 + 1, d
            ),
            "pos_ln": _init_ln(d),
            "image_pos_ln": _init_ln(d),
            "pos_q_linear": _init_linear(keys[4], d, d),
            "pos_k_linear": _init_linear(keys[5], d, d),
            "image_proj": _init_linear(keys[6], 1024, d),
            "resnet": init_resnet(keys[7], cfg.resnet_layers),
            "layers": _stack(
                [
                    _init_enc_layer(k, cfg)
                    for k in jax.random.split(keys[8], cfg.encoder_layers)
                ]
            ),
            "layer_norm": _init_ln(d),
            # prefix prompts (ref: PromptEncoder, no-projection variant)
            **(
                {"prompt_embedding": _init_embed(
                    jax.random.fold_in(keys[8], 99),
                    cfg.encoder_prompt_length, cfg.encoder_layers * 2 * d,
                )}
                if cfg.encoder_prompt else {}
            ),
            # zero-init rel-pos tables (ref: Embedding(..., zero_init=True))
            "token_rel_pos_table": jnp.zeros(
                (cfg.encoder_layers, cfg.token_num_rel_dis, cfg.attention_heads),
                jnp.float32,
            ),
            "image_rel_pos_table": jnp.zeros(
                (cfg.encoder_layers, cfg.image_num_rel_dis, cfg.attention_heads),
                jnp.float32,
            ),
        },
        "decoder": {
            "layernorm_embedding": _init_ln(d),
            "code_layernorm_embedding": _init_ln(d),
            "embed_positions": _init_embed(keys[9], cfg.max_target_positions + 2, d),
            "embed_image_positions": _init_embed(
                keys[10], cfg.image_bucket_size**2 + 1, d
            ),
            "pos_ln": _init_ln(d),
            "image_pos_ln": _init_ln(d),
            "self_pos_q_linear": _init_linear(keys[11], d, d),
            "self_pos_k_linear": _init_linear(keys[12], d, d),
            "cross_pos_q_linear": _init_linear(keys[13], d, d),
            "cross_pos_k_linear": _init_linear(keys[14], d, d),
            "layers": _stack(
                [
                    _init_dec_layer(k, cfg)
                    for k in jax.random.split(keys[15], cfg.decoder_layers)
                ]
            ),
            "layer_norm": _init_ln(d),
            **(
                {"prompt_embedding": _init_embed(
                    jax.random.fold_in(keys[15], 99),
                    cfg.decoder_prompt_length, cfg.decoder_layers * 2 * d,
                )}
                if cfg.decoder_prompt else {}
            ),
            "token_rel_pos_table": jnp.zeros(
                (cfg.decoder_layers, cfg.token_num_rel_dis, cfg.attention_heads),
                jnp.float32,
            ),
            "image_rel_pos_table": jnp.zeros(
                (cfg.decoder_layers, cfg.image_num_rel_dis, cfg.attention_heads),
                jnp.float32,
            ),
        },
    }
    return params


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def _prompt_kv(embed: jnp.ndarray, L: int, H: int, hd: int, B: int, dtype):
    """[P, L*2*d] prompt table → stacked per-layer KV [L, 2, B, H, P, hd]
    (ref: get_encoder_prompt reshape, unify_transformer.py:700-711)."""
    P = embed.shape[0]
    kv = embed.reshape(P, L, 2, H, hd).transpose(1, 2, 3, 0, 4)  # [L,2,H,P,hd]
    kv = jnp.broadcast_to(kv[:, :, None], (L, 2, B, H, P, hd))
    return kv.astype(dtype)


def _pos_proj(lin: Params, pos_embed: jnp.ndarray, cfg: ModelConfig, scale_q: bool, dtype):
    """LN'd positional embeds → per-head projections [B, H, T, hd] for the
    in-kernel abs-pos bias product (replaces materializing [B,H,T,T]).

    Runs the matmul in the COMPUTE dtype: the kernel consumes the result
    cast to bf16 anyway, an fp32 matmul runs the MXU at 1/8 rate (the two
    projections + grads ranked ~2 M cycles in the compiled-HLO ranking),
    and the reference computes this very product in fp16
    (unify_transformer.py get_pos_info under fairseq --fp16)."""
    B, T, _ = pos_embed.shape
    H = cfg.attention_heads
    # head split folded into the dot (see _linear_heads)
    x = _linear_heads(
        {"w": lin["w"].astype(dtype), "b": lin["b"].astype(dtype)},
        pos_embed.astype(dtype), H,
    )
    if scale_q:
        x = x * jnp.asarray(
            float(cfg.embed_dim / H * cfg.attn_scale_factor) ** -0.5, dtype
        )
    return x.astype(dtype)


def _flash_self_attn(
    p: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,  # [B, T, d] (post-LN)
    pos_q: jnp.ndarray,  # [B, H, T, hd]
    pos_k: jnp.ndarray,
    rel: jnp.ndarray,  # [H, T, T]
    kpad: jnp.ndarray,  # [B, T]
    causal: bool,
) -> jnp.ndarray:
    from ..ops.flash_attention_bwd import flash_attention_bias_trainable

    H = cfg.attention_heads
    scaling = float(cfg.head_dim * cfg.attn_scale_factor) ** -0.5
    # head-split folded into the projection dots (no transpose passes)
    q = _linear_heads(p["q_proj"], x, H) * jnp.asarray(scaling, x.dtype)
    k = _linear_heads(p["k_proj"], x, H)
    v = _linear_heads(p["v_proj"], x, H)
    # 256-row q-tiles amortize the per-tile K/V/rel streams at long S
    # (encoder S≈980: bwd 3.7→3.2 ms/layer, probe_attn r3); short decoder
    # targets keep 128 to bound the pad waste, and Sp>1024 keeps 128 to fit
    # the backward's scoped VMEM (19.15 MB OOM at bq256/S1152)
    Sp_ = -(-x.shape[1] // 128) * 128
    bq = 256 if (x.shape[1] >= 256 and Sp_ <= 1024) else 128
    out = flash_attention_bias_trainable(
        q, k, v, pos_q.astype(q.dtype), pos_k.astype(q.dtype),
        rel.astype(q.dtype), kpad, causal, bq, False, True,
        cfg.flash_skip_max_subtract,
    )
    if "c_attn" in p:
        out = out * p["c_attn"].astype(out.dtype)[None, :, None, None]
    return _out_proj_heads(p["out_proj"], out)


def _flash_cross_attn(
    p: Params, cfg: ModelConfig, x: jnp.ndarray, enc_x: jnp.ndarray,
    pos_q: jnp.ndarray, pos_k: jnp.ndarray, kpad: jnp.ndarray,
) -> jnp.ndarray:
    from ..ops.flash_attention_bwd import flash_attention_bias_trainable

    H = cfg.attention_heads
    scaling = float(cfg.head_dim * cfg.attn_scale_factor) ** -0.5
    q = _linear_heads(p["q_proj"], x, H) * jnp.asarray(scaling, x.dtype)
    k = _linear_heads(p["k_proj"], enc_x, H)
    v = _linear_heads(p["v_proj"], enc_x, H)
    rel0 = jnp.zeros((H, q.shape[2], k.shape[2]), q.dtype)
    Sp_ = -(-k.shape[2] // 128) * 128
    bq = 256 if (q.shape[2] >= 256 and Sp_ <= 1024) else 128
    out = flash_attention_bias_trainable(
        q, k, v, pos_q.astype(q.dtype), pos_k.astype(q.dtype),
        rel0, kpad, False, bq, False, False,
        cfg.flash_skip_max_subtract,
    )
    if "c_attn" in p:
        out = out * p["c_attn"].astype(out.dtype)[None, :, None, None]
    return _out_proj_heads(p["out_proj"], out)


def _linear_heads(p: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """x @ W + b emitted DIRECTLY as [B, H, T, hd].

    Equivalent to ``_split_heads(_linear(p, x), heads)`` but the head
    split rides the dot's output instead of running as a standalone XLA
    transpose pass — the split/merge transposes around the Pallas
    kernels ranked 7.1 M cycles (~6 ms, ~40× off their bandwidth
    roofline: minor-dim transposes shuffle the 64-lane axis across
    sublanes) of the B8 train step in the compiled-HLO cycle ranking.
    Mosaic cannot express head-last per-head blocks (block dim −2 must
    be divisible by 8 or equal the array dim — lowering error on
    [B, T, H, D] blocks), so folding into the dot is the viable route."""
    b_, t, d = x.shape
    w = p["w"].astype(x.dtype)
    hd = w.shape[1] // heads
    out = jnp.einsum("btd,dhe->bhte", x, w.reshape(d, heads, hd))
    return out + p["b"].astype(x.dtype).reshape(heads, hd)[None, :, None, :]


def _out_proj_heads(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, hd] attention output → out_proj, with the head merge
    folded into the dot (see _linear_heads)."""
    b_, h, t, hd = x.shape
    w = p["w"].astype(x.dtype)
    out = jnp.einsum("bhte,hed->btd", x, w.reshape(h, hd, w.shape[1]))
    return out + p["b"].astype(x.dtype)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attention(
    p: Params,
    cfg: ModelConfig,
    query: jnp.ndarray,  # [B, Tq, d]
    key: jnp.ndarray,  # [B, Tk, d]
    value: jnp.ndarray,
    bias: Optional[jnp.ndarray],  # [B, H, Tq, Tk] fp32 additive (abs+rel pos)
    key_padding_mask: Optional[jnp.ndarray],  # [B, Tk] bool, True = pad
    causal_offset: Optional[int] = None,  # int: causal with q starting at offset
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    prompt_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # ([B,H,P,hd], [B,H,P,hd])
) -> jnp.ndarray:
    """Multi-head attention with additive positional bias.

    ref: unify_multihead_attention.py:200-420. Scaling (hd*scale_factor)^-0.5,
    bias added pre-softmax in fp32, softmax in fp32. ``prompt_kv`` prepends
    prefix-tuning keys/values; bias/causality apply only to the real keys
    (ref: attn_weights[:, :, -src_len:] += attn_bias, :350-351).
    """
    H = cfg.attention_heads
    scaling = float(cfg.head_dim * cfg.attn_scale_factor) ** -0.5
    q = _split_heads(_linear(p["q_proj"], query) * scaling, H)
    k = _split_heads(_linear(p["k_proj"], key), H)
    v = _split_heads(_linear(p["v_proj"], value), H)

    P = 0
    if prompt_kv is not None:
        pk, pv = prompt_kv
        P = pk.shape[2]
        k = jnp.concatenate([pk.astype(k.dtype), k], axis=2)
        v = jnp.concatenate([pv.astype(v.dtype), v], axis=2)

    w = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        if P:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (P, 0)))
        w = w + bias.astype(jnp.float32)
    if causal_offset is not None:
        tq, tk = w.shape[-2], w.shape[-1]
        qpos = jnp.arange(tq) + causal_offset
        kpos = jnp.arange(tk) - P  # prompt keys visible to every query
        w = jnp.where(kpos[None, :] > qpos[:, None], NEG_INF, w)
    if key_padding_mask is not None:
        if P:
            key_padding_mask = jnp.pad(
                key_padding_mask, ((0, 0), (P, 0)), constant_values=False
            )
        w = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, w)

    probs = jax.nn.softmax(w, axis=-1)
    # rows where everything is masked (padded queries) produce NaN; zero them
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    probs = _dropout(probs, dropout_rate, rng, deterministic).astype(value.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = _merge_heads(out)
    if "c_attn" in p:
        b, t, _ = out.shape
        out = (
            out.reshape(b, t, H, cfg.head_dim) * p["c_attn"].astype(out.dtype)[None, None, :, None]
        ).reshape(b, t, -1)
    return _linear(p["out_proj"], out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _active_pipe_mesh(cfg: ModelConfig):
    """The context mesh when pipeline mode is on and usable, else None."""
    if cfg.pipeline_microbatches <= 0:
        return None
    try:
        mesh = jax.sharding.get_mesh()
    except Exception:
        return None
    if mesh is None or getattr(mesh, "empty", False):
        return None
    if "pipe" not in mesh.shape or mesh.shape["pipe"] <= 1:
        return None
    return mesh


def _usable_interleave(cfg: ModelConfig, n_layers: int, mesh, M: int) -> int:
    """cfg.pipeline_interleave when the interleaved schedule's static
    preconditions hold for this stack (layers divisible by stages*V,
    microbatches <= stages), else 1 (plain GPipe)."""
    V = cfg.pipeline_interleave
    if V <= 1:
        return 1
    Pn = mesh.shape["pipe"]
    if n_layers % (Pn * V) != 0 or M > Pn:
        # silent downgrade would let a user believe the interleaved
        # schedule is running when it is not (ADVICE r3 #1)
        _warn_once(
            f"interleave-{n_layers}-{Pn}-{V}-{M}",
            "pipeline_interleave=%d falls back to plain GPipe for this "
            "%d-layer stack (needs layers %% (stages*V) == 0 with stages=%d "
            "and microbatches %d <= stages)", V, n_layers, Pn, M,
        )
        return 1
    return V


def _active_seq_mesh(cfg: ModelConfig):
    """The context mesh when sequence parallelism is on and usable, else None."""
    if not cfg.seq_parallel:
        return None
    try:
        mesh = jax.sharding.get_mesh()
    except Exception:
        return None
    if mesh is None or getattr(mesh, "empty", False):
        return None
    if "seq" not in mesh.shape or mesh.shape["seq"] <= 1:
        return None
    return mesh


def _ring_self_attn(
    p: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,  # [B, S, d] (post-LN), S divisible by the ring size
    pos_q: jnp.ndarray,  # [B, H, S, hd]
    pos_k: jnp.ndarray,
    rel: jnp.ndarray,  # [H, S, S]
    kpad: jnp.ndarray,  # [B, S]
    mesh,
    causal: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel self-attention: projections partition per-position
    under GSPMD; the attention itself rides the ring (K/V chunks ppermute
    over ICI, online-softmax merge — parallel/ring_attention.py)."""
    from ..parallel.ring_attention import ring_attention

    H = cfg.attention_heads
    scaling = float(cfg.head_dim * cfg.attn_scale_factor) ** -0.5
    q = _split_heads(_linear(p["q_proj"], x) * scaling, H)
    k = _split_heads(_linear(p["k_proj"], x), H)
    v = _split_heads(_linear(p["v_proj"], x), H)
    out = ring_attention(
        q, k, v, pos_q.astype(q.dtype), pos_k.astype(q.dtype),
        rel.astype(q.dtype), kpad, mesh, "seq", causal=causal,
    )
    out = _merge_heads(out)
    if "c_attn" in p:
        b, t, _ = out.shape
        out = (
            out.reshape(b, t, H, cfg.head_dim)
            * p["c_attn"].astype(out.dtype)[None, None, :, None]
        ).reshape(b, t, -1)
    return _linear(p["out_proj"], out)


def _encoder_layer_sp(
    p: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    pos_q: jnp.ndarray,
    pos_k: jnp.ndarray,
    rel: jnp.ndarray,
    padding_mask: jnp.ndarray,
    mesh,
) -> jnp.ndarray:
    """Pre-LN encoder block under sequence parallelism (deterministic only:
    the SP gate in encode() requires all dropout/drop-path rates be zero or
    deterministic=True, so the regularizers are omitted here). The stream is
    pinned to the seq sharding between layers so LN/FFN stay partitioned."""
    from jax.sharding import NamedSharding, PartitionSpec

    bax = "data" if ("data" in mesh.shape and mesh.shape["data"] > 1) else None
    spec = NamedSharding(mesh, PartitionSpec(bax, "seq", None))
    x = jax.lax.with_sharding_constraint(x, spec)
    residual = x
    h = _layer_norm(p["self_attn_layer_norm"], x)
    h = _ring_self_attn(p["self_attn"], cfg, h, pos_q, pos_k, rel, padding_mask, mesh)
    if "attn_ln" in p:
        h = _layer_norm(p["attn_ln"], h)
    x = residual + h

    residual = x
    h = _layer_norm(p["final_layer_norm"], x)
    h = _gelu(_linear(p["fc1"], h))
    if "ffn_layernorm" in p:
        h = _layer_norm(p["ffn_layernorm"], h)
    h = _linear(p["fc2"], h)
    if "adapter" in p:
        h = _apply_adapter(p["adapter"], h)
    if "w_resid" in p:
        residual = residual * p["w_resid"].astype(residual.dtype)
    return jax.lax.with_sharding_constraint(residual + h, spec)


def _decoder_layer_sp(
    p: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,  # [B, T, d], T divisible by the ring size
    pos_q: jnp.ndarray,  # [B, H, T, hd] self-attn decomposed abs-pos
    pos_k: jnp.ndarray,
    rel: jnp.ndarray,  # [H, T, T] self-attn rel bias
    self_pad: jnp.ndarray,  # [B, T]
    enc_x: jnp.ndarray,  # [B, S, d] encoder stream (replicated over seq)
    enc_pad: jnp.ndarray,  # [B, S]
    cross_pos_q: jnp.ndarray,  # [B, H, T, hd]
    cross_pos_k: jnp.ndarray,  # [B, H, S, hd]
    mesh,
) -> jnp.ndarray:
    """Pre-LN decoder block under sequence parallelism (deterministic only —
    see _encoder_layer_sp). Causal self-attention rides the ring on global
    positions; cross attention is embarrassingly parallel in the query rows
    (each device attends its T/P queries against the full encoder K/V), so
    it stays plain XLA under the seq sharding constraint."""
    from jax.sharding import NamedSharding, PartitionSpec

    bax = "data" if ("data" in mesh.shape and mesh.shape["data"] > 1) else None
    spec = NamedSharding(mesh, PartitionSpec(bax, "seq", None))
    x = jax.lax.with_sharding_constraint(x, spec)
    H = cfg.attention_heads

    residual = x
    h = _layer_norm(p["self_attn_layer_norm"], x)
    h = _ring_self_attn(
        p["self_attn"], cfg, h, pos_q, pos_k, rel, self_pad, mesh, causal=True
    )
    if "self_attn_ln" in p:
        h = _layer_norm(p["self_attn_ln"], h)
    x = residual + h

    # cross attention: q rows partition over seq, full encoder K/V
    residual = x
    h = _layer_norm(p["encoder_attn_layer_norm"], x)
    pc = p["encoder_attn"]
    scaling = float(cfg.head_dim * cfg.attn_scale_factor) ** -0.5
    q = _split_heads(_linear(pc["q_proj"], h) * scaling, H)
    k = _split_heads(_linear(pc["k_proj"], enc_x), H)
    v = _split_heads(_linear(pc["v_proj"], enc_x), H)
    w = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = w + jnp.einsum(
        "bhqd,bhkd->bhqk", cross_pos_q.astype(q.dtype),
        cross_pos_k.astype(q.dtype), preferred_element_type=jnp.float32,
    )
    w = jnp.where(enc_pad[:, None, None, :], NEG_INF, w)
    probs = jax.nn.softmax(w, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = _merge_heads(out)
    if "c_attn" in pc:
        b, t, _ = out.shape
        out = (
            out.reshape(b, t, H, cfg.head_dim)
            * pc["c_attn"].astype(out.dtype)[None, None, :, None]
        ).reshape(b, t, -1)
    h = _linear(pc["out_proj"], out)
    if "cross_attn_ln" in p:
        h = _layer_norm(p["cross_attn_ln"], h)
    x = residual + h

    residual = x
    h = _layer_norm(p["final_layer_norm"], x)
    h = _gelu(_linear(p["fc1"], h))
    if "ffn_layernorm" in p:
        h = _layer_norm(p["ffn_layernorm"], h)
    h = _linear(p["fc2"], h)
    if "adapter" in p:
        h = _apply_adapter(p["adapter"], h)
    if "w_resid" in p:
        residual = residual * p["w_resid"].astype(residual.dtype)
    return jax.lax.with_sharding_constraint(residual + h, spec)


def _dec_dpr(cfg: ModelConfig) -> jnp.ndarray:
    return jnp.linspace(0.0, cfg.decoder_drop_path_rate, cfg.decoder_layers)


def _scan_or_unroll(body, x, xs, unroll: bool):
    """Drive the layer stack: ``lax.scan`` over stacked leaves, or a Python
    loop with static per-layer slices when ``unroll``.

    Unrolled, XLA saves each layer's backward residuals as plain buffers
    instead of dynamic-update-slice stacking into [L, ...] arrays — those
    DUS passes ranked among the top train-step fusions in the compiled-HLO
    cycle ranking (probe_hlo.py) — at the price of O(L) compile time."""
    if not unroll:
        x, _ = jax.lax.scan(body, x, xs)
        return x
    L = jax.tree.leaves(xs)[0].shape[0]
    for i in range(L):
        x, _ = body(x, jax.tree.map(lambda a: a[i], xs))
    return x


class EncoderOut(NamedTuple):
    x: jnp.ndarray  # [B, S, d] final hidden states
    padding_mask: jnp.ndarray  # [B, S] bool, True = pad
    pos_embed: jnp.ndarray  # [B, S, d] LN'd positional embeddings (for cross bias)


def _abs_pos_bias(q_lin, k_lin, pos_embed, cfg: ModelConfig) -> jnp.ndarray:
    """(pos_q * scaling) @ pos_kᵀ per head → [B, H, T, T] fp32.

    ref: unify_transformer.py:906-912 / 1297-1318.
    """
    B, T, d = pos_embed.shape
    H = cfg.attention_heads
    scaling = float(cfg.embed_dim / H * cfg.attn_scale_factor) ** -0.5
    pe = pos_embed.astype(jnp.float32)
    pos_q = (pe @ q_lin["w"] + q_lin["b"]).reshape(B, T, H, -1).transpose(0, 2, 1, 3)
    pos_q = pos_q * scaling
    pos_k = (pe @ k_lin["w"] + k_lin["b"]).reshape(B, T, H, -1).transpose(0, 2, 1, 3)
    return jnp.einsum("bhqd,bhkd->bhqk", pos_q, pos_k)


def _encoder_layer(
    p: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    padding_mask: jnp.ndarray,
    rngs=None,
    deterministic: bool = True,
    flash: Optional[Tuple] = None,  # (pos_q, pos_k, rel) → pallas kernel path
    drop_path_rate=None,  # traced per-layer scalar (stochastic depth)
    prompt_kv: Optional[Tuple] = None,  # prefix-tuning KV for self-attn
) -> jnp.ndarray:
    """Pre-LN encoder block (ref: unify_transformer_layer.py:110-293)."""
    def dr(i):
        return None if rngs is None else jax.random.fold_in(rngs, i)

    residual = x
    h = _layer_norm(p["self_attn_layer_norm"], x)
    if flash is not None:
        pos_q, pos_k, rel = flash
        h = _flash_self_attn(
            p["self_attn"], cfg, h, pos_q, pos_k, rel, padding_mask, causal=False
        )
    else:
        h = attention(
            p["self_attn"], cfg, h, h, h, bias, padding_mask,
            dropout_rate=cfg.attention_dropout, rng=dr(0), deterministic=deterministic,
            prompt_kv=prompt_kv,
        )
    if "attn_ln" in p:
        h = _layer_norm(p["attn_ln"], h)
    h = _dropout(h, cfg.dropout, dr(1), deterministic)
    x = residual + _drop_path(h, drop_path_rate, dr(10), deterministic)

    residual = x
    h = _layer_norm(p["final_layer_norm"], x)
    h = _gelu(_linear(p["fc1"], h))
    h = _dropout(h, cfg.activation_dropout, dr(2), deterministic)
    if "ffn_layernorm" in p:
        h = _layer_norm(p["ffn_layernorm"], h)
    h = _linear(p["fc2"], h)
    h = _dropout(h, cfg.dropout, dr(3), deterministic)
    if "adapter" in p:
        h = _apply_adapter(p["adapter"], h)
    if "w_resid" in p:
        residual = residual * p["w_resid"].astype(residual.dtype)
    return residual + _drop_path(h, drop_path_rate, dr(11), deterministic)


def encode(
    params: Params,
    cfg: ModelConfig,
    src_tokens: jnp.ndarray,  # [B, T] int32
    patch_images: Optional[jnp.ndarray] = None,  # [B, Himg, Wimg, 3]
    patch_masks: Optional[jnp.ndarray] = None,  # [B] bool, False = no image
    sample_patch_order: Optional[jnp.ndarray] = None,  # [B, P] int32 subsample idx
    rngs: Optional[jax.Array] = None,
    deterministic: bool = True,
    train_bn: bool = False,
    resnet_feats: Optional[jnp.ndarray] = None,  # [B, h, w, C] precomputed
) -> EncoderOut:
    """Joint image+text encoder forward (ref: unify_transformer.py:819-966).

    ``resnet_feats`` bypasses the ResNet stem with precomputed feature maps —
    the joint-train vision-stem packing runs ONE concatenated ResNet pass
    for all vision tasks and feeds each task its slice (see
    training.train_step.multitask_loss)."""
    enc = params["encoder"]
    B, T = src_tokens.shape
    dtype = jnp.dtype(cfg.dtype)

    # ---- text branch (gather fp32 rows THEN convert: casting the full
    # [59520, 768] table first is a 137 MB read+write pass — it ranked
    # 1.6 M cycles in the compiled-HLO ranking; the gathered rows are
    # ~700× smaller)
    x_text = params["embed_tokens"][src_tokens].astype(dtype)
    x_text = x_text + enc["type_embedding"].astype(dtype)[0]
    x_text = _layer_norm(enc["layernorm_embedding"], x_text)
    x_text = _dropout(x_text, cfg.dropout, rngs, deterministic)
    text_pad = src_tokens == cfg.pad

    pos_embed = jnp.broadcast_to(
        enc["embed_positions"][jnp.arange(T)][None], (B, T, cfg.embed_dim)
    )

    if patch_images is not None or resnet_feats is not None:
        # ---- image branch
        if resnet_feats is not None:
            feats = resnet_feats.astype(dtype)
        else:
            feats = resnet_forward(
                enc["resnet"], patch_images.astype(dtype), train=train_bn,
                unroll=cfg.unroll_layers, remat=cfg.remat,
            )
        Bi, h, w, _ = feats.shape
        image_embed = feats.reshape(Bi, h * w, -1)
        image_pos_ids = jnp.asarray(
            pos_lib.encoder_image_position_ids(h, w, cfg.image_bucket_size)
        )
        image_pos_ids = jnp.broadcast_to(image_pos_ids[None], (B, h * w))
        if sample_patch_order is not None:
            # training-time patch subsampling (ref: unify_transformer.py:671-682)
            image_embed = jnp.take_along_axis(
                image_embed, sample_patch_order[:, :, None], axis=1
            )
            image_pos_ids = jnp.take_along_axis(image_pos_ids, sample_patch_order, axis=1)
        N = image_embed.shape[1]
        orig_hw = cfg.orig_patch_image_size // 16
        if cfg.interpolate_position and h * w > orig_hw * orig_hw:
            # Bilinearly resample the trained pos-embed grid to the larger
            # feature map instead of indexing unseen 2D buckets (ref:
            # unify_transformer.py:685-693; rel-bias buckets stay id-based,
            # matching the reference). half-pixel-centres resize == torch
            # F.interpolate(align_corners=False).
            old_ids = jnp.asarray(
                pos_lib.encoder_image_position_ids(
                    orig_hw, orig_hw, cfg.image_bucket_size
                )
            ).reshape(orig_hw, orig_hw)
            old = enc["embed_image_positions"][old_ids]  # [hw, hw, D]
            interp = jax.image.resize(
                old, (h, w, old.shape[-1]), method="bilinear"
            ).reshape(h * w, -1)
            image_pos_embed = jnp.broadcast_to(
                interp[None], (B, h * w, interp.shape[-1])
            )
            if sample_patch_order is not None:
                image_pos_embed = jnp.take_along_axis(
                    image_pos_embed, sample_patch_order[:, :, None], axis=1
                )
        else:
            image_pos_embed = enc["embed_image_positions"][image_pos_ids]

        x_img = _linear(enc["image_proj"], image_embed)
        x_img = x_img + enc["type_embedding"].astype(dtype)[1]
        x_img = _layer_norm(enc["patch_layernorm_embedding"], x_img)
        x_img = _dropout(x_img, cfg.dropout, rngs, deterministic)
        if patch_masks is None:
            image_pad = jnp.zeros((B, N), bool)
        else:
            image_pad = jnp.broadcast_to(~patch_masks[:, None], (B, N))

        x = jnp.concatenate([x_img, x_text], axis=1)
        padding_mask = jnp.concatenate([image_pad, text_pad], axis=1)
        pos_for_bias = jnp.concatenate(
            [
                _layer_norm(enc["image_pos_ln"], image_pos_embed.astype(dtype)),
                _layer_norm(enc["pos_ln"], pos_embed.astype(dtype)),
            ],
            axis=1,
        )
    else:
        N = 0
        image_pos_ids = None
        x = x_text
        padding_mask = text_pad
        pos_for_bias = _layer_norm(enc["pos_ln"], pos_embed.astype(dtype))

    # zero out padded embeddings (ref: unify_transformer.py:894)
    x = x * (1.0 - padding_mask[:, :, None].astype(x.dtype))

    S = x.shape[1]
    # Pallas path preconditions: no attention dropout (kernel has none) and
    # batch-invariant relative bias (no per-sample patch subsampling)
    use_flash = (
        cfg.use_flash_attention
        and sample_patch_order is None
        and not cfg.encoder_prompt
        and (deterministic or cfg.attention_dropout == 0.0)
    )
    # sequence parallelism: ring attention over a 'seq' mesh axis. Shares
    # the flash branch's decomposed positional streams (pos_q/pos_k +
    # compact rel) but replaces the Pallas kernel with the ring schedule;
    # requires no in-layer regularizers (the SP layer has no dropout).
    sp_mesh = _active_seq_mesh(cfg)
    if sp_mesh is not None and (
        sample_patch_order is not None
        or cfg.encoder_prompt
        or not (
            deterministic
            or (
                cfg.dropout == 0.0
                and cfg.attention_dropout == 0.0
                and cfg.activation_dropout == 0.0
                and cfg.encoder_drop_path_rate == 0.0
            )
        )
    ):
        # a run launched with seq_parallel + nonzero dropout would silently
        # replicate all work over the seq axis with no speedup (ADVICE r3 #2)
        _warn_once(
            "sp-gate",
            "seq_parallel is configured but disabled for this forward "
            "(dropout/drop-path active, encoder prompts, or per-sample "
            "patch subsampling) — the encoder runs replicated over the "
            "seq axis",
        )
        sp_mesh = None
    if sp_mesh is not None:
        use_flash = True
    S_orig, padding_mask_out, pos_out = S, padding_mask, pos_for_bias
    # pad-once only when layers are UNROLLED or nothing needs residuals
    # saved (pure inference): under lax.scan every residual the scan stacks
    # for the backward grows to the padded length, which measured as a net
    # loss (probe_unroll r3d: scan 112.5 → 116.4 ms) while unroll gained.
    _pad_once = sp_mesh is None and cfg.flash_pad_once and (
        cfg.unroll_layers or (deterministic and rngs is None)
    )
    if use_flash and _pad_once:
        # Pad the encoder stream ONCE to the flash kernel's padded length:
        # every layer's _pack_pad then sees input shape == padded shape and
        # its per-stream pad/unpad passes become zero-width (XLA elides
        # them) — those pads ranked ~9 M cycles (≈6 ms/step) in the
        # compiled-HLO cycle ranking of the unrolled encoder fwd+bwd
        # (probe_hlo r3). Padded rows ride as kpad=True keys (NEG_INF
        # masked in-kernel); the garbage padded query rows are sliced off
        # after the layer stack.
        # Gate on the pad ratio: padding the whole stream runs every
        # projection/LN/FFN at Spad rows, so a short text-only sequence
        # (S=80 → 128 = +60 % matmul rows) would pay more in MXU work than
        # the elided pad passes save. The encoder's vision+text shape
        # (S=980 → 1024, +4.5 %) is the case this targets. MEASURED
        # negative result (bench r3i): widening the gate to 1.13 so the
        # inference encoder (S≈910 → 1024, ratio 1.125) qualifies made the
        # headline WORSE (186.8 → 184.0 samples/s) — the +12.5 % matmul
        # rows outweigh the elided pad passes, and the padded cross-KV
        # precompute adds ~1.7 ms to the decode phase. 1.1 is the measured
        # optimum; it also keeps image-gen code targets (T=1025 → 1152)
        # unpadded (their padding contributed to the joint step's HBM
        # squeeze, bench r3e).
        _Sk0 = -(-S // 128) * 128
        _bq0 = 256 if (S >= 256 and _Sk0 <= 1024) else 128
        Spad = -(-S // _bq0) * _bq0
        if Spad != S and Spad <= S * 1.1:
            x = jnp.pad(x, ((0, 0), (0, Spad - S), (0, 0)))
            padding_mask = jnp.pad(
                padding_mask, ((0, 0), (0, Spad - S)), constant_values=True
            )
            pos_for_bias = jnp.pad(
                pos_for_bias, ((0, 0), (0, Spad - S), (0, 0))
            )
            S = Spad
    if sp_mesh is not None:
        # the ring shards S evenly over the axis; pad to a multiple with
        # kpad=True rows (NEG_INF-masked keys, garbage queries sliced off
        # after the stack — same contract as pad-once above)
        Pn_sp = sp_mesh.shape["seq"]
        Spad = -(-S // Pn_sp) * Pn_sp
        if Spad != S:
            x = jnp.pad(x, ((0, 0), (0, Spad - S), (0, 0)))
            padding_mask = jnp.pad(
                padding_mask, ((0, 0), (0, Spad - S)), constant_values=True
            )
            pos_for_bias = jnp.pad(
                pos_for_bias, ((0, 0), (0, Spad - S), (0, 0))
            )
            S = Spad
    enc_prompt_kv = (
        _prompt_kv(
            enc["prompt_embedding"], cfg.encoder_layers, cfg.attention_heads,
            cfg.head_dim, B, dtype,
        )
        if cfg.encoder_prompt
        else None
    )

    # text rel bias indices [T, T]; image rel bias indices [B, N, N]
    token_rp = jnp.asarray(
        pos_lib.make_token_bucket_position(cfg.token_bucket_size, cfg.max_source_positions)
    )[:T, :T]
    if N:
        image_rp_full = jnp.asarray(
            pos_lib.make_image_bucket_position(cfg.image_bucket_size, cfg.image_num_rel_dis)
        )
        if use_flash:
            ids0 = image_pos_ids[0]  # batch-invariant without subsampling
            image_rp = image_rp_full[ids0[:, None], ids0[None, :]]  # [N, N]
        else:
            # gather per-sample buckets: [B, N, N]
            image_rp = image_rp_full[
                image_pos_ids[:, :, None], image_pos_ids[:, None, :]
            ]

    if use_flash:
        pos_q = _pos_proj(enc["pos_q_linear"], pos_for_bias, cfg, True, dtype)
        pos_k = _pos_proj(enc["pos_k_linear"], pos_for_bias, cfg, False, dtype)
        H = cfg.attention_heads

        # One lane-dense gather for ALL layers, hoisted out of the scan: the
        # per-layer ``table[rp]`` alternative gathers [N, N, H] with H=12
        # trailing lanes padded to 128 (≈10× HBM traffic), repeats it per
        # layer, and re-runs it under remat — measured as the dominant cost
        # of the encoder train step (probe_train r3: 19.5 ms/layer vs ~6 ms
        # of attention+FFN). [L, H, T, T] / [L, H, N, N] compact slices ride
        # the scan as xs; the cheap zeros+set compose stays in-layer (and
        # in-remat) so no [L, H, S, S] residual is saved.
        rel_tok_all = _rel_gather(enc["token_rel_pos_table"], token_rp, dtype)
        rel_img_all = (
            _rel_gather(enc["image_rel_pos_table"], image_rp, dtype)
            if N
            else jnp.zeros(
                (cfg.encoder_layers, H, 1, 1), dtype
            )  # scan xs placeholder (text-only encode)
        )

        # compose rel directly at the kernel's padded size so its wrapper
        # pad is zero-width (XLA elides it) — saves a full [H, Sp, Sp]
        # read+write pass per layer consumption (fwd AND the remat bwd
        # recompute); padded key cols are NEG_INF-masked by kpad anyway.
        # Tile math mirrors _flash_self_attn's block_q selection.
        _Sk = -(-S // 128) * 128
        _bq = 256 if (S >= 256 and _Sk <= 1024) else 128
        _Sq = -(-S // _bq) * _bq

        if sp_mesh is not None:

            def layer_body(x, layer_in):
                layer_p, rel_tok, rel_img, dp_rate = layer_in
                rel = jnp.zeros((H, S, S), dtype)
                rel = rel.at[
                    :, S_orig - T : S_orig, S_orig - T : S_orig
                ].set(rel_tok)
                if N:
                    rel = rel.at[:, :N, :N].set(rel_img)
                # shard the bias compose on its QUERY axis over the ring:
                # each device materializes only its [H, S/P, S] slice
                # instead of the full O(S²) bias per layer — the dominant
                # HBM term in the long-context regime SP targets
                # (ADVICE r3 #4); ring_attention's in_spec matches.
                rel = jax.lax.with_sharding_constraint(
                    rel,
                    jax.sharding.NamedSharding(
                        sp_mesh, jax.sharding.PartitionSpec(None, "seq", None)
                    ),
                )
                fwd = lambda xx: _encoder_layer_sp(
                    layer_p, cfg, xx, pos_q, pos_k, rel, padding_mask, sp_mesh
                )
                if cfg.remat:
                    fwd = jax.checkpoint(fwd)
                return fwd(x), None
        else:

            def layer_body(x, layer_in):
                layer_p, rel_tok, rel_img, dp_rate = layer_in
                # composed in compute dtype: the kernel consumes bf16 rel, so an
                # fp32 intermediate would just add a [H,S,S] convert pass
                rel = jnp.zeros((H, _Sq, _Sk), dtype)
                rel = rel.at[:, S_orig - T : S_orig, S_orig - T : S_orig].set(rel_tok)
                if N:
                    rel = rel.at[:, :N, :N].set(rel_img)
                fwd = lambda xx: _encoder_layer(
                    layer_p, cfg, xx, None, padding_mask,
                    rngs=rngs, deterministic=deterministic,
                    flash=(pos_q, pos_k, rel),
                    drop_path_rate=dp_rate if enc_dp else None,
                )
                if cfg.remat:
                    fwd = jax.checkpoint(fwd)
                return fwd(x), None
    else:
        abs_bias = _abs_pos_bias(
            enc["pos_q_linear"], enc["pos_k_linear"], pos_for_bias, cfg
        )

        def layer_body(x, layer_in):
            if cfg.encoder_prompt:
                layer_p, token_table, image_table, dp_rate, pkv = layer_in
            else:
                layer_p, token_table, image_table, dp_rate = layer_in
                pkv = None
            rel_text = token_table[token_rp]  # [T, T, H]
            bias = abs_bias
            # add text rel bias to the bottom-right [T, T] block
            bias = bias.at[:, :, S - T :, S - T :].add(
                rel_text.transpose(2, 0, 1)[None].astype(bias.dtype)
            )
            if N:
                rel_img = image_table[image_rp]  # [B, N, N, H]
                bias = bias.at[:, :, :N, :N].add(
                    rel_img.transpose(0, 3, 1, 2).astype(bias.dtype)
                )
            fwd = lambda xx: _encoder_layer(
                layer_p, cfg, xx, bias, padding_mask,
                rngs=rngs, deterministic=deterministic,
                drop_path_rate=dp_rate if enc_dp else None,
                prompt_kv=(pkv[0], pkv[1]) if cfg.encoder_prompt else None,
            )
            if cfg.remat:
                fwd = jax.checkpoint(fwd)
            return fwd(x), None

    enc_dp = cfg.encoder_drop_path_rate > 0 and not deterministic
    dp_rates = jnp.linspace(
        0.0, cfg.encoder_drop_path_rate, cfg.encoder_layers
    )
    if use_flash:
        xs = (enc["layers"], rel_tok_all, rel_img_all, dp_rates)
    else:
        xs = (
            enc["layers"],
            enc["token_rel_pos_table"],
            enc["image_rel_pos_table"],
            dp_rates,
        )
    if cfg.encoder_prompt:
        xs = xs + (enc_prompt_kv,)

    # pipeline usable with rngs only when nothing consumes them in-layer
    _no_reg = (
        cfg.dropout == 0.0 and cfg.attention_dropout == 0.0
        and cfg.activation_dropout == 0.0 and not enc_dp
    )
    pipe_mesh = (
        _active_pipe_mesh(cfg)
        if (use_flash and sp_mesh is None and (rngs is None or _no_reg))
        else None
    )
    if pipe_mesh is not None:
        # GPipe over the layer stack: microbatch payloads flow stage-to-stage
        from ..parallel.pipeline import pipeline_scan

        M = cfg.pipeline_microbatches
        assert B % M == 0, f"batch {B} not divisible by microbatches {M}"
        payload = {"x": x, "pad": padding_mask, "pos_q": pos_q, "pos_k": pos_k}
        payload_mb = jax.tree.map(
            lambda a: a.reshape((M, B // M) + a.shape[1:]), payload
        )
        consts = jnp.zeros((1, 1), jnp.int32)  # unused; kept for the API
        Hh = cfg.attention_heads

        _Sk = -(-S // 128) * 128
        _bq = 256 if (S >= 256 and _Sk <= 1024) else 128
        _Sq = -(-S // _bq) * _bq

        def pipe_body(pl, layer_in, consts_in):
            # xs carry the pre-gathered compact rel slices (see layer_body);
            # rel composed at the kernel's padded size (see layer_body below)
            layer_p, rel_tok, rel_img, _dp = layer_in
            rel = jnp.zeros((Hh, _Sq, _Sk), dtype)
            rel = rel.at[:, S_orig - T : S_orig, S_orig - T : S_orig].set(rel_tok)
            if N:
                rel = rel.at[:, :N, :N].set(rel_img)
            new_x = _encoder_layer(
                layer_p, cfg, pl["x"], None, pl["pad"],
                deterministic=True, flash=(pl["pos_q"], pl["pos_k"], rel),
            )
            return {**pl, "x": new_x}

        out = pipeline_scan(
            pipe_body, payload_mb, xs[:4], pipe_mesh, "pipe", consts=consts,
            remat=cfg.remat,
            interleave=_usable_interleave(
                cfg, cfg.encoder_layers, pipe_mesh, M
            ),
        )
        x = out["x"].reshape((B,) + out["x"].shape[2:])
    else:
        x = _scan_or_unroll(layer_body, x, xs, cfg.unroll_layers)

    if S != S_orig:
        x = x[:, :S_orig]
    x = _layer_norm(enc["layer_norm"], x)
    return EncoderOut(x=x, padding_mask=padding_mask_out, pos_embed=pos_out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _decoder_pos_setup(
    params: Params,
    cfg: ModelConfig,
    B: int,
    T: int,
    encoder_pos: jnp.ndarray,  # [B, S, d]
    code_masks: Optional[jnp.ndarray],  # [B] bool or None
    dtype,
):
    """Target positional embeddings + self/cross abs-pos biases.

    ref: unify_transformer.py:1445-1466 + get_pos_info :1297-1318.
    Returns (tgt_pos_embed [B,T,d], self_bias [B,H,T,T], cross_bias [B,H,T,S]).
    """
    dec = params["decoder"]
    tok_pos = dec["embed_positions"][jnp.arange(T)][None]
    tok_pos = jnp.broadcast_to(tok_pos, (B, T, cfg.embed_dim))
    if code_masks is not None:
        img_idx = jnp.asarray(
            pos_lib.decoder_image_position_idx(
                cfg.code_image_size, cfg.image_bucket_size, cfg.max_target_positions
            )
        )[:T]
        img_pos = dec["embed_image_positions"][img_idx][None]
        img_pos = jnp.broadcast_to(img_pos, (B, T, cfg.embed_dim))
        tgt_pos_embed = jnp.where(code_masks[:, None, None], img_pos, tok_pos)
    else:
        tgt_pos_embed = tok_pos

    def self_bias_for(use_image: bool):
        ln = dec["image_pos_ln"] if use_image else dec["pos_ln"]
        pe = _layer_norm(ln, tgt_pos_embed.astype(dtype))
        return _abs_pos_bias(dec["self_pos_q_linear"], dec["self_pos_k_linear"], pe, cfg), pe

    self_bias, pe_tok = self_bias_for(False)
    if code_masks is not None:
        self_bias_img, pe_img = self_bias_for(True)
        self_bias = jnp.where(code_masks[:, None, None, None], self_bias_img, self_bias)
        pe_cross = jnp.where(code_masks[:, None, None], pe_img, pe_tok)
    else:
        pe_cross = pe_tok

    # cross bias: q from tgt pos (LN'd), k from encoder's LN'd pos embeds
    H = cfg.attention_heads
    scaling = float(cfg.embed_dim / H * cfg.attn_scale_factor) ** -0.5
    S = encoder_pos.shape[1]
    pq = (
        (pe_cross.astype(jnp.float32) @ dec["cross_pos_q_linear"]["w"] + dec["cross_pos_q_linear"]["b"])
        .reshape(B, T, H, -1)
        .transpose(0, 2, 1, 3)
        * scaling
    )
    pk = (
        (encoder_pos.astype(jnp.float32) @ dec["cross_pos_k_linear"]["w"] + dec["cross_pos_k_linear"]["b"])
        .reshape(B, S, H, -1)
        .transpose(0, 2, 1, 3)
    )
    cross_bias = jnp.einsum("bhqd,bhkd->bhqk", pq, pk)
    return tgt_pos_embed, self_bias, cross_bias


def _decoder_embed(
    params: Params,
    cfg: ModelConfig,
    prev_output_tokens: jnp.ndarray,
    tgt_pos_embed: jnp.ndarray,
    code_masks: Optional[jnp.ndarray],
    dtype,
    rngs=None,
    deterministic=True,
) -> jnp.ndarray:
    dec = params["decoder"]
    # gather fp32 rows THEN convert (see encode: full-table cast is a
    # 137 MB pass)
    x = params["embed_tokens"][prev_output_tokens].astype(dtype)
    if cfg.decoder_entangle_positions:
        x = x + tgt_pos_embed.astype(dtype)
    x_tok = _layer_norm(dec["layernorm_embedding"], x)
    if code_masks is not None:
        x_code = _layer_norm(dec["code_layernorm_embedding"], x)
        x = jnp.where(code_masks[:, None, None], x_code, x_tok)
    else:
        x = x_tok
    return _dropout(x, cfg.dropout, rngs, deterministic)


def _decoder_rel_bias(params, cfg, T: int, code_masks, dtype=None):
    """Per-layer self-attn rel bias [L, H, T, T] (token and/or image variant).

    The bucket grid extends past max_target_positions when T exceeds it
    (bucket values saturate with distance, so a bigger grid is the same
    function): image-gen targets are 1024 codes + bos/eos = 1025 > 1024,
    and the reference only dodges this because its all-code batches never
    touch the token table (unify_transformer.py:1520-1526) — ours is built
    unconditionally for the mixed-batch where()."""
    dec = params["decoder"]
    token_rp = jnp.asarray(
        pos_lib.make_token_bucket_position(
            cfg.token_bucket_size, max(cfg.max_target_positions, T)
        )
    )[:T, :T]
    rel_tok = _rel_gather(dec["token_rel_pos_table"], token_rp, dtype)
    if code_masks is None:
        return rel_tok, None
    img_idx = jnp.asarray(
        pos_lib.decoder_image_position_idx(
            cfg.code_image_size, cfg.image_bucket_size, cfg.max_target_positions
        )
    )[:T]
    image_rp_full = jnp.asarray(
        pos_lib.make_image_bucket_position(cfg.image_bucket_size, cfg.image_num_rel_dis)
    )
    image_rp = image_rp_full[img_idx[:, None], img_idx[None, :]]  # [T, T]
    rel_img = _rel_gather(dec["image_rel_pos_table"], image_rp, dtype)
    return rel_tok, rel_img


def _rel_gather(table: jnp.ndarray, rp: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """table [L, Vb, H] gathered by bucket ids rp [T, T] → [L, H, T, T].

    Gathers through a lane-dense [Vb, L·H] view: the naive
    ``table[:, rp].transpose`` materializes a [T², L, H] intermediate whose
    (L, H) trailing dims pad to the (8, 128) tile — a 14× memory expansion
    (4 GB at T=1025, the image-gen target length; seen as the top HBM
    allocation in the joint-step OOM). The dense view pads 72→128 lanes
    once instead. ``dtype`` casts the (tiny) table BEFORE gathering so the
    [T², L·H] gather output streams at compute precision, not fp32.
    """
    if dtype is not None:
        table = table.astype(dtype)
    L, Vb, H = table.shape
    T = rp.shape[0]
    # NOTE (negative result, r3): gathering along the table's minor axis
    # ([L·H, Vb] columns → output directly in [L, H, T, T], no transpose)
    # measured 4.8 ms SLOWER on the unrolled encoder fwd+bwd despite
    # eliding the [T², L·H] → [L, H, T, T] transpose — XLA's minor-axis
    # gather is far off roofline. Keep the major-axis gather + transpose.
    flat = table.transpose(1, 0, 2).reshape(Vb, L * H)[rp.reshape(-1)]
    return flat.reshape(T, T, L, H).transpose(2, 3, 0, 1)


def _decoder_layer(
    p: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    self_bias: jnp.ndarray,
    cross_bias: jnp.ndarray,
    enc_x: jnp.ndarray,
    enc_pad: jnp.ndarray,
    self_pad: Optional[jnp.ndarray],
    causal_offset: Optional[int],
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_index: Optional[jnp.ndarray] = None,
    rngs=None,
    deterministic=True,
    flash: Optional[Tuple] = None,  # (pos_q, pos_k, rel, cross_pos_q, cross_pos_k)
    drop_path_rate=None,
    prompt_kv: Optional[Tuple] = None,  # prefix-tuning KV for self-attn
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Pre-LN decoder block (ref: unify_transformer_layer.py:296-615).

    With `cache`, runs one incremental step: x is [B, 1, d], cache holds
    self-attn K/V ([B, H, Tmax, hd]) and precomputed cross K/V.
    """
    def dr(i):
        return None if rngs is None else jax.random.fold_in(rngs, i)

    H = cfg.attention_heads
    scaling = float(cfg.head_dim * cfg.attn_scale_factor) ** -0.5

    residual = x
    h = _layer_norm(p["self_attn_layer_norm"], x)
    new_cache = None
    if flash is not None:
        pos_q, pos_k, rel, cross_pos_q, cross_pos_k = flash
        h = _flash_self_attn(
            p["self_attn"], cfg, h, pos_q, pos_k, rel,
            self_pad if self_pad is not None else jnp.zeros(h.shape[:2], bool),
            causal=True,
        )
    elif cache is None:
        h = attention(
            p["self_attn"], cfg, h, h, h, self_bias, self_pad,
            causal_offset=causal_offset,
            dropout_rate=cfg.attention_dropout, rng=dr(0), deterministic=deterministic,
            prompt_kv=prompt_kv,
        )
    else:
        # incremental: append this step's K/V then attend over the prefix
        q = _split_heads(_linear(p["self_attn"]["q_proj"], h) * scaling, H)
        k_new = _split_heads(_linear(p["self_attn"]["k_proj"], h), H)
        v_new = _split_heads(_linear(p["self_attn"]["v_proj"], h), H)
        k = jax.lax.dynamic_update_slice(
            cache["self_k"], k_new.astype(cache["self_k"].dtype), (0, 0, cache_index, 0)
        )
        v = jax.lax.dynamic_update_slice(
            cache["self_v"], v_new.astype(cache["self_v"].dtype), (0, 0, cache_index, 0)
        )
        new_cache = {**cache, "self_k": k, "self_v": v}
        w = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(q.dtype), preferred_element_type=jnp.float32)
        w = w + self_bias.astype(jnp.float32)
        Tmax = k.shape[2]
        valid = jnp.arange(Tmax)[None, None, None, :] <= cache_index
        w = jnp.where(valid, w, NEG_INF)
        probs = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(x.dtype))
        out = _merge_heads(out)
        if "c_attn" in p["self_attn"]:
            b, t, _ = out.shape
            out = (
                out.reshape(b, t, H, cfg.head_dim)
                * p["self_attn"]["c_attn"].astype(out.dtype)[None, None, :, None]
            ).reshape(b, t, -1)
        h = _linear(p["self_attn"]["out_proj"], out)
    if "self_attn_ln" in p:
        h = _layer_norm(p["self_attn_ln"], h)
    h = _dropout(h, cfg.dropout, dr(1), deterministic)
    x = residual + _drop_path(h, drop_path_rate, dr(10), deterministic)

    # cross attention
    residual = x
    h = _layer_norm(p["encoder_attn_layer_norm"], x)
    if flash is not None:
        h = _flash_cross_attn(
            p["encoder_attn"], cfg, h, enc_x, cross_pos_q, cross_pos_k, enc_pad
        )
    elif cache is None:
        h = attention(
            p["encoder_attn"], cfg, h, enc_x, enc_x, cross_bias, enc_pad,
            dropout_rate=cfg.attention_dropout, rng=dr(2), deterministic=deterministic,
        )
    else:
        # beam-shared cross attention: K/V, bias and pad mask are stored once
        # per SAMPLE ([B, ...]); query rows are B*K beams → reshape and share
        rows = h.shape[0]
        Bs = cache["cross_k"].shape[0]
        Kb = rows // Bs
        q = _split_heads(_linear(p["encoder_attn"]["q_proj"], h) * scaling, H)
        int8_kv = "cross_k_scale" in cache
        if int8_kv and cfg.decode_int8_kv_kernel and q.shape[2] == 1:
            # fused Pallas step: reads the int8 cache directly from HBM and
            # dequantizes per-tile in VMEM — the XLA path below materializes
            # a bf16 copy of the whole cache every step (the r2 ~6%-slower
            # negative result). ops/decode_cross_attn.py
            from ..ops.decode_cross_attn import decode_cross_attention_int8

            D = q.shape[-1]
            # beams ride H-major into the kernel (see its docstring)
            qk = q[:, :, 0, :].reshape(Bs, Kb, H, D).transpose(0, 2, 1, 3)
            out = decode_cross_attention_int8(
                qk, cache["cross_k"], cache["cross_v"],
                cache["cross_k_scale"], cache["cross_v_scale"],
                cross_bias[:, :, 0, :], enc_pad,
            )
            out = out.transpose(0, 2, 1, 3).reshape(rows, H, 1, D)
            out = out.astype(x.dtype)
        else:
            qb = q.reshape(Bs, Kb, H, q.shape[2], q.shape[3])
            ck = cache["cross_k"].astype(q.dtype)
            w = jnp.einsum(
                "bkhqd,bhsd->bkhqs", qb, ck,
                preferred_element_type=jnp.float32,
            )
            if int8_kv:
                # int8 KV cache (quantize_cross_kv): the per-position dequant
                # scale factors out of the hd contraction — applied to the
                # tiny [B,K,H,1,S] scores, never to the cache itself
                w = w * cache["cross_k_scale"][:, None, :, None, :]
            w = w + cross_bias.astype(jnp.float32)[:, None]
            w = jnp.where(enc_pad[:, None, None, None, :], -jnp.inf, w)
            probs = jax.nn.softmax(w, axis=-1)
            probs = jnp.where(jnp.isnan(probs), 0.0, probs)
            if int8_kv:
                probs = probs * cache["cross_v_scale"][:, None, :, None, :]
            probs = probs.astype(x.dtype)
            out = jnp.einsum(
                "bkhqs,bhsd->bkhqd", probs, cache["cross_v"].astype(x.dtype)
            )
            out = out.reshape(rows, H, out.shape[3], out.shape[4])
        out = _merge_heads(out)
        if "c_attn" in p["encoder_attn"]:
            b, t, _ = out.shape
            out = (
                out.reshape(b, t, H, cfg.head_dim)
                * p["encoder_attn"]["c_attn"].astype(out.dtype)[None, None, :, None]
            ).reshape(b, t, -1)
        h = _linear(p["encoder_attn"]["out_proj"], out)
    if "cross_attn_ln" in p:
        h = _layer_norm(p["cross_attn_ln"], h)
    h = _dropout(h, cfg.dropout, dr(3), deterministic)
    x = residual + _drop_path(h, drop_path_rate, dr(11), deterministic)

    # FFN
    residual = x
    h = _layer_norm(p["final_layer_norm"], x)
    h = _gelu(_linear(p["fc1"], h))
    h = _dropout(h, cfg.activation_dropout, dr(4), deterministic)
    if "ffn_layernorm" in p:
        h = _layer_norm(p["ffn_layernorm"], h)
    h = _linear(p["fc2"], h)
    h = _dropout(h, cfg.dropout, dr(5), deterministic)
    if "adapter" in p:
        h = _apply_adapter(p["adapter"], h)
    if "w_resid" in p:
        residual = residual * p["w_resid"].astype(residual.dtype)
    return residual + _drop_path(h, drop_path_rate, dr(12), deterministic), new_cache


def decode(
    params: Params,
    cfg: ModelConfig,
    prev_output_tokens: jnp.ndarray,  # [B, T]
    encoder_out: EncoderOut,
    code_masks: Optional[jnp.ndarray] = None,  # [B] bool
    rngs: Optional[jax.Array] = None,
    deterministic: bool = True,
    features_only: bool = False,
    code_masks_all: bool = False,  # STATIC: every row is a code sequence
) -> jnp.ndarray:
    """Teacher-forced decoder forward → logits [B, T, V].

    ref: unify_transformer.py:1393-1583.

    ``code_masks_all=True`` is a static promise that ``code_masks`` is
    all-True (image-gen / pure-image batches are always homogeneous) — the
    equivalent of the reference's runtime ``code_masks.all()`` branch
    (unify_transformer.py:1520-1526). It keeps the Pallas flash path
    usable for full-length (1025-token) code targets, whose [B, H, T, T]
    materialized-bias XLA path needs >20 GB of HBM.
    """
    B, T = prev_output_tokens.shape
    dtype = jnp.dtype(cfg.dtype)
    dec = params["decoder"]

    use_flash = (
        cfg.use_flash_attention
        and (code_masks is None or code_masks_all)
        and not cfg.decoder_prompt
        and (deterministic or cfg.attention_dropout == 0.0)
    )
    # sequence parallelism over the TARGET stream: causal ring self-attn +
    # query-row-partitioned cross attention (see _decoder_layer_sp)
    sp_mesh = _active_seq_mesh(cfg)
    if sp_mesh is not None and (
        (code_masks is not None and not code_masks_all)
        or cfg.decoder_prompt
        or not (
            deterministic
            or (
                cfg.dropout == 0.0
                and cfg.attention_dropout == 0.0
                and cfg.activation_dropout == 0.0
                and cfg.decoder_drop_path_rate == 0.0
            )
        )
    ):
        sp_mesh = None
    if sp_mesh is not None:
        use_flash = True
    dec_dp = cfg.decoder_drop_path_rate > 0 and not deterministic
    dec_prompt_kv = (
        _prompt_kv(
            dec["prompt_embedding"], cfg.decoder_layers, cfg.attention_heads,
            cfg.head_dim, B, dtype,
        )
        if cfg.decoder_prompt
        else None
    )

    self_pad = prev_output_tokens == cfg.pad
    # fairseq only applies self-attn padding mask when pads exist; padded
    # positions' outputs are garbage either way (ignored by the loss), and the
    # causal mask already hides them from real positions when targets are
    # left-aligned. We pass it for full parity.
    enc_x = encoder_out.x.astype(dtype)
    enc_pad = encoder_out.padding_mask

    if use_flash:
        # Pad the encoder stream ONCE for the per-layer cross-attn K/V
        # projections (same rationale + pad-ratio gate as encode()'s
        # pad-once): the flash kernel pads keys to a 128 multiple per layer
        # otherwise — fwd AND re-sliced in bwd, ×decoder_layers.
        S_enc = enc_x.shape[1]
        enc_pos = encoder_out.pos_embed
        _Spad_c = -(-S_enc // 128) * 128
        _pad_once = cfg.flash_pad_once and (
            cfg.unroll_layers or (deterministic and rngs is None)
        )
        if _pad_once and _Spad_c != S_enc and _Spad_c <= S_enc * 1.1:
            enc_x = jnp.pad(enc_x, ((0, 0), (0, _Spad_c - S_enc), (0, 0)))
            enc_pad = jnp.pad(
                enc_pad, ((0, 0), (0, _Spad_c - S_enc)), constant_values=True
            )
            enc_pos = jnp.pad(
                enc_pos, ((0, 0), (0, _Spad_c - S_enc), (0, 0))
            )
        all_code = code_masks is not None  # static (code_masks_all checked)
        if all_code:
            # all-code positions: image grid pos embeds + image_pos_ln
            # (ref: unify_transformer.py:1451-1465 all-code branch)
            img_idx = jnp.asarray(
                pos_lib.decoder_image_position_idx(
                    cfg.code_image_size, cfg.image_bucket_size,
                    cfg.max_target_positions,
                )
            )[:T]
            pos_e = dec["embed_image_positions"][img_idx][None]
            tgt_pos_embed = jnp.broadcast_to(pos_e, (B, T, cfg.embed_dim))
            pe = _layer_norm(dec["image_pos_ln"], tgt_pos_embed.astype(dtype))
        else:
            tok_pos = dec["embed_positions"][jnp.arange(T)][None]
            tgt_pos_embed = jnp.broadcast_to(tok_pos, (B, T, cfg.embed_dim))
            pe = _layer_norm(dec["pos_ln"], tgt_pos_embed.astype(dtype))
        pos_q = _pos_proj(dec["self_pos_q_linear"], pe, cfg, True, dtype)
        pos_k = _pos_proj(dec["self_pos_k_linear"], pe, cfg, False, dtype)
        cross_pos_q = _pos_proj(dec["cross_pos_q_linear"], pe, cfg, True, dtype)
        cross_pos_k = _pos_proj(
            dec["cross_pos_k_linear"], enc_pos, cfg, False, dtype
        )
        x = _decoder_embed(
            params, cfg, prev_output_tokens, tgt_pos_embed,
            code_masks if all_code else None, dtype,
            rngs=rngs, deterministic=deterministic,
        )
        rel_tok, rel_img = _decoder_rel_bias(
            params, cfg, T, code_masks if all_code else None, dtype
        )
        rel_flash = rel_img if all_code else rel_tok

        # pad-once for the TARGET stream (image-gen code targets:
        # T=1025 → 1152, ratio 1.124): same rationale + gates as the
        # encoder pad-once. Padded rows ride as kpad=True keys (and the
        # causal mask already hides cols ≥ T from real rows); the garbage
        # padded rows are sliced off before the final LN/output projection.
        _SkT = -(-T // 128) * 128
        _bqT = 256 if (T >= 256 and _SkT <= 1024) else 128
        Tpad = -(-T // _bqT) * _bqT
        if sp_mesh is not None:
            # the ring shards T evenly; pad with kpad rows (causality already
            # hides the trailing pad cols from real rows)
            Tpad = -(-T // sp_mesh.shape["seq"]) * sp_mesh.shape["seq"]
        if (sp_mesh is not None and Tpad != T) or (
            sp_mesh is None and _pad_once and Tpad != T and Tpad <= T * 1.1
        ):
            tpw = ((0, 0), (0, Tpad - T), (0, 0))
            hpw = ((0, 0), (0, 0), (0, Tpad - T), (0, 0))
            x = jnp.pad(x, tpw)
            self_pad = jnp.pad(
                self_pad, ((0, 0), (0, Tpad - T)), constant_values=True
            )
            pos_q = jnp.pad(pos_q, hpw)
            pos_k = jnp.pad(pos_k, hpw)
            cross_pos_q = jnp.pad(cross_pos_q, hpw)
            rel_flash = jnp.pad(
                rel_flash, ((0, 0), (0, 0), (0, Tpad - T), (0, Tpad - T))
            )
            T = Tpad

        if sp_mesh is not None:

            def layer_body(x, layer_in):
                layer_p, rt, dp_rate = layer_in
                fwd = lambda xx: _decoder_layer_sp(
                    layer_p, cfg, xx, pos_q, pos_k, rt, self_pad,
                    enc_x, enc_pad, cross_pos_q, cross_pos_k, sp_mesh,
                )
                if cfg.remat:
                    fwd = jax.checkpoint(fwd)
                return fwd(x), None
        else:

            def layer_body(x, layer_in):
                layer_p, rt, dp_rate = layer_in
                fwd = lambda xx: _decoder_layer(
                    layer_p, cfg, xx, None, None, enc_x, enc_pad, self_pad,
                    causal_offset=None, rngs=rngs, deterministic=deterministic,
                    flash=(pos_q, pos_k, rt, cross_pos_q, cross_pos_k),
                    drop_path_rate=dp_rate if dec_dp else None,
                )[0]
                if cfg.remat:
                    fwd = jax.checkpoint(fwd)
                return fwd(x), None

        xs = (dec["layers"], rel_flash, _dec_dpr(cfg))
    else:
        tgt_pos_embed, self_bias, cross_bias = _decoder_pos_setup(
            params, cfg, B, T, encoder_out.pos_embed, code_masks, dtype
        )
        x = _decoder_embed(
            params, cfg, prev_output_tokens, tgt_pos_embed, code_masks, dtype,
            rngs=rngs, deterministic=deterministic,
        )
        rel_tok, rel_img = _decoder_rel_bias(params, cfg, T, code_masks)

        def layer_body(x, layer_in):
            pkv = None
            if code_masks is None and cfg.decoder_prompt:
                layer_p, rt, dp_rate, pkv = layer_in
                rel = rt[None]
            elif code_masks is None:
                layer_p, rt, dp_rate = layer_in
                rel = rt[None]
            else:
                layer_p, rt, ri, dp_rate = layer_in
                rel = jnp.where(code_masks[:, None, None, None], ri[None], rt[None])
            bias = self_bias + rel.astype(self_bias.dtype)
            fwd = lambda xx: _decoder_layer(
                layer_p, cfg, xx, bias, cross_bias, enc_x, enc_pad, self_pad,
                causal_offset=0, rngs=rngs, deterministic=deterministic,
                drop_path_rate=dp_rate if dec_dp else None,
                prompt_kv=(pkv[0], pkv[1]) if pkv is not None else None,
            )[0]
            if cfg.remat:
                fwd = jax.checkpoint(fwd)
            return fwd(x), None

        if code_masks is None and cfg.decoder_prompt:
            xs = (dec["layers"], rel_tok, _dec_dpr(cfg), dec_prompt_kv)
        elif code_masks is None:
            xs = (dec["layers"], rel_tok, _dec_dpr(cfg))
        else:
            xs = (dec["layers"], rel_tok, rel_img, _dec_dpr(cfg))

    _no_reg_dec = (
        cfg.dropout == 0.0 and cfg.attention_dropout == 0.0
        and cfg.activation_dropout == 0.0 and not dec_dp
    )
    pipe_mesh = (
        _active_pipe_mesh(cfg)
        if (
            use_flash and sp_mesh is None and code_masks is None
            and (rngs is None or _no_reg_dec)
        )
        else None
    )
    if pipe_mesh is not None:
        from ..parallel.pipeline import pipeline_scan

        M = cfg.pipeline_microbatches
        assert B % M == 0, f"batch {B} not divisible by microbatches {M}"
        token_rp_dec = jnp.asarray(
            pos_lib.make_token_bucket_position(
                cfg.token_bucket_size, cfg.max_target_positions
            )
        )[:T, :T]
        payload = {
            "x": x, "self_pad": self_pad,
            "pos_q": pos_q, "pos_k": pos_k,
            "cross_pos_q": cross_pos_q, "cross_pos_k": cross_pos_k,
            "enc_x": enc_x, "enc_pad": enc_pad,
        }
        payload_mb = jax.tree.map(
            lambda a: a.reshape((M, B // M) + a.shape[1:]), payload
        )

        def pipe_body(pl, layer_in, _consts):
            layer_p, token_table, _dp = layer_in
            rel = token_table[token_rp_dec].transpose(2, 0, 1).astype(jnp.float32)
            new_x = _decoder_layer(
                layer_p, cfg, pl["x"], None, None, pl["enc_x"], pl["enc_pad"],
                pl["self_pad"], causal_offset=None, deterministic=True,
                flash=(pl["pos_q"], pl["pos_k"], rel,
                       pl["cross_pos_q"], pl["cross_pos_k"]),
            )[0]
            return {**pl, "x": new_x}

        out = pipeline_scan(
            pipe_body, payload_mb,
            (dec["layers"], dec["token_rel_pos_table"], _dec_dpr(cfg)),
            pipe_mesh, "pipe", remat=cfg.remat,
            interleave=_usable_interleave(
                cfg, cfg.decoder_layers, pipe_mesh, M
            ),
        )
        x = out["x"].reshape((B,) + out["x"].shape[2:])
    else:
        x = _scan_or_unroll(layer_body, x, xs, cfg.unroll_layers)
    if x.shape[1] != prev_output_tokens.shape[1]:  # target pad-once rows
        x = x[:, : prev_output_tokens.shape[1]]
    x = _layer_norm(dec["layer_norm"], x)
    if features_only:
        return x
    return output_layer(params, cfg, x)


def quantize_cross_kv(state: "DecoderState") -> "DecoderState":
    """Per-position absmax int8 quantization of the cross-attention K/V cache.

    Serving option: halves the cross-KV cache footprint (268 MB for
    ofa_base at B16/S~900). The per-(layer,batch,head,position) scale
    factors out of both attention contractions exactly —
    ``q·(k·s) = (q·k)·s`` applied to the scores along S, and
    ``Σ p·(v·s) = Σ (p·s)·v`` applied to the probabilities.

    Measured NEGATIVE speed result on v5e at B16/S~900 (BENCH r2): ~6%
    slower end-to-end because XLA materializes the int8→bf16 convert
    rather than fusing it into the attention einsum — use for memory,
    not latency, until that fusion lands.
    """
    cache = state.cache

    def q(a):
        af = a.astype(jnp.float32)
        scale = jnp.maximum(
            jnp.max(jnp.abs(af), axis=-1, keepdims=True), 1e-8
        ) / 127.0
        qa = jnp.clip(jnp.round(af / scale), -127, 127).astype(jnp.int8)
        return qa, scale[..., 0]  # [L, B, H, S]

    ck, ck_s = q(cache["cross_k"])
    cv, cv_s = q(cache["cross_v"])
    return state._replace(
        cache={
            **cache,
            "cross_k": ck,
            "cross_v": cv,
            "cross_k_scale": ck_s,
            "cross_v_scale": cv_s,
        }
    )


def quantize_output_proj(params: Params) -> Params:
    """Per-row absmax int8 quantization of the tied output projection.

    Inference-only serving optimization: the incremental decode loop is
    bound by re-reading the [Vp, d] embedding from HBM every step (91 MB
    bf16 for ofa_base); int8 halves that traffic. The input-embedding
    lookup keeps the original weights. Apply to a params tree before
    serving — never to a training state (the extra leaves would be
    optimized). Dequantization is a per-vocab-row scale on the logits,
    fused by XLA into the matmul epilogue.
    """
    w = params["embed_tokens"]
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {
        **params,
        "embed_tokens_q8": q,
        "embed_tokens_scale": scale[:, 0].astype(jnp.float32),
    }


def output_layer(params: Params, cfg: ModelConfig, features: jnp.ndarray) -> jnp.ndarray:
    """Tied output projection; pads vocab ids masked to -inf."""
    if "embed_tokens_q8" in params:
        w8 = params["embed_tokens_q8"]  # int8 HBM read; bf16 MXU compute
        logits = features @ w8.astype(features.dtype).T
        logits = logits * params["embed_tokens_scale"].astype(features.dtype)[
            None, None, :
        ]
    else:
        logits = features @ params["embed_tokens"].astype(features.dtype).T
    if cfg.padded_vocab_size > cfg.vocab_size:
        mask = jnp.arange(cfg.padded_vocab_size) >= cfg.vocab_size
        logits = jnp.where(mask[None, None, :], NEG_INF, logits)
    return logits


def forward(
    params: Params,
    cfg: ModelConfig,
    src_tokens: jnp.ndarray,
    prev_output_tokens: jnp.ndarray,
    patch_images: Optional[jnp.ndarray] = None,
    patch_masks: Optional[jnp.ndarray] = None,
    code_masks: Optional[jnp.ndarray] = None,
    sample_patch_order: Optional[jnp.ndarray] = None,
    rngs: Optional[jax.Array] = None,
    deterministic: bool = True,
    train_bn: bool = False,
    resnet_feats: Optional[jnp.ndarray] = None,
    code_masks_all: bool = False,
) -> jnp.ndarray:
    """Full model forward → logits (ref: models/ofa/ofa.py:80-97)."""
    enc_out = encode(
        params, cfg, src_tokens, patch_images, patch_masks,
        sample_patch_order=sample_patch_order,
        rngs=rngs, deterministic=deterministic, train_bn=train_bn,
        resnet_feats=resnet_feats,
    )
    return decode(
        params, cfg, prev_output_tokens, enc_out, code_masks=code_masks,
        rngs=rngs, deterministic=deterministic,
        code_masks_all=code_masks_all,
    )


# ---------------------------------------------------------------------------
# incremental decoding support
# ---------------------------------------------------------------------------

class DecoderState(NamedTuple):
    """Static-shape state for incremental decoding under jit."""

    cache: Dict[str, jnp.ndarray]  # stacked [L, ...] self_k/self_v/cross_k/cross_v
    enc_pad: jnp.ndarray  # [B, S]
    self_bias_full: jnp.ndarray  # [B, H, Tmax, Tmax] fp32 (abs pos, no rel)
    cross_bias_full: jnp.ndarray  # [B, H, Tmax, S]
    rel_full: jnp.ndarray  # [L, B or 1, H, Tmax, Tmax] self rel bias
    tgt_pos_embed: jnp.ndarray  # [B, Tmax, d]
    # fused decoder-stack kernel weight pack (ops/decode_stack.py), built
    # once per decode session when cfg.decode_stack_kernel applies; rides
    # the decode loop's carry so it is never re-materialized per step
    kernel_pack: Optional[Dict[str, jnp.ndarray]] = None


def init_decoder_state(
    params: Params,
    cfg: ModelConfig,
    encoder_out: EncoderOut,
    max_len: int,
    code_masks: Optional[jnp.ndarray] = None,
    beam_size: int = 1,
) -> DecoderState:
    """Precompute everything reusable across decode steps.

    With ``beam_size`` > 1, pass the UNTILED encoder output: the cross-attn
    K/V, bias, and padding mask are identical across a sample's beams, so
    they are stored once per sample and shared inside ``decode_step`` —
    otherwise the tiled cross K/V dominates per-step HBM traffic
    (L·B·K·H·S·hd reads every step). Self-attn state is per beam row.
    """
    dec = params["decoder"]
    B, S, _ = encoder_out.x.shape
    rows = B * beam_size
    dtype = jnp.dtype(cfg.dtype)
    H, hd, L = cfg.attention_heads, cfg.head_dim, cfg.decoder_layers

    # cross bias / pos setup over the UNtiled batch; code_masks per row → per
    # sample (beams share the sample's code mask; callers pass row-level masks)
    sample_code_masks = (
        code_masks[::beam_size] if code_masks is not None else None
    )
    tgt_pos_embed_s, self_bias_s, cross_bias = _decoder_pos_setup(
        params, cfg, B, max_len, encoder_out.pos_embed, sample_code_masks, dtype
    )
    # per-row copies for self-attn side (tiny: [rows, H, T, T] with T=max_len)
    tgt_pos_embed = jnp.repeat(tgt_pos_embed_s, beam_size, axis=0)
    self_bias = jnp.repeat(self_bias_s, beam_size, axis=0)

    rel_tok, rel_img = _decoder_rel_bias(params, cfg, max_len, code_masks)
    if code_masks is None:
        rel = rel_tok[:, None]  # [L, 1, H, T, T]
    else:
        rel = jnp.where(
            code_masks[None, :, None, None, None], rel_img[:, None], rel_tok[:, None]
        )

    # precompute per-layer cross K/V from the untiled encoder output
    enc_x = encoder_out.x.astype(dtype)

    def cross_kv(layer_p):
        k = _split_heads(_linear(layer_p["encoder_attn"]["k_proj"], enc_x), H)
        v = _split_heads(_linear(layer_p["encoder_attn"]["v_proj"], enc_x), H)
        return k, v

    cross_k, cross_v = jax.vmap(cross_kv)(dec["layers"])  # [L, B, H, S, hd]

    if cfg.decoder_prompt:
        # Prefix-tuning: seed the first P cache slots with the prompt K/V so
        # every decode step attends over [prompt | generated-so-far]. The
        # positional bias gets P zero columns (prompt keys carry no pos bias,
        # ref: attn_weights[:, :, -src_len:] += attn_bias) and decode_step
        # writes new K/V at index P+step (derived from the shape delta).
        P = cfg.decoder_prompt_length
        pkv = _prompt_kv(
            dec["prompt_embedding"], L, H, hd, rows, dtype
        )  # [L, 2, rows, H, P, hd]
        zeros_tail = jnp.zeros((L, rows, H, max_len, hd), dtype)
        self_k = jnp.concatenate([pkv[:, 0], zeros_tail], axis=3)
        self_v = jnp.concatenate([pkv[:, 1], zeros_tail], axis=3)
        self_bias = jnp.pad(self_bias, ((0, 0), (0, 0), (0, 0), (P, 0)))
        rel = jnp.pad(rel, ((0, 0), (0, 0), (0, 0), (0, 0), (P, 0)))
    else:
        self_k = jnp.zeros((L, rows, H, max_len, hd), dtype)
        self_v = jnp.zeros((L, rows, H, max_len, hd), dtype)

    cache = {
        "self_k": self_k,
        "self_v": self_v,
        "cross_k": cross_k,
        "cross_v": cross_v,
    }
    enc_pad = encoder_out.padding_mask  # [B, S] untiled

    kernel_pack = None
    if (
        cfg.decode_stack_kernel
        and not cfg.decoder_prompt
        and not (cfg.scale_attn or cfg.scale_fc or cfg.scale_heads or cfg.scale_resids)
    ):
        from ..ops.decode_stack import pack_decoder_weights

        kernel_pack = pack_decoder_weights(dec["layers"], dtype)
        # the kernel streams cross-K/V per sample chunk — pad S to the
        # sublane multiple once here (zero K/V + pad-masked columns are
        # exact zeros through both the kernel and the XLA softmax)
        if S % 8:
            padn = 8 - S % 8
            cache["cross_k"] = jnp.pad(
                cache["cross_k"], ((0, 0),) * 3 + ((0, padn), (0, 0))
            )
            cache["cross_v"] = jnp.pad(
                cache["cross_v"], ((0, 0),) * 3 + ((0, padn), (0, 0))
            )
            cross_bias = jnp.pad(
                cross_bias, ((0, 0),) * 3 + ((0, padn),)
            )
            enc_pad = jnp.pad(enc_pad, ((0, 0), (0, padn)), constant_values=True)
        # the kernel streams the cross K/V in a transposed [L*B, H, hd, S]
        # layout (S-minor; see ops/decode_stack.py) — build it once here
        # so it rides the decode loop's carried cache
        from ..ops.decode_stack import transpose_cross_kv

        cache["cross_kt"], cache["cross_vt"] = transpose_cross_kv(
            cache["cross_k"], cache["cross_v"]
        )

    return DecoderState(
        cache=cache,
        enc_pad=enc_pad,
        self_bias_full=self_bias,
        cross_bias_full=cross_bias,  # [B, H, T, S] untiled
        rel_full=rel,
        tgt_pos_embed=tgt_pos_embed,
        kernel_pack=kernel_pack,
    )


def decode_step(
    params: Params,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B] current input token
    step: jnp.ndarray,  # scalar int32 current position
    state: DecoderState,
    code_masks: Optional[jnp.ndarray] = None,
    features_only: bool = False,
) -> Tuple[jnp.ndarray, DecoderState]:
    """One incremental decode step → (logits [B, V], new state).

    ``features_only`` returns the post-LN features [B, d] instead of
    logits — the beam fast path fuses the output projection with its
    softmax stats in a Pallas kernel (ops/topk_projection.py)."""
    dec = params["decoder"]
    B = tokens.shape[0]
    dtype = jnp.dtype(cfg.dtype)
    Tmax = state.tgt_pos_embed.shape[1]

    pos_embed_t = jax.lax.dynamic_slice_in_dim(state.tgt_pos_embed, step, 1, axis=1)
    x = _decoder_embed(
        params, cfg, tokens[:, None], pos_embed_t, code_masks, dtype
    )

    self_bias_t = jax.lax.dynamic_slice_in_dim(state.self_bias_full, step, 1, axis=2)
    cross_bias_t = jax.lax.dynamic_slice_in_dim(state.cross_bias_full, step, 1, axis=2)
    rel_t = jax.lax.dynamic_slice_in_dim(state.rel_full, step, 1, axis=3)  # [L,b,H,1,T]

    # prefix-tuning: cache rows are [prompt | tokens]; new K/V land at P+step
    # (P derived statically from the cache/pos-table shape delta)
    prompt_len = state.cache["self_k"].shape[3] - Tmax
    cache_index = step + prompt_len if prompt_len else step

    int8_kv = "cross_k_scale" in state.cache  # see quantize_cross_kv

    Bs = state.cache["cross_k"].shape[1]
    use_stack = (
        state.kernel_pack is not None
        and "cross_kt" in state.cache
        and not int8_kv
        and prompt_len == 0
        and state.cache["cross_k"].shape[3] % 8 == 0
        # the transposed DMA stream needs a >=128-lane minor dim on TPU
        and (
            state.cache["cross_k"].shape[3] >= 128
            or jax.default_backend() == "cpu"
        )
        and B % Bs == 0
        and Bs % 2 == 0  # DMA slot rotation needs an even sample count
    )
    if use_stack:
        # single-launch fused decoder stack (ops/decode_stack.py) — one
        # pallas_call runs all L layers; the new K/V column lands in the
        # stacked cache via one dynamic_update_slice out here
        from ..ops.decode_stack import NEG_INF as _NI
        from ..ops.decode_stack import decode_stack_step

        L = cfg.decoder_layers
        H, hd = cfg.attention_heads, cfg.head_dim
        scaling = float(cfg.head_dim * cfg.attn_scale_factor) ** -0.5
        sbias = (
            self_bias_t[None, :, :, 0, :].astype(jnp.float32)
            + rel_t[:, :, :, 0, :].astype(jnp.float32)
        )
        sbias = jnp.broadcast_to(sbias, (L, B) + sbias.shape[2:])
        cbias = jnp.where(
            state.enc_pad[:, None, :],
            _NI,
            cross_bias_t[:, :, 0, :].astype(jnp.float32),
        )
        x1, k_new, v_new = decode_stack_step(
            state.kernel_pack, x[:, 0], sbias, cbias,
            state.cache["self_k"], state.cache["self_v"],
            state.cache["cross_kt"], state.cache["cross_vt"],
            cache_index, beam_size=B // Bs, scaling=scaling,
        )
        ck = state.cache["self_k"]
        kn = k_new.reshape(L, B, H, 1, hd).astype(ck.dtype)
        vn = v_new.reshape(L, B, H, 1, hd).astype(ck.dtype)
        new_self_k = jax.lax.dynamic_update_slice(
            ck, kn, (0, 0, 0, cache_index, 0)
        )
        new_self_v = jax.lax.dynamic_update_slice(
            state.cache["self_v"], vn, (0, 0, 0, cache_index, 0)
        )
        x = _layer_norm(dec["layer_norm"], x1[:, None, :])
        new_cache = {
            **state.cache, "self_k": new_self_k, "self_v": new_self_v,
        }
        if features_only:
            return x[:, 0], state._replace(cache=new_cache)
        return output_layer(params, cfg, x)[:, 0], state._replace(cache=new_cache)

    def layer_body(x, layer_in):
        if int8_kv:
            layer_p, rel_i, self_k, self_v, cross_k, cross_v, ck_s, cv_s = layer_in
        else:
            layer_p, rel_i, self_k, self_v, cross_k, cross_v = layer_in
            ck_s = cv_s = None
        cache_i = {
            "self_k": self_k, "self_v": self_v,
            "cross_k": cross_k, "cross_v": cross_v,
        }
        if int8_kv:
            cache_i["cross_k_scale"] = ck_s
            cache_i["cross_v_scale"] = cv_s
        bias_i = self_bias_t + rel_i.astype(self_bias_t.dtype)
        x, cache_i = _decoder_layer(
            layer_p, cfg, x, bias_i, cross_bias_t, None, state.enc_pad, None,
            causal_offset=None, cache=cache_i, cache_index=cache_index,
        )
        return x, (cache_i["self_k"], cache_i["self_v"])

    xs = (
        dec["layers"], rel_t,
        state.cache["self_k"], state.cache["self_v"],
        state.cache["cross_k"], state.cache["cross_v"],
    )
    if int8_kv:
        xs = xs + (state.cache["cross_k_scale"], state.cache["cross_v_scale"])
    x, (new_self_k, new_self_v) = jax.lax.scan(
        layer_body,
        x,
        xs,
        # unrolling lets XLA overlap each layer's HBM weight fetch with the
        # previous layer's compute — the decode step is weight-read bound
        unroll=4,
    )

    x = _layer_norm(dec["layer_norm"], x)
    new_cache = {
        **state.cache,
        "self_k": new_self_k,
        "self_v": new_self_v,
    }
    if features_only:
        return x[:, 0], state._replace(cache=new_cache)
    logits = output_layer(params, cfg, x)[:, 0]
    return logits, state._replace(cache=new_cache)
