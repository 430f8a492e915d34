"""CLIP (frozen, inference-only) in functional JAX.

The reference vendors OpenAI CLIP as the image-generation reward/eval model
(ref: models/clip/clip.py:116-254, models/clip/model.py:1-462; used by
tasks/mm_tasks/image_gen.py:262-291 and criterions/clip_scst_loss.py:109-140).
This is a fresh functional implementation of the published architecture
(ViT-B/32-style image tower + causal text tower) with a converter from the
OpenAI state-dict names. Weights must be supplied (zero-egress environment);
everything here is inference-only bf16/fp32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class ClipConfig:
    # ViT-B/16 defaults (the reference's image_gen uses ViT-B/16, image_gen.py:137-199)
    image_resolution: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    # text tower
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_layers: int = 12
    transformer_heads: int = 8
    # ModifiedResNet tower (RN50/101-CLIP, ref: models/clip/model.py:118-180);
    # when set, vision_width is the stem width (64 for RN50) and the
    # ViT fields above are ignored for the image tower
    rn_layers: Optional[tuple] = None


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _mha(p, x, heads: int, causal_mask: Optional[jnp.ndarray] = None):
    B, T, D = x.shape
    hd = D // heads
    qkv = _linear(p["in_proj"], x)  # [B, T, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(a):
        return a.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q) * (hd**-0.5), split(k), split(v)
    w = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if causal_mask is not None:
        w = w + causal_mask
    probs = jax.nn.softmax(w, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return _linear(p["out_proj"], out)


def _block(p, x, heads, causal_mask=None):
    x = x + _mha(p["attn"], _ln(p["ln_1"], x), heads, causal_mask)
    h = _ln(p["ln_2"], x)
    h = _linear(p["mlp_fc"], h)
    h = h * jax.nn.sigmoid(1.702 * h)  # quick-gelu (OpenAI CLIP)
    h = _linear(p["mlp_proj"], h)
    return x + h


# ---------------------------------------------------------------------------
# ModifiedResNet image tower (RN50/101-CLIP, ref: models/clip/model.py:20-180)
# Inference-only: BatchNorms are folded to per-channel scale/shift at convert
# time, convs run NHWC/HWIO on the MXU.
# ---------------------------------------------------------------------------

def _conv(w, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x):
    return x * p["scale"].astype(x.dtype) + p["shift"].astype(x.dtype)


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _bottleneck(p, x, stride: int):
    """Anti-aliased bottleneck: stride>1 becomes avgpool after conv2
    (ref: model.py:40-78)."""
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out)))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    if "downsample" in p:
        idn = x if stride == 1 else _avgpool(x, stride)
        idn = _bn(p["ds_bn"], _conv(p["downsample"], idn))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def _attention_pool(p, x, heads: int):
    """QKV attention pool over [B,H,W,C] + mean token → [B, out_dim]
    (ref: model.py:80-117 AttentionPool2d; only the mean-token query's
    output is used, so we attend with a single query)."""
    B, H, W, C = x.shape
    toks = x.reshape(B, H * W, C)
    toks = jnp.concatenate([toks.mean(1, keepdims=True), toks], axis=1)
    toks = toks + p["positional_embedding"].astype(toks.dtype)[None]
    q = _linear(p["q_proj"], toks[:, :1])
    k = _linear(p["k_proj"], toks)
    v = _linear(p["v_proj"], toks)
    hd = C // heads
    q = q.reshape(B, 1, heads, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
    k = k.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    w = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(w, axis=-1).astype(toks.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, C)
    return _linear(p["c_proj"], out)


def _encode_image_rn(params: Params, cfg: ClipConfig, images: jnp.ndarray):
    v = params["visual"]
    # 3-conv stem, stride 2 on the first; explicit (1,1) padding matches
    # torch Conv2d(k=3, s=2, p=1) (XLA "SAME" would pad (0,1) at stride 2)
    x = jax.nn.relu(
        _bn(v["bn1"], _conv(v["conv1"], images, stride=2, padding=((1, 1), (1, 1))))
    )
    for i in (2, 3):
        x = jax.nn.relu(_bn(v[f"bn{i}"], _conv(v[f"conv{i}"], x)))
    x = _avgpool(x, 2)
    for li, nblocks in enumerate(cfg.rn_layers, start=1):
        for bi in range(nblocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = _bottleneck(v[f"layer{li}"][bi], x, stride)
    heads = cfg.vision_width * 32 // 64
    return _attention_pool(v["attnpool"], x, heads)


def encode_image(params: Params, cfg: ClipConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] (CLIP-normalized) → embeddings [B, embed_dim]."""
    if cfg.rn_layers is not None:
        return _encode_image_rn(params, cfg, images)
    v = params["visual"]
    x = jax.lax.conv_general_dilated(
        images, v["conv1"].astype(images.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B, gh, gw, D = x.shape
    x = x.reshape(B, gh * gw, D)
    cls = jnp.broadcast_to(v["class_embedding"].astype(x.dtype), (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(x.dtype)[None]
    x = _ln(v["ln_pre"], x)
    for i in range(cfg.vision_layers):
        x = _block(jax.tree.map(lambda a: a[i], v["blocks"]), x, cfg.vision_heads)
    x = _ln(v["ln_post"], x[:, 0])
    return x @ v["proj"].astype(x.dtype)


def encode_text(params: Params, cfg: ClipConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [B, 77] int32 (CLIP BPE, eot = argmax) → [B, embed_dim]."""
    x = params["token_embedding"].astype(jnp.float32)[tokens]
    x = x + params["positional_embedding"][None, : x.shape[1]]
    T = x.shape[1]
    causal = jnp.where(
        jnp.arange(T)[None, :] > jnp.arange(T)[:, None], -1e9, 0.0
    )[None, None]
    for i in range(cfg.transformer_layers):
        x = _block(
            jax.tree.map(lambda a: a[i], params["blocks"]), x,
            cfg.transformer_heads, causal,
        )
    x = _ln(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ params["text_projection"].astype(x.dtype)


def clip_scores(params, cfg, images, tokens):
    """Cosine similarities scaled by logit_scale → [B_img, B_txt]."""
    ie = encode_image(params, cfg, images)
    te = encode_text(params, cfg, tokens)
    ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    return jnp.exp(params["logit_scale"]) * ie @ te.T


# ---------------------------------------------------------------------------
# converter from OpenAI CLIP state dict
# ---------------------------------------------------------------------------

def _fold_bn(sd, t, prefix: str, eps: float = 1e-5) -> Params:
    """BatchNorm2d (frozen, eval) → per-channel scale/shift."""
    w, b = t(sd[f"{prefix}.weight"]), t(sd[f"{prefix}.bias"])
    mu, var = t(sd[f"{prefix}.running_mean"]), t(sd[f"{prefix}.running_var"])
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "shift": b - mu * scale}


def _convert_rn_visual(sd, t) -> tuple[Params, tuple, int]:
    """ModifiedResNet visual.* names → params (ref: model.py:118-180)."""

    def cw(key):  # torch OIHW → HWIO
        return t(sd[key]).transpose(2, 3, 1, 0)

    rn_layers = tuple(
        1 + max(
            int(k.split(".")[2]) for k in sd
            if k.startswith(f"visual.layer{li}.")
        )
        for li in (1, 2, 3, 4)
    )
    visual: Params = {}
    for i in (1, 2, 3):
        visual[f"conv{i}"] = cw(f"visual.conv{i}.weight")
        visual[f"bn{i}"] = _fold_bn(sd, t, f"visual.bn{i}")
    for li, nblocks in enumerate(rn_layers, start=1):
        blocks = []
        for bi in range(nblocks):
            pre = f"visual.layer{li}.{bi}"
            blk = {
                "conv1": cw(f"{pre}.conv1.weight"),
                "bn1": _fold_bn(sd, t, f"{pre}.bn1"),
                "conv2": cw(f"{pre}.conv2.weight"),
                "bn2": _fold_bn(sd, t, f"{pre}.bn2"),
                "conv3": cw(f"{pre}.conv3.weight"),
                "bn3": _fold_bn(sd, t, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = cw(f"{pre}.downsample.0.weight")
                blk["ds_bn"] = _fold_bn(sd, t, f"{pre}.downsample.1")
            blocks.append(blk)
        visual[f"layer{li}"] = blocks
    ap = "visual.attnpool"
    visual["attnpool"] = {
        "positional_embedding": t(sd[f"{ap}.positional_embedding"]),
        **{
            f"{n}_proj": {
                "w": t(sd[f"{ap}.{n}_proj.weight"]).T,
                "b": t(sd[f"{ap}.{n}_proj.bias"]),
            }
            for n in ("q", "k", "v", "c")
        },
    }
    width = sd["visual.layer1.0.conv1.weight"].shape[0]
    return visual, rn_layers, width


def convert_clip_state_dict(sd) -> tuple[Params, ClipConfig]:
    """OpenAI CLIP torch state dict → (params, config). Detects ViT vs
    ModifiedResNet towers from the key layout (ref: model.py:392-416)."""

    def t(x):
        return np.asarray(x.detach().cpu().float().numpy())

    is_rn = "visual.layer1.0.conv1.weight" in sd
    if is_rn:
        rn_visual, rn_layers, vision_width = _convert_rn_visual(sd, t)
        spacial = int(round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
        image_resolution, patch, vision_layers = spacial * 32, 0, 0
    else:
        rn_layers = None
        vision_width = sd["visual.conv1.weight"].shape[0]
        patch = sd["visual.conv1.weight"].shape[-1]
        vision_layers = 1 + max(
            int(k.split(".")[3]) for k in sd if k.startswith("visual.transformer.resblocks.")
        )
        grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
        image_resolution = grid * patch
    cfg = ClipConfig(
        image_resolution=image_resolution,
        patch_size=patch,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_heads=vision_width // 64 if not is_rn else vision_width * 32 // 64,
        rn_layers=rn_layers,
        embed_dim=sd["text_projection"].shape[1],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_layers=1 + max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith("transformer.resblocks.")
        ),
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
    )

    def block(prefix):
        return {
            "ln_1": {"scale": t(sd[f"{prefix}.ln_1.weight"]), "bias": t(sd[f"{prefix}.ln_1.bias"])},
            "ln_2": {"scale": t(sd[f"{prefix}.ln_2.weight"]), "bias": t(sd[f"{prefix}.ln_2.bias"])},
            "attn": {
                "in_proj": {"w": t(sd[f"{prefix}.attn.in_proj_weight"]).T,
                            "b": t(sd[f"{prefix}.attn.in_proj_bias"])},
                "out_proj": {"w": t(sd[f"{prefix}.attn.out_proj.weight"]).T,
                             "b": t(sd[f"{prefix}.attn.out_proj.bias"])},
            },
            "mlp_fc": {"w": t(sd[f"{prefix}.mlp.c_fc.weight"]).T,
                       "b": t(sd[f"{prefix}.mlp.c_fc.bias"])},
            "mlp_proj": {"w": t(sd[f"{prefix}.mlp.c_proj.weight"]).T,
                         "b": t(sd[f"{prefix}.mlp.c_proj.bias"])},
        }

    def stack(blocks):
        return jax.tree.map(lambda *xs: np.stack(xs), *blocks)

    if is_rn:
        visual = rn_visual
    else:
        visual = {
            "conv1": t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0),
            "class_embedding": t(sd["visual.class_embedding"]),
            "positional_embedding": t(sd["visual.positional_embedding"]),
            "ln_pre": {"scale": t(sd["visual.ln_pre.weight"]), "bias": t(sd["visual.ln_pre.bias"])},
            "ln_post": {"scale": t(sd["visual.ln_post.weight"]), "bias": t(sd["visual.ln_post.bias"])},
            "proj": t(sd["visual.proj"]),
            "blocks": stack([
                block(f"visual.transformer.resblocks.{i}")
                for i in range(cfg.vision_layers)
            ]),
        }
    params: Params = {
        "visual": visual,
        "token_embedding": t(sd["token_embedding.weight"]),
        "positional_embedding": t(sd["positional_embedding"]),
        "ln_final": {"scale": t(sd["ln_final.weight"]), "bias": t(sd["ln_final.bias"])},
        "text_projection": t(sd["text_projection"]),
        "logit_scale": t(sd["logit_scale"]),
        "blocks": stack([
            block(f"transformer.resblocks.{i}")
            for i in range(cfg.transformer_layers)
        ]),
    }
    return params, cfg


CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
