"""VQGAN decoder (frozen) in functional JAX — image detokenizer.

The reference vendors taming-transformers' VQModel/GumbelVQ and only ever
calls ``decode_code(code_b)`` at inference (ref: models/taming/models/
vqgan.py:65-69, 207-211; used by tasks/mm_tasks/image_gen.py:347-364 and
criterions/clip_scst_loss.py:109-140). This is a fresh functional
implementation of exactly that path: codebook lookup → post-quant conv →
conv decoder (mid resnet+attn, upsampling stages, GroupNorm/swish), with a
converter from taming state-dict names. Weights user-supplied (zero egress).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class VQGANConfig:
    # taming f=8 / 8192-codebook (OFA image-gen default: 128² image, 16² codes
    # per image... code_image_size//8 grid, ref image_gen_dataset.py)
    codebook_size: int = 8192
    embed_dim: int = 256
    z_channels: int = 256
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    resolution: int = 256
    out_ch: int = 3


def _group_norm(p, x, groups=32, eps=1e-6):
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv(p, x, stride=1):
    kh = p["w"].shape[0]
    pad = (kh - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def _resnet_block(p, x):
    h = _conv(p["conv1"], _swish(_group_norm(p["norm1"], x)))
    h = _conv(p["conv2"], _swish(_group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = _conv(p["nin_shortcut"], x)
    return x + h


def _attn_block(p, x):
    B, H, W, C = x.shape
    h = _group_norm(p["norm"], x)
    q = _conv(p["q"], h).reshape(B, H * W, C)
    k = _conv(p["k"], h).reshape(B, H * W, C)
    v = _conv(p["v"], h).reshape(B, H * W, C)
    w = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w * (C**-0.5), axis=-1).astype(x.dtype)
    h = jnp.einsum("bqk,bkc->bqc", w, v).reshape(B, H, W, C)
    return x + _conv(p["proj_out"], h)


def _upsample(p, x):
    B, H, W, C = x.shape
    x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
    return _conv(p["conv"], x)


def decode_code(params: Params, cfg: VQGANConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, h, w] int32 (0..codebook_size) → images [B, H, W, 3] in [-1, 1].

    ref: vqgan.py decode_code → quantize.embed_code + decoder forward.
    """
    z = params["codebook"].astype(jnp.float32)[codes]  # [B, h, w, embed_dim]
    return decode_z(params, cfg, z)


def decode_z(params: Params, cfg: VQGANConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Quantized latents [B, h, w, embed_dim] → images (decoder forward,
    ref: taming vqgan.py VQModel.decode :59-63)."""
    z = _conv(params["post_quant_conv"], z)
    h = _conv(params["conv_in"], z)
    h = _resnet_block(params["mid_block_1"], h)
    h = _attn_block(params["mid_attn"], h)
    h = _resnet_block(params["mid_block_2"], h)
    n_res = len(cfg.ch_mult)
    for i_level in reversed(range(n_res)):
        up = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = _resnet_block(
                jax.tree.map(lambda a: a, up["blocks"][i_block]), h
            )
            if up.get("attn") is not None:
                h = _attn_block(up["attn"][i_block], h)
        if i_level != 0:
            h = _upsample(up["upsample"], h)
    return _conv(params["conv_out"], _swish(_group_norm(params["norm_out"], h)))


def codes_to_images_uint8(params, cfg, codes) -> jnp.ndarray:
    """decode + clamp to uint8 RGB (ref: image_gen.py:354-364 post-processing)."""
    x = decode_code(params, cfg, codes)
    x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return (x * 255.0).astype(jnp.uint8)


def _downsample(p, x):
    # taming pads asymmetrically ((0,1),(0,1)) then stride-2 valid conv
    # (ref: modules/diffusionmodules/model.py:56-74)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def encode_codes(params: Params, cfg: VQGANConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] in [-1, 1] → code ids [B, h, w] int32.

    The image tokenizer direction the reference vendors but never exposes on
    a CLI (VQModel.encode, ref: models/taming/models/vqgan.py:54-58; Encoder
    ref: modules/diffusionmodules/model.py:342-412; nearest-codebook
    quantization ref: modules/vqvae/quantize.py:34-60). Requires encoder
    weights in the checkpoint (``convert_vqgan_state_dict`` maps them when
    present). Use to build pure-image / image-gen code TSVs.
    """
    assert "encoder" in params, (
        "checkpoint has no encoder weights (decode-only conversion)"
    )
    h = _encoder_features(params, images)

    if "gumbel_proj" in params:
        # GumbelVQ at eval: hard argmax over the code logits
        # (ref: quantize.py GumbelQuantize.forward :171-186, hard=True)
        logits = _conv(params["gumbel_proj"], h)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    z = _conv(params["quant_conv"], h).astype(jnp.float32)  # [B,h,w,e]
    return _nearest_codes(params, z)


def _encoder_features(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    enc = params["encoder"]
    h = _conv(enc["conv_in"], images)
    for down in enc["down"]:
        for i_block, block in enumerate(down["blocks"]):
            h = _resnet_block(block, h)
            if down.get("attn") is not None:
                h = _attn_block(down["attn"][i_block], h)
        if down.get("downsample") is not None:
            h = _downsample(down["downsample"]["conv"], h)
    h = _resnet_block(enc["mid_block_1"], h)
    h = _attn_block(enc["mid_attn"], h)
    h = _resnet_block(enc["mid_block_2"], h)
    return _conv(enc["conv_out"], _swish(_group_norm(enc["norm_out"], h)))


def _nearest_codes(params: Params, z: jnp.ndarray) -> jnp.ndarray:
    e = params["codebook"].astype(jnp.float32)  # [N, e]
    # ||z - e||² = z² + e² - 2 z·e (ref: quantize.py:49-51)
    d = (
        jnp.sum(z**2, axis=-1, keepdims=True)
        + jnp.sum(e**2, axis=-1)[None, None, None, :]
        - 2.0 * jnp.einsum("bhwc,nc->bhwn", z, e)
    )
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# training path (first-stage objective; ref: taming quantize.py:42-94 +
# vqgan.py VQModel.training_step. The adversarial/perceptual terms
# (NLayerDiscriminator + LPIPS, modules/losses/) are an explicit won't-fix:
# they require pretrained VGG/discriminator weights unavailable offline AND
# the reference never executes its vendored training code at runtime —
# Musketeer only ever calls decode_code on a frozen tokenizer.)
# ---------------------------------------------------------------------------

def quantize_train(
    params: Params, z: jnp.ndarray, beta: float = 0.25
):
    """VectorQuantizer forward with straight-through gradients.

    z [B, h, w, e] → (z_q with straight-through estimator, codes [B, h, w],
    q_loss). q_loss = ||sg(z) − e||² (codebook) + beta·||z − sg(e)||²
    (commitment), exactly taming's VectorQuantizer2.forward
    (ref: modules/vqvae/quantize.py:62-78, legacy=False ordering).
    """
    z = z.astype(jnp.float32)
    codes = _nearest_codes(params, z)
    z_q = params["codebook"].astype(jnp.float32)[codes]
    codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
    commit_loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
    q_loss = codebook_loss + beta * commit_loss
    # straight-through: gradients flow to the encoder as if identity
    z_q = z + jax.lax.stop_gradient(z_q - z)
    return z_q, codes, q_loss


def autoencode_train(
    params: Params, cfg: VQGANConfig, images: jnp.ndarray, beta: float = 0.25
):
    """Full first-stage VQGAN train forward: encode → quantize (straight
    through) → decode. Returns (recon, codes, loss_dict) with
    loss = L1 reconstruction + quantizer loss (the generator objective
    minus its perceptual/adversarial terms, ref: vqgan.py training_step +
    losses/vqperceptual.py:40-66 with perceptual_weight=disc_factor=0).
    Differentiable end to end — drive with jax.grad for codebook training.
    """
    h = _encoder_features(params, images)
    z = _conv(params["quant_conv"], h)
    z_q, codes, q_loss = quantize_train(params, z, beta=beta)
    recon = decode_z(params, cfg, z_q)
    rec_loss = jnp.mean(jnp.abs(images - recon))
    return recon, codes, {
        "loss": rec_loss + q_loss,
        "rec_loss": rec_loss,
        "q_loss": q_loss,
    }


# ---------------------------------------------------------------------------
# converter from taming-transformers state dict
# ---------------------------------------------------------------------------

def convert_vqgan_state_dict(sd, gumbel: bool = False) -> tuple[Params, VQGANConfig]:
    def t(x):
        return np.asarray(x.detach().cpu().float().numpy())

    def conv(name):
        return {"w": t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0), "b": t(sd[f"{name}.bias"])}

    def gn(name):
        return {"scale": t(sd[f"{name}.weight"]), "bias": t(sd[f"{name}.bias"])}

    def res(prefix):
        p = {
            "norm1": gn(f"{prefix}.norm1"), "conv1": conv(f"{prefix}.conv1"),
            "norm2": gn(f"{prefix}.norm2"), "conv2": conv(f"{prefix}.conv2"),
        }
        if f"{prefix}.nin_shortcut.weight" in sd:
            p["nin_shortcut"] = conv(f"{prefix}.nin_shortcut")
        return p

    def attn(prefix):
        return {
            "norm": gn(f"{prefix}.norm"), "q": conv(f"{prefix}.q"),
            "k": conv(f"{prefix}.k"), "v": conv(f"{prefix}.v"),
            "proj_out": conv(f"{prefix}.proj_out"),
        }

    codebook_key = (
        "quantize.embed.weight" if gumbel else "quantize.embedding.weight"
    )
    codebook = t(sd[codebook_key])
    n_levels = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("decoder.up.")
    )
    num_res_blocks = max(
        int(k.split(".")[4]) for k in sd if k.startswith("decoder.up.0.block.")
    )
    up = []
    for i in range(n_levels):
        blocks = [
            res(f"decoder.up.{i}.block.{j}") for j in range(num_res_blocks + 1)
        ]
        entry: Dict[str, Any] = {"blocks": blocks, "attn": None}
        if f"decoder.up.{i}.attn.0.norm.weight" in sd:
            entry["attn"] = [
                attn(f"decoder.up.{i}.attn.{j}") for j in range(num_res_blocks + 1)
            ]
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            entry["upsample"] = {"conv": conv(f"decoder.up.{i}.upsample.conv")}
        up.append(entry)

    params: Params = {
        "codebook": codebook,
        "post_quant_conv": conv("post_quant_conv"),
        "conv_in": conv("decoder.conv_in"),
        "mid_block_1": res("decoder.mid.block_1"),
        "mid_attn": attn("decoder.mid.attn_1"),
        "mid_block_2": res("decoder.mid.block_2"),
        "up": up,
        "norm_out": gn("decoder.norm_out"),
        "conv_out": conv("decoder.conv_out"),
    }

    # encoder (image → codes direction) when the checkpoint carries it
    if "encoder.conv_in.weight" in sd:
        down = []
        n_down = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("encoder.down.")
        )
        for i in range(n_down):
            nb = 1 + max(
                int(k.split(".")[4])
                for k in sd if k.startswith(f"encoder.down.{i}.block.")
            )
            entry: Dict[str, Any] = {
                "blocks": [res(f"encoder.down.{i}.block.{j}") for j in range(nb)],
                "attn": None,
                "downsample": None,
            }
            if f"encoder.down.{i}.attn.0.norm.weight" in sd:
                entry["attn"] = [
                    attn(f"encoder.down.{i}.attn.{j}") for j in range(nb)
                ]
            if f"encoder.down.{i}.downsample.conv.weight" in sd:
                entry["downsample"] = {
                    "conv": conv(f"encoder.down.{i}.downsample.conv")
                }
            down.append(entry)
        params["encoder"] = {
            "conv_in": conv("encoder.conv_in"),
            "down": down,
            "mid_block_1": res("encoder.mid.block_1"),
            "mid_attn": attn("encoder.mid.attn_1"),
            "mid_block_2": res("encoder.mid.block_2"),
            "norm_out": gn("encoder.norm_out"),
            "conv_out": conv("encoder.conv_out"),
        }
        if gumbel:
            params["gumbel_proj"] = conv("quantize.proj")
        elif "quant_conv.weight" in sd:
            params["quant_conv"] = conv("quant_conv")
    cfg = VQGANConfig(
        codebook_size=codebook.shape[0],
        embed_dim=codebook.shape[1],
        num_res_blocks=num_res_blocks,
        ch_mult=tuple([1] * n_levels),  # exact mults recoverable from shapes
    )
    return params, cfg
