"""Transformer-core numerics parity vs a plain-torch restatement of the
reference encoder/decoder layers.

The reference layers (attention math: unify_multihead_attention.py:200-420;
blocks: unify_transformer_layer.py:110-615) are restated here in
dependency-free torch — pre-LN blocks with the normformer extras
(attn_ln/scale_attn, ffn_layernorm/scale_fc, c_attn/scale_heads,
w_resid/scale_resids), (head_dim*2)^-0.5 scaling, additive attn_bias on the
last src_len keys, fp32 softmax, erf gelu — loaded with synthetic weights,
converted through convert.torch_to_jax's layer mappers, and compared against
musketeer_tpu's jitted layer functions. This closes the numerics surface a
real .pt golden test would cover, without the checkpoint.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from dataclasses import replace

from musketeer_tpu.config import ofa_tiny
from musketeer_tpu.convert.torch_to_jax import _dec_layer, _enc_layer
from musketeer_tpu.models.ofa import _decoder_layer, _encoder_layer

D, H, FFN = 64, 4, 128
HD = D // H
SCALE_FACTOR = 2.0


def make_cfg():
    return replace(
        ofa_tiny(),
        embed_dim=D, ffn_dim=FFN, attention_heads=H, dtype="float32",
        scale_attn=True, scale_fc=True, scale_heads=True, scale_resids=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )


class RefMHA(nn.Module):
    """unify_multihead_attention.py:200-420, time-major [T, B, d]."""

    def __init__(self):
        super().__init__()
        self.q_proj = nn.Linear(D, D)
        self.k_proj = nn.Linear(D, D)
        self.v_proj = nn.Linear(D, D)
        self.out_proj = nn.Linear(D, D)
        self.c_attn = nn.Parameter(torch.ones(H))
        self.scaling = float(HD * SCALE_FACTOR) ** -0.5

    def forward(self, query, key, key_padding_mask=None, attn_mask=None,
                attn_bias=None):
        tgt_len, bsz, _ = query.shape
        q = self.q_proj(query) * self.scaling
        k = self.k_proj(key)
        v = self.v_proj(key)
        q = q.contiguous().view(tgt_len, bsz * H, HD).transpose(0, 1)
        k = k.contiguous().view(-1, bsz * H, HD).transpose(0, 1)
        v = v.contiguous().view(-1, bsz * H, HD).transpose(0, 1)
        src_len = k.size(1)

        attn_weights = torch.bmm(q, k.transpose(1, 2))
        if attn_bias is not None:
            # ref :350-351 — bias lands on the last src_len key columns
            attn_weights[:, :, -src_len:] += attn_bias[:, :, -src_len:]
        if attn_mask is not None:
            attn_weights += attn_mask.unsqueeze(0)
        if key_padding_mask is not None:
            attn_weights = attn_weights.view(bsz, H, tgt_len, src_len)
            attn_weights = attn_weights.masked_fill(
                key_padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool),
                float("-inf"),
            )
            attn_weights = attn_weights.view(bsz * H, tgt_len, src_len)
        probs = F.softmax(attn_weights, dim=-1, dtype=torch.float32).type_as(
            attn_weights
        )
        attn = torch.bmm(probs, v)
        attn = attn.transpose(0, 1).contiguous().view(tgt_len, bsz, D)
        attn = attn.view(tgt_len, bsz, H, HD)
        attn = torch.einsum("tbhd,h->tbhd", attn, self.c_attn)
        attn = attn.reshape(tgt_len, bsz, D)
        return self.out_proj(attn)


class RefEncoderLayer(nn.Module):
    """unify_transformer_layer.py:110-293, normalize_before=True."""

    def __init__(self):
        super().__init__()
        self.self_attn = RefMHA()
        self.self_attn_layer_norm = nn.LayerNorm(D)
        self.attn_ln = nn.LayerNorm(D)
        self.fc1 = nn.Linear(D, FFN)
        self.fc2 = nn.Linear(FFN, D)
        self.ffn_layernorm = nn.LayerNorm(FFN)
        self.w_resid = nn.Parameter(torch.ones(D))
        self.final_layer_norm = nn.LayerNorm(D)

    def forward(self, x, encoder_padding_mask, self_attn_bias):
        residual = x
        x = self.self_attn_layer_norm(x)
        x = self.self_attn(
            x, x, key_padding_mask=encoder_padding_mask, attn_bias=self_attn_bias
        )
        x = self.attn_ln(x)
        x = residual + x

        residual = x
        x = self.final_layer_norm(x)
        x = F.gelu(self.fc1(x))  # erf gelu
        x = self.ffn_layernorm(x)
        x = self.fc2(x)
        residual = torch.mul(self.w_resid, residual)
        return residual + x


class RefDecoderLayer(nn.Module):
    """unify_transformer_layer.py:296-615, normalize_before=True."""

    def __init__(self):
        super().__init__()
        self.self_attn = RefMHA()
        self.self_attn_layer_norm = nn.LayerNorm(D)
        self.self_attn_ln = nn.LayerNorm(D)
        self.encoder_attn = RefMHA()
        self.encoder_attn_layer_norm = nn.LayerNorm(D)
        self.cross_attn_ln = nn.LayerNorm(D)
        self.fc1 = nn.Linear(D, FFN)
        self.fc2 = nn.Linear(FFN, D)
        self.ffn_layernorm = nn.LayerNorm(FFN)
        self.w_resid = nn.Parameter(torch.ones(D))
        self.final_layer_norm = nn.LayerNorm(D)

    def forward(self, x, encoder_out, encoder_padding_mask, self_attn_mask,
                self_attn_bias, cross_attn_bias):
        residual = x
        x = self.self_attn_layer_norm(x)
        x = self.self_attn(x, x, attn_mask=self_attn_mask, attn_bias=self_attn_bias)
        x = self.self_attn_ln(x)
        x = residual + x

        residual = x
        x = self.encoder_attn_layer_norm(x)
        x = self.encoder_attn(
            x, encoder_out, key_padding_mask=encoder_padding_mask,
            attn_bias=cross_attn_bias,
        )
        x = self.cross_attn_ln(x)
        x = residual + x

        residual = x
        x = self.final_layer_norm(x)
        x = F.gelu(self.fc1(x))
        x = self.ffn_layernorm(x)
        x = self.fc2(x)
        residual = torch.mul(self.w_resid, residual)
        return residual + x


def _randomize(module, seed):
    """Non-trivial values everywhere, incl. LN scales/biases, c_attn, w_resid."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.3)
        # LN weights near 1 keep activations sane
        for name, p in module.named_parameters():
            if ("layer_norm" in name or "attn_ln" in name or "layernorm" in name) \
                    and name.endswith("weight"):
                p.add_(1.0)
            if name.endswith(("c_attn", "w_resid")):
                p.mul_(0.2).add_(1.0)


def test_encoder_layer_parity():
    cfg = make_cfg()
    B, T = 2, 7
    torch.manual_seed(0)
    layer = RefEncoderLayer()
    _randomize(layer, 1)
    layer.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(B, T, D).astype(np.float32)
    bias = (rng.randn(B, H, T, T) * 0.5).astype(np.float32)
    pad = np.zeros((B, T), bool)
    pad[0, -2:] = True  # padded keys in row 0

    with torch.no_grad():
        out_t = layer(
            torch.from_numpy(x).transpose(0, 1),  # [T, B, d] time-major
            torch.from_numpy(pad),
            torch.from_numpy(bias).reshape(B * H, T, T),
        ).transpose(0, 1).numpy()

    sd = {f"L.{k}": v for k, v in layer.state_dict().items()}
    p = jax.tree.map(jnp.asarray, _enc_layer(sd, "L", cfg))
    out_j = np.asarray(
        _encoder_layer(p, cfg, jnp.asarray(x), jnp.asarray(bias), jnp.asarray(pad))
    )
    # padded-query rows diverge by design (garbage either way); compare valid
    valid = ~pad
    np.testing.assert_allclose(out_j[valid], out_t[valid], atol=2e-5, rtol=1e-5)


def test_decoder_layer_parity():
    cfg = make_cfg()
    B, Tt, Ts = 2, 5, 9
    torch.manual_seed(0)
    layer = RefDecoderLayer()
    _randomize(layer, 2)
    layer.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(B, Tt, D).astype(np.float32)
    enc = rng.randn(B, Ts, D).astype(np.float32)
    self_bias = (rng.randn(B, H, Tt, Tt) * 0.5).astype(np.float32)
    cross_bias = (rng.randn(B, H, Tt, Ts) * 0.5).astype(np.float32)
    enc_pad = np.zeros((B, Ts), bool)
    enc_pad[1, -3:] = True

    # buffered_future_mask (ref: unify_transformer.py:1591-1603)
    fut = torch.triu(torch.full((Tt, Tt), float("-inf")), diagonal=1)

    with torch.no_grad():
        out_t = layer(
            torch.from_numpy(x).transpose(0, 1),
            torch.from_numpy(enc).transpose(0, 1),
            torch.from_numpy(enc_pad),
            fut,
            torch.from_numpy(self_bias).reshape(B * H, Tt, Tt),
            torch.from_numpy(cross_bias).reshape(B * H, Tt, Ts),
        ).transpose(0, 1).numpy()

    sd = {f"L.{k}": v for k, v in layer.state_dict().items()}
    p = jax.tree.map(jnp.asarray, _dec_layer(sd, "L", cfg))
    out_j, _ = _decoder_layer(
        p, cfg, jnp.asarray(x),
        jnp.asarray(self_bias), jnp.asarray(cross_bias),
        jnp.asarray(enc), jnp.asarray(enc_pad),
        self_pad=None, causal_offset=0,
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5, rtol=1e-5)


def test_attention_prompt_kv_parity():
    """prompt_kv prefix keys: bias/causality apply only to real keys
    (ref: unify_multihead_attention.py:339-351)."""
    from musketeer_tpu.models.ofa import attention

    cfg = make_cfg()
    B, T, P = 2, 6, 3
    torch.manual_seed(3)
    mha = RefMHA()
    _randomize(mha, 4)
    mha.eval()

    rng = np.random.RandomState(2)
    x = rng.randn(B, T, D).astype(np.float32)
    bias = (rng.randn(B, H, T, T) * 0.5).astype(np.float32)
    pk = rng.randn(B, H, P, HD).astype(np.float32)
    pv = rng.randn(B, H, P, HD).astype(np.float32)

    with torch.no_grad():
        q = mha.q_proj(torch.from_numpy(x)) * mha.scaling
        k = mha.k_proj(torch.from_numpy(x))
        v = mha.v_proj(torch.from_numpy(x))
        q = q.view(B, T, H, HD).permute(0, 2, 1, 3)
        k = k.view(B, T, H, HD).permute(0, 2, 1, 3)
        v = v.view(B, T, H, HD).permute(0, 2, 1, 3)
        k = torch.cat([torch.from_numpy(pk), k], dim=2)
        v = torch.cat([torch.from_numpy(pv), v], dim=2)
        w = torch.einsum("bhqd,bhkd->bhqk", q, k)
        w[..., -T:] += torch.from_numpy(bias)  # last src_len keys only
        probs = F.softmax(w, dim=-1, dtype=torch.float32)
        attn = torch.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.permute(0, 2, 1, 3)
        attn = torch.einsum("bthd,h->bthd", attn, mha.c_attn).reshape(B, T, D)
        out_t = mha.out_proj(attn).numpy()

    sd = {f"A.{k}": v for k, v in mha.state_dict().items()}
    from musketeer_tpu.convert.torch_to_jax import _attention as conv_attn

    p = jax.tree.map(jnp.asarray, conv_attn(sd, "A", cfg))
    out_j = np.asarray(attention(
        p, cfg, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        jnp.asarray(bias), key_padding_mask=None,
        prompt_kv=(jnp.asarray(pk), jnp.asarray(pv)),
    ))
    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=1e-5)
