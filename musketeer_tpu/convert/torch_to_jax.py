"""Reference ``.pt`` checkpoint → musketeer_tpu parameter pytree.

The reference's fairseq state dicts (ref: models/ofa/unify_transformer.py
parameter names; trainer.py:388-432 checkpoint layout) are the ground-truth
oracle for numerics parity — this converter is what unlocks golden testing
and zero-retrain inference (SURVEY.md §7 build order step 2).

Handles the reference's checkpoint-surgery behaviors at convert time:
- tied embeddings (encoder/decoder embed_tokens + output_projection share one
  tensor, ref: unify_transformer.py:1248-1254) → single ``embed_tokens``,
- vocab growth / padding: embedding rows padded to the TPU-friendly 128
  multiple; extra rows zero,
- torch Linear [out, in] → JAX [in, out] transpose; conv OIHW → HWIO.

Works on CPU torch only (no CUDA needed).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

from ..config import ARCH_PRESETS, ModelConfig


def _t(x) -> np.ndarray:  # torch tensor → numpy fp32
    return np.asarray(x.detach().cpu().float().numpy())


def _linear(sd, name) -> Dict[str, np.ndarray]:
    return {"w": _t(sd[f"{name}.weight"]).T, "b": _t(sd[f"{name}.bias"])}


def _ln(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _conv(sd, name) -> np.ndarray:
    return _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _bn(sd, name) -> Dict[str, np.ndarray]:
    return {
        "scale": _t(sd[f"{name}.weight"]),
        "bias": _t(sd[f"{name}.bias"]),
        "mean": _t(sd[f"{name}.running_mean"]),
        "var": _t(sd[f"{name}.running_var"]),
    }


def _bottleneck(sd, prefix) -> Dict[str, Any]:
    p = {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "bn1": _bn(sd, f"{prefix}.bn1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
        "bn2": _bn(sd, f"{prefix}.bn2"),
        "conv3": _conv(sd, f"{prefix}.conv3"),
        "bn3": _bn(sd, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample_conv"] = _conv(sd, f"{prefix}.downsample.0")
        p["downsample_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return p


def _stack(trees):
    return {
        k: np.stack([t[k] for t in trees])
        if not isinstance(trees[0][k], dict)
        else _stack([t[k] for t in trees])
        for k in trees[0]
    }


def _resnet(sd, prefix, n_blocks) -> Dict[str, Any]:
    p = {"conv1": _conv(sd, f"{prefix}.conv1"), "bn1": _bn(sd, f"{prefix}.bn1")}
    for s, blocks in enumerate(n_blocks):
        stage = f"{prefix}.layer{s+1}"
        first = _bottleneck(sd, f"{stage}.0")
        rest = [_bottleneck(sd, f"{stage}.{i}") for i in range(1, blocks)]
        p[f"layer{s+1}"] = {"first": first, "rest": _stack(rest) if rest else None}
    return p


def _attention(sd, prefix, cfg: ModelConfig) -> Dict[str, Any]:
    p = {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }
    if f"{prefix}.c_attn" in sd:
        p["c_attn"] = _t(sd[f"{prefix}.c_attn"])
    return p


def _enc_layer(sd, prefix, cfg) -> Dict[str, Any]:
    p = {
        "self_attn": _attention(sd, f"{prefix}.self_attn", cfg),
        "self_attn_layer_norm": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
        "final_layer_norm": _ln(sd, f"{prefix}.final_layer_norm"),
    }
    if f"{prefix}.attn_ln.weight" in sd:
        p["attn_ln"] = _ln(sd, f"{prefix}.attn_ln")
    if f"{prefix}.ffn_layernorm.weight" in sd:
        p["ffn_layernorm"] = _ln(sd, f"{prefix}.ffn_layernorm")
    if f"{prefix}.w_resid" in sd:
        p["w_resid"] = _t(sd[f"{prefix}.w_resid"])
    return p


def _dec_layer(sd, prefix, cfg) -> Dict[str, Any]:
    p = _enc_layer(sd, prefix, cfg)
    p["encoder_attn"] = _attention(sd, f"{prefix}.encoder_attn", cfg)
    p["encoder_attn_layer_norm"] = _ln(sd, f"{prefix}.encoder_attn_layer_norm")
    if f"{prefix}.self_attn_ln.weight" in sd:
        p["self_attn_ln"] = _ln(sd, f"{prefix}.self_attn_ln")
    if f"{prefix}.cross_attn_ln.weight" in sd:
        p["cross_attn_ln"] = _ln(sd, f"{prefix}.cross_attn_ln")
    return p


def infer_config(sd: Dict[str, Any]) -> ModelConfig:
    """Derive the full ModelConfig from state-dict shapes (preset-free)."""
    from dataclasses import replace

    def n_layers(pat):
        return 1 + max(
            int(m.group(1)) for k in sd if (m := re.match(pat, k))
        )

    d = sd["encoder.embed_tokens.weight"].shape[1]
    vocab, _ = sd["encoder.embed_tokens.weight"].shape
    enc_layers = n_layers(r"encoder\.layers\.(\d+)\.")
    dec_layers = n_layers(r"decoder\.layers\.(\d+)\.")
    ffn = sd["encoder.layers.0.fc1.weight"].shape[0]
    token_num_rel, heads = sd["encoder.token_rel_pos_table_list.0.weight"].shape
    token_bucket = (token_num_rel + 1) // 2
    img_rows = sd["encoder.embed_image_positions.weight"].shape[0]
    image_bucket = int(round((img_rows - 1) ** 0.5))
    max_src = sd["encoder.embed_positions.weight"].shape[0] - 2
    max_tgt = sd["decoder.embed_positions.weight"].shape[0] - 2
    n_blocks = tuple(
        n_layers(rf"encoder\.embed_images\.layer{s}\.(\d+)\.") for s in (1, 2, 3)
    )
    padded = -(-vocab // 128) * 128
    return replace(
        ModelConfig(),
        embed_dim=d, ffn_dim=ffn,
        encoder_layers=enc_layers, decoder_layers=dec_layers,
        attention_heads=heads, vocab_size=vocab, padded_vocab_size=padded,
        token_bucket_size=token_bucket, image_bucket_size=image_bucket,
        max_source_positions=max_src, max_target_positions=max_tgt,
        resnet_layers=n_blocks,
        scale_attn="encoder.layers.0.attn_ln.weight" in sd,
        scale_fc="encoder.layers.0.ffn_layernorm.weight" in sd,
        scale_heads="encoder.layers.0.self_attn.c_attn" in sd,
        scale_resids="encoder.layers.0.w_resid" in sd,
    )


def convert_state_dict(
    sd: Dict[str, Any], cfg: Optional[ModelConfig] = None
) -> tuple[Dict[str, Any], ModelConfig]:
    """fairseq OFA state dict → (params pytree (numpy), ModelConfig)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    if cfg is None:
        cfg = infer_config(sd)

    embed = _t(sd["encoder.embed_tokens.weight"])
    V, d = embed.shape
    if V < cfg.padded_vocab_size:
        embed = np.concatenate(
            [embed, np.zeros((cfg.padded_vocab_size - V, d), np.float32)]
        )

    def rel_tables(side, n_layers):
        tok = np.stack(
            [_t(sd[f"{side}.token_rel_pos_table_list.{i}.weight"]) for i in range(n_layers)]
        )
        img = np.stack(
            [_t(sd[f"{side}.image_rel_pos_table_list.{i}.weight"]) for i in range(n_layers)]
        )
        return tok, img

    enc_tok_rel, enc_img_rel = rel_tables("encoder", cfg.encoder_layers)
    dec_tok_rel, dec_img_rel = rel_tables("decoder", cfg.decoder_layers)

    params = {
        "embed_tokens": embed,
        "encoder": {
            "layernorm_embedding": _ln(sd, "encoder.layernorm_embedding"),
            "patch_layernorm_embedding": _ln(sd, "encoder.patch_layernorm_embedding"),
            "type_embedding": _t(sd["encoder.type_embedding.weight"]),
            "embed_positions": _t(sd["encoder.embed_positions.weight"]),
            "embed_image_positions": _t(sd["encoder.embed_image_positions.weight"]),
            "pos_ln": _ln(sd, "encoder.pos_ln"),
            "image_pos_ln": _ln(sd, "encoder.image_pos_ln"),
            "pos_q_linear": _linear(sd, "encoder.pos_q_linear"),
            "pos_k_linear": _linear(sd, "encoder.pos_k_linear"),
            "image_proj": _linear(sd, "encoder.image_proj"),
            "resnet": _resnet(sd, "encoder.embed_images", cfg.resnet_layers),
            "layers": _stack(
                [
                    _enc_layer(sd, f"encoder.layers.{i}", cfg)
                    for i in range(cfg.encoder_layers)
                ]
            ),
            "layer_norm": _ln(sd, "encoder.layer_norm"),
            "token_rel_pos_table": enc_tok_rel,
            "image_rel_pos_table": enc_img_rel,
        },
        "decoder": {
            "layernorm_embedding": _ln(sd, "decoder.layernorm_embedding"),
            "code_layernorm_embedding": _ln(sd, "decoder.code_layernorm_embedding"),
            "embed_positions": _t(sd["decoder.embed_positions.weight"]),
            "embed_image_positions": _t(sd["decoder.embed_image_positions.weight"]),
            "pos_ln": _ln(sd, "decoder.pos_ln"),
            "image_pos_ln": _ln(sd, "decoder.image_pos_ln"),
            "self_pos_q_linear": _linear(sd, "decoder.self_pos_q_linear"),
            "self_pos_k_linear": _linear(sd, "decoder.self_pos_k_linear"),
            "cross_pos_q_linear": _linear(sd, "decoder.cross_pos_q_linear"),
            "cross_pos_k_linear": _linear(sd, "decoder.cross_pos_k_linear"),
            "layers": _stack(
                [
                    _dec_layer(sd, f"decoder.layers.{i}", cfg)
                    for i in range(cfg.decoder_layers)
                ]
            ),
            "layer_norm": _ln(sd, "decoder.layer_norm"),
            "token_rel_pos_table": dec_tok_rel,
            "image_rel_pos_table": dec_img_rel,
        },
    }
    return params, cfg


def load_checkpoint(path: str, cfg: Optional[ModelConfig] = None):
    """Load a reference .pt training checkpoint or bare state dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    return convert_state_dict(sd, cfg)


def export_state_dict(params: Dict[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    """Inverse conversion: params pytree → fairseq-named torch state dict.

    Lets checkpoints trained in this framework be consumed by the reference
    stack (round-trip tested).
    """
    import torch

    out: Dict[str, Any] = {}

    def put(name, arr):
        out[name] = torch.from_numpy(np.asarray(arr, np.float32).copy())

    def put_linear(name, p):
        put(f"{name}.weight", np.asarray(p["w"]).T)
        put(f"{name}.bias", p["b"])

    def put_ln(name, p):
        put(f"{name}.weight", p["scale"])
        put(f"{name}.bias", p["bias"])

    def put_bn(name, p):
        put(f"{name}.weight", p["scale"])
        put(f"{name}.bias", p["bias"])
        put(f"{name}.running_mean", p["mean"])
        put(f"{name}.running_var", p["var"])

    def put_conv(name, w):
        put(f"{name}.weight", np.asarray(w).transpose(3, 2, 0, 1))

    embed = np.asarray(params["embed_tokens"])[: cfg.vocab_size]
    put("encoder.embed_tokens.weight", embed)
    put("decoder.embed_tokens.weight", embed)
    put("decoder.output_projection.weight", embed)

    def put_block(prefix, p):
        put_conv(f"{prefix}.conv1", p["conv1"])
        put_bn(f"{prefix}.bn1", p["bn1"])
        put_conv(f"{prefix}.conv2", p["conv2"])
        put_bn(f"{prefix}.bn2", p["bn2"])
        put_conv(f"{prefix}.conv3", p["conv3"])
        put_bn(f"{prefix}.bn3", p["bn3"])
        if "downsample_conv" in p:
            put_conv(f"{prefix}.downsample.0", p["downsample_conv"])
            put_bn(f"{prefix}.downsample.1", p["downsample_bn"])

    def unstack(tree, i):
        return {
            k: (unstack(v, i) if isinstance(v, dict) else np.asarray(v)[i])
            for k, v in tree.items()
            if v is not None
        }

    def put_attn(prefix, p):
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_linear(f"{prefix}.{nm}", p[nm])
        if "c_attn" in p:
            put(f"{prefix}.c_attn", p["c_attn"])

    for side, n_layers, is_dec in (
        ("encoder", cfg.encoder_layers, False),
        ("decoder", cfg.decoder_layers, True),
    ):
        sp = params[side]
        put_ln(f"{side}.layernorm_embedding", sp["layernorm_embedding"])
        put(f"{side}.embed_positions.weight", sp["embed_positions"])
        put(f"{side}.embed_image_positions.weight", sp["embed_image_positions"])
        put_ln(f"{side}.pos_ln", sp["pos_ln"])
        put_ln(f"{side}.image_pos_ln", sp["image_pos_ln"])
        for i in range(n_layers):
            lp = unstack(sp["layers"], i)
            prefix = f"{side}.layers.{i}"
            put_attn(f"{prefix}.self_attn", lp["self_attn"])
            put_ln(f"{prefix}.self_attn_layer_norm", lp["self_attn_layer_norm"])
            put_linear(f"{prefix}.fc1", lp["fc1"])
            put_linear(f"{prefix}.fc2", lp["fc2"])
            put_ln(f"{prefix}.final_layer_norm", lp["final_layer_norm"])
            for extra, ln_name in (
                ("attn_ln", "attn_ln"),
                ("ffn_layernorm", "ffn_layernorm"),
                ("self_attn_ln", "self_attn_ln"),
                ("cross_attn_ln", "cross_attn_ln"),
            ):
                if extra in lp:
                    put_ln(f"{prefix}.{ln_name}", lp[extra])
            if "w_resid" in lp:
                put(f"{prefix}.w_resid", lp["w_resid"])
            if is_dec:
                put_attn(f"{prefix}.encoder_attn", lp["encoder_attn"])
                put_ln(f"{prefix}.encoder_attn_layer_norm", lp["encoder_attn_layer_norm"])
            put(
                f"{side}.token_rel_pos_table_list.{i}.weight",
                np.asarray(sp["token_rel_pos_table"])[i],
            )
            put(
                f"{side}.image_rel_pos_table_list.{i}.weight",
                np.asarray(sp["image_rel_pos_table"])[i],
            )
        put_ln(f"{side}.layer_norm", sp["layer_norm"])

    enc = params["encoder"]
    put("encoder.type_embedding.weight", enc["type_embedding"])
    put_ln("encoder.patch_layernorm_embedding", enc["patch_layernorm_embedding"])
    put_linear("encoder.pos_q_linear", enc["pos_q_linear"])
    put_linear("encoder.pos_k_linear", enc["pos_k_linear"])
    put_linear("encoder.image_proj", enc["image_proj"])
    rn = enc["resnet"]
    put_conv("encoder.embed_images.conv1", rn["conv1"])
    put_bn("encoder.embed_images.bn1", rn["bn1"])
    for s, blocks in enumerate(cfg.resnet_layers):
        stage = rn[f"layer{s+1}"]
        put_block(f"encoder.embed_images.layer{s+1}.0", stage["first"])
        for i in range(1, blocks):
            put_block(
                f"encoder.embed_images.layer{s+1}.{i}", unstack(stage["rest"], i - 1)
            )

    dec = params["decoder"]
    put_ln("decoder.code_layernorm_embedding", dec["code_layernorm_embedding"])
    for nm in ("self_pos_q_linear", "self_pos_k_linear", "cross_pos_q_linear", "cross_pos_k_linear"):
        put_linear(f"decoder.{nm}", dec[nm])
    return out
