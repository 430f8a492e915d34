"""Typed configuration tree for musketeer_tpu.

Replaces the reference's hydra/argparse/arch-preset-mutation stack
(ref: tasks/ofa_task.py:29-84, models/ofa/ofa.py:370-487,
models/ofa/unify_transformer.py:149-334) with plain frozen dataclasses.
Presets are data, not arg-mutating functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """OFA unified transformer hyperparameters.

    Defaults are the shared ``ofa_large_architecture`` settings
    (ref: models/ofa/ofa.py:370-440); use the ``ofa_*`` presets below.
    """

    # transformer dims
    embed_dim: int = 1024
    ffn_dim: int = 4096
    encoder_layers: int = 12
    decoder_layers: int = 12
    attention_heads: int = 16
    # vocab (fixed by the OFA dictionary; see tokenization.dictionary)
    vocab_size: int = 59457
    padded_vocab_size: int = 59520  # 128-multiple embedding rows; extra ids masked
    bos: int = 0
    pad: int = 1
    eos: int = 2
    unk: int = 3
    code_dict_size: int = 8192
    num_bins: int = 1000
    # positions
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    token_bucket_size: int = 256  # ref: ofa.py:418
    image_bucket_size: int = 42  # ref: ofa.py:419
    # attention extras
    attn_scale_factor: float = 2.0  # ref: ofa.py:424; scaling (hd*sf)^-0.5
    scale_attn: bool = False
    scale_fc: bool = False
    scale_heads: bool = False
    scale_resids: bool = False
    # embeddings
    add_type_embedding: bool = True
    layernorm_embedding: bool = True
    patch_layernorm_embedding: bool = True
    code_layernorm_embedding: bool = True
    entangle_position_embedding: bool = False  # encoder: pos only via bias
    # NOTE ref quirk: decoder *always* adds tgt pos embed because
    # `if self.entangle_position_embedding is not None` (unify_transformer.py:1486)
    # is truthy for bool False. We reproduce that behavior explicitly:
    decoder_entangle_positions: bool = True
    # image branch
    resnet_layers: Tuple[int, int, int] = (3, 8, 36)  # resnet152
    resnet_drop_path_rate: float = 0.0
    freeze_resnet: bool = False  # frozen batch-norm stats (eval-parity default path)
    patch_image_size: int = 480
    orig_patch_image_size: int = 256
    interpolate_position: bool = False
    code_image_size: int = 128  # decoder image window = //8 = 16
    # bottleneck adapters (ref: unify_transformer_layer.py:49-93)
    use_adapter: bool = False
    adapter_dim: int = 200
    # prefix prompt tuning (ref: PromptEncoder unify_transformer.py:85-140)
    encoder_prompt: bool = False
    encoder_prompt_length: int = 100
    decoder_prompt: bool = False
    decoder_prompt_length: int = 100
    # regularization
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    encoder_drop_path_rate: float = 0.0
    decoder_drop_path_rate: float = 0.0
    activation_fn: str = "gelu"
    # compute
    dtype: str = "bfloat16"  # activation dtype under jit
    remat: bool = False  # jax.checkpoint each layer
    # Pallas attention with decomposed positional bias (TPU; inference paths).
    # Falls back to XLA attention when preconditions don't hold (dropout,
    # per-sample patch subsampling, per-sample code_masks).
    use_flash_attention: bool = False
    # numerics-gated fast softmax in the Pallas kernels: skip the
    # max-subtract pass (safe while |attention logits| < ~80; validated by
    # tests/test_flash_attention.py on real-scale activations)
    flash_skip_max_subtract: bool = False
    # pad the encoder/decoder streams ONCE to the flash kernel's tile
    # (unrolled/inference paths, small pad ratios) instead of per-layer
    # pad/unpad passes; costs ~4.5 % more activation memory at the 980→1024
    # encoder shape — disable when a step is at the HBM edge
    flash_pad_once: bool = True
    # int8 cross-KV decode steps run through the fused Pallas kernel
    # (ops/decode_cross_attn.py) that dequantizes per-tile in VMEM instead
    # of materializing a bf16 copy of the cache every step. MEASURED
    # NEGATIVE on v5e (probe_int8kv.py: 47.3 vs 31.6 ms XLA-int8 decode —
    # per-step work too small for 12 in-loop kernel launches), so the
    # default stays the XLA einsum path; flag kept for future sweeps
    decode_int8_kv_kernel: bool = False
    # Fused single-launch decoder-stack kernel for incremental decode steps
    # (ops/decode_stack.py): all L layers — self-attn over the growing
    # cache, beam-shared cross-attn over streamed resident K/V, FFN — run
    # as ONE pallas_call per step (per-layer kernels lose to the ~0.1 ms
    # pallas_call fixed cost; this amortizes it L×). Preconditions gate at
    # decode time: no decoder prompts, no int8 cross-KV, no normformer
    # extras; falls back to the XLA scan otherwise.
    decode_stack_kernel: bool = False
    # GPipe pipeline parallelism over the mesh 'pipe' axis: encoder/decoder
    # layer stacks run as P stages with this many microbatches (0 = off;
    # requires use_flash_attention, a 'pipe' mesh axis, and B % M == 0)
    pipeline_microbatches: int = 0
    # Sequence parallelism: run the ENCODER layer stack with ring attention
    # over a mesh 'seq' axis (parallel/ring_attention.py). Each device holds
    # an S/P slice of the activation stream; K/V chunks rotate over ICI with
    # ppermute while LN/FFN/projections partition per-position under GSPMD.
    # Long-context extension beyond the reference (which caps S at 1024,
    # ref: unify_transformer.py:40-41). Preconditions: a 'seq' mesh axis,
    # deterministic (or all dropout/drop-path rates zero — the ring layer
    # has no dropout), no encoder prompts, no per-sample patch subsampling;
    # mutually exclusive with pipeline_microbatches on the encoder.
    seq_parallel: bool = False
    # Interleaved (virtual-stage) pipeline schedule: split each stage's
    # layers into this many round-robin chunks so microbatches wrap the
    # ring V times — the bubble shrinks ~V× in the small-microbatch regime
    # (parallel/pipeline.py). Used when layers % (stages*V) == 0 and
    # microbatches <= stages; otherwise the plain GPipe schedule runs.
    pipeline_interleave: int = 1
    # Unroll the encoder/decoder/ResNet layer loops instead of lax.scan:
    # XLA then stores each layer's backward residuals as plain buffers
    # instead of dynamic-update-slice stacking (the DUS passes ranked among
    # the top train-step fusions in the compiled HLO), trading O(L) compile
    # time. Ignored by the pipelined path (stages need stacked layers).
    unroll_layers: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.attention_heads

    @property
    def token_num_rel_dis(self) -> int:
        return 2 * self.token_bucket_size - 1

    @property
    def image_num_rel_dis(self) -> int:
        b = self.image_bucket_size
        return (2 * b - 1) * (2 * b - 1) + 3

    @property
    def decoder_image_window(self) -> int:
        return self.code_image_size // 8


def ofa_tiny() -> ModelConfig:
    return replace(
        ModelConfig(),
        embed_dim=256, ffn_dim=1024, encoder_layers=4, decoder_layers=4,
        attention_heads=4, resnet_layers=(3, 4, 6),
    )


def ofa_medium() -> ModelConfig:
    return replace(
        ModelConfig(),
        embed_dim=512, ffn_dim=2048, encoder_layers=4, decoder_layers=4,
        attention_heads=8, resnet_layers=(3, 4, 23),
    )


def ofa_base() -> ModelConfig:
    return replace(
        ModelConfig(),
        embed_dim=768, ffn_dim=3072, encoder_layers=6, decoder_layers=6,
        attention_heads=12, resnet_layers=(3, 4, 23),
    )


def ofa_large() -> ModelConfig:
    return ModelConfig()


def ofa_huge() -> ModelConfig:
    return replace(
        ModelConfig(),
        embed_dim=1280, ffn_dim=5120, encoder_layers=24, decoder_layers=12,
        attention_heads=16, resnet_layers=(3, 8, 36),
    )


ARCH_PRESETS = {
    "ofa_tiny": ofa_tiny,
    "ofa_medium": ofa_medium,
    "ofa_base": ofa_base,
    "ofa_large": ofa_large,
    "ofa_huge": ofa_huge,
}


@dataclass(frozen=True)
class GenerationConfig:
    """Beam-search / sampling settings (ref: models/sequence_generator.py:19-120)."""

    beam_size: int = 5
    max_len_a: float = 0.0
    max_len_b: int = 200
    min_len: int = 1
    # per-sentence length constraints: with src_lengths passed to beam_search,
    # min_i = min_len_a*len_i + min_len and max_i = max_len_a*len_i + max_len_b
    # (ref: models/search.py LengthConstrainedBeamSearch :526-549)
    min_len_a: float = 0.0
    normalize_scores: bool = True
    len_penalty: float = 1.0
    unk_penalty: float = 0.0
    temperature: float = 1.0
    no_repeat_ngram_size: int = 0
    # constrained decoding
    constraint_range: Optional[Tuple[int, int]] = None  # vocab band [start, end)
    gen_box: bool = False  # force <bin_k> tokens 4-of-5 steps (refcoco)
    gen_code: bool = False  # image-code generation (code_masks on)
    zero_shot: bool = False  # post-softmax trie masking variant
    sampling: bool = False
    sampling_topk: int = -1
    sampling_topp: float = -1.0
    # diverse decoding (ref: models/search.py DiverseBeamSearch :551-618,
    # DiverseSiblingsSearch :745-814)
    diverse_beam_groups: int = 0  # >1 enables grouped Hamming diversity
    diversity_strength: float = 0.5  # group-count penalty weight
    diversity_rate: float = 0.0  # >0 enables sibling-rank penalty
    # serving: int8-quantize the cross-attention K/V cache (per-position
    # absmax scales; halves the decode loop's per-step cross-KV HBM read)
    int8_cross_kv: bool = False
    # escape hatch: force the reference (full-vocab XLA) candidate path even
    # when the fused Pallas projection fast path would apply (A/B + debug)
    use_fast_path: bool = True


@dataclass(frozen=True)
class OptimConfig:
    """Adam + polynomial decay (ref run scripts: run_scripts/musketeer/train_musketeer.sh)."""

    lr: float = 1e-4
    end_lr: float = 0.0
    warmup_updates: int = 1000
    total_updates: int = 30000
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 0.01  # decoupled (adamw), matching fairseq adam
    clip_norm: float = 0.1  # ref: train_musketeer.sh:136
    power: float = 1.0  # polynomial decay power
    # dotted param-path prefixes excluded from training (grads zeroed before
    # the clip norm, updates zeroed after weight decay). The shared token
    # embedding is "embed_tokens" — --freeze-{encoder,decoder}-embedding both
    # map here because OFA shares all embeddings (ref:
    # unify_transformer.py:364-384: share_all_embeddings=True in every arch,
    # so requires_grad=False on either handle freezes the one tensor).
    freeze_params: tuple = ()


@dataclass(frozen=True)
class CriterionConfig:
    """Label-smoothed CE options (ref: criterions/label_smoothed_cross_entropy.py)."""

    label_smoothing: float = 0.1
    ignore_prefix_size: int = 0
    ignore_eos: bool = False
    report_accuracy: bool = False
    drop_worst_ratio: float = 0.0
    drop_worst_after: int = 0
    # encouraging-loss variant: drop the BEST-fit (lowest-loss) positions
    # (ref: label_smoothed_encouraging_loss.py:64-68, :129-132)
    drop_best_ratio: float = 0.0
    drop_best_after: int = 0
    # non-None switches CE to the encouraging loss with this log_end
    # (ref: label_smoothed_encouraging_loss.py:59-63)
    encouraging_log_end: Optional[float] = None
    use_rdrop: bool = False
    reg_alpha: float = 1.0
    sample_patch_num: int = 196
    constraint_start: Optional[int] = None
    constraint_end: Optional[int] = None


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data × fsdp × model (tensor) × pipe axes."""

    data: int = -1  # -1: all remaining devices
    fsdp: int = 1
    model: int = 1
    pipe: int = 1  # pipeline stages (GPipe over layer stacks)
    seq: int = 1  # sequence-parallel ring size (encoder ring attention)

    def axis_sizes(self, n_devices: int) -> Tuple[int, int, int, int, int]:
        d, f, m, p, s = self.data, self.fsdp, self.model, self.pipe, self.seq
        if d == -1:
            d = n_devices // (f * m * p * s)
        assert d * f * m * p * s == n_devices, (
            f"mesh {d}x{f}x{m}x{p}x{s} != {n_devices} devices"
        )
        return d, f, m, p, s


@dataclass(frozen=True)
class TrainConfig:
    arch: str = "ofa_base"
    batch_size: int = 8  # per-step global batch (already accumulated shape)
    update_freq: int = 1  # gradient accumulation microbatches
    seed: int = 7
    bf16: bool = True
    ema_decay: float = 0.0  # 0 disables EMA
    save_interval_updates: int = 0
    validate_interval_updates: int = 0  # mid-epoch validation (ref: train.py:366-433)
    async_save: bool = False  # background checkpoint writes
    keep_best_checkpoints: int = -1
    best_checkpoint_metric: str = "score"
    maximize_best_checkpoint_metric: bool = True
    patience: int = -1
    max_epoch: int = 0
    max_update: int = 0
    stop_time_hours: float = 0.0  # wall-clock stop (ref: train.py:387-397)
    # background-thread batch prefetch depth (0 = synchronous; ref:
    # fairseq EpochBatchIterator num_workers, tasks/ofa_task.py:157)
    prefetch_depth: int = 2
    optim: OptimConfig = field(default_factory=OptimConfig)
    criterion: CriterionConfig = field(default_factory=CriterionConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)
