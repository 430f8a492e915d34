"""The jitted multi-task training step.

Replaces the reference's Trainer.train_step (ref: trainer.py:734-1039) —
grad-accum loop, all-reduce, clip, optimizer step — with ONE XLA program:
``lax.scan`` over microbatches accumulates grads on device, GSPMD inserts the
gradient reductions over the mesh, optax applies clip+adam. No host↔device
round trips inside the step.

Multi-task semantics follow the reference's criterion recursion
(ref: criterions/label_smoothed_cross_entropy.py:175-202): each task's
summed loss is normalized by its own kept-token count and the normalized
losses are added (sample_size=1).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import CriterionConfig, ModelConfig, OptimConfig
from ..criterions.label_smoothed_ce import CELossOut, label_smoothed_ce
from ..models import ofa
from .train_state import TrainState, ema_update, make_optimizer


class TaskBatch(NamedTuple):
    """One task's (micro)batch. Arrays may carry a leading accum axis."""

    src_tokens: jnp.ndarray  # [..., B, Ts]
    prev_output_tokens: jnp.ndarray  # [..., B, Tt]
    target: jnp.ndarray  # [..., B, Tt]
    patch_images: Optional[jnp.ndarray] = None  # [..., B, H, W, 3]
    patch_masks: Optional[jnp.ndarray] = None  # [..., B]
    constraint_masks: Optional[jnp.ndarray] = None  # [..., B, Tt, V]
    conf: Optional[jnp.ndarray] = None  # [..., B]
    code_masks: Optional[jnp.ndarray] = None  # [..., B]
    # training-time patch subsampling order (host-sampled; ref sample_patch_num)
    sample_patch_order: Optional[jnp.ndarray] = None  # [..., B, P]
    # precomputed ResNet feature maps (vision-stem packing; set inside the
    # jitted step, never by the loader)
    resnet_feats: Optional[jnp.ndarray] = None  # [..., B, h, w, C]
    # uint8 image transport: when patch_images is uint8, this [..., 2, 3]
    # (scale row, bias row) affine dequantizes it in-step — raw bytes over
    # the host→device link are 4x smaller than normalized float32 and carry
    # the same information (PIL resize output is uint8)
    patch_norm: Optional[jnp.ndarray] = None  # [..., 2, 3]


def dequantize_batch(b: TaskBatch, dtype) -> TaskBatch:
    """Expand the compressed-transport fields to compute form, in-step.

    * uint8 ``patch_images`` + ``patch_norm`` → float ``p*scale + bias``
      (== normalize(p/255) up to fp rounding; data/transforms.norm_constants)
    * bit-packed ``constraint_masks`` (uint8, last dim V/8, little-endian
      np.packbits) → bool [..., V] — 8x smaller over the link.
    """
    if b.patch_images is not None and b.patch_images.dtype == jnp.uint8:
        assert b.patch_norm is not None, "uint8 patch_images need patch_norm"
        # patch_images [*L, B, H, W, 3], patch_norm [*L, 2, 3]: broadcast
        # the per-channel affine over B, H, W
        norm = b.patch_norm.astype(jnp.float32)
        sc = norm[..., 0, :].reshape(norm.shape[:-2] + (1, 1, 1, 3))
        bi = norm[..., 1, :].reshape(norm.shape[:-2] + (1, 1, 1, 3))
        img = (b.patch_images.astype(jnp.float32) * sc + bi).astype(dtype)
        b = b._replace(patch_images=img, patch_norm=None)
    cm = b.constraint_masks
    if cm is not None and cm.dtype == jnp.uint8:
        bits = (cm[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        b = b._replace(
            constraint_masks=bits.reshape(cm.shape[:-1] + (cm.shape[-1] * 8,))
            .astype(bool)
        )
    return b


def task_loss(
    params,
    model_cfg: ModelConfig,
    crit_cfg: CriterionConfig,
    batch: TaskBatch,
    rng: Optional[jax.Array],
    update_num: jnp.ndarray,
    train: bool = True,
):
    """One task's (loss_sum, nll_sum, ntokens)."""
    # expand compressed-transport fields BEFORE the R-Drop dup (the dup
    # concatenates along batch axis 0, which patch_norm [2, 3] lacks)
    batch = dequantize_batch(batch, jnp.dtype(model_cfg.dtype))
    if crit_cfg.use_rdrop and train:
        dup = lambda a: None if a is None else jnp.concatenate([a, a], axis=0)
        batch = TaskBatch(*[dup(a) for a in batch])
    logits = ofa.forward(
        params,
        model_cfg,
        batch.src_tokens,
        batch.prev_output_tokens,
        patch_images=batch.patch_images,
        patch_masks=batch.patch_masks,
        code_masks=batch.code_masks,
        sample_patch_order=batch.sample_patch_order,
        rngs=rng,
        deterministic=not train,
        train_bn=False,  # frozen BN stats (ref FrozenBatchNorm eval-parity path)
        resnet_feats=batch.resnet_feats,
        # task batches are homogeneous: a batch carrying code_masks is an
        # image-gen / pure-image batch with EVERY row a code sequence, so
        # the static all-code promise holds (keeps the flash decode path —
        # the materialized-bias path OOMs at the 1025-token code targets)
        code_masks_all=batch.code_masks is not None,
    )
    out = label_smoothed_ce(
        logits,
        batch.target,
        epsilon=crit_cfg.label_smoothing,
        pad_id=model_cfg.pad,
        constraint_masks=batch.constraint_masks,
        constraint_range=(
            (crit_cfg.constraint_start, crit_cfg.constraint_end)
            if crit_cfg.constraint_start is not None
            else None
        ),
        conf=batch.conf,
        drop_worst_ratio=crit_cfg.drop_worst_ratio if train else 0.0,
        drop_worst_active=update_num > crit_cfg.drop_worst_after,
        drop_best_ratio=crit_cfg.drop_best_ratio if train else 0.0,
        drop_best_active=update_num > crit_cfg.drop_best_after,
        use_rdrop=crit_cfg.use_rdrop and train,
        reg_alpha=crit_cfg.reg_alpha,
        vocab_size=model_cfg.vocab_size,
        encouraging_log_end=crit_cfg.encouraging_log_end,
    )
    return out


def _pack_key(batch: TaskBatch):
    """Static grouping key for the packed forward, or None if the batch is
    not packable.

    Text-only batches pack on (src, tgt) shapes. Vision batches whose stem
    already ran (``resnet_feats`` set by :func:`_pack_vision_stem`) pack too
    when their token AND feature shapes match — at the reference envelope
    that merges vqa_gen + snli_ve (both [B, 90]/[B, 90] + 30×30 feats) into
    one transformer pass. Raw-image / code / patch-subsample batches keep
    their own forwards (heterogeneous aux inputs)."""
    if (
        batch.patch_images is not None
        or batch.code_masks is not None
        or batch.sample_patch_order is not None
    ):
        return None
    return (
        batch.src_tokens.shape,
        batch.prev_output_tokens.shape,
        batch.constraint_masks is not None,
        None if batch.resnet_feats is None else batch.resnet_feats.shape,
        None if batch.patch_masks is None else batch.patch_masks.shape,
    )


def packed_text_loss(
    params,
    model_cfg: ModelConfig,
    crit_cfg: CriterionConfig,
    group: Dict[str, TaskBatch],  # same-shape text-only batches
    rng: Optional[jax.Array],
    update_num: jnp.ndarray,
):
    """ONE forward for G same-shape tasks, per-task losses exact.

    SURVEY §7's architecture stance: the reference runs 9 sequential
    forwards per step (ref: label_smoothed_cross_entropy.py:175-202); tasks
    that share (src_len, tgt_len) buckets instead concatenate along batch
    into a single transformer pass — bigger matmuls, one kernel stream.
    Text-only tasks (the 7 GLUE tasks + gigaword + text infilling under a
    common bucket) always qualify; vision tasks qualify once the stem
    packing has replaced their images with same-shape ``resnet_feats``
    (vqa_gen + snli_ve at the reference envelope). Per-task semantics are
    preserved exactly by vmapping the criterion over the task axis:
    drop-worst/drop-best ranking, R-Drop halves and ntokens normalization
    all stay within each task's segment.
    """
    names = sorted(group)
    G = len(names)
    bs = [group[n] for n in names]
    B = bs[0].src_tokens.shape[0]
    assert all(b.src_tokens.shape[0] == B for b in bs)

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    src = cat([b.src_tokens for b in bs])  # [G*B, Ts]
    prev = cat([b.prev_output_tokens for b in bs])
    tgt = cat([b.target for b in bs])
    has_cm = bs[0].constraint_masks is not None
    cm = cat([b.constraint_masks for b in bs]) if has_cm else None
    # same-shape vision batches (stem already packed into resnet_feats)
    # ride the same transformer pass; _pack_key guarantees homogeneity
    feats = (
        cat([b.resnet_feats for b in bs])
        if bs[0].resnet_feats is not None else None
    )
    pmask = (
        cat([b.patch_masks for b in bs])
        if bs[0].patch_masks is not None else None
    )
    # conf is per-sample multiplicative — missing members get neutral ones
    if any(b.conf is not None for b in bs):
        conf = cat([
            b.conf if b.conf is not None else jnp.ones((B,), jnp.float32)
            for b in bs
        ])
    else:
        conf = None

    dup = crit_cfg.use_rdrop
    if dup:
        d = lambda a: None if a is None else jnp.concatenate([a, a], axis=0)
        src, prev, tgt, cm, conf = d(src), d(prev), d(tgt), d(cm), d(conf)
        feats, pmask = d(feats), d(pmask)

    logits = ofa.forward(
        params, model_cfg, src, prev, rngs=rng, deterministic=rng is None,
        train_bn=False, resnet_feats=feats, patch_masks=pmask,
    )

    def per_task(shaped):
        """[R*G*B, ...] → [G, R*B, ...] with R-Drop halves aligned per task."""
        if shaped is None:
            return None
        R = 2 if dup else 1
        x = shaped.reshape((R, G, B) + shaped.shape[1:])
        x = jnp.swapaxes(x, 0, 1)  # [G, R, B, ...]
        return x.reshape((G, R * B) + shaped.shape[1:])

    ce = functools.partial(
        label_smoothed_ce,
        epsilon=crit_cfg.label_smoothing,
        pad_id=model_cfg.pad,
        constraint_range=(
            (crit_cfg.constraint_start, crit_cfg.constraint_end)
            if crit_cfg.constraint_start is not None
            else None
        ),
        drop_worst_ratio=crit_cfg.drop_worst_ratio,
        drop_worst_active=update_num > crit_cfg.drop_worst_after,
        drop_best_ratio=crit_cfg.drop_best_ratio,
        drop_best_active=update_num > crit_cfg.drop_best_after,
        use_rdrop=dup,
        reg_alpha=crit_cfg.reg_alpha,
        vocab_size=model_cfg.vocab_size,
        encouraging_log_end=crit_cfg.encouraging_log_end,
    )
    if has_cm and conf is not None:
        outs = jax.vmap(lambda lg, t, c, cf: ce(lg, t, constraint_masks=c, conf=cf))(
            per_task(logits), per_task(tgt), per_task(cm), per_task(conf)
        )
    elif has_cm:
        outs = jax.vmap(lambda lg, t, c: ce(lg, t, constraint_masks=c))(
            per_task(logits), per_task(tgt), per_task(cm)
        )
    elif conf is not None:
        outs = jax.vmap(lambda lg, t, cf: ce(lg, t, conf=cf))(
            per_task(logits), per_task(tgt), per_task(conf)
        )
    else:
        outs = jax.vmap(lambda lg, t: ce(lg, t))(per_task(logits), per_task(tgt))
    return names, outs


def _pack_vision_stem(params, model_cfg, batches: Dict[str, TaskBatch]):
    """ONE ResNet pass for all same-resolution vision batches.

    The stem is task-agnostic (same params, frozen BN), so the per-task
    [B, H, W, 3] images concatenate into a single conv stream — at the
    reference envelope that turns 6 batch-2 ResNet-101 calls into one
    batch-12 call (better MXU utilization, one kernel stream). Each task's
    feature slice rides in ``TaskBatch.resnet_feats``; gradients are
    identical (convs are row-independent, R-Drop dups the feats not the
    conv). Exactness covered by the packed-vs-sequential parity test.
    """
    from ..models.resnet import resnet_forward

    groups: Dict[tuple, list] = {}
    for name, b in batches.items():
        if b.patch_images is not None and b.resnet_feats is None:
            groups.setdefault(b.patch_images.shape[1:], []).append(name)
    out = dict(batches)
    dtype = jnp.dtype(model_cfg.dtype)
    for shape, names in sorted(groups.items(), key=str):
        if len(names) < 2:
            continue
        imgs = jnp.concatenate(
            [batches[n].patch_images for n in names], axis=0
        )
        feats = resnet_forward(
            params["encoder"]["resnet"], imgs.astype(dtype), train=False,
            unroll=model_cfg.unroll_layers, remat=model_cfg.remat,
        )
        off = 0
        for n in names:
            sz = batches[n].patch_images.shape[0]
            out[n] = batches[n]._replace(
                resnet_feats=feats[off : off + sz], patch_images=None
            )
            off += sz
    return out


def multitask_loss(
    params,
    model_cfg: ModelConfig,
    crit_cfg: CriterionConfig,
    batches: Dict[str, TaskBatch],
    rng: Optional[jax.Array],
    update_num: jnp.ndarray,
    pack_text: bool = True,
    pack_vision: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Σ_task loss_t / ntokens_t (ref criterion recursion semantics).

    ``pack_text=True`` fuses same-shape text-only tasks into one forward
    (see :func:`packed_text_loss`); ``pack_vision=True`` fuses all
    same-resolution vision batches' ResNet stems into one conv pass
    (:func:`_pack_vision_stem`). Per-task loss semantics are exact in
    both cases."""
    total = 0.0
    metrics: Dict[str, jnp.ndarray] = {}
    # uint8 images / bit-packed constraint masks → compute form (must run
    # before vision-stem packing, which concatenates images across tasks
    # with possibly different normalization stats)
    dt = jnp.dtype(model_cfg.dtype)
    batches = {n: dequantize_batch(b, dt) for n, b in batches.items()}
    if pack_vision:
        batches = _pack_vision_stem(params, model_cfg, batches)
    ordered = sorted(batches.items())

    groups: Dict[object, Dict[str, TaskBatch]] = {}
    singles = []
    if pack_text:
        for name, batch in ordered:
            key = _pack_key(batch)
            if key is None:
                singles.append((name, batch))
            else:
                groups.setdefault(key, {})[name] = batch
        # groups of one gain nothing — run them the plain way
        for key in list(groups):
            if len(groups[key]) == 1:
                singles.extend(groups.pop(key).items())
    else:
        singles = ordered

    def add(name, out):
        nonlocal total
        norm = out.loss / jnp.maximum(out.ntokens, 1.0)
        total = total + norm
        metrics[f"loss/{name}"] = norm
        metrics[f"nll/{name}"] = out.nll_loss / jnp.maximum(out.ntokens, 1.0)

    name_index = {name: i for i, (name, _) in enumerate(ordered)}
    for name, batch in singles:
        trng = (
            None if rng is None else jax.random.fold_in(rng, name_index[name])
        )
        add(name, task_loss(params, model_cfg, crit_cfg, batch, trng, update_num))
    for key, group in sorted(groups.items(), key=str):
        grng = (
            None
            if rng is None
            else jax.random.fold_in(rng, min(name_index[n] for n in group))
        )
        names, outs = packed_text_loss(
            params, model_cfg, crit_cfg, group, grng, update_num
        )
        for g, name in enumerate(names):
            add(
                name,
                CELossOut(
                    loss=outs.loss[g],
                    nll_loss=outs.nll_loss[g],
                    ntokens=outs.ntokens[g],
                ),
            )
    metrics["loss/total"] = total
    return total, metrics


def make_train_step(
    model_cfg: ModelConfig,
    crit_cfg: CriterionConfig,
    optim_cfg: OptimConfig,
    ema_decay: float = 0.0,
    donate: bool = True,
    pack_text: bool = True,
    pack_vision: bool = True,
):
    """Build the jitted train step.

    The returned fn: (state, batches, rng) → (state, metrics), where every
    array in `batches` has a leading accum axis A (A=1 for no accumulation).
    """
    tx = make_optimizer(optim_cfg)

    def loss_fn(params, micro, rng, update_num):
        return multitask_loss(
            params, model_cfg, crit_cfg, micro, rng, update_num,
            pack_text=pack_text, pack_vision=pack_vision,
        )

    def step(state: TrainState, batches: Dict[str, TaskBatch], rng: jax.Array):
        A = jax.tree.leaves(batches)[0].shape[0]

        def micro_step(acc, xs):
            grads_acc, loss_acc = acc
            micro, a = xs
            mrng = jax.random.fold_in(rng, a)
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, micro, mrng, state.step
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), metrics

        if A == 1:
            # no real accumulation: skip the scan so XLA never materializes
            # the zeros-init carry + add over the full param tree (~0.5 GB
            # of pure grad-buffer traffic at ofa_base scale)
            micro = jax.tree.map(lambda a: a[0], batches)
            mrng = jax.random.fold_in(rng, 0)
            (loss_sum, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, micro, mrng, state.step
            )
            metrics = jax.tree.map(lambda x: x[None], m)
        else:
            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss_sum), metrics = jax.lax.scan(
                micro_step,
                (zero_grads, 0.0),
                (batches, jnp.arange(A)),
            )
            grads = jax.tree.map(lambda g: g / A, grads)

        gnorm = optax.global_norm(grads)
        # skip the update on non-finite gradients — the TPU-native stand-in
        # for the reference's NaN detector / AMP overflow batch-retry
        # (ref: trainer.py:899-923, fairseq.nan_detector)
        finite = jnp.isfinite(gnorm)
        safe_grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def keep_if_skipped(new, old):
            return jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)

        new_params = keep_if_skipped(new_params, state.params)
        new_opt = keep_if_skipped(new_opt, state.opt_state)
        new_ema = (
            ema_update(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        new_state = TrainState(
            step=state.step + finite.astype(jnp.int32),
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        out_metrics = {k: v[-1] for k, v in metrics.items()}
        out_metrics["loss"] = loss_sum / A
        out_metrics["gnorm"] = gnorm
        out_metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return new_state, out_metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
