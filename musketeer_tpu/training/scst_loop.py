"""SCST / CLIP-SCST training driver: the reference's reward-criterion
fine-tuning stage as a first-class `cli train --criterion` path.

In the reference, SCST is selected like any other criterion
(ref: criterions/scst_loss.py:80-223 registered as 'scst_reward_criterion',
clip_scst_loss.py:109-140 as 'clip_scst_reward_criterion'; BASELINE.json
configs[4] names the SCST CIDEr/CLIP fine-tune a target config). The jitted
sample/PG-step pieces live in criterions/scst.py and criterions/clip_scst.py;
this module is the epoch/step/checkpoint loop around them — deliberately
separate from trainer.train_loop because SCST steps are sample → host-side
reward (CIDEr or CLIP) → grad step, not one fused jitted program.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import numpy as np

from ..config import GenerationConfig, ModelConfig, OptimConfig
from ..data.file_dataset import FileDataset
from ..data.task_data import CaptionBuilder, ImageGenBuilder, collate
from .checkpoint import CheckpointManager, wait_for_saves
from .train_state import init_train_state, make_optimizer

logger = logging.getLogger("musketeer_tpu.scst")


def scst_training(
    vocab,
    model_cfg: ModelConfig,
    params,
    data_path: str,
    criterion: str = "scst",  # 'scst' | 'clip_scst'
    optim: Optional[OptimConfig] = None,
    batch_size: int = 2,
    sample_beams: int = 5,
    max_len_b: int = 16,
    max_epoch: int = 1,
    max_update: int = 0,
    save_dir: Optional[str] = None,
    description: str = "tep",
    patch_image_size: int = 480,
    limit: Optional[int] = None,
    log_interval: int = 10,
    seed: int = 7,
    image_gen_task=None,  # required for clip_scst (carries CLIP+VQGAN)
    shard_id: int = 0,
    num_shards: int = 1,
):
    """Run reward fine-tuning; returns the final TrainState.

    scst: caption TSVs (id, image_b64, 'ref1&&ref2&&...') — sample K
    captions per image, CIDEr-D reward, leave-one-out baseline
    (ref: scst_loss.py:139-180).
    clip_scst: image-gen TSVs (id, caption, codes) — sample K code
    sequences, frozen-VQGAN decode, frozen-CLIP ti_sim reward
    (ref: clip_scst_loss.py:109-140).
    """
    from ..criterions.clip_scst import clip_scst_train_step
    from ..criterions.scst import make_scst_fns, scst_train_step

    assert criterion in ("scst", "clip_scst"), criterion
    optim = optim or OptimConfig()
    tx = make_optimizer(optim)
    state = init_train_state(params, optim)

    gen_code = criterion == "clip_scst"
    if gen_code:
        assert image_gen_task is not None, (
            "clip_scst needs an ImageGenTask with CLIP + VQGAN weights "
            "(cli: --clip-pt and --vqgan-pt)"
        )
        image_gen_task.sampling_times = sample_beams
        gen_cfg = image_gen_task.generation_config()
        builder = ImageGenBuilder(
            vocab, description=description,
            code_image_size=image_gen_task.code_image_size,
        )
    else:
        gen_cfg = GenerationConfig(
            beam_size=sample_beams, max_len_b=max_len_b, min_len=1,
            sampling=True,
        )
        builder = CaptionBuilder(
            vocab, description=description, split="train", scst=True,
            patch_image_size=patch_image_size,
        )

    sample_fn, grad_fn = make_scst_fns(model_cfg, gen_cfg, tx, gen_code=gen_code)

    ds = FileDataset(data_path, shard_id=shard_id, num_shards=num_shards)
    n_rows = ds.row_count if limit is None else min(limit, ds.row_count)
    assert n_rows >= batch_size, f"{n_rows} rows < batch {batch_size}"

    ckpt_mgr = (
        CheckpointManager(
            save_dir, best_checkpoint_metric="mean_reward",
            maximize_best_checkpoint_metric=True,
        )
        if save_dir
        else None
    )

    updates = 0
    t0 = time.time()
    reward_meter = []
    for epoch in range(1, max_epoch + 1):
        order = np.random.RandomState(seed + epoch).permutation(n_rows)
        for start in range(0, n_rows - batch_size + 1, batch_size):
            idx = [int(order[start + j]) for j in range(batch_size)]
            exs = [builder(cols) for cols in ds.get_batch(idx)]
            # SCST sources are one fixed TEP prompt per task → per-batch max
            # length is constant, so dynamic padding never recompiles
            batch = collate(exs, pad_id=vocab.pad)
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), updates)
            if gen_code:
                state, metrics = clip_scst_train_step(
                    state, vocab, image_gen_task, grad_fn, batch,
                    model_cfg, rng,
                )
                reward = metrics["mean_clip_reward"]
            else:
                state, metrics = scst_train_step(
                    state, vocab, sample_fn, grad_fn, batch, rng,
                    max_len=max_len_b,
                )
                reward = metrics["mean_reward"]
            updates += 1
            reward_meter.append(float(reward))
            if updates % log_interval == 0:
                logger.info(
                    "%s epoch %d update %d loss %.4f mean_reward %.4f "
                    "ups %.2f", criterion, epoch, updates,
                    float(metrics["scst_loss"]),
                    float(np.mean(reward_meter[-log_interval:])),
                    updates / (time.time() - t0),
                )
            if max_update and updates >= max_update:
                break
        mean_r = float(np.mean(reward_meter)) if reward_meter else 0.0
        if ckpt_mgr is not None:
            ckpt_mgr.step(state, epoch, updates, mean_r, end_of_epoch=True)
        if max_update and updates >= max_update:
            break
    wait_for_saves()
    logger.info(
        "%s done: %d updates, mean reward %.4f", criterion, updates,
        float(np.mean(reward_meter)) if reward_meter else 0.0,
    )
    return state


def run_scst_cli(args):
    """cli train --criterion {scst,clip_scst} entry (parses CLI args)."""
    import jax

    # single-program loop: sample → host reward → PG step. Mesh/pipeline/
    # accumulation flags belong to the fused label-smoothed step and are
    # not wired here — fail loudly rather than silently ignore them.
    ignored = [
        name for name, dflt in (
            ("fsdp", 1), ("model_parallel", 1), ("pipeline", 1),
            ("seq_parallel", 1), ("microbatches", 0), ("update_freq", 1),
            ("ema_decay", 0.0),
        )
        if getattr(args, name, dflt) != dflt
    ]
    if ignored:
        logger.warning(
            "--criterion %s ignores %s (reward fine-tuning runs the plain "
            "data-parallel loop; ref fine-tunes SCST the same way)",
            args.criterion, ", ".join(f"--{n.replace('_', '-')}" for n in ignored),
        )

    from ..config import ARCH_PRESETS
    from ..models import ofa
    from ..tokenization import default_vocab
    from .checkpoint import import_pt

    vocab = default_vocab()
    from dataclasses import replace as _replace

    if args.restore_pt:
        # arch inferred from the checkpoint's tensor shapes (convert/)
        params, model_cfg = import_pt(args.restore_pt, None)
        params = jax.tree.map(jax.numpy.asarray, params)
    else:
        model_cfg = ARCH_PRESETS[args.arch]()
        params = ofa.init_ofa_params(jax.random.PRNGKey(7), model_cfg)
    model_cfg = _replace(model_cfg, use_flash_attention=not args.no_flash)

    items = [it.split("=", 1) for it in args.tasks.split(",")]
    assert len(items) == 1, (
        f"--criterion {args.criterion} fine-tunes ONE task "
        f"(caption for scst, image_gen for clip_scst); got {args.tasks}"
    )
    task_name, data_path = items[0]

    image_gen_task = None
    if args.criterion == "clip_scst":
        assert task_name == "image_gen", "clip_scst runs on image_gen data"
        import torch

        from ..models.clip import convert_clip_state_dict
        from ..models.vqgan import convert_vqgan_state_dict
        from ..tasks.image_gen import ImageGenTask

        assert args.clip_pt and args.vqgan_pt, (
            "clip_scst needs --clip-pt and --vqgan-pt checkpoints"
        )
        csd = torch.load(args.clip_pt, map_location="cpu", weights_only=False)
        csd = csd.get("state_dict", csd) if isinstance(csd, dict) else csd
        clip_params, clip_cfg = convert_clip_state_dict(csd)
        vsd = torch.load(args.vqgan_pt, map_location="cpu", weights_only=False)
        vsd = vsd.get("state_dict", vsd) if isinstance(vsd, dict) else vsd
        vq_params, vq_cfg = convert_vqgan_state_dict(vsd, gumbel=args.gumbel)
        image_gen_task = ImageGenTask(
            vocab, description=args.description,
            code_image_size=model_cfg.code_image_size,
            clip_params=clip_params, clip_cfg=clip_cfg,
            vqgan_params=vq_params, vqgan_cfg=vq_cfg,
        )
    else:
        assert task_name == "caption", "scst runs on caption data"

    from ..config import OptimConfig

    return scst_training(
        vocab, model_cfg, params, data_path,
        criterion=args.criterion,
        optim=OptimConfig(
            lr=args.lr, warmup_updates=args.warmup_updates,
            total_updates=args.total_updates, clip_norm=args.clip_norm,
            freeze_params=("embed_tokens",)
            if (args.freeze_encoder_embedding or args.freeze_decoder_embedding)
            else (),
        ),
        batch_size=args.batch_size,
        sample_beams=args.scst_sample_beams,
        max_len_b=args.scst_max_len_b,
        max_epoch=args.max_epoch or 1,
        max_update=args.max_update,
        save_dir=args.save_dir,
        description=args.description,
        patch_image_size=args.patch_image_size,
        limit=args.limit,
        image_gen_task=image_gen_task,
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
    )
