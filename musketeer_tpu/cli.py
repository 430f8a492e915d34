"""Command-line entry points: train / evaluate / convert.

Replaces the reference's fairseq-launched train.py / evaluate.py + ~60-flag
bash scripts (ref: run_scripts/musketeer/train_musketeer.sh:95-177) with a
typed-config CLI. Single-controller JAX: run once per host, no process spawn.

Usage:
  python -m musketeer_tpu.cli train --tasks caption=path.tsv,vqa_gen=path2.tsv \
      --arch ofa_base --description tep --save-dir ckpts [...]
  python -m musketeer_tpu.cli evaluate --task caption --data path.tsv \
      --ckpt ckpts/checkpoint_best [--pt reference.pt]
  python -m musketeer_tpu.cli convert --pt ofa_base.pt --out ckpts/converted
"""

from __future__ import annotations

import argparse
import json
import logging

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
)
logger = logging.getLogger("musketeer_tpu.cli")


def _add_common(p):
    p.add_argument("--arch", default="ofa_base")
    p.add_argument("--description", default="tep", choices=["base", "tep", "onehot"])
    p.add_argument("--patch-image-size", type=int, default=480)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--limit", type=int, default=None)


def cmd_train(args):
    import jax

    if args.criterion in ("scst", "clip_scst"):
        # reward-criterion fine-tuning stage (ref: criterions/scst_loss.py
        # 'scst_reward_criterion', clip_scst_loss.py; BASELINE configs[4])
        from .training.scst_loop import run_scst_cli

        run_scst_cli(args)
        return

    from .config import CriterionConfig, MeshConfig, OptimConfig, TrainConfig, ARCH_PRESETS
    from .models import ofa
    from .parallel import make_mesh, shard_params
    from .tasks import MusketeerDataLoader, SubTaskSpec
    from .tokenization import default_vocab
    from .training import init_train_state, train_loop
    from .training.checkpoint import import_pt

    vocab = default_vocab()
    model_cfg = ARCH_PRESETS[args.arch]()
    specs = []
    for item in args.tasks.split(","):
        name, path = item.split("=", 1)
        specs.append(
            SubTaskSpec(
                name, path, batch_size=args.batch_size,
                src_len=args.src_bucket, tgt_len=args.tgt_bucket,
                task_kwargs={"patch_image_size": args.patch_image_size}
                if name not in ("gigaword", "cola", "sst2", "mrpc", "qqp", "qnli", "rte", "mnli")
                else {},
            )
        )
    loader = MusketeerDataLoader(
        vocab, specs, description=args.description,
        eq_sampling=args.eq_sampling, update_freq=args.update_freq,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )
    cfg = TrainConfig(
        arch=args.arch,
        update_freq=args.update_freq,
        ema_decay=args.ema_decay,
        patience=args.patience,
        max_epoch=args.max_epoch,
        max_update=args.max_update,
        optim=OptimConfig(
            lr=args.lr, warmup_updates=args.warmup_updates,
            total_updates=args.total_updates, clip_norm=args.clip_norm,
            # embeddings are shared (share_all_embeddings), so either flag
            # freezes the one tensor (ref: unify_transformer.py:380-384)
            freeze_params=("embed_tokens",)
            if (args.freeze_encoder_embedding or args.freeze_decoder_embedding)
            else (),
        ),
        stop_time_hours=args.stop_time_hours,
        prefetch_depth=args.prefetch_depth,
        async_save=args.async_save,
        save_interval_updates=args.save_interval_updates,
        validate_interval_updates=args.validate_interval_updates,
        keep_best_checkpoints=args.keep_best_checkpoints,
        criterion=CriterionConfig(
            label_smoothing=args.label_smoothing,
            drop_worst_ratio=args.drop_worst_ratio,
            drop_worst_after=args.drop_worst_after,
            drop_best_ratio=args.drop_best_ratio,
            drop_best_after=args.drop_best_after,
            encouraging_log_end=args.log_end,
            use_rdrop=args.use_rdrop,
        ),
        mesh=MeshConfig(
            data=-1, fsdp=args.fsdp, model=args.model_parallel,
            pipe=args.pipeline, seq=args.seq_parallel,
        ),
    )
    if args.restore_pt:
        params, model_cfg = import_pt(args.restore_pt, model_cfg)
        params = jax.tree.map(jax.numpy.asarray, params)
        logger.info("restored reference checkpoint %s", args.restore_pt)
    else:
        params = ofa.init_ofa_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    from dataclasses import replace as _replace

    # training compute-path defaults: Pallas attention ON (it falls back
    # per-call when a precondition fails, e.g. attention dropout)
    model_cfg = _replace(
        model_cfg,
        use_flash_attention=not args.no_flash,
        remat=args.remat,
        unroll_layers=args.unroll_layers,
    )
    if args.microbatches:
        model_cfg = _replace(
            model_cfg, pipeline_microbatches=args.microbatches,
            pipeline_interleave=args.pipeline_interleave,
        )
    elif args.pipeline_interleave > 1:
        logger.warning(
            "--pipeline-interleave=%d is ignored without --microbatches "
            "(the interleaved schedule only exists on the pipelined path)",
            args.pipeline_interleave,
        )
    if args.seq_parallel > 1:
        model_cfg = _replace(model_cfg, seq_parallel=True)

    # validation: by default Musketeer monitors SNLI-VE only
    # (ref: musketeer_task.py:545-559); override with --valid-task/--valid-data
    validate_fn = None
    if args.valid_data:
        from .data import FileDataset
        from .tasks import TASK_REGISTRY

        vname = args.valid_task or "snli_ve"
        vkw = (
            {"patch_image_size": args.patch_image_size}
            if vname not in ("gigaword", "cola", "sst2", "mrpc", "qqp", "qnli", "rte", "mnli")
            else {}
        )
        vtask = TASK_REGISTRY[vname](vocab, description=args.description, **vkw)
        vds = FileDataset(
            args.valid_data, shard_id=jax.process_index(),
            num_shards=jax.process_count(),
        )

        def validate_fn(state):
            m = vtask.evaluate(
                state.params, model_cfg, vds,
                batch_size=args.batch_size, limit=args.valid_limit,
            )
            metric = m.get("acc", m.get("cider", m.get("acc@0.5", 0.0)))
            logger.info("valid %s: %s", vname, {k: v for k, v in m.items() if k not in ("pairs", "predictions")})
            return float(metric)

    mesh = make_mesh(cfg.mesh)
    with jax.set_mesh(mesh):
        params = shard_params(mesh, params)
        state = init_train_state(params, cfg.optim, ema_decay=cfg.ema_decay)
        state = train_loop(
            cfg, model_cfg, state, loader, validate_fn=validate_fn,
            save_dir=args.save_dir, max_epoch=args.max_epoch,
            resume=not args.no_resume,
        )
    logger.info("done at update %d", int(state.step))


def cmd_evaluate(args):
    import jax

    from .config import ARCH_PRESETS
    from .data import FileDataset
    from .models import ofa
    from .tasks import TASK_REGISTRY
    from .tokenization import default_vocab
    from .training.checkpoint import import_pt

    vocab = default_vocab()
    model_cfg = ARCH_PRESETS[args.arch]()
    if args.pt:
        # comma-separated checkpoints → ensemble decoding (ref:
        # load_model_ensemble_and_task, utils/checkpoint_utils.py:405-495;
        # lprobs averaged in probability space per step)
        pt_paths = [p for p in args.pt.split(",") if p]
        plist = []
        for p in pt_paths:
            pi, model_cfg = import_pt(p, None)
            plist.append(jax.tree.map(jax.numpy.asarray, pi))
        params = plist[0] if len(plist) == 1 else plist
        if len(plist) > 1:
            assert args.task in ("caption", "refcoco", "gigaword"), (
                f"ensemble eval supports the generation tasks "
                f"(caption/refcoco/gigaword); {args.task} scores fixed "
                "candidates — run single-model"
            )
            logger.info("ensemble of %d checkpoints", len(plist))
    elif args.ckpt:
        from .config import OptimConfig
        from .training import init_train_state, load_checkpoint
        import os

        params = ofa.init_ofa_params(jax.random.PRNGKey(0), model_cfg)
        # load_checkpoint adapts the EMA slot to whatever the ckpt carries
        template = init_train_state(params, OptimConfig())
        state, _ = load_checkpoint(
            os.path.dirname(args.ckpt), template, os.path.basename(args.ckpt)
        )
        # eval on the EMA shadow when asked (ref: eval driver loads +EMA,
        # utils/checkpoint_utils.py 'ema' model-state overlay)
        if args.use_ema:
            assert state.ema_params is not None, (
                "--use-ema: checkpoint has no EMA shadow (trained without "
                "--ema-decay)"
            )
            params = state.ema_params
        else:
            params = state.params
    else:
        logger.warning("no checkpoint given; evaluating random init")
        params = ofa.init_ofa_params(jax.random.PRNGKey(0), model_cfg)

    if args.int8_output_proj:
        params = (
            [ofa.quantize_output_proj(p) for p in params]
            if isinstance(params, list)
            else ofa.quantize_output_proj(params)
        )

    task_kw = {}
    if args.task not in ("gigaword", "cola", "sst2", "mrpc", "qqp", "qnli", "rte", "mnli"):
        task_kw["patch_image_size"] = args.patch_image_size
    if args.answers_file:
        with open(args.answers_file) as f:
            task_kw["answers"] = [line.strip() for line in f if line.strip()]
    task = TASK_REGISTRY[args.task](vocab, description=args.description, **task_kw)
    gen_overrides = {}
    if args.beam is not None:
        gen_overrides["beam_size"] = args.beam
    if args.max_len_b is not None:
        gen_overrides["max_len_b"] = args.max_len_b
    if args.diverse_groups:
        gen_overrides["diverse_beam_groups"] = args.diverse_groups
        gen_overrides["diversity_strength"] = args.diversity_strength
    if getattr(args, "int8_kv_cache", False):
        gen_overrides["int8_cross_kv"] = True
    if gen_overrides:
        task.set_generation_overrides(**gen_overrides)
    dataset = FileDataset(
        args.data, shard_id=jax.process_index(), num_shards=jax.process_count()
    )
    if args.zero_shot:
        assert hasattr(task, "evaluate_zero_shot"), (
            f"task {args.task} has no zero-shot path"
        )
        metrics = task.evaluate_zero_shot(
            params, model_cfg, dataset, batch_size=args.batch_size,
            limit=args.limit,
        )
    elif getattr(args, "beam_search_vqa_eval", False):
        assert hasattr(task, "evaluate_beam"), (
            f"task {args.task} has no beam-search eval path"
        )
        metrics = task.evaluate_beam(
            params, model_cfg, dataset, batch_size=args.batch_size,
            limit=args.limit,
        )
    else:
        metrics = task.evaluate(
            params, model_cfg, dataset, batch_size=args.batch_size, limit=args.limit
        )
    preds = metrics.pop("predictions", None)
    metrics.pop("pairs", None)
    if args.results_json and preds is not None:
        # dump per-example predictions (the reference's test_predict.json,
        # ref: run_scripts/caption/evaluate_caption_base.sh + coco_eval.py)
        with open(args.results_json, "w") as f:
            json.dump(
                [{"image_id": k, "caption": v} for k, v in preds.items()], f
            )
        logger.info("wrote %d predictions to %s", len(preds), args.results_json)
    print(json.dumps({"task": args.task, **{k: v for k, v in metrics.items()}}))


def cmd_evaluate_all(args):
    """Evaluate every task of a Musketeer checkpoint in one invocation —
    the reference's per-task evaluate.sh sweep (+ ckpt retargeting,
    checkpoint_utils.py:448-451) collapsed into one command.

    --tasks caption=path.tsv,refcoco=path.tsv,... (same syntax as train)
    """
    import jax

    from .config import ARCH_PRESETS
    from .data import FileDataset
    from .tasks import TASK_REGISTRY
    from .tokenization import default_vocab
    from .training.checkpoint import import_pt
    from .models import ofa

    vocab = default_vocab()
    model_cfg = ARCH_PRESETS[args.arch]()
    if args.pt:
        params, model_cfg = import_pt(args.pt, None)
        params = jax.tree.map(jax.numpy.asarray, params)
    else:
        logger.warning("no checkpoint given; evaluating random init")
        params = ofa.init_ofa_params(jax.random.PRNGKey(0), model_cfg)

    if args.int8_output_proj:
        params = ofa.quantize_output_proj(params)

    results = {}
    for item in args.tasks.split(","):
        name, path = item.split("=", 1)
        task_kw = {}
        if name not in ("gigaword", "cola", "sst2", "mrpc", "qqp", "qnli", "rte", "mnli"):
            task_kw["patch_image_size"] = args.patch_image_size
        task = TASK_REGISTRY[name](vocab, description=args.description, **task_kw)
        if getattr(args, "int8_kv_cache", False):
            task.set_generation_overrides(int8_cross_kv=True)
        ds = FileDataset(path, shard_id=jax.process_index(), num_shards=jax.process_count())
        m = task.evaluate(params, model_cfg, ds, batch_size=args.batch_size, limit=args.limit)
        m.pop("predictions", None)
        m.pop("pairs", None)
        results[name] = m
        logger.info("%s: %s", name, m)
    print(json.dumps(results))


def cmd_convert(args):
    from .training.checkpoint import import_pt, save_checkpoint
    from .config import OptimConfig
    from .training import init_train_state
    import jax
    import os

    params, model_cfg = import_pt(args.pt, None)
    params = jax.tree.map(jax.numpy.asarray, params)
    state = init_train_state(params, OptimConfig())
    save_checkpoint(
        os.path.dirname(args.out) or ".", state, os.path.basename(args.out),
        {"source_pt": args.pt, "arch_embed_dim": model_cfg.embed_dim},
    )
    logger.info("converted %s -> %s", args.pt, args.out)


def cmd_vqgan_encode(args):
    """Tokenize images into VQGAN code TSVs — the data-prep step the
    reference assumes was done offline (its pure_image/image_gen TSVs carry
    precomputed code strings, ref: data/pretrain_data/unify_dataset.py
    process_pure_image, data/mm_data/image_gen_dataset.py)."""
    import numpy as np
    import jax.numpy as jnp
    import torch

    from .data.file_dataset import FileDataset
    from .data.transforms import decode_base64_image
    from .models.vqgan import convert_vqgan_state_dict, encode_codes

    sd = torch.load(args.vqgan, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params, vcfg = convert_vqgan_state_dict(sd, gumbel=args.gumbel)
    assert "encoder" in params, "checkpoint has no encoder weights"

    ds = FileDataset(args.data)
    S = args.image_size
    n_written = 0
    with open(args.out, "w") as out:
        for start in range(0, len(ds), args.batch_size):
            idx = list(range(start, min(start + args.batch_size, len(ds))))
            rows = ds.get_batch(idx)
            imgs = np.stack([
                np.asarray(
                    decode_base64_image(r[1]).resize((S, S)), np.float32
                ) / 127.5 - 1.0
                for r in rows
            ])
            ids = np.asarray(encode_codes(params, vcfg, jnp.asarray(imgs)))
            for r, row_ids in zip(rows, ids):
                code_str = " ".join(str(int(c)) for c in row_ids.reshape(-1))
                out.write(f"{r[0]}\t{r[1]}\t{code_str}\n")
                n_written += 1
    if n_written > 0:
        logger.info("wrote %d code rows (%dx%d grid) to %s",
                    n_written, ids.shape[1], ids.shape[2], args.out)
    else:
        logger.info("wrote 0 code rows to %s (empty input)", args.out)


def main(argv=None):
    parser = argparse.ArgumentParser("musketeer_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    _add_common(pt)
    pt.add_argument("--tasks", required=True, help="name=path.tsv[,name=path...]")
    pt.add_argument("--save-dir", default=None)
    pt.add_argument("--no-resume", action="store_true",
                    help="do not auto-restore checkpoint_last from --save-dir")
    pt.add_argument("--save-interval-updates", type=int, default=0,
                    help="mid-epoch checkpoint every N updates")
    pt.add_argument("--validate-interval-updates", type=int, default=0,
                    help="mid-epoch validation every N updates")
    pt.add_argument("--keep-best-checkpoints", type=int, default=-1)
    pt.add_argument("--async-save", action="store_true",
                    help="background checkpoint writes")
    pt.add_argument("--restore-pt", default=None)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--warmup-updates", type=int, default=1000)
    pt.add_argument("--total-updates", type=int, default=30000)
    pt.add_argument("--max-epoch", type=int, default=1)
    pt.add_argument("--max-update", type=int, default=0)
    pt.add_argument("--update-freq", type=int, default=1)
    pt.add_argument("--clip-norm", type=float, default=1.0)
    pt.add_argument("--label-smoothing", type=float, default=0.1)
    pt.add_argument("--drop-worst-ratio", type=float, default=0.0)
    pt.add_argument("--drop-worst-after", type=int, default=0)
    pt.add_argument("--drop-best-ratio", type=float, default=0.0)
    pt.add_argument("--drop-best-after", type=int, default=0)
    pt.add_argument("--log-end", type=float, default=None,
                    help="enable encouraging loss with this log_end")
    pt.add_argument("--criterion", default="label_smoothed",
                    choices=["label_smoothed", "scst", "clip_scst"],
                    help="label_smoothed: multi-task CE (default); scst: "
                         "CIDEr-reward policy gradient on caption data; "
                         "clip_scst: CLIP-reward PG on image_gen data")
    pt.add_argument("--scst-sample-beams", type=int, default=5,
                    help="sampled chains per example for SCST rewards")
    pt.add_argument("--scst-max-len-b", type=int, default=16,
                    help="max sampled caption length (scst)")
    pt.add_argument("--clip-pt", default=None,
                    help="CLIP .pt checkpoint (clip_scst reward model)")
    pt.add_argument("--vqgan-pt", default=None,
                    help="VQGAN .pt/.ckpt checkpoint (clip_scst decoder)")
    pt.add_argument("--gumbel", action="store_true",
                    help="--vqgan-pt is a GumbelVQ checkpoint")
    pt.add_argument("--use-rdrop", action="store_true")
    pt.add_argument("--freeze-encoder-embedding", action="store_true",
                    help="freeze the (shared) token embedding "
                         "(ref: unify_transformer.py:380-384)")
    pt.add_argument("--freeze-decoder-embedding", action="store_true",
                    help="freeze the (shared) token embedding / tied output "
                         "projection (ref: unify_transformer.py:383-384)")
    pt.add_argument("--stop-time-hours", type=float, default=0.0)
    pt.add_argument("--prefetch-depth", type=int, default=2,
                    help="background batch-prefetch queue depth (0 = off)")
    pt.add_argument("--no-flash", action="store_true",
                    help="disable the Pallas attention kernels (XLA fallback)")
    pt.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each transformer layer (memory for FLOPs)")
    pt.add_argument("--unroll-layers", action="store_true",
                    help="unroll layer loops instead of lax.scan (faster steps, "
                         "O(L) compile time)")
    pt.add_argument("--pipeline", type=int, default=1,
                    help="pipeline stages (mesh pipe axis)")
    pt.add_argument("--microbatches", type=int, default=0,
                    help="pipeline microbatches (0 = off)")
    pt.add_argument("--pipeline-interleave", type=int, default=1,
                    help="virtual stages per pipeline device (interleaved "
                         "schedule; needs layers %% (stages*V) == 0 and "
                         "microbatches <= stages)")
    pt.add_argument("--seq-parallel", type=int, default=1,
                    help="sequence-parallel ring size (mesh seq axis; "
                         "encoder ring attention)")
    pt.add_argument("--ema-decay", type=float, default=0.0)
    pt.add_argument("--patience", type=int, default=-1)
    pt.add_argument("--eq-sampling", type=int, default=0)
    pt.add_argument("--fsdp", type=int, default=1)
    pt.add_argument("--model-parallel", type=int, default=1)
    pt.add_argument("--src-bucket", type=int, default=None)
    pt.add_argument("--tgt-bucket", type=int, default=None)
    pt.add_argument("--valid-task", default=None,
                    help="validation task (default snli_ve, the reference quirk)")
    pt.add_argument("--valid-data", default=None, help="validation TSV")
    pt.add_argument("--valid-limit", type=int, default=None)
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("evaluate")
    _add_common(pe)
    pe.add_argument("--task", required=True)
    pe.add_argument("--data", required=True)
    pe.add_argument("--ckpt", default=None)
    pe.add_argument("--pt", default=None,
                    help="reference fairseq .pt checkpoint; comma-separate "
                         "several for ensemble decoding (generation tasks)")
    pe.add_argument("--answers-file", default=None)
    pe.add_argument("--use-ema", action="store_true",
                    help="evaluate the EMA shadow params from the checkpoint")
    pe.add_argument("--beam-search-vqa-eval", action="store_true",
                    help="trie-constrained beam-search VQA eval instead of "
                    "allcand scoring (ref: evaluate_vqa_beam_base.sh)")
    pe.add_argument("--zero-shot", action="store_true",
                    help="zero-shot eval path (vqa_gen: no trie, open gen)")
    pe.add_argument("--beam", type=int, default=None)
    pe.add_argument("--max-len-b", type=int, default=None)
    pe.add_argument("--diverse-groups", type=int, default=0)
    pe.add_argument("--diversity-strength", type=float, default=0.5)
    pe.add_argument("--results-json", default=None,
                    help="dump per-example predictions (test_predict.json style)")
    pe.add_argument("--int8-output-proj", action="store_true",
                    help="serve with int8 output projection (halves the "
                         "decode loop's HBM weight read; ~1e-2 logit error)")
    pe.add_argument("--int8-kv-cache", action="store_true",
                    help="serve with an int8 cross-attention K/V cache "
                         "(halves the decode loop's per-step cross-KV read)")
    pe.set_defaults(fn=cmd_evaluate)

    pa = sub.add_parser("evaluate-all")
    _add_common(pa)
    pa.add_argument("--tasks", required=True, help="name=path.tsv[,name=path...]")
    pa.add_argument("--pt", default=None)
    pa.add_argument("--int8-output-proj", action="store_true")
    pa.add_argument("--int8-kv-cache", action="store_true")
    pa.set_defaults(fn=cmd_evaluate_all)

    pv = sub.add_parser("vqgan-encode")
    pv.add_argument("--vqgan", required=True, help="taming VQGAN .pt/.ckpt")
    pv.add_argument("--gumbel", action="store_true")
    pv.add_argument("--data", required=True, help="TSV: id \\t image_b64 [...]")
    pv.add_argument("--out", required=True, help="output TSV: id, image, codes")
    pv.add_argument("--image-size", type=int, default=256)
    pv.add_argument("--batch-size", type=int, default=16)
    pv.set_defaults(fn=cmd_vqgan_encode)

    pc = sub.add_parser("convert")
    pc.add_argument("--pt", required=True)
    pc.add_argument("--out", required=True)
    pc.set_defaults(fn=cmd_convert)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
