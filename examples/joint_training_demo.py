"""End-to-end Musketeer joint-training demo on synthetic data.

Trains ONE fully-shared model on three tasks simultaneously (caption +
visual grounding + CoLA), TEP-prompt-disambiguated, then evaluates each
task — the reference's headline capability (README.md:1-4) in miniature.
Runs on whatever accelerator jax sees (TPU chip under the driver;
`--cpu` forces the 8-device virtual mesh).

CONVERGENCE ARTIFACT (VERDICT r4 #6): evaluates all three tasks BEFORE
and AFTER training with the same shared weights and ASSERTS improvement
(caption CIDEr up, grounding mean-IoU up, CoLA accuracy above chance) —
the rebuild's machine-checkable stand-in for the reference's
validation-during-training quality control (ref: train.py:366-433,
SURVEY §4). `--json-out FILE` captures the full record.

Usage: python examples/joint_training_demo.py [--steps 60] [--cpu]
           [--json-out DEMO.json]
"""

import argparse
import base64
import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(tmpdir, n=24):
    import numpy as np
    from PIL import Image, ImageDraw

    def b64(img):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.urlsafe_b64encode(buf.getvalue()).decode()

    colors = ["red", "green", "blue", "yellow"]
    rng = np.random.RandomState(0)
    cap_path = os.path.join(tmpdir, "cap.tsv")
    ref_path = os.path.join(tmpdir, "ref.tsv")
    cola_path = os.path.join(tmpdir, "cola.tsv")
    rgb = {"red": (220, 40, 40), "green": (40, 200, 40),
           "blue": (40, 40, 220), "yellow": (230, 220, 40)}
    with open(cap_path, "w") as fc, open(ref_path, "w") as fr:
        for i in range(n):
            color = colors[i % 4]
            img = Image.new("RGB", (96, 96), (30, 30, 30))
            d = ImageDraw.Draw(img)
            x0, y0 = int(rng.randint(8, 40)), int(rng.randint(8, 40))
            d.rectangle([x0, y0, x0 + 40, y0 + 40], fill=rgb[color])
            b = b64(img)
            fc.write(f"c{i}\t{b}\ta {color} square on a dark background\n")
            fr.write(f"r{i}\t{b}\tthe {color} square\t{x0}.0,{y0}.0,{x0+40}.0,{y0+40}.0\n")
    with open(cola_path, "w") as f:
        for i in range(n):
            f.write(f"the model number {i} runs fine\t1\n")
            f.write(f"runs number fine the {i} model\t0\n")
    return cap_path, ref_path, cola_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--json-out", default=None,
                    help="write the convergence record (per-task metrics "
                         "before/after, steps, wall time) as JSON")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace

    from musketeer_tpu.config import CriterionConfig, OptimConfig, ofa_tiny
    from musketeer_tpu.data import FileDataset
    from musketeer_tpu.models import ofa
    from musketeer_tpu.tasks import (
        CaptionTask, GlueTask, MusketeerDataLoader, RefcocoTask, SubTaskSpec,
    )
    from musketeer_tpu.tokenization import default_vocab
    from musketeer_tpu.training import init_train_state, make_train_step

    print("devices:", jax.devices(), flush=True)
    vocab = default_vocab()
    cfg = replace(
        ofa_tiny(),
        embed_dim=128, ffn_dim=256, encoder_layers=2, decoder_layers=2,
        attention_heads=4, resnet_layers=(1, 1, 1),
        dtype="bfloat16" if not args.cpu else "float32",
        use_flash_attention=not args.cpu,
    )
    tmpdir = tempfile.mkdtemp()
    cap_path, ref_path, cola_path = make_data(tmpdir)

    loader = MusketeerDataLoader(
        vocab,
        [
            SubTaskSpec("caption", cap_path, batch_size=4, src_len=16, tgt_len=16,
                        task_kwargs={"patch_image_size": 64}),
            SubTaskSpec("refcoco", ref_path, batch_size=4, src_len=16, tgt_len=8,
                        task_kwargs={"patch_image_size": 64}),
            SubTaskSpec("cola", cola_path, batch_size=4, src_len=24, tgt_len=32),
        ],
        description="base",
    )
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    optim = OptimConfig(
        lr=args.lr, warmup_updates=5, total_updates=args.steps * 3,
        weight_decay=0.0, clip_norm=2.0,
    )
    state = init_train_state(params, optim)
    step_fn = make_train_step(cfg, CriterionConfig(label_smoothing=0.1), optim, donate=False)

    # per-task eval harness, reused before and after training so the compiled
    # generate/score programs are shared between the two passes
    cap_task = CaptionTask(vocab, description="base", patch_image_size=64)
    ref_task = RefcocoTask(vocab, description="base", patch_image_size=64)
    cola_task = GlueTask("cola", vocab, description="base")

    def eval_all(p):
        cap = cap_task.evaluate(p, cfg, FileDataset(cap_path), batch_size=4, limit=8)
        ref = ref_task.evaluate(p, cfg, FileDataset(ref_path), batch_size=4, limit=8)
        cola = cola_task.evaluate(p, cfg, FileDataset(cola_path), batch_size=4, limit=16)
        return {
            "caption_cider": round(cap["cider"], 4),
            "refcoco_acc@0.5": round(ref["acc@0.5"], 4),
            "refcoco_mean_iou": round(ref["mean_iou"], 4),
            "cola_acc": round(cola["acc"], 4),
            "caption_sample": list(cap["predictions"].values())[0],
        }

    before = eval_all(state.params)
    print("before:", {k: v for k, v in before.items() if k != "caption_sample"},
          flush=True)

    t0 = time.time()
    step = 0
    first = last = None
    while step < args.steps:
        loader.set_epoch(1 + step // max(1, loader.steps_per_epoch()))
        for batches in loader.epoch_iterator():
            state, metrics = step_fn(state, batches, jax.random.PRNGKey(step))
            loss = float(metrics["loss"])
            first = loss if first is None else first
            last = loss
            step += 1
            if step % 10 == 0:
                print(f"step {step} loss {loss:.3f} "
                      f"(cap {float(metrics['loss/caption']):.2f} "
                      f"ref {float(metrics['loss/refcoco']):.2f} "
                      f"cola {float(metrics['loss/cola']):.2f})", flush=True)
            if step >= args.steps:
                break
    train_s = time.time() - t0
    print(f"trained {step} joint steps in {train_s:.0f}s; "
          f"loss {first:.2f} -> {last:.2f}", flush=True)

    # per-task eval with the SAME shared weights
    after = eval_all(state.params)
    print("after:", {k: v for k, v in after.items() if k != "caption_sample"},
          "sample:", repr(after["caption_sample"]), flush=True)

    record = {
        "demo": "joint_training_3task",
        "arch": "ofa_tiny(d128,L2+2)",
        "tasks": ["caption", "refcoco", "cola"],
        "steps": step,
        "train_wall_s": round(train_s, 1),
        "step_ms": round(train_s / max(1, step) * 1000.0, 1),
        "loss_first": round(first, 4),
        "loss_last": round(last, 4),
        "before": {k: v for k, v in before.items() if k != "caption_sample"},
        "after": {k: v for k, v in after.items() if k != "caption_sample"},
        "caption_sample": after["caption_sample"],
        "device": str(jax.devices()[0].platform),
    }
    import json

    print(json.dumps(record), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(record, f, indent=1)

    # machine-checkable convergence (VERDICT r4 #6): each task's quality
    # metric must actually improve from the random-init baseline
    assert last < first * 0.6, "joint loss must drop substantially"
    assert after["caption_cider"] > before["caption_cider"], \
        f"caption CIDEr must improve: {before['caption_cider']} -> {after['caption_cider']}"
    assert after["refcoco_mean_iou"] > before["refcoco_mean_iou"], \
        f"grounding IoU must improve: {before['refcoco_mean_iou']} -> {after['refcoco_mean_iou']}"
    assert after["cola_acc"] > 0.5, \
        f"CoLA accuracy must beat chance: {after['cola_acc']}"
    print("DEMO_OK")


if __name__ == "__main__":
    main()
