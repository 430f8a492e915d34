"""Concrete task implementations (eval paths per SURVEY.md §2.3 / BASELINE.md).

Each task wires: builder → jitted compute (beam search or allcand scorer) →
host-side metric. Decode configs mirror the reference eval scripts (cited).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig, ModelConfig
from ..data import task_data as D
from ..generation import DenseTrie, beam_search
from ..models import ofa
from ..utils.cider import CiderD
from ..utils.eval_utils import (
    box_iou_accuracy, build_candidate_arrays, debin_boxes, score_candidates,
)
from .base import Task, iter_batches


def _pad_rows(rows: List[np.ndarray], pad: int, length: int) -> np.ndarray:
    out = np.full((len(rows), length), pad, np.int32)
    for i, r in enumerate(rows):
        out[i, : min(len(r), length)] = r[:length]
    return out


class CaptionTask(Task):
    """COCO caption: beam=5 gen + CIDEr-D (ref: tasks/mm_tasks/caption.py,
    run_scripts/caption/evaluate_caption_base.sh:36-57)."""

    name = "caption"

    def builder(self, split: str = "train"):
        return D.CaptionBuilder(
            self.vocab, description=self.description, split=split, **self.kw
        )

    def generation_config(self) -> GenerationConfig:
        return GenerationConfig(
            beam_size=5, max_len_b=16, min_len=1, no_repeat_ngram_size=3
        )

    def evaluate(self, params, model_cfg, dataset, batch_size=8, limit=None):
        gen_cfg = self.generation_config()
        v = self.vocab

        @jax.jit
        def run(params, src, imgs, masks):
            enc = ofa.encode(params, model_cfg, src, imgs, masks)
            return beam_search(params, model_cfg, gen_cfg, enc, max_len=gen_cfg.max_len_b)

        gts, res = {}, {}
        b = self.builder("valid")
        for batch in iter_batches(
            dataset, b, batch_size, v.pad, src_len=None, limit=limit, drop_last=True
        ):
            toks, _ = run(
                params,
                jnp.asarray(batch["src_tokens"]),
                jnp.asarray(batch["patch_images"], jnp.float32),
                jnp.asarray(batch["patch_masks"]),
            )
            toks = np.asarray(toks)
            for i, uid in enumerate(batch["id"]):
                seq = [int(t) for t in toks[i, 0] if t not in (v.pad, v.eos)]
                res[str(uid)] = v.decode_ids(seq)
                refs = batch["extras"][i]["caption_refs"].split("&&")
                gts[str(uid)] = [r.strip() for r in refs]
        score, _ = CiderD().compute_score(gts, res)
        return {"cider": score, "n": len(res), "predictions": res}


class RefcocoTask(Task):
    """Visual grounding: gen_box beam → de-bin → IoU@0.5
    (ref: tasks/mm_tasks/refcoco.py:125-157; utils/eval_utils.py:220-253)."""

    name = "refcoco"

    def __init__(self, *a, max_image_size: int = 512, **kw):
        super().__init__(*a, **kw)
        self.max_image_size = max_image_size

    def builder(self, split: str = "train"):
        return D.RefcocoBuilder(
            self.vocab, description=self.description, split=split,
            max_image_size=self.max_image_size, **self.kw
        )

    def generation_config(self) -> GenerationConfig:
        v = self.vocab
        return GenerationConfig(
            beam_size=5, max_len_b=4, min_len=4, no_repeat_ngram_size=3,
            gen_box=True, constraint_range=(v.bin_start, v.vocab_size),
        )

    def evaluate(self, params, model_cfg, dataset, batch_size=8, limit=None):
        gen_cfg = self.generation_config()
        v = self.vocab

        @jax.jit
        def run(params, src, imgs, masks):
            enc = ofa.encode(params, model_cfg, src, imgs, masks)
            return beam_search(params, model_cfg, gen_cfg, enc, max_len=4)

        accs = []
        for batch in iter_batches(
            dataset, self.builder("valid"), batch_size, v.pad, limit=limit, drop_last=True
        ):
            toks, _ = run(
                params,
                jnp.asarray(batch["src_tokens"]),
                jnp.asarray(batch["patch_images"], jnp.float32),
                jnp.asarray(batch["patch_masks"]),
            )
            bins = np.asarray(toks)[:, 0, :4]  # top hypo, 4 bin tokens
            w_r = np.asarray([e["w_resize_ratio"] for e in batch["extras"]])
            h_r = np.asarray([e["h_resize_ratio"] for e in batch["extras"]])
            boxes = debin_boxes(
                bins, v.bin_start, v.num_bins, self.max_image_size, w_r, h_r
            )
            refs = np.stack([e["region_coord"] for e in batch["extras"]])
            accs.append(box_iou_accuracy(boxes, refs))
        acc = float(np.concatenate(accs).mean()) if accs else 0.0
        return {"acc@0.5": acc, "n": int(sum(len(a) for a in accs))}


class AllCandTask(Task):
    """Shared machinery for closed-vocabulary tasks (VQA / SNLI-VE /
    ImageNet / GLUE): score every candidate answer with teacher forcing +
    constraint masks, argmax (ref: tasks/mm_tasks/vqa_gen.py:244-310)."""

    name = ""
    answers: List[str] = []
    prompt_type = "prev_output"

    def __init__(self, *a, answers: Optional[Sequence[str]] = None, **kw):
        super().__init__(*a, **kw)
        if answers is not None:
            self.answers = list(answers)
        self.trie = DenseTrie.from_answers(self.vocab, self.answers)
        self._ans_enc = [
            self.vocab.encode_text(" " + a.strip()) for a in self.answers
        ]

    def score_fn(self, model_cfg, use_masks: bool = True):
        @jax.jit
        def run(params, src, imgs, masks, prev, target, cmask):
            enc = ofa.encode(params, model_cfg, src, imgs, masks)
            return score_candidates(params, model_cfg, enc, prev, target, cmask)

        @jax.jit
        def run_text(params, src, prev, target, cmask):
            enc = ofa.encode(params, model_cfg, src)
            return score_candidates(params, model_cfg, enc, prev, target, cmask)

        return run, run_text

    def candidate_arrays(self, src_rows: List[np.ndarray], cand_len: int):
        """Build [B, C, T] prev/target/masks for prompt_type=prev_output."""
        v = self.vocab
        B, C = len(src_rows), len(self.answers)
        Tp = max(len(s) for s in src_rows) - 1
        T = Tp + cand_len + 1
        prev = np.full((B, C, T), v.pad, np.int32)
        target = np.full((B, C, T), v.pad, np.int32)
        masks = np.zeros((B, C, T, v.padded_size), bool)
        for b, src in enumerate(src_rows):
            p, t, m = build_candidate_arrays(
                v, self.answers, src[:-1], pad_to=T, trie=self.trie
            )
            prev[b], target[b], masks[b] = p, t, m
        return prev, target, masks

    def _eval_common(self, params, model_cfg, dataset, batch_size, limit, with_image):
        v = self.vocab
        run, run_text = self.score_fn(model_cfg)
        cand_len = max(len(e) for e in self._ans_enc)
        n_correct, n_total, soft_sum = 0, 0, 0.0
        builder = self.builder("valid")
        for batch in iter_batches(
            dataset, builder, batch_size, v.pad, limit=limit, drop_last=True
        ):
            src_rows = [
                np.asarray([t for t in row if t != v.pad], np.int32)
                for row in batch["src_tokens"]
            ]
            prev, target, masks = self.candidate_arrays(src_rows, cand_len)
            if with_image:
                scores = run(
                    params,
                    jnp.asarray(batch["src_tokens"]),
                    jnp.asarray(batch["patch_images"], jnp.float32),
                    jnp.asarray(batch["patch_masks"]),
                    jnp.asarray(prev), jnp.asarray(target), jnp.asarray(masks),
                )
            else:
                scores = run_text(
                    params, jnp.asarray(batch["src_tokens"]),
                    jnp.asarray(prev), jnp.asarray(target), jnp.asarray(masks),
                )
            pred_idx = np.asarray(jnp.argmax(scores, axis=1))
            for i, e in enumerate(batch["extras"]):
                pred = self.answers[pred_idx[i]]
                ref = e.get("ref_dict", {e.get("label"): 1.0})
                soft_sum += ref.get(pred, 0.0)
                n_correct += int(pred == max(ref, key=ref.get))
                n_total += 1
        return {
            "acc": n_correct / max(1, n_total),
            "soft_score": soft_sum / max(1, n_total),
            "n": n_total,
        }


class SnliVeTask(AllCandTask):
    name = "snli_ve"
    answers = ["no", "yes", "maybe"]

    def builder(self, split="train"):
        return D.SnliVeBuilder(
            self.vocab, description=self.description, split=split,
            trie=self.trie, **self.kw
        )

    def evaluate(self, params, model_cfg, dataset, batch_size=8, limit=None):
        return self._eval_common(params, model_cfg, dataset, batch_size, limit, True)


class VqaTask(AllCandTask):
    name = "vqa_gen"

    def builder(self, split="train"):
        return D.VqaBuilder(
            self.vocab, description=self.description, split=split,
            trie=self.trie, **self.kw
        )

    def evaluate(self, params, model_cfg, dataset, batch_size=4, limit=None):
        return self._eval_common(params, model_cfg, dataset, batch_size, limit, True)

    def evaluate_zero_shot(self, params, model_cfg, dataset, batch_size=4, limit=None):
        """Open-vocabulary beam decode, no trie (ref: utils/zero_shot_utils.py:
        40-46 — generator.zero_shot=True, constraint trie removed)."""
        gen_cfg = GenerationConfig(
            beam_size=5, max_len_b=8, min_len=1, zero_shot=True
        )
        v = self.vocab

        @jax.jit
        def run(params, src, imgs, masks):
            enc = ofa.encode(params, model_cfg, src, imgs, masks)
            return beam_search(params, model_cfg, gen_cfg, enc, max_len=gen_cfg.max_len_b)

        soft_sum, n = 0.0, 0
        for batch in iter_batches(
            dataset, self.builder("valid"), batch_size, v.pad, limit=limit, drop_last=True
        ):
            toks, _ = run(
                params,
                jnp.asarray(batch["src_tokens"]),
                jnp.asarray(batch["patch_images"], jnp.float32),
                jnp.asarray(batch["patch_masks"]),
            )
            toks = np.asarray(toks)
            for i, e in enumerate(batch["extras"]):
                seq = [int(t) for t in toks[i, 0] if t not in (v.pad, v.eos)]
                pred = v.decode_ids(seq)
                soft_sum += e["ref_dict"].get(pred, 0.0)
                n += 1
        return {"zero_shot_score": soft_sum / max(1, n), "n": n}


class ImageClassifyTask(AllCandTask):
    name = "image_classify"

    def builder(self, split="train"):
        return D.ImageClassifyBuilder(
            self.vocab, description=self.description, split=split,
            trie=self.trie, **self.kw
        )

    def evaluate(self, params, model_cfg, dataset, batch_size=4, limit=None):
        return self._eval_common(params, model_cfg, dataset, batch_size, limit, True)


class GlueTask(AllCandTask):
    def __init__(self, glue_task: str, *a, **kw):
        self.name = glue_task
        self.glue_task = glue_task
        label_map = D.GlueBuilder.TASK_DEFS[glue_task][2]
        answers = sorted(set(label_map.values()))
        super().__init__(*a, answers=answers, **kw)

    def builder(self, split="train"):
        return D.GlueBuilder(
            self.glue_task, self.vocab, description=self.description,
            trie=self.trie, **self.kw
        )

    def evaluate(self, params, model_cfg, dataset, batch_size=8, limit=None):
        out = self._eval_common(params, model_cfg, dataset, batch_size, limit, False)
        if self.glue_task == "cola":
            out["mcc"] = self._mcc(params, model_cfg, dataset, batch_size, limit)
        return out

    def _mcc(self, params, model_cfg, dataset, batch_size, limit):
        # Matthews corr needs the confusion matrix; re-run cheaply
        v = self.vocab
        _, run_text = self.score_fn(model_cfg)
        cand_len = max(len(e) for e in self._ans_enc)
        tp = fp = tn = fn = 0
        for batch in iter_batches(
            dataset, self.builder("valid"), batch_size, v.pad, limit=limit, drop_last=True
        ):
            src_rows = [
                np.asarray([t for t in row if t != v.pad], np.int32)
                for row in batch["src_tokens"]
            ]
            prev, target, masks = self.candidate_arrays(src_rows, cand_len)
            scores = run_text(
                params, jnp.asarray(batch["src_tokens"]),
                jnp.asarray(prev), jnp.asarray(target), jnp.asarray(masks),
            )
            pred_idx = np.asarray(jnp.argmax(scores, axis=1))
            for i, e in enumerate(batch["extras"]):
                pred = self.answers[pred_idx[i]] == "yes"
                ref = e["label"] == "yes"
                tp += pred and ref
                fp += pred and not ref
                tn += (not pred) and (not ref)
                fn += (not pred) and ref
        denom = np.sqrt(
            float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        )
        return (tp * tn - fp * fn) / denom if denom > 0 else 0.0


class GigawordTask(Task):
    """Summarization: beam gen + ROUGE-1/2/L
    (ref: tasks/nlg_tasks/gigaword.py:195-268)."""

    name = "gigaword"

    def builder(self, split="train"):
        return D.GigawordBuilder(
            self.vocab, description=self.description, split=split, **self.kw
        )

    def generation_config(self):
        return GenerationConfig(
            beam_size=5, max_len_b=32, min_len=1, no_repeat_ngram_size=3
        )

    def evaluate(self, params, model_cfg, dataset, batch_size=8, limit=None):
        from rouge_score import rouge_scorer

        gen_cfg = self.generation_config()
        v = self.vocab

        @jax.jit
        def run(params, src):
            enc = ofa.encode(params, model_cfg, src)
            return beam_search(params, model_cfg, gen_cfg, enc, max_len=gen_cfg.max_len_b)

        scorer = rouge_scorer.RougeScorer(
            ["rouge1", "rouge2", "rougeL"], use_stemmer=True
        )
        agg = {"rouge1": [], "rouge2": [], "rougeL": []}
        for batch in iter_batches(
            dataset, self.builder("valid"), batch_size, v.pad, limit=limit, drop_last=True
        ):
            toks, _ = run(params, jnp.asarray(batch["src_tokens"]))
            toks = np.asarray(toks)
            for i, e in enumerate(batch["extras"]):
                seq = [int(t) for t in toks[i, 0] if t not in (v.pad, v.eos)]
                hyp = v.decode_ids(seq)
                s = scorer.score(e["target_text"], hyp)
                for k in agg:
                    agg[k].append(s[k].fmeasure)
        return {k: float(np.mean(vs)) if vs else 0.0 for k, vs in agg.items()}


TASK_REGISTRY = {
    "caption": CaptionTask,
    "refcoco": RefcocoTask,
    "vqa_gen": VqaTask,
    "snli_ve": SnliVeTask,
    "image_classify": ImageClassifyTask,
    "gigaword": GigawordTask,
    "cola": lambda *a, **kw: GlueTask("cola", *a, **kw),
    "sst2": lambda *a, **kw: GlueTask("sst2", *a, **kw),
    "mrpc": lambda *a, **kw: GlueTask("mrpc", *a, **kw),
    "qqp": lambda *a, **kw: GlueTask("qqp", *a, **kw),
    "qnli": lambda *a, **kw: GlueTask("qnli", *a, **kw),
    "rte": lambda *a, **kw: GlueTask("rte", *a, **kw),
    "mnli": lambda *a, **kw: GlueTask("mnli", *a, **kw),
}
