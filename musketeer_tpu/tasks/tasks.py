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
from ..generation import DenseTrie, beam_search, generate
from ..models import ofa
from ..utils.cider import CiderD
from ..utils.summary_detok import normalize_summary_hyp
from ..utils.eval_utils import (
    box_iou, box_iou_accuracy, debin_boxes, score_candidates_span,
)
from .base import Task, iter_batches


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

        # generate() accepts a LIST of param pytrees → ensemble decoding
        # (ref: load_model_ensemble, utils/checkpoint_utils.py:405-495)
        @jax.jit
        def run(params, src, imgs, masks):
            return generate(params, model_cfg, gen_cfg, src, imgs, masks)

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
        out = {"cider": score, "n": len(res), "predictions": res}
        try:  # BLEU via sacrebleu (ref: caption.py:139-163 eval_bleu path)
            import sacrebleu

            max_refs = max(len(r) for r in gts.values())
            ref_streams = [
                [gts[i][k] if k < len(gts[i]) else gts[i][0] for i in res]
                for k in range(max_refs)
            ]
            out["bleu4"] = sacrebleu.corpus_bleu(
                [res[i] for i in res], ref_streams
            ).score
        except Exception:
            pass
        return out


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

        # ensemble-capable (params may be a list; see CaptionTask.evaluate)
        @jax.jit
        def run(params, src, imgs, masks):
            return generate(params, model_cfg, gen_cfg, src, imgs, masks)

        accs = []
        ious = []
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
            ious.append(box_iou(boxes, refs))
        acc = float(np.concatenate(accs).mean()) if accs else 0.0
        miou = float(np.concatenate(ious).mean()) if ious else 0.0
        return {
            "acc@0.5": acc,
            "mean_iou": miou,  # finer-grained convergence signal than acc@0.5
            "n": int(sum(len(a) for a in accs)),
        }


class AllCandTask(Task):
    """Shared machinery for closed-vocabulary tasks (VQA / SNLI-VE /
    ImageNet / GLUE): score every candidate answer with teacher forcing +
    constraint masks, argmax (ref: tasks/mm_tasks/vqa_gen.py:244-310).

    Candidates are scored in host-level chunks (ref valid_batch_size=20) with
    span-sliced logits, so the 3129-answer VQA set fits: memory per call is
    [B, chunk, Tc, V] with Tc = answer length + 1, never [*, T, V].
    """

    name = ""
    answers: List[str] = []
    prompt_type = "prev_output"
    valid_batch_size = 20  # candidates per scoring call (ref default)

    def __init__(self, *a, answers: Optional[Sequence[str]] = None, **kw):
        super().__init__(*a, **kw)
        if answers is not None:
            self.answers = list(answers)
        self.trie = DenseTrie.from_answers(self.vocab, self.answers)
        self._ans_enc = [
            self.vocab.encode_text(" " + a.strip()) for a in self.answers
        ]
        v = self.vocab
        C = len(self.answers)
        # no candidate set (e.g. zero-shot VQA, utils/zero_shot_utils.py:40-46
        # removes the trie): skip the allcand tables; evaluate() will assert
        self.Tc = (max(len(e) for e in self._ans_enc) + 1) if C else 1
        self._ans_target = np.full((C, self.Tc), v.pad, np.int32)
        self._ans_nodes = np.full((C, self.Tc), -1, np.int32)
        for c, e in enumerate(self._ans_enc):
            seq = list(e) + [v.eos]
            self._ans_target[c, : len(seq)] = seq
            node = 0
            for i, t in enumerate(seq):
                self._ans_nodes[c, i] = node
                node = self.trie.transition_np(node, int(t))
    def make_score_fn(self, model_cfg):
        @functools.partial(jax.jit, static_argnames=())
        def encode_fn(params, src, imgs, masks):
            return ofa.encode(params, model_cfg, src, imgs, masks)

        @jax.jit
        def encode_text_fn(params, src):
            return ofa.encode(params, model_cfg, src)

        trie = self.trie

        @jax.jit
        def score_fn(params, enc_x, enc_pad, enc_pos, prev, ans_pos, ans_target, ans_nodes):
            enc = ofa.EncoderOut(enc_x, enc_pad, enc_pos)
            # constraint masks gathered ON DEVICE from the trie cursors —
            # no host-side [chunk, Tc, V] mask cache (VQA's 3,129-answer set
            # cost ~1 GB of host RAM that way; ref builds the same masks per
            # answer on CPU, vqa_gen.py:169-190)
            return score_candidates_span(
                params, model_cfg, enc, prev, ans_pos, ans_target,
                trie=trie, ans_nodes=ans_nodes,
            )

        return encode_fn, encode_text_fn, score_fn

    def _assemble_prev(self, src_rows: List[np.ndarray], chunk_enc: List[np.ndarray],
                       padded_src: int):
        """[B, chunk, T] decoder inputs + [B, Tc] answer-span positions for
        prompt_type=prev_output (ref: vqa_gen_dataset.py:162-173). T is keyed
        on the bucketed source width so jit shapes stay stable."""
        v = self.vocab
        B, C = len(src_rows), len(chunk_enc)
        T = padded_src - 1 + self.Tc
        prev = np.full((B, C, T), v.pad, np.int32)
        ans_pos = np.zeros((B, self.Tc), np.int32)
        for b, src in enumerate(src_rows):
            L = len(src) - 1  # drop final eos
            prev[b, :, :L] = src[:-1]
            for c, e in enumerate(chunk_enc):
                prev[b, c, L : L + len(e)] = e
            ans_pos[b] = (L - 1) + np.arange(self.Tc)
        return prev, ans_pos

    def _eval_common(self, params, model_cfg, dataset, batch_size, limit, with_image):
        v = self.vocab
        C = len(self.answers)
        assert C > 0, (
            f"{self.name}: allcand scoring needs a candidate answer set "
            "(pass answers=/--answers-file), or use the zero-shot path"
        )
        encode_fn, encode_text_fn, score_fn = self.make_score_fn(model_cfg)
        chunk = min(self.valid_batch_size, C)
        n_correct, n_total, soft_sum = 0, 0, 0.0
        pairs: List[tuple] = []
        builder = self.builder("valid")
        for batch in iter_batches(
            dataset, builder, batch_size, v.pad, limit=limit, drop_last=True
        ):
            src_rows = [
                np.asarray([t for t in row if t != v.pad], np.int32)
                for row in batch["src_tokens"]
            ]
            if with_image:
                enc = encode_fn(
                    params,
                    jnp.asarray(batch["src_tokens"]),
                    jnp.asarray(batch["patch_images"], jnp.float32),
                    jnp.asarray(batch["patch_masks"]),
                )
            else:
                enc = encode_text_fn(params, jnp.asarray(batch["src_tokens"]))
            all_scores = []
            for c0 in range(0, C, chunk):
                c1 = min(c0 + chunk, C)
                idxs = list(range(c0, c1))
                # keep static chunk shape: repeat last candidate as filler
                while len(idxs) < chunk:
                    idxs.append(c1 - 1)
                enc_chunk = [self._ans_enc[i] for i in idxs]
                prev, ans_pos = self._assemble_prev(
                    src_rows, enc_chunk, batch["src_tokens"].shape[1]
                )
                tgt = self._ans_target[idxs]
                nodes = self._ans_nodes[idxs]
                scores = score_fn(
                    params, enc.x, enc.padding_mask, enc.pos_embed,
                    jnp.asarray(prev), jnp.asarray(ans_pos),
                    jnp.asarray(tgt), jnp.asarray(nodes),
                )
                all_scores.append(np.asarray(scores)[:, : c1 - c0])
            scores = np.concatenate(all_scores, axis=1)  # [B, C]
            pred_idx = scores.argmax(axis=1)
            for i, e in enumerate(batch["extras"]):
                pred = self.answers[pred_idx[i]]
                ref = e.get("ref_dict", {e.get("label"): 1.0})
                soft_sum += ref.get(pred, 0.0)
                n_correct += int(pred == max(ref, key=ref.get))
                n_total += 1
                pairs.append((pred, max(ref, key=ref.get)))
        return {
            "acc": n_correct / max(1, n_total),
            "soft_score": soft_sum / max(1, n_total),
            "n": n_total,
            "pairs": pairs,
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

    def evaluate_beam(self, params, model_cfg, dataset, batch_size=4, limit=None):
        """Trie-constrained beam-search VQA eval (ref run script
        evaluate_vqa_beam_base.sh --beam-search-vqa-eval: vqa_gen.py:184-189
        builds a constrained generator, :311-318 generates with the question
        as ``prefix_tokens``, strips the per-row prefix and soft-scores the
        suffix against ref_dict). Complements allcand ``evaluate`` (exact
        candidate scoring) — beam explores the open answer trie instead,
        so the predicted answer is always a trie path but need not be a
        full forward over every candidate."""
        assert len(self.answers) > 0, "beam VQA eval needs the answer trie"
        v = self.vocab
        builder = self.builder("valid")
        cache: Dict[tuple, object] = {}
        soft_sum, n = 0.0, 0
        for batch in iter_batches(
            dataset, builder, batch_size, v.pad, limit=limit, drop_last=True
        ):
            src = np.asarray(batch["src_tokens"])
            # decoder prompt = question without bos/eos (prompt_type
            # prev_output seeds the decoder with the source, ref
            # vqa_gen_dataset.py:154-173; fairseq collates the per-row
            # prompts right-padded, and pad positions are unforced)
            pref = src[:, 1:].copy()
            pref[pref == v.eos] = v.pad
            key = (src.shape[1], pref.shape[1])
            if key not in cache:
                gen_cfg = GenerationConfig(
                    beam_size=5, min_len=1, normalize_scores=False,
                    max_len_b=pref.shape[1] + self.Tc + 1,
                )

                @jax.jit
                def run(params, src_t, imgs, masks, pref_t):
                    return generate(
                        params, model_cfg, gen_cfg, src_t, imgs, masks,
                        prefix_tokens=pref_t, trie=self.trie,
                    )

                cache[key] = run
            toks, _ = cache[key](
                params,
                jnp.asarray(batch["src_tokens"]),
                jnp.asarray(batch["patch_images"], jnp.float32),
                jnp.asarray(batch["patch_masks"]),
                jnp.asarray(pref),
            )
            toks = np.asarray(toks)
            for i, e in enumerate(batch["extras"]):
                plen = int((pref[i] != v.pad).sum())
                seq = []
                for t in toks[i, 0, plen:]:
                    if t == v.eos:
                        break
                    if t != v.pad:
                        seq.append(int(t))
                pred = v.decode_ids(seq).strip()
                soft_sum += e["ref_dict"].get(pred, 0.0)
                n += 1
        return {"soft_score": soft_sum / max(1, n), "n": n}

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
            out["mcc"] = self._mcc(out.pop("pairs"))
        else:
            out.pop("pairs", None)
        return out

    @staticmethod
    def _mcc(pairs):
        """Matthews correlation from (pred, ref) yes/no pairs
        (ref: tasks/nlu_tasks/cola.py:107-160)."""
        tp = fp = tn = fn = 0
        for pred, ref in pairs:
            p, r = pred == "yes", ref == "yes"
            tp += p and r
            fp += p and not r
            tn += (not p) and (not r)
            fn += (not p) and r
        denom = np.sqrt(float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)))
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

        # ensemble-capable (params may be a list; see CaptionTask.evaluate)
        @jax.jit
        def run(params, src):
            return generate(params, model_cfg, gen_cfg, src)

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
                # ref normalization before ROUGE (gigaword.py:283):
                # lower + fix_tokenization + <unk>/digit rewrites
                hyp = normalize_summary_hyp(v.decode_ids(seq))
                s = scorer.score(e["target_text"], hyp)
                for k in agg:
                    agg[k].append(s[k].fmeasure)
        return {k: float(np.mean(vs)) if vs else 0.0 for k, vs in agg.items()}


def _pretrain_entries():
    # detection/image_gen register in tasks/__init__.py (heavier deps)
    from .pretrain import (
        ImageTextMatchingTask, ImageTextPairTask, PureImageTask,
        TextInfillingTask, VisualGroundingTask,
    )

    return {
        "text_infilling": TextInfillingTask,
        "image_text_pair": ImageTextPairTask,
        "image_text_matching": ImageTextMatchingTask,
        "pure_image": PureImageTask,
        "visual_grounding": VisualGroundingTask,
    }


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
TASK_REGISTRY.update(_pretrain_entries())
