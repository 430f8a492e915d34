"""Fully-jitted constrained beam search (``lax.while_loop``, static shapes).

TPU-native replacement for the reference's Python-loop generator
(ref: models/sequence_generator.py:209-598 + models/search.py:103-146).
Redesign, not a translation:

- one ``while_loop`` step = one fused XLA program: incremental decoder step
  (KV cache), constraint masking, top-2K selection, beam reorder — no host
  round-trips, no dynamic batch pruning (finished sentences are masked, the
  arrays never change shape),
- "alive / finished" grow-prune bookkeeping (the t5x/flaxformer scheme)
  replaces fairseq's in-Python ``finalize_hypos`` list surgery; scores are
  length-normalized exactly like the reference (score / (len)**len_penalty,
  ref: sequence_generator.py:683-685),
- the per-hypothesis Python trie walk (ref: sequence_generator.py:857-869 —
  the reference's worst hot-spot) becomes a precomputed on-device table
  lookup (:mod:`musketeer_tpu.generation.trie`).

Constraint feature parity (ref lines cited inline): trie masking (pre-softmax,
or post-softmax in zero-shot mode :880-887), ``constraint_range`` vocab band
:870-873, ``gen_box`` bin/eos forcing :390-397, ``gen_code`` :389, prefix-token
forcing :600-631, min/max length, unk penalty, n-gram repeat blocking
:105-108/425-426.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GenerationConfig, ModelConfig
from ..models import ofa
from .lexical import constraint_transition, stripe_key
from .trie import DenseTrie

NEG_INF = -1e9


class BeamState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    alive_tokens: jnp.ndarray  # [B, K, T+2] int32 (slot 0 = bos)
    alive_scores: jnp.ndarray  # [B, K] fp32 cumulative lprob
    finished_tokens: jnp.ndarray  # [B, K, T+2]
    finished_scores: jnp.ndarray  # [B, K] normalized (length-penalized)
    # ONLY the mutable decoder state rides in the while_loop carry: the
    # cross K/V, biases and padding (≈0.5GB at B16/S910, never written in
    # the loop) stay CLOSED OVER as loop invariants — carrying them cost a
    # measured ~1ms/step of copy traffic on v5e.
    self_kv: Tuple[jnp.ndarray, jnp.ndarray]  # (self_k, self_v) [L, B*K, ...]
    trie_nodes: Optional[jnp.ndarray]  # [B, K] int32 trie cursor (or None)
    rng: Optional[jax.Array] = None  # sampling mode only
    cons_ptr: Optional[jnp.ndarray] = None  # [B, K] lexical-constraint pointer


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


def _unflat(x, B, K):
    return x.reshape((B, K) + x.shape[1:])


def _gather_beams(x, beam_idx):
    """x: [B, K, ...], beam_idx: [B, K'] → [B, K', ...]."""
    return jnp.take_along_axis(
        x, beam_idx.reshape(beam_idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def tile_encoder_out(enc: ofa.EncoderOut, beam_size: int) -> ofa.EncoderOut:
    """Repeat each batch row beam_size times (ref: reorder_encoder_out tiling)."""
    rep = lambda a: jnp.repeat(a, beam_size, axis=0)
    return ofa.EncoderOut(rep(enc.x), rep(enc.padding_mask), rep(enc.pos_embed))


def _apply_no_repeat_ngram(lprobs, tokens_flat, step, ngram: int):
    """Ban tokens that would complete an already-seen n-gram.

    ref: fairseq NGramRepeatBlock via sequence_generator.py:105-108, 425-426.
    tokens_flat: [N, T+2]; generating position step+1. Vectorized over all
    earlier n-gram starts with a validity mask (static shapes).
    """
    n = ngram
    N, L = tokens_flat.shape
    # context = last n-1 generated tokens: positions step-(n-2) .. step
    # candidate bans: token at i+n-1 where tokens[i:i+n-1] == context
    idx = jnp.arange(L - n + 1)
    # an n-gram (positions i .. i+n-1) was *seen* iff i+n-1 <= step
    valid = idx + n - 1 <= step
    match = jnp.ones((N, L - n + 1), bool)
    for j in range(n - 1):
        ctx_j = jnp.take_along_axis(
            tokens_flat, jnp.full((N, 1), 0) + (step - (n - 2) + j), axis=1
        )  # [N, 1]
        match = match & (tokens_flat[:, j : j + L - n + 1] == ctx_j)
    match = match & valid[None, :]
    banned = tokens_flat[:, n - 1 :]  # token at i+n-1 for each start i
    # scatter-min NEG_INF into lprobs at banned ids where match
    rows = jnp.broadcast_to(jnp.arange(N)[:, None], banned.shape)
    updates = jnp.where(match, NEG_INF, 0.0)
    return lprobs.at[rows, banned].add(updates.astype(lprobs.dtype))


def _constrain_logits_pre(
    logits, gen_cfg: GenerationConfig, trie: Optional[DenseTrie], trie_nodes_flat
):
    """Pre-log_softmax constraints (renormalizing). ref: sequence_generator.py:855-873."""
    V = logits.shape[-1]
    if trie is not None and not gen_cfg.zero_shot:
        allowed = trie.allowed_mask(trie_nodes_flat, V)  # [N, V] bool
        logits = jnp.where(allowed, logits, NEG_INF)
    if gen_cfg.constraint_range is not None and not gen_cfg.zero_shot:
        cs, ce = gen_cfg.constraint_range
        band = jnp.arange(V)
        ban = (band >= 4) & (band < cs) | (band >= ce)
        logits = jnp.where(ban[None, :], NEG_INF, logits)
    return logits


def _constrain_lprobs_post(
    lprobs, gen_cfg: GenerationConfig, trie: Optional[DenseTrie], trie_nodes_flat
):
    """Post-log_softmax constraints (zero-shot mode). ref: :880-887."""
    V = lprobs.shape[-1]
    if trie is not None and gen_cfg.zero_shot:
        allowed = trie.allowed_mask(trie_nodes_flat, V)
        lprobs = jnp.where(allowed, lprobs, NEG_INF)
    if gen_cfg.constraint_range is not None and gen_cfg.zero_shot:
        cs, ce = gen_cfg.constraint_range
        band = jnp.arange(V)
        ban = (band >= 4) & (band < cs) | (band >= ce)
        lprobs = jnp.where(ban[None, :], NEG_INF, lprobs)
    return lprobs


def beam_search(
    params,
    cfg: ModelConfig,
    gen_cfg: GenerationConfig,
    encoder_out: ofa.EncoderOut,  # [B, S, ...] (untiled)
    max_len: int,  # static: int(max_len_a*src_len + max_len_b)
    prefix_tokens: Optional[jnp.ndarray] = None,  # [B, P] pad-padded
    trie: Optional[DenseTrie] = None,
    code_masks_value: bool = False,  # gen_code → decoder image positions
    rng: Optional[jax.Array] = None,  # required when gen_cfg.sampling
    src_lengths: Optional[jnp.ndarray] = None,  # [B] → per-sentence min/max
    constraints: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    allowed_fn: Optional[Callable] = None,
    n_models: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run constrained beam search. Returns (tokens [B,K,max_len+2], scores [B,K]).

    ``n_models > 1`` enables ensemble decoding (ref: EnsembleModel,
    models/sequence_generator.py:767-940): ``params`` is a pytree whose
    leaves carry a leading model axis (stack same-architecture checkpoints
    with ``jax.tree.map(lambda *xs: jnp.stack(xs), *param_list)``) and
    ``encoder_out`` likewise carries a leading model axis (each model
    encodes the batch itself). Per step the models' normalized log-probs
    are averaged in probability space (``logsumexp over models − log M``,
    exactly fairseq's combination) before the beam competition; decoder
    KV caches stay per-model via one vmapped decode step.

    Output rows are sorted by descending normalized score; tokens start after
    bos (i.e. row = generated sequence incl. final eos, pad-filled), matching
    the reference's hypo format (ref: finalize_hypos, sequence_generator.py:665).

    ``constraints``: (cons_tokens [B, C], phrase_start [B, C]) from
    :func:`musketeer_tpu.generation.lexical.pack_constraints` — enables the
    lexically constrained mode (ref: models/search.py:210-524, Post & Vilar
    dynamic beam allocation), incompatible with sampling/diverse modes.

    ``allowed_fn``: traceable ``(step, tokens_flat [B*K, T]) -> bool mask
    [B*K, V]`` — the jit-native equivalent of the reference's
    PrefixConstrainedBeamSearch ``prefix_allowed_tokens_fn`` callback
    (ref: models/search.py:147-180, tasks/ofa_task.py:276-283): the mask is
    applied to the post-softmax lprobs without renormalizing, exactly like
    the reference's additive 0/-inf mask. Instead of a per-sentence Python
    callback the hook sees the whole flat beam batch and the current step,
    so any vectorizable constraint (grammar tables, per-sample vocab
    restrictions) stays on device.
    """
    B = encoder_out.x.shape[1] if n_models > 1 else encoder_out.x.shape[0]
    K = gen_cfg.beam_size
    bos, pad, eos, unk = cfg.bos, cfg.pad, cfg.eos, cfg.unk
    Vp = cfg.padded_vocab_size
    T = max_len + 2
    if n_models > 1:
        assert not gen_cfg.int8_cross_kv, "int8 KV + ensemble not supported"

    if constraints is not None:
        assert not gen_cfg.sampling and gen_cfg.diverse_beam_groups <= 1 \
            and gen_cfg.diversity_rate == 0, \
            "lexical constraints don't compose with sampling/diverse modes"
        cons_t = jnp.asarray(constraints[0], jnp.int32)  # [B, C]
        starts_t = jnp.asarray(constraints[1], jnp.int32)
        cons_total = jnp.sum(cons_t != pad, axis=1).astype(jnp.int32)  # [B]
        Cc = cons_t.shape[1]

    code_masks = (
        jnp.ones((B * K,), bool) if code_masks_value else None
    )
    # untiled encoder: cross K/V, bias and pad mask are beam-shared inside
    # decode_step (cuts per-step cross-attn HBM traffic by the beam factor)
    if n_models > 1:
        dec_state = jax.vmap(
            lambda p, e: ofa.init_decoder_state(
                p, cfg, e, max_len=max_len + 1, code_masks=code_masks,
                beam_size=K,
            )
        )(params, encoder_out)
    else:
        dec_state = ofa.init_decoder_state(
            params, cfg, encoder_out, max_len=max_len + 1,
            code_masks=code_masks, beam_size=K,
        )
    if gen_cfg.int8_cross_kv:
        dec_state = ofa.quantize_cross_kv(dec_state)
    # split mutable (self K/V) from invariant decoder state; the invariant
    # part is closed over by the loop body (see BeamState docstring)
    inv_state = dec_state._replace(
        cache={
            k: v for k, v in dec_state.cache.items()
            if k not in ("self_k", "self_v")
        }
    )
    # Pin the invariants in HBM: without the barrier XLA's constant-sinking
    # RECOMPUTES the cross-K/V projections ([B,S,d]·[d,d] per layer) inside
    # the while body on every decode step (seen in compiled HLO: the
    # projection fusion tagged while/body at ~147k cycles per layer-step).
    inv_state = jax.lax.optimization_barrier(inv_state)
    init_self_kv = (dec_state.cache["self_k"], dec_state.cache["self_v"])

    def _with_self_kv(self_kv):
        return inv_state._replace(
            cache={
                **inv_state.cache,
                "self_k": self_kv[0],
                "self_v": self_kv[1],
            }
        )

    if n_models > 1:
        def _decode(toks_flat, step, self_kv):
            """Vmapped per-model step → probability-space-averaged lprobs
            (logsumexp over models − log M, ref: EnsembleModel
            forward_decoder avg_probs, sequence_generator.py:880-900)."""
            st = _with_self_kv(self_kv)
            logits_m, new_dec = jax.vmap(
                lambda p, s_: ofa.decode_step(
                    p, cfg, toks_flat, step, s_, code_masks=code_masks
                )
            )(params, st)
            logits_m = logits_m.astype(jnp.float32)
            if gen_cfg.temperature != 1.0:
                logits_m = logits_m / gen_cfg.temperature
            lp = jax.nn.log_softmax(logits_m, axis=-1)
            comb = jax.scipy.special.logsumexp(lp, axis=0) - jnp.log(
                float(n_models)
            )
            return comb, new_dec

        def _reorder_kv(new_dec, bbsz):
            return (
                new_dec.cache["self_k"][:, :, bbsz],
                new_dec.cache["self_v"][:, :, bbsz],
            )
    else:
        def _decode(toks_flat, step, self_kv):
            logits, new_dec = ofa.decode_step(
                params, cfg, toks_flat, step, _with_self_kv(self_kv),
                code_masks=code_masks,
            )
            if gen_cfg.temperature != 1.0:
                logits = logits.astype(jnp.float32) / gen_cfg.temperature
            return logits, new_dec

        def _reorder_kv(new_dec, bbsz):
            return (
                new_dec.cache["self_k"][:, bbsz],
                new_dec.cache["self_v"][:, bbsz],
            )

    if gen_cfg.sampling:
        assert rng is not None, "sampling mode needs an rng"
        # all K chains live from step 0 (independent samples)
        init_alive = jnp.zeros((B, K), jnp.float32)
    elif gen_cfg.diverse_beam_groups > 1:
        # group-local pruning never crosses groups, so each group needs its
        # own live seed beam (beams g::G belong to group g; seed beam g)
        G = gen_cfg.diverse_beam_groups
        live = jnp.arange(K) < G
        init_alive = jnp.where(live[None, :], 0.0, NEG_INF)
        init_alive = jnp.broadcast_to(init_alive, (B, K)).astype(jnp.float32)
    else:
        # only beam 0 live at step 0 (ref: search.py:119)
        init_alive = jnp.zeros((B, K), jnp.float32).at[:, 1:].set(NEG_INF)
    init = BeamState(
        step=jnp.int32(0),
        alive_tokens=jnp.full((B, K, T), pad, jnp.int32).at[:, :, 0].set(bos),
        alive_scores=init_alive,
        finished_tokens=jnp.full((B, K, T), pad, jnp.int32),
        finished_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        self_kv=init_self_kv,
        trie_nodes=jnp.zeros((B, K), jnp.int32) if trie is not None else None,
        rng=rng if gen_cfg.sampling else None,
        cons_ptr=jnp.zeros((B, K), jnp.int32) if constraints is not None else None,
    )

    prefix_len = 0 if prefix_tokens is None else prefix_tokens.shape[1]
    # per-ROW prefix lengths: the reference gates the constraint trie on
    # each row's own prefix (prefix_tokens[row].ne(pad).sum(),
    # sequence_generator.py:862-867), so with mixed-length prompts a short
    # row becomes trie-constrained the moment ITS prefix ends — there is no
    # unconstrained gap up to the padded prefix width.
    row_plen = (
        jnp.repeat(jnp.sum(prefix_tokens != pad, axis=1), K)  # [B*K]
        if prefix_tokens is not None
        else None
    )

    # per-sentence length constraints (ref: search.py:526-549)
    if src_lengths is not None:
        sl = src_lengths.astype(jnp.float32)
        row_min = jnp.repeat(gen_cfg.min_len_a * sl + gen_cfg.min_len, K)
        row_max = jnp.repeat(gen_cfg.max_len_a * sl + gen_cfg.max_len_b, K)
    else:
        row_min = row_max = None

    def length_norm(step):
        # score / (gen_len)**len_penalty; gen_len = step+1 incl. eos
        if gen_cfg.normalize_scores:
            return (step.astype(jnp.float32) + 1.0) ** gen_cfg.len_penalty
        return jnp.float32(1.0)

    def _sampling_grow(s: BeamState, lprobs, new_dec, step) -> BeamState:
        """Sampling mode: K independent chains, one sampled token per chain
        per step (fairseq Sampling search, models/search.py:526 — used by the
        SCST generator, criterions/scst_loss.py:139-165)."""
        new_rng, sub = jax.random.split(s.rng)
        filt = lprobs
        if gen_cfg.sampling_topk > 0:
            kth = jax.lax.top_k(filt, gen_cfg.sampling_topk)[0][:, -1:]
            filt = jnp.where(filt < kth, NEG_INF, filt)
        if gen_cfg.sampling_topp > 0:
            srt = jnp.sort(filt, axis=-1)[:, ::-1]
            cum = jnp.cumsum(jnp.exp(srt), axis=-1)
            # smallest set with cumulative prob >= topp
            cutoff_idx = jnp.argmax(cum >= gen_cfg.sampling_topp, axis=-1)
            cutoff = jnp.take_along_axis(srt, cutoff_idx[:, None], axis=-1)
            filt = jnp.where(filt < cutoff, NEG_INF, filt)
        sampled = jax.random.categorical(sub, filt, axis=-1)  # [B*K]
        tok_lp = jnp.take_along_axis(lprobs, sampled[:, None], axis=1)[:, 0]
        sampled = _unflat(sampled, B, K).astype(jnp.int32)
        tok_lp = _unflat(tok_lp, B, K)

        dead = s.alive_scores <= NEG_INF / 2
        new_scores = jnp.where(dead, NEG_INF, s.alive_scores + tok_lp)
        tokens = jax.lax.dynamic_update_index_in_dim(
            s.alive_tokens, sampled, step + 1, axis=2
        )
        is_eos = jnp.logical_and(sampled == eos, jnp.logical_not(dead))
        fin_scores_new = jnp.where(is_eos, new_scores / length_norm(step), NEG_INF)
        fin_scores_all = jnp.concatenate([s.finished_scores, fin_scores_new], axis=1)
        fin_tokens_all = jnp.concatenate([s.finished_tokens, tokens], axis=1)
        fin_top_scores, fin_top_idx = jax.lax.top_k(fin_scores_all, K)
        fin_tokens = _gather_beams(fin_tokens_all, fin_top_idx)
        alive_scores = jnp.where(is_eos, NEG_INF, new_scores)

        if trie is not None:
            nodes = trie.transition(_flat(s.trie_nodes), _flat(sampled))
            nodes = jnp.where(
                step >= row_plen if prefix_len else jnp.bool_(True),
                nodes, _flat(s.trie_nodes),
            )
            trie_nodes = _unflat(nodes, B, K)
        else:
            trie_nodes = None
        return BeamState(
            step=step + 1,
            alive_tokens=tokens,
            alive_scores=alive_scores,
            finished_tokens=fin_tokens,
            finished_scores=fin_top_scores,
            # chains keep their own rows; no reorder
            self_kv=(new_dec.cache["self_k"], new_dec.cache["self_v"]),
            trie_nodes=trie_nodes,
            rng=new_rng,
        )

    def cond(s: BeamState):
        not_done = s.step <= max_len
        # early exit: can any alive beam still beat the worst finished?
        best_alive = jnp.max(s.alive_scores, axis=1) / length_norm(
            jnp.int32(max_len)
        )
        worst_fin = jnp.min(s.finished_scores, axis=1)
        improvable = jnp.any(best_alive > worst_fin)
        return jnp.logical_and(not_done, improvable)

    # ---- fast candidate path -------------------------------------------
    # When no vocab-shaped constraint applies (the headline caption/gigaword
    # configs), the output projection runs through the fused Pallas kernel
    # (ops/topk_projection.py): logits + per-128-block maxes + exact
    # logsumexp in ONE pass over the projection weights, then candidate
    # blocks are selected from the tiny [N, Vp/128] table and every ban
    # lands on the gathered [N, nb_sel·128] candidate set. Measured r3
    # (probe, v5e): ANY full-vocab XLA op costs ~0.6-0.8 ms at this shape
    # (lane-reduction bound, 30x off roofline) — the kernel removes all of
    # them. Exactness: the post-ban top-2K live within the top
    # (2K + max_bans) blocks — every outranking block holds a better token,
    # ≤ 2K−1 unbanned + one per banned id (pad + eos + ≤ T−n+1 n-gram);
    # forced at-max eos is appended as its own column. On exact bf16 value
    # ties at the block boundary an equal-scoring token may differ.
    fast_path = (
        gen_cfg.use_fast_path
        and trie is None
        and gen_cfg.constraint_range is None
        and allowed_fn is None
        and constraints is None
        and not gen_cfg.sampling
        and gen_cfg.diverse_beam_groups <= 1
        and gen_cfg.diversity_rate == 0
        and prefix_tokens is None
        and gen_cfg.unk_penalty == 0
        and not gen_cfg.gen_box
        and not gen_cfg.gen_code
        and n_models == 1
        and Vp % 128 == 0
    )
    ngram = gen_cfg.no_repeat_ngram_size
    if fast_path:
        from ..ops.topk_projection import (
            project_with_stats, select_candidate_blocks,
        )

        proj_dtype = jnp.dtype(cfg.dtype)
        if "embed_tokens_q8" in params:
            w_proj = params["embed_tokens_q8"]
            w_scale = params["embed_tokens_scale"]
        else:
            w_proj = params["embed_tokens"].astype(proj_dtype)
            w_scale = None
        # pin outside the loop: the astype/copy is loop-invariant and XLA's
        # constant-sinking would otherwise re-cast 91MB per step (the r2
        # cross-KV lesson)
        w_proj = jax.lax.optimization_barrier(w_proj)
        nb_sel = min(
            2 * K + 2 + (T - ngram + 1 if ngram > 0 else 0), Vp // 128
        )

    def body_fast(s: BeamState) -> BeamState:
        step = s.step
        N = B * K
        cur_tokens = jax.lax.dynamic_index_in_dim(
            s.alive_tokens, step, axis=2, keepdims=False
        )  # [B, K]
        feats, new_dec = ofa.decode_step(
            params, cfg, _flat(cur_tokens), step, _with_self_kv(s.self_kv),
            code_masks=code_masks, features_only=True,
        )  # [N, d]
        h = feats.astype(proj_dtype)
        if gen_cfg.temperature != 1.0:
            # projection is linear (no bias): scaling h == scaling logits
            h = h / gen_cfg.temperature
        logits, bmax, Z = project_with_stats(
            h, w_proj, w_scale, vocab_size=cfg.vocab_size
        )
        vals, ids = select_candidate_blocks(logits, bmax, nb_sel)
        alive_flat = _flat(s.alive_scores)  # [N]
        cand = vals.astype(jnp.float32) - Z[:, None] + alive_flat[:, None]
        cand = jnp.where(jnp.isnan(cand), NEG_INF, cand)
        cand = jnp.where(ids == pad, NEG_INF, cand)  # (ref :388)
        min_thr = row_min if row_min is not None else gen_cfg.min_len
        min_act = jnp.broadcast_to(step < min_thr, (N,))
        cand = jnp.where(
            jnp.logical_and(min_act[:, None], ids == eos), NEG_INF, cand
        )
        if ngram > 0:
            # candidate-domain n-gram blocking: a candidate is banned iff its
            # token completes a seen n-gram (same match rule as
            # _apply_no_repeat_ngram, compared against M ids instead of
            # scattered into the vocab buffer)
            tokens_flat = _flat(s.alive_tokens)
            L = tokens_flat.shape[1]
            idx = jnp.arange(L - ngram + 1)
            valid = idx + ngram - 1 <= step
            match = jnp.ones((N, L - ngram + 1), bool)
            for j in range(ngram - 1):
                ctx_j = jnp.take_along_axis(
                    tokens_flat,
                    jnp.full((N, 1), 0) + (step - (ngram - 2) + j),
                    axis=1,
                )
                match = match & (
                    tokens_flat[:, j : j + L - ngram + 1] == ctx_j
                )
            match = match & valid[None, :]
            banned = tokens_flat[:, ngram - 1 :]  # [N, L-n+1]
            ban_hit = jnp.any(
                (ids[:, :, None] == banned[:, None, :]) & match[:, None, :],
                axis=2,
            )
            can_block = step + 2 - ngram >= 0
            cand = jnp.where(
                jnp.logical_and(can_block, ban_hit), NEG_INF, cand
            )
        at_max = jnp.broadcast_to(step >= max_len, (N,))
        if row_max is not None:
            at_max = jnp.logical_or(at_max, step >= row_max)
        cand = jnp.where(at_max[:, None], NEG_INF, cand)
        # forced-eos column: value = cumulative score when at max (ref
        # :400-404), NEG_INF otherwise (a real eos candidate, if viable,
        # is already in the top-M)
        eos_val = jnp.where(at_max, alive_flat, NEG_INF)
        cand_ext = jnp.concatenate([cand, eos_val[:, None]], axis=1)
        ids_ext = jnp.concatenate(
            [ids, jnp.full((N, 1), eos, ids.dtype)], axis=1
        )

        # two-stage exact top-2K over the tiny candidate set
        row_sc, row_pos = jax.lax.top_k(cand_ext, 2 * K)
        row_ix = jnp.take_along_axis(ids_ext, row_pos, axis=1)
        merged_sc = _unflat(row_sc, B, K).reshape(B, K * 2 * K)
        topk_scores, sel = jax.lax.top_k(merged_sc, 2 * K)
        topk_beams = sel // (2 * K)
        topk_toks = jnp.take_along_axis(
            _unflat(row_ix, B, K).reshape(B, K * 2 * K), sel, axis=1
        )

        cand_tokens = _gather_beams(s.alive_tokens, topk_beams)  # [B, 2K, T]
        cand_tokens = jax.lax.dynamic_update_index_in_dim(
            cand_tokens, topk_toks, step + 1, axis=2
        )
        is_eos = topk_toks == eos
        new_fin_scores = jnp.where(
            is_eos, topk_scores / length_norm(step), NEG_INF
        )
        fin_scores_all = jnp.concatenate(
            [s.finished_scores, new_fin_scores], axis=1
        )
        fin_tokens_all = jnp.concatenate(
            [s.finished_tokens, cand_tokens], axis=1
        )
        fin_top_scores, fin_top_idx = jax.lax.top_k(fin_scores_all, K)
        fin_tokens = _gather_beams(fin_tokens_all, fin_top_idx)

        alive_cand_scores = jnp.where(is_eos, NEG_INF, topk_scores)
        alive_top_scores, alive_top_idx = jax.lax.top_k(alive_cand_scores, K)
        alive_tokens = _gather_beams(cand_tokens, alive_top_idx)
        alive_beam_src = jnp.take_along_axis(topk_beams, alive_top_idx, axis=1)
        bbsz = (jnp.arange(B)[:, None] * K + alive_beam_src).reshape(-1)
        return BeamState(
            step=step + 1,
            alive_tokens=alive_tokens,
            alive_scores=alive_top_scores,
            finished_tokens=fin_tokens,
            finished_scores=fin_top_scores,
            self_kv=_reorder_kv(new_dec, bbsz),
            trie_nodes=None,
        )

    def body(s: BeamState) -> BeamState:
        step = s.step
        cur_tokens = jax.lax.dynamic_index_in_dim(
            s.alive_tokens, step, axis=2, keepdims=False
        )  # [B, K]
        logits, new_dec = _decode(_flat(cur_tokens), step, s.self_kv)
        logits = logits.astype(jnp.float32)

        # trie constraints only apply past each row's OWN prefix — the
        # reference strips the per-row prefix before walking
        # (sequence_generator.py:860-867)
        trie_active_rows = (
            step >= row_plen if prefix_len else jnp.bool_(True)  # [B*K] | scalar
        )
        trie_active = (
            trie_active_rows[:, None] if prefix_len else trie_active_rows
        )
        trie_nodes_flat = _flat(s.trie_nodes) if trie is not None else None
        c_logits = _constrain_logits_pre(logits, gen_cfg, trie, trie_nodes_flat)
        logits = jnp.where(trie_active, c_logits, logits) if prefix_len else c_logits
        if gen_cfg.sampling:
            # sampling needs true per-token lprobs (categorical + tok_lp)
            lprobs = jax.nn.log_softmax(logits, axis=-1)
            at_max_eos = jnp.float32(0.0)
        else:
            # Fused candidate computation: the beam competition only ever
            # consumes cand = lprob + cum = logits - logsumexp + alive, so
            # compute THAT directly — the separate log_softmax output and
            # the later "+ alive_scores" pass never materialize their own
            # [B*K, V] buffers (the decode loop's beam-logic phase is bound
            # by these full-vocab passes, BENCH_r02 probe).
            Z = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
            alive_flat = _flat(s.alive_scores)[:, None]  # [B*K, 1]
            lprobs = logits - Z + alive_flat
            at_max_eos = alive_flat
        c_lprobs = _constrain_lprobs_post(lprobs, gen_cfg, trie, trie_nodes_flat)
        lprobs = jnp.where(trie_active, c_lprobs, lprobs) if prefix_len else c_lprobs

        if allowed_fn is not None:
            # PrefixConstrainedBeamSearch hook (ref: search.py:159-180) —
            # additive 0/-inf mask on lprobs, no renormalization. Safe in
            # the fused candidate domain (pure where→NEG_INF).
            am = allowed_fn(step, _flat(s.alive_tokens))
            if am.shape[-1] < Vp:  # user mask over the unpadded vocab
                am = jnp.pad(am, ((0, 0), (0, Vp - am.shape[-1])))
            lprobs = jnp.where(am, lprobs, NEG_INF)

        # All full-vocab conditioning below is written as fused iota-mask
        # arithmetic, NEVER scatter-style .at[...] column ops: each scatter
        # on the [B*K, V] buffer materializes a full copy and breaks XLA's
        # elementwise fusion — the beam-logic phase was profiled at
        # 2.7ms/step with scatters vs ~1ms fused (BENCH_r02 probe).
        iota_v = jnp.arange(Vp)
        eos_col = (iota_v == eos)[None, :]

        # prefix forcing (ref: _prefix_tokens :600-631)
        if prefix_tokens is not None:
            ptok = jnp.repeat(prefix_tokens, K, axis=0)  # [B*K, P]
            in_prefix = jnp.logical_and(step < prefix_len, step < max_len)
            pt = ptok[:, jnp.minimum(step, prefix_len - 1)]  # [B*K]
            force = jnp.logical_and(in_prefix, pt != pad)
            forced_lp = jnp.take_along_axis(lprobs, pt[:, None], axis=1)
            forced = jnp.where(
                iota_v[None, :] == pt[:, None], forced_lp, NEG_INF
            )
            lprobs = jnp.where(force[:, None], forced, lprobs)
            min_thr = row_min if row_min is not None else gen_cfg.min_len
            min_len_active = jnp.logical_and(
                jnp.logical_not(in_prefix), step < min_thr
            )
        else:
            min_thr = row_min if row_min is not None else gen_cfg.min_len
            min_len_active = step < min_thr
        # min length: no eos yet (ref :383-385)
        min_rows = jnp.broadcast_to(min_len_active, (B * K,))
        lprobs = lprobs + jnp.where(
            jnp.logical_and(min_rows[:, None], eos_col), NEG_INF, 0.0
        )

        lprobs = jnp.where(jnp.isnan(lprobs), NEG_INF, lprobs)
        lprobs = jnp.where((iota_v == pad)[None, :], NEG_INF, lprobs)  # (ref :388)
        if gen_cfg.unk_penalty:
            lprobs = lprobs - jnp.where(
                (iota_v == unk)[None, :], gen_cfg.unk_penalty, 0.0
            )

        if gen_cfg.gen_code or gen_cfg.gen_box:
            # ban specials while generating (ref :389-390)
            lprobs = jnp.where(
                jnp.logical_and(step < max_len, jnp.arange(Vp)[None, :] < 4),
                NEG_INF,
                lprobs,
            )
        if gen_cfg.gen_box:
            # 4 bins then eos, repeating (ref :391-397)
            lprobs = jnp.where((iota_v == Vp - 1)[None, :], NEG_INF, lprobs)
            cs = (
                gen_cfg.constraint_range[0]
                if gen_cfg.constraint_range
                else cfg.vocab_size - cfg.num_bins
            )
            band = iota_v[None, :]
            eos_step = (step + 1) % 5 == 0
            ban_bins = (band >= cs) & (band < cfg.vocab_size)
            ban_nonbins = band >= cfg.vocab_size
            lprobs = jnp.where(
                jnp.where(eos_step, ban_bins, ban_nonbins), NEG_INF, lprobs
            )

        # max length: eos only (ref :400-404; per-sentence ref :549)
        at_max = jnp.broadcast_to(step >= max_len, (B * K,))
        if row_max is not None:
            at_max = jnp.logical_or(at_max, step >= row_max)
        # in candidate domain (non-sampling) the forced-eos value is the
        # hypothesis's cumulative score, i.e. lprob(eos) := 0
        lprobs = jnp.where(
            at_max[:, None],
            jnp.where(eos_col, at_max_eos, NEG_INF),
            lprobs,
        )

        # lexical constraints: eos blocked until all constraints are met
        # (ref: search.py:309-323 "Prevent EOS for unfinished hyps"; the
        # block lands after the generator's max_len forcing in the reference
        # too, so unmet hypos never finalize there either — fairseq simply
        # returns no hypothesis for such sentences). Static shapes force us
        # to return a row: the post-loop fallback terminates it with eos.
        if constraints is not None:
            cons_unfinished = s.cons_ptr < cons_total[:, None]  # [B, K]
            lprobs = lprobs + jnp.where(
                jnp.logical_and(_flat(cons_unfinished)[:, None], eos_col),
                NEG_INF,
                0.0,
            )

        if gen_cfg.no_repeat_ngram_size > 0:
            can_block = step + 2 - gen_cfg.no_repeat_ngram_size >= 0
            blocked = _apply_no_repeat_ngram(
                lprobs, _flat(s.alive_tokens), step, gen_cfg.no_repeat_ngram_size
            )
            lprobs = jnp.where(can_block, blocked, lprobs)

        if gen_cfg.sampling:
            return _sampling_grow(s, lprobs, new_dec, step)

        # ---- grow: top-2K candidates per sentence over K*V scores
        G = gen_cfg.diverse_beam_groups
        cand_ptr = None
        if constraints is not None:
            # Post & Vilar dynamic beam allocation (ref: search.py:264-300):
            # candidates = global top-2K ∪ each beam's own top-1 (the
            # reference's per-beam top-each_k addition, search.py step docs —
            # a beam whose best token falls outside the global top-2K keeps
            # its continuation) ∪ each beam's forced next-constraint token;
            # banks (= constraint tokens consumed) share the beam via stripe
            # ranks instead of pure score order.
            cand = _unflat(lprobs, B, K)  # candidate domain: lprob + cum
            # two-stage exact global top-2K (see default branch: avoids the
            # [B, K*Vp] reshape's layout-copy)
            row_sc, row_ix = jax.lax.top_k(lprobs, 2 * K)  # [B*K, 2K]
            m_sc = _unflat(row_sc, B, K).reshape(B, K * 2 * K)
            sc2k, sel = jax.lax.top_k(m_sc, 2 * K)
            beams2k = sel // (2 * K)
            toks2k = jnp.take_along_axis(
                _unflat(row_ix, B, K).reshape(B, K * 2 * K), sel, axis=1
            )
            top1_sc = _unflat(row_sc, B, K)[:, :, 0]  # [B, K] per-beam best
            top1_tok = _unflat(row_ix, B, K)[:, :, 0]
            ptr_clamped = jnp.minimum(s.cons_ptr, Cc - 1)
            next_tok = jnp.take_along_axis(cons_t, ptr_clamped, axis=1)  # [B,K]
            unf = s.cons_ptr < cons_total[:, None]
            forced_sc = jnp.take_along_axis(
                cand, next_tok[:, :, None], axis=2
            )[..., 0]
            forced_sc = jnp.where(unf, forced_sc, NEG_INF)
            beam_ids = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
            topk_scores = jnp.concatenate(
                [sc2k, top1_sc, forced_sc], axis=1
            )  # [B, 4K]
            topk_beams = jnp.concatenate([beams2k, beam_ids, beam_ids], axis=1)
            topk_toks = jnp.concatenate([toks2k, top1_tok, next_tok], axis=1)
            # dedup: per-beam top-1 / forced candidates may coincide with a
            # top-2K one
            same = (topk_beams[:, None, :] == topk_beams[:, :, None]) & (
                topk_toks[:, None, :] == topk_toks[:, :, None]
            )
            Nc = 4 * K
            earlier = (jnp.arange(Nc)[None, :] < jnp.arange(Nc)[:, None])[None]
            dup = jnp.any(same & earlier, axis=2)
            topk_scores = jnp.where(dup, NEG_INF, topk_scores)
            # per-candidate constraint-pointer transition → bank id
            ptr_cand = jnp.take_along_axis(s.cons_ptr, topk_beams, axis=1)
            cand_ptr = constraint_transition(
                cons_t, starts_t, cons_total, ptr_cand, topk_toks
            )
        elif G > 1:
            # grouped Hamming diversity (ref: models/search.py:551-618):
            # groups pick in order; later groups pay `strength` per earlier
            # selection of the same token this step. Group g owns beams
            # g::G; candidate axis is group-blocked [2Kg | 2Kg | ...].
            assert K % G == 0, f"beam {K} not divisible by groups {G}"
            Kg = K // G
            lp3 = _unflat(lprobs, B, K)  # candidate domain: lprob + cum
            counts = jnp.zeros((B, Vp), jnp.float32)
            sc_l, bm_l, tk_l = [], [], []
            for g in range(G):
                cand_g = (
                    lp3[:, g::G]
                    - gen_cfg.diversity_strength * counts[:, None, :]
                )  # [B,Kg,V]
                # two-stage exact group top-2Kg (avoids [B, Kg*Vp] reshape)
                r_sc, r_ix = jax.lax.top_k(cand_g, 2 * Kg)  # [B,Kg,2Kg]
                sc_g, sel_g = jax.lax.top_k(
                    r_sc.reshape(B, Kg * 2 * Kg), 2 * Kg
                )
                tk_g = jnp.take_along_axis(
                    r_ix.reshape(B, Kg * 2 * Kg), sel_g, axis=1
                )
                sc_l.append(sc_g)
                bm_l.append((sel_g // (2 * Kg)) * G + g)
                tk_l.append(tk_g)
                counts = counts.at[jnp.arange(B)[:, None], tk_g].add(1.0)
            topk_scores = jnp.concatenate(sc_l, axis=1)  # [B, 2K]
            topk_beams = jnp.concatenate(bm_l, axis=1)
            topk_toks = jnp.concatenate(tk_l, axis=1)
        elif gen_cfg.diversity_rate > 0:
            # sibling-rank penalty (ref: models/search.py:745-814): each
            # beam's k-th best token is penalized k*rate before the global
            # candidate competition; penalized scores are kept (ref :order).
            lp3 = _unflat(lprobs, B, K)  # candidate domain: lprob + cum
            v_sc, v_ix = jax.lax.top_k(lp3, 2 * K)  # per-beam top-2K tokens
            penalty = gen_cfg.diversity_rate * jnp.arange(
                1, 2 * K + 1, dtype=jnp.float32
            )
            cand = v_sc - penalty[None, None, :]
            flat_cand = cand.reshape(B, K * 2 * K)
            topk_scores, flat_ix = jax.lax.top_k(flat_cand, 2 * K)
            topk_beams = flat_ix // (2 * K)
            topk_toks = jnp.take_along_axis(
                v_ix.reshape(B, K * 2 * K), flat_ix, axis=1
            )
        else:
            # Two-stage exact top-2K: per-beam-row top-2K on [B*K, Vp] then a
            # tiny merge over [B, K·2K]. Equivalent to the flat top-2K over
            # [B, K·Vp] (the global top-2K lies within each row's top-2K)
            # but avoids reshaping the full-vocab buffer to [B, K·Vp] —
            # which cost a physical 19MB layout-transpose copy per step in
            # compiled HLO (TopK's operand layout constraint).
            row_sc, row_ix = jax.lax.top_k(lprobs, 2 * K)  # [B*K, 2K]
            merged_sc = _unflat(row_sc, B, K).reshape(B, K * 2 * K)
            topk_scores, sel = jax.lax.top_k(merged_sc, 2 * K)
            topk_beams = sel // (2 * K)  # [B, 2K]
            topk_toks = jnp.take_along_axis(
                _unflat(row_ix, B, K).reshape(B, K * 2 * K), sel, axis=1
            )

        # candidate token buffers
        cand_tokens = _gather_beams(s.alive_tokens, topk_beams)  # [B, 2K, T]
        cand_tokens = jax.lax.dynamic_update_index_in_dim(
            cand_tokens, topk_toks, step + 1, axis=2
        )

        is_eos = topk_toks == eos

        # ---- finished set: merge existing K with new eos candidates (2K)
        new_fin_scores = jnp.where(
            is_eos, topk_scores / length_norm(step), NEG_INF
        )  # [B, 2K]
        fin_scores_all = jnp.concatenate([s.finished_scores, new_fin_scores], axis=1)
        fin_tokens_all = jnp.concatenate([s.finished_tokens, cand_tokens], axis=1)
        fin_top_scores, fin_top_idx = jax.lax.top_k(fin_scores_all, K)
        fin_tokens = _gather_beams(fin_tokens_all, fin_top_idx)

        # ---- alive set: top-K non-eos candidates
        alive_cand_scores = jnp.where(is_eos, NEG_INF, topk_scores)
        if constraints is not None:
            # lexicographic (stripe rank asc, score desc) selection so every
            # bank keeps its best hypotheses (ref: search.py:275-281)
            key = stripe_key(cand_ptr, alive_cand_scores)
            _, alive_top_idx = jax.lax.top_k(key, K)
            alive_top_scores = jnp.take_along_axis(
                alive_cand_scores, alive_top_idx, axis=1
            )
        elif G > 1:
            # group-local pruning keeps beams g::G owned by group g (the
            # reference's candidate-order active selection has the same
            # effect, sequence_generator.py active_mask over grouped cands)
            Kg = K // G
            a_sc, a_ix = [], []
            for g in range(G):
                sl_lo = 2 * Kg * g
                sc_g = jax.lax.dynamic_slice_in_dim(
                    alive_cand_scores, sl_lo, 2 * Kg, axis=1
                )
                top_sc, top_ix = jax.lax.top_k(sc_g, Kg)
                a_sc.append(top_sc)
                a_ix.append(top_ix + sl_lo)
            # [B, Kg, G] reshaped so position kg*G+g holds group g's kg-th
            alive_top_scores = jnp.stack(a_sc, axis=2).reshape(B, K)
            alive_top_idx = jnp.stack(a_ix, axis=2).reshape(B, K)
        else:
            alive_top_scores, alive_top_idx = jax.lax.top_k(alive_cand_scores, K)
        alive_tokens = _gather_beams(cand_tokens, alive_top_idx)
        alive_beam_src = jnp.take_along_axis(topk_beams, alive_top_idx, axis=1)  # [B,K]

        # reorder self-attn KV cache rows to follow the selected beams;
        # cross K/V and biases are beam-uniform loop invariants (closure)
        bbsz = (jnp.arange(B)[:, None] * K + alive_beam_src).reshape(-1)  # [B*K]
        new_self_kv = _reorder_kv(new_dec, bbsz)

        # trie cursor transition
        if trie is not None:
            src_nodes = jnp.take_along_axis(s.trie_nodes, alive_beam_src, axis=1)
            chosen = jnp.take_along_axis(topk_toks, alive_top_idx, axis=1)
            new_nodes = trie.transition(_flat(src_nodes), _flat(chosen))
            # gather the per-row gate along the selected beams (plen is
            # per-sample, shared by all K beams, so no reorder needed)
            new_nodes = jnp.where(
                trie_active_rows, new_nodes, _flat(src_nodes)
            )
            trie_nodes = _unflat(new_nodes, B, K)
        else:
            trie_nodes = None

        new_cons_ptr = (
            jnp.take_along_axis(cand_ptr, alive_top_idx, axis=1)
            if constraints is not None
            else None
        )
        return BeamState(
            step=step + 1,
            alive_tokens=alive_tokens,
            alive_scores=alive_top_scores,
            finished_tokens=fin_tokens,
            finished_scores=fin_top_scores,
            self_kv=new_self_kv,
            trie_nodes=trie_nodes,
            cons_ptr=new_cons_ptr,
        )

    final = jax.lax.while_loop(cond, body_fast if fast_path else body, init)

    # Sentences may end with no finished hypo when eos was unreachable
    # (unmeetable lexical constraints; dead sampling chains). The reference
    # returns NO hypothesis in that case; static shapes force a row, so fall
    # back to the best alive prefix, TERMINATED with eos (overwriting the
    # meaningless all-banned final pick) so eos-scanning detokenizers are
    # safe. Fallback scores stay deeply negative — an honest "no valid
    # hypothesis" signal callers can threshold on.
    have_fin = final.finished_scores > NEG_INF / 2
    fallback_scores = final.alive_scores / length_norm(jnp.int32(max_len))
    scores = jnp.where(have_fin, final.finished_scores, fallback_scores)
    alive_terminated = final.alive_tokens.at[:, :, -1].set(eos)
    tokens = jnp.where(
        have_fin[:, :, None], final.finished_tokens, alive_terminated
    )
    # strip bos: reference hypos are tokens[1:step+2]
    return tokens[:, :, 1:], scores


def generate(
    params,
    cfg: ModelConfig,
    gen_cfg: GenerationConfig,
    src_tokens: jnp.ndarray,
    patch_images: Optional[jnp.ndarray] = None,
    patch_masks: Optional[jnp.ndarray] = None,
    prefix_tokens: Optional[jnp.ndarray] = None,
    trie: Optional[DenseTrie] = None,
    constraints: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    allowed_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """encode + beam_search, jit-friendly end to end.

    ``params`` may be a LIST of same-architecture param pytrees — ensemble
    decoding with probability-space lprob averaging (ref: EnsembleModel,
    models/sequence_generator.py:767-940; load via
    checkpoint_utils.load_model_ensemble in the reference).

    Returns (tokens [B, K, max_len+1], normalized scores [B, K]).
    """
    n_models = 1
    if isinstance(params, (list, tuple)):
        n_models = len(params)
        if n_models == 1:
            params = params[0]
        else:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
            params = stacked
    if n_models > 1:
        enc = jax.vmap(
            lambda p: ofa.encode(p, cfg, src_tokens, patch_images, patch_masks)
        )(params)
    else:
        enc = ofa.encode(params, cfg, src_tokens, patch_images, patch_masks)
    max_len = int(gen_cfg.max_len_a * src_tokens.shape[1] + gen_cfg.max_len_b)
    # per-sentence length constraints activate when a length slope is set
    src_lengths = (
        jnp.sum(src_tokens != cfg.pad, axis=1)
        if (gen_cfg.min_len_a or gen_cfg.max_len_a)
        else None
    )
    return beam_search(
        params,
        cfg,
        gen_cfg,
        enc,
        max_len=max_len,
        prefix_tokens=prefix_tokens,
        trie=trie,
        code_masks_value=gen_cfg.gen_code,
        src_lengths=src_lengths,
        constraints=constraints,
        allowed_fn=allowed_fn,
        n_models=n_models,
    )
