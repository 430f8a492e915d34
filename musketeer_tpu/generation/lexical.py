"""Lexically constrained decoding state (ordered constraints).

TPU-native re-design of fairseq's LexicallyConstrainedBeamSearch
(ref: models/search.py:210-524) + OrderedConstraintState: instead of
per-hypothesis Python objects, the constraint state is a single int32
pointer per beam into a flat per-sentence constraint token sequence —
fixed shapes, fully jittable inside the beam-search ``while_loop``.

Semantics (Post & Vilar NAACL'18 dynamic beam allocation, Hu et al.
NAACL'19 ordered representation):

- constraints are phrases that must each appear, in order, somewhere in
  the output;
- a hypothesis's state is ``ptr`` = number of constraint tokens consumed;
- generating ``cons[ptr]`` advances the pointer; generating anything else
  mid-phrase rewinds to the phrase start (partial phrases don't count);
- eos is blocked until ``ptr == total``;
- beam slots are allocated across "banks" (= ptr value) by stripe rank,
  so hypotheses that satisfied more constraints are never crowded out.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def pack_constraints(
    batch_constraints: Sequence[Sequence[Sequence[int]]], pad: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Phrase lists → (cons_tokens [B, C], phrase_start [B, C]).

    ``cons_tokens[b]`` is sentence b's phrases concatenated, pad-padded;
    ``phrase_start[b, c]`` is the flat index where the phrase containing
    position c begins (used for the mid-phrase rewind). The fairseq
    equivalent is utils.pack_constraints → ConstraintState.create.
    """
    C = max(
        (sum(len(p) for p in sent) for sent in batch_constraints), default=1
    )
    C = max(C, 1)
    B = len(batch_constraints)
    cons = np.full((B, C), pad, np.int32)
    starts = np.zeros((B, C), np.int32)
    for b, sent in enumerate(batch_constraints):
        i = 0
        for phrase in sent:
            starts[b, i : i + len(phrase)] = i
            cons[b, i : i + len(phrase)] = np.asarray(phrase, np.int32)
            i += len(phrase)
        starts[b, i:] = i  # boundary: not mid-phrase
    return cons, starts


def constraint_transition(
    cons: jnp.ndarray,  # [B, C] flat constraint tokens
    starts: jnp.ndarray,  # [B, C] phrase-start index per position
    total: jnp.ndarray,  # [B] number of constraint tokens
    ptr: jnp.ndarray,  # [B, N] current pointers
    toks: jnp.ndarray,  # [B, N] generated tokens
) -> jnp.ndarray:
    """Ordered-constraint pointer update → new ptr [B, N]."""
    C = cons.shape[1]
    ptr_c = jnp.minimum(ptr, C - 1)
    expected = jnp.take_along_axis(cons, ptr_c, axis=1)
    unfinished = ptr < total[:, None]
    advance = (toks == expected) & unfinished
    phrase_start = jnp.take_along_axis(starts, ptr_c, axis=1)
    mid = (ptr > phrase_start) & unfinished
    # a mid-phrase mismatch that equals the phrase's FIRST token restarts the
    # phrase with that token already consumed (fairseq OrderedConstraintState
    # advances to root+1) — keeps self-overlapping phrases like [a,a,b] over
    # "a a a b" in step with the reference
    first = jnp.take_along_axis(cons, jnp.minimum(phrase_start, C - 1), axis=1)
    rewind_to = jnp.where(toks == first, phrase_start + 1, phrase_start)
    return jnp.where(advance, ptr + 1, jnp.where(mid, rewind_to, ptr))


def stripe_rank(bank: jnp.ndarray, score: jnp.ndarray) -> jnp.ndarray:
    """Rank of each candidate within its bank by descending score
    (0 = best; ties broken by index) → [B, N].

    The fairseq step sorts candidates by (stripe, score) and truncates
    (ref: search.py:275-281 docstring); N is small (≈3·beam), so the
    O(N²) pairwise comparison is a single fused VPU op.
    """
    same = bank[:, :, None] == bank[:, None, :]
    N = bank.shape[1]
    j_lt_i = (jnp.arange(N)[None, :] < jnp.arange(N)[:, None])[None]
    better = (score[:, None, :] > score[:, :, None]) | (
        (score[:, None, :] == score[:, :, None]) & j_lt_i
    )
    return jnp.sum(same & better, axis=2).astype(jnp.float32)


def stripe_key(bank: jnp.ndarray, score: jnp.ndarray) -> jnp.ndarray:
    """Selection key: lexicographic (stripe rank asc, score desc) as one
    float — higher key = selected first.

    Exact integer ordering: key = -(stripe_rank·N + global_score_rank),
    both ranks < N so the packed key < N² « 2²⁴ is exactly representable
    in fp32 — no packed-float resolution loss between near-tied scores
    (a score-offset packing loses ~0.016 of fp32 resolution by rank 1).
    Within one stripe rank, lower global score rank ⇔ higher score, so the
    ordering is identical to (rank asc, score desc) with index tiebreak.
    """
    N = bank.shape[1]
    same = bank[:, :, None] == bank[:, None, :]
    j_lt_i = (jnp.arange(N)[None, :] < jnp.arange(N)[:, None])[None]
    better = (score[:, None, :] > score[:, :, None]) | (
        (score[:, None, :] == score[:, :, None]) & j_lt_i
    )
    global_rank = jnp.sum(better, axis=2)  # unique 0..N-1 per row
    srank = jnp.sum(same & better, axis=2)
    return -(srank * N + global_rank).astype(jnp.float32)
