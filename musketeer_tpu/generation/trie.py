"""Token trie compiled to on-device tables for jitted constrained decoding.

The reference walks a Python dict-trie per hypothesis per step inside the
beam loop (ref: utils/trie.py:9-31 used at models/sequence_generator.py:857-869)
— a host-side hot loop. Here the trie compiles once, at task-setup time, into
dense arrays; the beam search keeps an int32 cursor per hypothesis and does a
gather + scatter per step entirely on device.

Semantics parity: the reference trie returns ``[eos]`` on a miss
(utils/trie.py:27-29), so a dead cursor allows exactly eos. Insertion is over
``answer_tokens + [eos]`` starting from the post-bos root (the reference
inserts ``[bos] + ans + [eos]`` and always walks prefixes that start with bos,
so bos is folded into the root here).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEAD = -1
ROOT = 0


class DenseTrie:
    """Static token trie as device tables.

    Attributes (device arrays):
      root_mask:  [Vpad] bool — allowed first tokens
      root_next:  [Vpad] int32 — next node per first token (DEAD if absent)
      child_tokens: [N, Bmax] int32 — sorted children tokens per non-root node
                    (row i = node i+1), padded with Vpad (sorts last)
      child_next:   [N, Bmax] int32
    """

    def __init__(self, sequences: Sequence[Sequence[int]], vocab_size: int):
        self.vocab_size = vocab_size
        # host-side build
        children: List[dict] = [dict()]  # node id -> {token: node}
        for seq in sequences:
            cur = ROOT
            for tok in seq:
                nxt = children[cur].get(tok)
                if nxt is None:
                    nxt = len(children)
                    children.append(dict())
                    children[cur][tok] = nxt
                cur = nxt
        self.num_nodes = len(children)

        root_mask = np.zeros((vocab_size,), bool)
        root_next = np.full((vocab_size,), DEAD, np.int32)
        for tok, nxt in children[ROOT].items():
            root_mask[tok] = True
            root_next[tok] = nxt

        n_nonroot = max(1, self.num_nodes - 1)
        bmax = max([1] + [len(children[i]) for i in range(1, self.num_nodes)])
        child_tokens = np.full((n_nonroot, bmax), vocab_size, np.int32)
        child_next = np.full((n_nonroot, bmax), DEAD, np.int32)
        for i in range(1, self.num_nodes):
            items = sorted(children[i].items())
            for j, (tok, nxt) in enumerate(items):
                child_tokens[i - 1, j] = tok
                child_next[i - 1, j] = nxt

        self.root_mask = jnp.asarray(root_mask)
        self.root_next = jnp.asarray(root_next)
        self.child_tokens = jnp.asarray(child_tokens)
        self.child_next = jnp.asarray(child_next)
        self.max_branch = bmax
        # numpy copies for HOST-side walks (batch builders): per-example
        # device dispatches from the input pipeline measured as the
        # dominant host cost of constraint-mask construction
        self._np_root_mask = root_mask
        self._np_root_next = root_next
        self._np_child_tokens = child_tokens
        self._np_child_next = child_next

    @classmethod
    def from_answers(cls, vocab, answers: Sequence[str]) -> "DenseTrie":
        """Build from answer strings (ref encodes ``' ' + answer`` + eos,
        tasks/mm_tasks/vqa_gen.py:160-167)."""
        seqs = [
            list(vocab.encode_text(" " + answer.strip())) + [vocab.eos]
            for answer in answers
        ]
        return cls(seqs, vocab.padded_size)

    # -- jit-side ops --------------------------------------------------------

    def allowed_mask(self, nodes: jnp.ndarray, V: int) -> jnp.ndarray:
        """nodes [N] int32 → [N, V] bool of allowed next tokens.

        DEAD → {eos} (id 2, fixed by the OFA dictionary).
        """
        n = nodes.shape[0]
        toks = self.child_tokens[jnp.maximum(nodes, 1) - 1]  # [N, Bmax]
        valid = toks < V
        mask = jnp.zeros((n, V), bool)
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], toks.shape)
        mask = mask.at[rows, jnp.minimum(toks, V - 1)].max(valid)
        mask = jnp.where(nodes[:, None] == ROOT, self.root_mask[None, :V], mask)
        eos_only = jnp.zeros((V,), bool).at[2].set(True)
        mask = jnp.where(nodes[:, None] == DEAD, eos_only[None, :], mask)
        return mask

    # -- host-side ops (numpy; for batch builders, not jitted code) ----------

    def allowed_mask_np(self, node: int) -> np.ndarray:
        """Host equivalent of :meth:`allowed_mask` for one node."""
        V = self.vocab_size
        if node == DEAD:
            m = np.zeros((V,), bool)
            m[2] = True  # eos (fixed by the OFA dictionary)
            return m
        if node == ROOT:
            return self._np_root_mask.copy()
        row = self._np_child_tokens[node - 1]
        m = np.zeros((V,), bool)
        m[row[row < V]] = True
        return m

    def transition_np(self, node: int, token: int) -> int:
        """Host equivalent of :meth:`transition` for one (node, token)."""
        if node == DEAD:
            return DEAD
        if node == ROOT:
            return int(self._np_root_next[token]) if token < self.vocab_size else DEAD
        row = self._np_child_tokens[node - 1]
        j = int(np.searchsorted(row, token))
        if j < len(row) and row[j] == token:
            return int(self._np_child_next[node - 1, j])
        return DEAD

    def transition(self, nodes: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
        """(nodes [N], chosen tokens [N]) → next nodes [N]."""
        row = self.child_tokens[jnp.maximum(nodes, 1) - 1]  # [N, Bmax]
        idx = jax.vmap(jnp.searchsorted)(row, tokens)
        idx = jnp.minimum(idx, row.shape[1] - 1)
        hit = jnp.take_along_axis(row, idx[:, None], axis=1)[:, 0] == tokens
        nxt = jnp.take_along_axis(
            self.child_next[jnp.maximum(nodes, 1) - 1], idx[:, None], axis=1
        )[:, 0]
        nonroot = jnp.where(hit, nxt, DEAD)
        from_root = self.root_next[jnp.minimum(tokens, self.vocab_size - 1)]
        out = jnp.where(nodes == ROOT, from_root, nonroot)
        return jnp.where(nodes == DEAD, DEAD, out)
