"""GPipe-style pipeline parallelism over a mesh axis (shard_map + ppermute).

The reference only forwards a pipeline_model_parallel flag to fairseq
(ref: trainer.py:110-122); here the primitive is TPU-native: stacked layer
parameters are sharded on their LAYER axis across the ``pipe`` mesh axis,
microbatch payloads flow stage-to-stage over ICI with ``jax.lax.ppermute``,
and the whole schedule is one jitted program.

Schedule (M microbatches, P stages, M ≥ 1): at clock t, stage s processes
microbatch (t - s) when 0 ≤ t - s < M; total M + P - 1 clocks. Bubble
fraction = (P-1)/(M+P-1).

``pipeline_scan`` replaces ``lax.scan(body, x, layers)`` over L stacked
layers with a P-stage pipeline, each stage scanning its local L/P layers.
The unit flowing between stages is an arbitrary activation PYTREE (payload);
``consts`` are replicated stage-invariant inputs (masks, positional
projections). Equivalence with the plain scan is tested on the virtual CPU
mesh; the model wiring lives in models/ofa.py behind
``ModelConfig.pipeline_microbatches``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_scan(
    body: Callable[[Any, Any, Any], Any],  # (payload, one_layer_xs, consts) -> payload
    payload_mb: Any,  # pytree, leaves [M, ...] (replicated microbatches)
    layer_xs: Any,  # pytree with leading layer axis [L, ...]
    mesh: Mesh,
    axis_name: str = "pipe",
    consts: Any = None,  # replicated stage-invariant pytree
    remat: bool = False,
    interleave: int = 1,
) -> Any:
    """Run `body` over all L layers as a P-stage pipeline → payload [M, ...].

    Requires L % P == 0. Output is fully replicated.

    ``remat=True`` checkpoints the per-tick stage computation so the scan
    saves only the inter-stage payload per clock tick and recomputes the
    local layers in the backward pass. This bounds activation memory to
    O(stages) payloads — the quantity 1F1B scheduling buys on GPU — while
    leaving the fwd/bwd interleaving to XLA's scheduler (the TPU-native
    division of labor: memory via remat, schedule via the compiler).
    The reference honors pipeline placement only for device mapping
    (ref: trainer.py:110-122, 1269-1271); this is a full schedule.

    ``interleave=V`` (V > 1) runs the Megatron-style interleaved schedule:
    the L layers split into P·V chunks and device d owns the NON-contiguous
    chunks {d, d+P, …, d+(V-1)P}, so each microbatch wraps around the ring
    V times in chunks of L/(P·V) layers. Clocks shrink from (M + P - 1)
    stage-sized ticks to (M + P·V - 1) chunk-sized ticks — work-normalized
    bubble (P-1)/(M·V + ...) instead of (P-1)/(M + P - 1), a ~V× smaller
    bubble in the small-M regime the per-chip batch forces. Requires
    L % (P·V) == 0 and M ≤ P (microbatch m occupies ring slot m mod P;
    M ≤ P keeps the slots conflict-free — for M > P run V=1, where the
    GPipe bubble is already amortized). Communication grows V× in count
    but each hop carries the same payload; hops ride ICI neighbours.
    """
    M = jax.tree.leaves(payload_mb)[0].shape[0]
    P_stages = mesh.shape[axis_name]
    L = jax.tree.leaves(layer_xs)[0].shape[0]
    assert L % P_stages == 0, f"layers {L} not divisible by stages {P_stages}"
    if interleave > 1:
        return _pipeline_scan_interleaved(
            body, payload_mb, layer_xs, mesh, axis_name, consts, remat,
            interleave,
        )

    layer_sharding = NamedSharding(mesh, P(axis_name))
    layer_xs = jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, layer_sharding), layer_xs
    )
    if consts is None:
        consts = ()

    def stage_fn(local_layers, pl_mb, consts):
        s = jax.lax.axis_index(axis_name)
        n_clock = M + P_stages - 1

        def run_local(pl):
            def scan_body(h, one):
                return body(h, one, consts), None

            out, _ = jax.lax.scan(scan_body, pl, local_layers)
            return out

        if remat:
            run_local = jax.checkpoint(run_local)

        zero_pl = jax.tree.map(lambda a: jnp.zeros_like(a[0]), pl_mb)
        outputs = jax.tree.map(jnp.zeros_like, pl_mb)

        def clock(t, carry):
            incoming, outputs = carry
            mb_idx = jnp.clip(t, 0, M - 1)
            pl_in = jax.tree.map(
                lambda mb, inc: jnp.where(s == 0, mb[mb_idx], inc),
                pl_mb, incoming,
            )
            active = jnp.logical_and(t - s >= 0, t - s < M)
            y = run_local(pl_in)
            y = jax.tree.map(
                lambda a, z: jnp.where(active, a, z), y, zero_pl
            )
            out_idx = jnp.clip(t - (P_stages - 1), 0, M - 1)
            write = jnp.logical_and(s == P_stages - 1, active)
            outputs = jax.tree.map(
                lambda outs, a: jax.lax.dynamic_update_index_in_dim(
                    outs, jnp.where(write, a, outs[out_idx]), out_idx, axis=0
                ),
                outputs, y,
            )
            nxt = jax.tree.map(
                lambda a: jax.lax.ppermute(
                    a, axis_name,
                    [(i, (i + 1) % P_stages) for i in range(P_stages)],
                ),
                y,
            )
            return nxt, outputs

        _, outputs = jax.lax.fori_loop(0, n_clock, clock, (zero_pl, outputs))
        # non-last stages never write → their buffers are zero; psum replicates
        # the last stage's outputs to every stage
        return jax.tree.map(lambda a: jax.lax.psum(a, axis_name), outputs)

    try:
        from jax import shard_map

        fn = shard_map(
            stage_fn,
            mesh=mesh,
            in_specs=(P(axis_name), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

        fn = shard_map(
            stage_fn,
            mesh=mesh,
            in_specs=(P(axis_name), P(), P()),
            out_specs=P(),
            check_rep=False,
        )
    return fn(layer_xs, payload_mb, consts)


def _pipeline_scan_interleaved(
    body, payload_mb, layer_xs, mesh, axis_name, consts, remat, V: int
):
    """Interleaved (virtual-stage) circular pipeline; see pipeline_scan.

    Schedule: chunk c = v·P + d (v = virtual stage, d = device) processes
    microbatch m at clock t = m + c. Device d at clock t is active on
    m = (t - d) mod P, v = (t - d) // P when t ≥ d, m < M, v < V — with
    M ≤ P at most one (m, v) per device per clock, so the ring permute
    d → d+1 carries every inter-chunk hop (the wrap P-1 → 0 advances v).
    """
    import numpy as np

    M = jax.tree.leaves(payload_mb)[0].shape[0]
    P_stages = mesh.shape[axis_name]
    L = jax.tree.leaves(layer_xs)[0].shape[0]
    assert L % (P_stages * V) == 0, (
        f"layers {L} not divisible by stages*interleave {P_stages}*{V}"
    )
    assert M <= P_stages, (
        f"interleaved schedule needs microbatches {M} <= stages {P_stages}"
    )
    Lc = L // (P_stages * V)
    if consts is None:
        consts = ()

    # permute layers to device-major order: new[d*(V*Lc) + v*Lc + o] =
    # old[(v*P + d)*Lc + o], so the contiguous block-sharding by layer axis
    # lands chunk v*P+d in device d's slot v
    perm = np.empty(L, np.int64)
    for d in range(P_stages):
        for v in range(V):
            for o in range(Lc):
                perm[d * V * Lc + v * Lc + o] = (v * P_stages + d) * Lc + o
    perm = jnp.asarray(perm)
    layer_xs = jax.tree.map(lambda a: a[perm], layer_xs)
    layer_sharding = NamedSharding(mesh, P(axis_name))
    layer_xs = jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, layer_sharding), layer_xs
    )

    def stage_fn(local_layers, pl_mb, consts):
        d = jax.lax.axis_index(axis_name)
        n_clock = M + P_stages * V - 1
        # local [V*Lc, ...] → [V, Lc, ...] virtual-stage chunks
        local_layers = jax.tree.map(
            lambda a: a.reshape((V, Lc) + a.shape[1:]), local_layers
        )

        def run_chunk(pl, v):
            chunk = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, v, 0, False),
                local_layers,
            )

            def scan_body(h, one):
                return body(h, one, consts), None

            out, _ = jax.lax.scan(scan_body, pl, chunk)
            return out

        if remat:
            run_chunk = jax.checkpoint(run_chunk, static_argnums=())

        zero_pl = jax.tree.map(lambda a: jnp.zeros_like(a[0]), pl_mb)
        outputs = jax.tree.map(jnp.zeros_like, pl_mb)

        def clock(t, carry):
            incoming, outputs = carry
            td = t - d
            m = jnp.clip(jnp.mod(td, P_stages), 0, M - 1)
            v = jnp.clip(td // P_stages, 0, V - 1)
            active = jnp.logical_and(
                td >= 0,
                jnp.logical_and(jnp.mod(td, P_stages) < M, td // P_stages < V),
            )
            inject = jnp.logical_and(d == 0, td // P_stages <= 0)
            pl_in = jax.tree.map(
                lambda mb, inc: jnp.where(inject, mb[m], inc), pl_mb, incoming
            )
            y = run_chunk(pl_in, v)
            y = jax.tree.map(lambda a, z: jnp.where(active, a, z), y, zero_pl)
            write = jnp.logical_and(
                jnp.logical_and(d == P_stages - 1, active), v == V - 1
            )
            outputs = jax.tree.map(
                lambda outs, a: jax.lax.dynamic_update_index_in_dim(
                    outs, jnp.where(write, a, outs[m]), m, axis=0
                ),
                outputs, y,
            )
            nxt = jax.tree.map(
                lambda a: jax.lax.ppermute(
                    a, axis_name,
                    [(i, (i + 1) % P_stages) for i in range(P_stages)],
                ),
                y,
            )
            return nxt, outputs

        _, outputs = jax.lax.fori_loop(0, n_clock, clock, (zero_pl, outputs))
        return jax.tree.map(lambda a: jax.lax.psum(a, axis_name), outputs)

    try:
        from jax import shard_map

        fn = shard_map(
            stage_fn, mesh=mesh,
            in_specs=(P(axis_name), P(), P()), out_specs=P(),
            check_vma=False,
        )
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

        fn = shard_map(
            stage_fn, mesh=mesh,
            in_specs=(P(axis_name), P(), P()), out_specs=P(),
            check_rep=False,
        )
    return fn(layer_xs, payload_mb, consts)
