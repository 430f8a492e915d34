"""GPipe-style pipeline parallelism over a mesh axis (shard_map + ppermute).

The reference only forwards a pipeline_model_parallel flag to fairseq
(ref: trainer.py:110-122); here the primitive is TPU-native: stacked layer
parameters are sharded on their LAYER axis across the ``pipe`` mesh axis,
microbatches flow stage-to-stage over ICI with ``jax.lax.ppermute``, and the
whole schedule is one jitted program.

Schedule (M microbatches, P stages, M ≥ P): at clock t, stage s processes
microbatch (t - s) when 0 ≤ t - s < M; total M + P - 1 clocks. Bubble
fraction = (P-1)/(M+P-1).

``pipeline_scan`` is the building block: it replaces a
``lax.scan(body, x, layers)`` over L stacked layers with a P-stage pipeline,
each stage scanning its local L/P layers. Equivalence with the plain scan is
tested on the virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_scan(
    body: Callable[[jnp.ndarray, Any], jnp.ndarray],
    x_microbatches: jnp.ndarray,  # [M, mb, ...] replicated input microbatches
    layer_xs: Any,  # pytree with leading layer axis [L, ...]
    mesh: Mesh,
    axis_name: str = "pipe",
) -> jnp.ndarray:
    """Run `body` over all L layers as a P-stage pipeline → [M, mb, ...].

    body(x, one_layer_xs) -> x  (one layer's forward)
    Requires L % P == 0 and M ≥ 1. Output is fully replicated.
    """
    M = x_microbatches.shape[0]
    P_stages = mesh.shape[axis_name]
    L = jax.tree.leaves(layer_xs)[0].shape[0]
    assert L % P_stages == 0, f"layers {L} not divisible by stages {P_stages}"

    layer_sharding = NamedSharding(mesh, P(axis_name))
    layer_xs = jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, layer_sharding), layer_xs
    )

    def stage_fn(local_layers, x_mb):
        # inside shard_map: local_layers leading dim = L/P
        s = jax.lax.axis_index(axis_name)
        n_clock = M + P_stages - 1

        def run_local(x):
            def scan_body(h, one):
                return body(h, one), None

            out, _ = jax.lax.scan(scan_body, x, local_layers)
            return out

        zero = jnp.zeros_like(x_mb[0])
        outputs = jnp.zeros_like(x_mb)

        def clock(t, carry):
            incoming, outputs = carry
            # stage 0 ingests microbatch t; others use the incoming buffer
            mb_idx = jnp.clip(t, 0, M - 1)
            x_in = jnp.where(s == 0, x_mb[mb_idx], incoming)
            active = jnp.logical_and(t - s >= 0, t - s < M)
            y = run_local(x_in)
            y = jnp.where(active, y, zero)
            # last stage writes its finished microbatch (index t - (P-1))
            out_idx = jnp.clip(t - (P_stages - 1), 0, M - 1)
            write = jnp.logical_and(s == P_stages - 1, active)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(write, y, outputs[out_idx]),
                out_idx,
                axis=0,
            )
            # pass activations to the next stage over ICI
            nxt = jax.lax.ppermute(
                y, axis_name,
                [(i, (i + 1) % P_stages) for i in range(P_stages)],
            )
            return nxt, outputs

        _, outputs = jax.lax.fori_loop(0, n_clock, clock, (zero, outputs))
        # non-last stages never write → their buffers are zero; psum replicates
        # the last stage's outputs to every stage
        return jax.lax.psum(outputs, axis_name)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(layer_xs, x_microbatches)
