"""Device mesh + sharding rules — the framework's entire "distributed backend".

Replaces the reference's NCCL/DDP/FSDP/ZeRO plumbing (ref: trainer.py:254-386,
fairseq distributed_utils; SURVEY.md §2.7) with JAX GSPMD: pick a mesh,
annotate shardings, let XLA insert the collectives over ICI.

Axes:
  data  — batch sharding (DDP equivalent; gradient psum inserted by XLA)
  fsdp  — parameter/optimizer-state sharding (ZeRO/FSDP equivalent);
          parameters are sharded on their largest dim and all-gathered
          per layer by XLA automatically
  model — tensor parallelism: attention heads / FFN hidden / vocab sharded

A single-axis mesh of N devices with data=N reproduces the reference's pure
DDP run; fsdp>1 reproduces ``--ddp-backend fully_sharded``; model>1 gives the
Megatron path the reference only stubs (train.py:155-158).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA, FSDP, MODEL, PIPE, SEQ = "data", "fsdp", "model", "pipe", "seq"


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    d, f, m, pp, s = cfg.axis_sizes(len(devices))
    arr = np.asarray(devices).reshape(d, f, m, pp, s)
    return Mesh(arr, (DATA, FSDP, MODEL, PIPE, SEQ))


# ---------------------------------------------------------------------------
# parameter sharding rules
# ---------------------------------------------------------------------------
# Rules are matched against the flattened param path. First match wins.
# Layer-stacked leaves have a leading L axis (never sharded).
#
# Tensor-parallel choices (standard Megatron layout on the MXU):
#   attention q/k/v: out dim (heads) on MODEL;   out_proj: in dim on MODEL
#   fc1: out dim on MODEL;                        fc2: in dim on MODEL
#   embed_tokens: vocab dim on FSDP (all-gathered once per step)
# FSDP shards the largest remaining dim of every big leaf.

_RULES = [
    # path regex, spec builder (takes ndim incl. any leading L axis)
    (r"embed_tokens$", lambda nd: P(FSDP, MODEL)),
    (r"(self_attn|encoder_attn)\.(q|k|v)_proj\.w$", lambda nd: _stacked(nd, P(None, FSDP, MODEL))),
    (r"(self_attn|encoder_attn)\.(q|k|v)_proj\.b$", lambda nd: _stacked(nd, P(None, MODEL))),
    (r"(self_attn|encoder_attn)\.out_proj\.w$", lambda nd: _stacked(nd, P(None, MODEL, FSDP))),
    (r"fc1\.w$", lambda nd: _stacked(nd, P(None, FSDP, MODEL))),
    (r"fc1\.b$", lambda nd: _stacked(nd, P(None, MODEL))),
    (r"fc2\.w$", lambda nd: _stacked(nd, P(None, MODEL, FSDP))),
    (r"ffn_layernorm\.(scale|bias)$", lambda nd: _stacked(nd, P(None, MODEL))),
    # big non-layer matrices: shard on fsdp
    (r"(pos_q_linear|pos_k_linear|self_pos_q_linear|self_pos_k_linear|"
     r"cross_pos_q_linear|cross_pos_k_linear|image_proj)\.w$", lambda nd: P(FSDP, None)),
    (r"embed_positions$|embed_image_positions$", lambda nd: P(FSDP, None)),
    (r"rel_pos_table$", lambda nd: P(None, FSDP, None)),
    # resnet convs: shard output channels on fsdp where big
    (r"conv\d$|downsample_conv$|conv1$", lambda nd: _conv_spec(nd)),
]


def _stacked(ndim: int, spec: P) -> P:
    """Use `spec` if the leaf has the leading layer axis, else drop it."""
    if ndim == len(spec):
        return spec
    assert ndim == len(spec) - 1
    return P(*spec[1:])


def _conv_spec(ndim: int) -> P:
    if ndim == 4:  # HWIO
        return P(None, None, None, FSDP)
    if ndim == 5:  # stacked L,HWIO
        return P(None, None, None, None, FSDP)
    return P()


def param_spec(path: str, ndim: int) -> P:
    for pat, builder in _RULES:
        if re.search(pat, path):
            spec = builder(ndim)
            if len(spec) <= ndim:
                return spec
    return P()  # replicate small leaves


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on dims the mesh can't divide evenly (e.g. the 1765-row
    embed_image_positions table) — replication is always correct."""
    out = []
    for i, axes in enumerate(spec):
        if axes is None:
            out.append(None)
            continue
        names = (axes,) if isinstance(axes, str) else tuple(axes)
        size = int(np.prod([mesh.shape[n] for n in names]))
        out.append(axes if shape[i] % size == 0 else None)
    return P(*out)


def _tree_paths(tree, prefix=""):
    for k, v in tree.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _tree_paths(v, path + ".")
        elif v is not None:
            yield path, v


def _is_layer_stacked(path: str) -> bool:
    """Leaves whose leading axis is the transformer layer axis."""
    return ".layers." in path or path.endswith("rel_pos_table")


def param_shardings(mesh: Mesh, params) -> Any:
    """Pytree of NamedShardings matching `params`."""
    pipe_on = PIPE in mesh.shape and mesh.shape[PIPE] > 1

    def walk(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}{k}"
            if isinstance(v, dict):
                out[k] = walk(v, path + ".")
            elif v is None:
                out[k] = None
            else:
                spec = param_spec(path, np.ndim(v))
                if pipe_on and _is_layer_stacked(path) and np.ndim(v) >= 1:
                    # pipeline stages own contiguous layer shards
                    rest = list(spec[1:]) if len(spec) > 1 else []
                    rest += [None] * (np.ndim(v) - 1 - len(rest))
                    spec = P(PIPE, *rest)
                spec = _fit_spec(spec, np.shape(v), mesh)
                out[k] = NamedSharding(mesh, spec)
        return out

    return walk(params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over data(+fsdp) axes."""
    return NamedSharding(mesh, P((DATA, FSDP)))


def batch_spec() -> P:
    return P((DATA, FSDP))


def accum_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[accum, batch, ...] arrays: shard the batch (2nd) axis."""
    return NamedSharding(mesh, P(None, (DATA, FSDP)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Device-put params with the framework sharding rules."""
    sh = param_shardings(mesh, params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s) if s is not None else p,
        params,
        sh,
        is_leaf=lambda x: x is None or not isinstance(x, dict),
    )
