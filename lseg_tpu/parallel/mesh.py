"""Device mesh + sharding layout for LSeg-TPU.

TPU-native replacement for the reference's PyTorch-Lightning DDP/NCCL
stack (reference: utils.py:20-34 — `accelerator="ddp"`, `gpus=-1`,
`sync_batchnorm=True`) and its thread-based eval DataParallel
(additional_utils/models.py:183-248). Strategy (SURVEY.md §2.3):

- `data` axis: batch sharding; gradient/metric all-reduce is inserted by
  XLA's SPMD partitioner — there is no explicit collective code.
- `model` axis: optional tensor parallelism over the ViT's attention/MLP
  (Megatron layout: qkv/fc1 column-parallel, proj/fc2 row-parallel) and
  the correlation head's embedding dim. ViT-L fits on one chip, so TP is
  off (model=1) by default; the rules exist for larger backbones and for
  the dryrun multi-chip validation.

Multi-host: call `jax.distributed.initialize()` before `create_mesh`;
`jax.devices()` then spans hosts, ICI within a slice and DCN across —
the same code path, no changes.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Param-path regex -> PartitionSpec over the *trailing* dims. ViT blocks
# are scan-stacked, so their kernels carry a leading layer axis (None).
# Megatron-style TP: column-parallel into attention/MLP, row-parallel out.
_TP_RULES = [
    # HEAD-ALIGNED layout (ViTConfig.tp_layout=True; params via
    # checkpoint_convert.to_tp_layout): qkv (L, D, 3, H, hd) / proj
    # (L, H, hd, D) — shard the real head axis, so attention is fully
    # head-local and only proj's row-parallel contraction all-reduces.
    (r"vit/seg\d+/blocks/attn/qkv/kernel$",
     P(None, None, None, "model", None)),
    (r"vit/seg\d+/blocks/attn/qkv/bias$", P(None, None, "model", None)),
    (r"vit/seg\d+/blocks/attn/proj/kernel$",
     P(None, "model", None, None)),
    # stacked ViT blocks: (L, D, 3D) qkv & (L, D, 4D) fc1 -> shard out dim
    # (flat layout fallback — rank-matched, so these fire only when
    # tp_layout=False; GSPMD keeps it correct but re-lays out around the
    # head reshape)
    (r"vit/seg\d+/blocks/attn/qkv/kernel$", P(None, None, "model")),
    (r"vit/seg\d+/blocks/mlp/fc1/kernel$", P(None, None, "model")),
    # row-parallel back out: shard the contracted (input) dim
    (r"vit/seg\d+/blocks/attn/proj/kernel$", P(None, "model", None)),
    (r"vit/seg\d+/blocks/mlp/fc2/kernel$", P(None, "model", None)),
    # biases of column-parallel layers follow their out dim
    (r"vit/seg\d+/blocks/attn/qkv/bias$", P(None, "model")),
    (r"vit/seg\d+/blocks/mlp/fc1/bias$", P(None, "model")),
    # CLIP text tower (stacked): same layout
    (r"resblocks/blocks/attn/in_proj/kernel$", P(None, None, "model")),
    (r"resblocks/blocks/c_fc/kernel$", P(None, None, "model")),
    (r"resblocks/blocks/attn/out_proj/kernel$", P(None, "model", None)),
    (r"resblocks/blocks/c_proj/kernel$", P(None, "model", None)),
    (r"resblocks/blocks/attn/in_proj/bias$", P(None, "model")),
    (r"resblocks/blocks/c_fc/bias$", P(None, "model")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a params (or batch_stats/opt_state) tree:
    TP rules where they match and the leaf rank fits, replicated
    otherwise."""

    def leaf_sharding(path, leaf):
        s = _path_str(path)
        for pat, spec in _TP_RULES:
            if re.search(pat, s) and len(spec) == getattr(leaf, "ndim", -1):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the `data` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Shardings pytree for a full TrainState. The path rules match by
    suffix, so optimizer-state leaves (whose paths embed the param path,
    e.g. opt_state/.../trace/vit/seg0/blocks/attn/qkv/kernel) inherit the
    same TP layout as their params; everything else replicates."""
    return param_shardings(state, mesh)


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_devices_per_process: Optional[int] = None,
) -> None:
    """Multi-host bring-up (the reference's SLURM/NCCL multi-node path,
    utils.py:51-56 + sbatch_run.sh): call once per host before
    create_mesh; jax.devices() then spans all hosts, with ICI inside a
    slice and DCN across. No-ops on a single process with no coordinator
    (e.g. unit tests / single-chip dev).

    `cpu_devices_per_process` enables the CPU multi-process simulation
    (tests/multihost_worker.py): N virtual CPU devices per process with
    gloo cross-process collectives — the same code path real multi-host
    TPU takes, minus the hardware."""
    if coordinator is None and num_processes is None:
        return
    if cpu_devices_per_process:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
