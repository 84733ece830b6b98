"""Torch-format checkpoint import/export shim.

SURVEY.md §5 "Checkpoint / resume": checkpoint-format parity with the
reference is a north-star item [B].  The reference persists one
``torch.save`` file bundling model params, optimizer state, and step
[H; exact schema unverifiable — the reference mount was empty, see
SURVEY provenance].  This shim provides the bridge in both directions:

* :func:`export_torch` — writes our state as a torch checkpoint: a flat
  ``{dotted.path: torch.Tensor}`` state dict for params/opt/bottleneck
  state plus ``step`` and the full config JSON.
* :func:`import_torch` — loads such a file (or any flat torch state dict
  following the same naming) back into our pytree structures by key path.

Keys are derived from the pytree paths (e.g.
``params.wavenet.layers.3.w_cond.w``), so a torch-side reimplementation can
address every tensor by name.
"""

from __future__ import annotations

import json

import jax
import numpy as np

from ae_wavenet_tpu.utils import config as config_mod


def _key_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return ".".join(parts)


def flatten_named(tree) -> dict:
    """pytree -> {dotted_path: np.ndarray}."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_key_str(path): np.asarray(leaf) for path, leaf in flat}


def unflatten_named(ref_tree, named: dict):
    """Rebuild ``ref_tree``'s structure from {dotted_path: array}."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(ref_tree)
    leaves = []
    missing = []
    for path, ref_leaf in paths_and_leaves:
        k = _key_str(path)
        if k not in named:
            missing.append(k)
            continue
        v = np.asarray(named[k])
        if v.shape != tuple(ref_leaf.shape):
            # torch round-trips 0-d tensors as shape (1,); reshape when the
            # element count matches, reject real mismatches
            if v.size == int(np.prod(ref_leaf.shape, dtype=np.int64)):
                v = v.reshape(tuple(ref_leaf.shape))
            else:
                raise ValueError(
                    f"checkpoint tensor {k} has shape {v.shape}, expected "
                    f"{tuple(ref_leaf.shape)}"
                )
        leaves.append(v.astype(ref_leaf.dtype))
    if missing:
        raise KeyError(f"checkpoint is missing {len(missing)} tensors, e.g. "
                       f"{missing[:5]}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_torch(path: str, step: int, tree: dict,
                 cfg: config_mod.RunConfig) -> None:
    """tree: {'params', 'opt_state', 'bn_state'} pytrees."""
    import torch

    def to_tensor(v: np.ndarray):
        # torch.from_numpy rejects ml_dtypes (bfloat16); widen to f32
        if v.dtype.kind not in "fiub" or v.dtype.itemsize == 2 and v.dtype.kind == "f" and v.dtype != np.float16:
            v = v.astype(np.float32)
        return torch.from_numpy(np.ascontiguousarray(v).copy())

    payload = {
        "step": int(step),
        "run_config_json": config_mod.to_json(cfg),
        "state": {k: to_tensor(v) for k, v in flatten_named(tree).items()},
    }
    torch.save(payload, path)


def import_torch(path: str, ref_tree: dict):
    """-> (step, tree matching ref_tree's structure, RunConfig)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    named = {k: v.numpy() for k, v in payload["state"].items()}
    tree = unflatten_named(ref_tree, named)
    cfg = config_mod.from_json(payload["run_config_json"])
    return int(payload["step"]), tree, cfg
