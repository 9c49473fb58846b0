"""Device-mesh data parallelism.

The reference's only distribution is single-process multi-GPU
``torch.nn.DataParallel`` (reference tools/train.py:99-101): replicate the
module, scatter the batch, reduce grads on device 0.  The TPU-native
superset: ONE jit program over a 1-D ``Mesh('data')`` — the batch is sharded
with ``NamedSharding(P('data'))``, params are replicated, and XLA inserts the
gradient psum over ICI.  Multi-host (DCN) falls out of
``jax.distributed.initialize`` + the same program.

At this model scale (≈55M params) TP/PP are unnecessary; the mesh is built
with named axes so tensor-parallel rules can slot in later without changing
the step functions.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names=("data",)) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put every array leaf with its leading dim over 'data'.
    Non-array values (gts lists, infos) pass through untouched."""
    s = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or hasattr(v, "dtype"):
            out[k] = jax.device_put(v, s)
        else:
            out[k] = v
    return out


def replicate_state(state, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), state)


def pad_batch_to(batch: Dict[str, Any], multiple: int):
    """Pad the image dimension so it divides the mesh (repeat last rows;
    extra rows only add compute, their grads average in — harmless for DP
    throughput tests; the train loop sizes batches divisibly instead)."""
    b = None
    for v in batch.values():
        if hasattr(v, "shape"):
            b = v.shape[0]
            break
    pad = (-b) % multiple
    if pad == 0:
        return batch
    # wrap rows round-robin: v[-pad:] would under-pad whenever pad > b
    # (e.g. b=3 -> multiple=8 needs 5 extra rows from a 3-row batch)
    idx = np.arange(pad) % b
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape"):
            out[k] = np.concatenate([v, np.asarray(v)[idx]], axis=0)
        else:
            out[k] = v
    return out


def param_partition_specs(params):
    """Tensor-parallel partition rules (SURVEY.md §2.6: one sharding-rules
    table so TP slots in without touching the step functions).

    Megatron-style layout over the 'model' axis:
      * attention wq/wk/wv and FFN up-projection: shard the OUTPUT features
        (column parallel),
      * attention wo and FFN down-projection: shard the INPUT features
        (row parallel) — XLA inserts the psum,
      * embeddings/generator: shard the vocab/feature dim,
      * everything else (norms, biases of row-parallel layers, heads)
        replicated.
    """
    from jax.tree_util import tree_map_with_path

    def spec(path, x):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = "/".join(str(k) for k in keys)
        if x.ndim == 2:
            if any(f"/{k}/" in name or name.endswith(f"/{k}/kernel")
                   for k in ("wq", "wk", "wv")):
                return P(None, "model")
            if "/wo/" in name:
                return P("model", None)
            if "/ffn/Dense_0/" in name:
                return P(None, "model")
            if "/ffn/Dense_1/" in name:
                return P("model", None)
            if "generator" in name and name.endswith("kernel"):
                return P(None, "model")
            if "embedding" in name:
                return P(None, None)
        return P()

    return tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """device_put params per the TP rules (no 'model' axis in the mesh ->
    everything replicates)."""
    specs = param_partition_specs(params)
    have_model = "model" in mesh.axis_names and \
        mesh.shape.get("model", 1) > 1

    def put(x, s):
        if not have_model:
            s = P()
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(put, params, specs)
