"""Device mesh and sharding rules.

The reference's only parallelism is single-process multi-GPU data parallel
with hand-tuned uneven shard tables (/root/reference/utils/data_parallel.py:
8-132). The TPU-native replacement is a ``jax.sharding.Mesh`` with two axes:

* ``dp`` — data parallel over the flattened sequence axis (the natural
  analogue of what ``scatter_imbalance`` splits); no imbalance hack is needed
  because loss/metrics are computed on device and TPU cores are homogeneous;
* ``mp`` — optional tensor parallel (Megatron-style column/row sharding of the
  attention QKV / MLP matrices and vocab sharding of the embedding table),
  expressed purely as sharding constraints — XLA GSPMD inserts the
  all-reduce/all-gather collectives over ICI.

Gradient reduction across ``dp`` is likewise inserted by the partitioner when
the jitted train step consumes dp-sharded batches and produces replicated
parameter updates.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP, MP = "dp", "mp"


def make_mesh(n_devices: Optional[int] = None, mp: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % mp == 0, (n_devices, mp)
    arr = np.asarray(devices).reshape(n_devices // mp, mp)
    return Mesh(arr, (DP, MP))


def local_mesh(mp: int = 1) -> Mesh:
    """dp(+mp) mesh over THIS process's addressable devices only.

    Data-sharded eval (-eval_data_sharded) runs an independent computation
    per process over its own loader shard; this mesh spreads that
    computation across all local chips instead of idling everything but
    device 0. Distinct from make_mesh, which spans the global device list
    and requires every process to participate in the same jit."""
    return make_mesh(devices=jax.local_devices(), mp=mp)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (flattened-sequence) axis over dp, replicate over mp."""
    return NamedSharding(mesh, P(DP))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- tensor-parallel parameter layout ---------------------------------------

def param_spec(path: Tuple[str, ...]) -> P:
    """Megatron-style sharding rules keyed on the torch-mirroring path.

    Column-parallel (shard output dim): QKV projections, FFN up-projection,
    co-attention QKV. Row-parallel (shard input dim): attention output dense,
    FFN down-projection, biOutput projections. Vocab-shard the embedding
    table. Everything small is replicated.
    """
    name = ".".join(path)
    if path[-1] != "kernel":
        if path[-1] == "word_embeddings":
            return P(MP, None)
        return P()
    col = (".self.query.", ".self.key.", ".self.value.", "intermediate.dense",
           "biattention.query", "biattention.key", "biattention.value")
    # NOTE: the connection layers name their FFN down-projections
    # v_output.dense / t_output.dense — ".output.dense" does not match them
    row = ("attention.output.dense", ".output.dense", "v_output.dense",
           "t_output.dense", "biOutput.dense", "biOutput.q_dense")
    if any(s in name or name.endswith(s.strip(".")) for s in col):
        return P(None, MP)
    if any(s in name for s in row):
        return P(MP, None)
    return P()


def _spec_tree(params):
    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return param_spec(path)
    return rec(params, ())


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the parameter tree (divisibility-checked:
    falls back to replication when a dim doesn't divide the mp axis)."""
    mp_size = mesh.shape[MP]

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        spec = param_spec(path)
        for dim, axis in enumerate(spec):
            if axis == MP and node.shape[dim] % mp_size != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return rec(params, ())


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings), shardings


def mesh_process_count(mesh: Mesh) -> int:
    return len({d.process_index for d in mesh.devices.flat})


@functools.lru_cache(maxsize=8)
def _gather_fn(mesh: Mesh):
    return jax.jit(lambda x: x, out_shardings=replicated(mesh))


def gather_to_host(tree, mesh: Mesh, max_bytes: int = 256 * 1024 * 1024):
    """Fetch a (dp/mp-)sharded pytree to host numpy on every process
    (cross-host shards are not directly addressable to ``device_get``).

    Gathers in GROUPS of leaves bounded by ``max_bytes`` of replicated
    device memory: replicating a whole mp-sharded train state (params +
    both Adam moments) at once would OOM exactly the sharded-model case mp
    exists for, while gathering leaf-by-leaf costs one cross-process
    collective dispatch per leaf (~400 for a full train state — minutes
    over Gloo/DCN, measured in the 2-process resume test). Leaves larger
    than the budget still go alone (same bound as leaf-wise)."""
    if mesh_process_count(mesh) == 1:
        return jax.device_get(tree)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    g = _gather_fn(mesh)
    out, group, group_bytes = [], [], 0

    def flush():
        nonlocal group, group_bytes
        if group:
            out.extend(jax.device_get(g(group)))
            group, group_bytes = [], 0

    for leaf in leaves:
        nbytes = getattr(leaf, "nbytes", np.asarray(leaf).nbytes)
        if group and group_bytes + nbytes > max_bytes:
            flush()
        group.append(leaf)
        group_bytes += nbytes
    flush()
    return jax.tree_util.tree_unflatten(treedef, out)


def restore_placement(template_tree, host_tree):
    """Re-establish a restored host state's pre-restore placement: leaves
    whose template carries a NamedSharding (mesh-sharded params and the
    Adam moments tx.init derived from them) go back to their shardings —
    replicating the moments would OOM exactly the sharded-model case —
    while everything else (scalar counts, rng) stays uncommitted so jit may
    place it freely."""
    def put(tmpl, v):
        s = getattr(tmpl, "sharding", None)
        if isinstance(s, jax.sharding.NamedSharding):
            return jax.device_put(v, s)
        return jnp.asarray(v)

    return jax.tree_util.tree_map(put, template_tree, host_tree)


def shard_batch(batch, mesh: Mesh):
    """dp-shard each array's leading axis; arrays whose leading dim does not
    divide the dp axis (e.g. a 100-candidate dense slate on an 8-way mesh)
    are replicated instead.

    Multi-process meshes: each process passes its PROCESS-LOCAL rows (the
    slice its DataLoader produced, loader.py process sharding) and the global
    batch is assembled with jax.make_array_from_process_local_data — no
    host-global arrays exist anywhere, matching how multi-host JAX feeds a
    dp axis that spans hosts over DCN. Arrays that end up replicated must be
    identical on every process (true for everything the CLIs build:
    nsp_weight, dense slates)."""
    s = batch_sharding(mesh)
    r = replicated(mesh)
    dp = mesh.shape[DP]
    nproc = mesh_process_count(mesh)

    def put_replicated(v):
        v = np.asarray(v)
        if nproc == 1:
            return jax.device_put(v, r)
        return jax.make_array_from_process_local_data(r, v, v.shape)

    def put(v):
        v = np.asarray(v) if not hasattr(v, "shape") else v
        if nproc == 1:
            ok = getattr(v, "ndim", 0) >= 1 and v.shape[0] % dp == 0
            return jax.device_put(v, s if ok else r)
        v = np.asarray(v)
        gdim = v.shape[0] * nproc if v.ndim >= 1 else 0
        if v.ndim >= 1 and gdim % dp == 0:
            return jax.make_array_from_process_local_data(
                s, v, (gdim,) + v.shape[1:])
        if v.ndim >= 1:
            # the single-process fallback (replicate a non-divisible array)
            # is UNSOUND here: each process holds different rows, and XLA
            # assumes replicated operands are identical — silent divergence.
            # Fail loudly instead.
            raise ValueError(
                f"multi-process shard_batch: array of local shape {v.shape} "
                f"(global leading dim {gdim}) does not divide the dp axis "
                f"({dp}); pad the per-process batch, or stage genuinely "
                f"replicated arrays outside shard_batch")
        return jax.make_array_from_process_local_data(r, v, v.shape)

    # group-level loss normalisers are per-GROUP scalars/tiny vectors,
    # identical on every process by construction (length_bucket_morsels
    # syncs them) — never rows to shard (a [2] nsp_norm_counts would
    # otherwise look dp-divisible and be row-split)
    repl_keys = ("lm_norm", "img_norm", "nsp_norm_counts", "nsp_weight")
    return {k: (put_replicated(v) if k in repl_keys else put(v))
            for k, v in batch.items()}
