"""Device mesh + sharding for data-parallel training and batched sampling.

TPU-native replacement for the reference's Lightning DDP/NCCL stack
(configs/flowmol3.yml:9-12, adaptive_sampler.py:18-29): a 1-D `data` mesh,
batches sharded over it, parameters replicated, gradient reduction inserted
by GSPMD over ICI.

The molecule axis (atoms) is never sharded — molecules are small; we shard
the batch, exactly as SURVEY.md §2.2 prescribes.  An optional `edge` mesh
axis shards the O(N^2) pairwise-message tensors of very large molecules
across chips (sequence-parallel analogue); off by default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (molecules) of every array in the batch."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh, axis_name: str = "data"):
    """Apply batch sharding to every leaf (axis 0 = molecule axis)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def jit_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """jit the train step with state replicated and batch sharded over data.

    GSPMD derives the gradient all-reduce (psum over ICI) automatically from
    the output sharding constraint — no explicit collectives needed.
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    # note: no buffer donation — donation triggers backend errors on the
    # remote-TPU (axon) platform
    return jax.jit(
        train_step,
        in_shardings=(repl, bsh, repl, None),
        out_shardings=(repl, repl),
    )


def jit_sample_fn(sample_fn, mesh: Mesh, axis_name: str = "data"):
    """jit a (params, rng, node_mask) sampler with the molecule batch sharded."""
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    return jax.jit(sample_fn, in_shardings=(repl, repl, bsh))


def make_mesh_2d(n_data: int, n_edge: int) -> Mesh:
    """2-D ('data', 'edge') mesh: batch over `data`, the destination-row axis
    of every O(N^2) pair tensor over `edge` (see parallel/pairshard.py).  Use
    n_data=1, n_edge=D to spread one giant molecule's pair blocks over D
    chips; `n_edge` should divide the padded bucket size for even shards."""
    devs = jax.devices()[:n_data * n_edge]
    if len(devs) < n_data * n_edge:
        raise ValueError(f"need {n_data * n_edge} devices, "
                         f"have {len(jax.devices())}")
    return Mesh(np.array(devs).reshape(n_data, n_edge), ("data", "edge"))


def pair_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, N_dst, N_src, ...) pair tensors on a 2-D mesh."""
    return NamedSharding(mesh, P("data", "edge"))


def jit_sample_fn_2d(sample_fn, mesh: Mesh):
    """jit a (params, rng, node_mask) sampler over a ('data', 'edge') mesh:
    molecule batch sharded over `data`, pair tensors sharded over `edge` via
    the pairshard trace context.  GSPMD inserts the node-feature all-gathers
    and keeps the per-destination-row message reduction chip-local."""
    from flowmol_tpu.parallel.pairshard import pair_sharding

    repl = replicated(mesh)
    bsh = NamedSharding(mesh, P("data"))
    psh = pair_sharding_2d(mesh)

    def wrapped(params, rng, node_mask):
        with pair_sharding(psh):
            return sample_fn(params, rng, node_mask)

    return jax.jit(wrapped, in_shardings=(repl, repl, bsh))


def jit_forward_2d(forward_fn, mesh: Mesh, n_batch_args: int = 1):
    """jit an arbitrary forward fn (params, *batch_arrays) over a 2-D mesh:
    every batch array sharded over `data` on axis 0, pair tensors created
    inside sharded over `edge`."""
    from flowmol_tpu.parallel.pairshard import pair_sharding

    repl = replicated(mesh)
    bsh = NamedSharding(mesh, P("data"))
    psh = pair_sharding_2d(mesh)

    def wrapped(params, *batch):
        with pair_sharding(psh):
            return forward_fn(params, *batch)

    return jax.jit(wrapped,
                   in_shardings=(repl,) + (bsh,) * n_batch_args)


def shard_global_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Multi-process sharding: every host builds the identical global batch
    (shared batcher schedule → identical compiled programs/collectives on all
    hosts), then contributes only its contiguous row slice to the global
    array.  The global batch size must divide jax.process_count()."""
    h, n_hosts = jax.process_index(), jax.process_count()
    sh = batch_sharding(mesh, axis_name)

    def put(a):
        a = np.asarray(a)
        b = a.shape[0]
        per = b // n_hosts
        if per * n_hosts != b:
            raise ValueError(
                f"global batch size {b} not divisible by {n_hosts} hosts")
        local = a[h * per:(h + 1) * per]
        return jax.make_array_from_process_local_data(sh, local, a.shape)

    return jax.tree.map(put, batch)


def shard_local_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Multi-process sharding from LOCAL rows: each host passes only its own
    prepared row slice (see MoleculeDataModule.iter_split(local_rows=...));
    the global array is assembled across processes without any host ever
    materializing rows it doesn't own.  Replaces `shard_global_batch`'s
    prepare-everything-then-slice flow for the training path."""
    n_hosts = jax.process_count()
    sh = batch_sharding(mesh, axis_name)

    def put(a):
        a = np.asarray(a)
        global_shape = (a.shape[0] * n_hosts,) + a.shape[1:]
        return jax.make_array_from_process_local_data(sh, a, global_shape)

    return jax.tree.map(put, batch)


def per_host_slice(n_total: int, host_id: int, n_hosts: int) -> slice:
    """Contiguous per-host dataset fraction, mirroring the reference's
    rank-aware sharding (adaptive_sampler.py:22-29)."""
    per = n_total // n_hosts
    start = host_id * per
    end = n_total if host_id == n_hosts - 1 else start + per
    return slice(start, end)
