"""Device mesh + sharding layouts.

Replaces the reference's distribution substrate (SURVEY.md §2.3/§2.4):
Spark/TensorFlowOnSpark placed TF parameter servers (whole embedding tables
on PS tasks, gRPC gather/update traffic) and async workers. TPU-native
equivalent: a ``jax.sharding.Mesh`` with axes ``('data', 'model')`` —

- **'model'**: embedding tables are **row-sharded** (each shard owns a
  contiguous row range); the PS gather becomes a masked local gather +
  ``psum`` over 'model' riding ICI.
- **'data'**: the training triples are edge-partitioned; each data shard
  draws positives from its own contiguous triple slice (the reference
  gave each Spark worker a triple partition) and gradients flow back with
  an ``all_gather`` of (ids, row-grads) over 'data'.

Synchronous SPMD replaces the reference's Hogwild-async PS updates — the
per-step math matches the single-worker reference exactly; the
multi-worker numerics delta (sync vs async) is by design (DESIGN.md).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openkeonspark_tpu.sampling.device import DeviceSampler
from openkeonspark_tpu.train.step import TrainState

DATA, MODEL = "data", "model"


def make_mesh(shape: Tuple[int, int] = (1, 1),
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh of shape (data, model). ``shape=(−1, m)`` uses all devices."""
    devices = list(devices if devices is not None else jax.devices())
    d, m = shape
    if d == -1:
        d = len(devices) // m
    if d * m != len(devices):
        devices = devices[: d * m]
    arr = np.array(devices).reshape(d, m)
    return Mesh(arr, (DATA, MODEL))


def table_spec(flat: bool = False) -> P:
    """Embedding-table row sharding. ``flat=False``: rows over 'model',
    replicated over 'data' (the legacy psum step's layout). ``flat=True``:
    rows over the WHOLE (data×model) grid — the owner-directed exchange
    step's layout, where every update row crosses the wire exactly once
    and per-device table memory shrinks by another data-axis factor."""
    return P((DATA, MODEL), None) if flat else P(MODEL, None)


def _put_global(x, sharding: NamedSharding):
    """Place process-local data as a global array on a (possibly
    multi-process) mesh. ``jax.device_put`` requires an addressable
    sharding, so true multi-host runs (cli/launch.py) need the
    callback form — every process holds identical full copies (fresh
    init with the same seed, or an orbax restore), so slicing locally
    yields a consistent global array."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_state(state: TrainState, mesh: Mesh,
                flat: bool = False) -> TrainState:
    """Place params + opt state row-sharded per :func:`table_spec`. Table
    row counts must be divisible by the sharded axis size (init with
    ``pad_to_multiple=M`` for the legacy layout, ``=D·M`` for ``flat``;
    padding to ``D·M`` always is safe for both)."""
    tspec = NamedSharding(mesh, table_spec(flat))
    rspec = NamedSharding(mesh, P())

    def put_tables(tree):
        return jax.tree_util.tree_map(
            lambda x: _put_global(x, tspec) if getattr(x, "ndim", 0) == 2
            else _put_global(x, rspec), tree)

    return TrainState(params=put_tables(state.params),
                      opt_state=put_tables(state.opt_state),
                      step=_put_global(state.step, rspec))


def shard_sampler(sampler: DeviceSampler, mesh: Mesh) -> DeviceSampler:
    """Replicate the triple store + CSR indexes on every device.

    The store is modest (a 10M-triple KG ≈ a few hundred MB) and every
    data shard needs global complement windows, so full replication is the
    right trade at this scale; row-sharding the store itself is a
    larger-scale follow-up (DESIGN.md)."""
    rspec = NamedSharding(mesh, P())
    children, aux = sampler.tree_flatten()
    placed = jax.tree_util.tree_map(lambda c: _put_global(c, rspec),
                                    children)
    return DeviceSampler.tree_unflatten(aux, placed)
