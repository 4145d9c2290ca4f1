"""Mesh construction and sharded execution.

Design (scaling-book recipe): pick a 1-D mesh over all chips, shard the
read-batch axis with `P("dp")`, leave every model table replicated, and
let XLA insert any collectives.  Classification needs zero cross-device
communication — reads are independent — so scaling is bounded only by
host IO and batch skew.  The single collective in the whole program is
the global-histogram psum during estimation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("dp",))


def shard_batch(mesh: Mesh, *arrays):
    """Place each (B, ...) array with the leading axis sharded over dp."""
    out = []
    for a in arrays:
        spec = P("dp", *([None] * (np.ndim(a) - 1)))
        out.append(jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec)))
    return out if len(out) > 1 else out[0]


def psum_histogram(mesh: Mesh, local_hist: np.ndarray) -> jnp.ndarray:
    """All-reduce per-host/per-shard partial k-mer count histograms.

    Replaces the reference's single-threaded global histogram load
    (process_global_hist, hist.c:28-143) for the distributed setting:
    every host counts its shard of reads, then one psum makes the global
    histogram identical everywhere."""
    from jax.experimental.shard_map import shard_map

    n = mesh.devices.size
    stacked = jnp.asarray(np.broadcast_to(local_hist, (n,) + local_hist.shape))

    def _sum(h):
        return jax.lax.psum(h, axis_name="dp")

    f = shard_map(_sum, mesh=mesh, in_specs=P("dp", None), out_specs=P("dp", None))
    return f(stacked)[0]


def sharded_classify(mesh: Mesh, fblobs: np.ndarray, iblobs: np.ndarray,
                     PP, dims: tuple):
    """Run the full classification program data-parallel over the mesh.

    fblobs (D, Lf) / iblobs (D, Li): one transfer-blob pair per device
    (each packs that device's read shard — engine.pack_chunk layout);
    dims are the per-shard static dims.  Returns (D, Bn, max_n) int8.
    Zero collectives: each device classifies its own shard (the blob
    axis is sharded over dp, so XLA partitions the vmapped program
    one shard per device)."""
    from classpro_tpu.tpu.device_pipeline import classify_batch_dev

    fb = shard_batch(mesh, fblobs)
    ib = shard_batch(mesh, iblobs)

    fn = jax.jit(
        jax.vmap(lambda f, i: classify_batch_dev(f, i, PP, *dims)),
        out_shardings=NamedSharding(mesh, P("dp", None, None)))
    return fn(fb, ib)
