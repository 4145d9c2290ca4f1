"""Mesh construction and sharded kernels.

Design (scaling-book recipe): pick a 1-D mesh over all chips, annotate
the batch axis of every per-read array with `P("dp")`, leave tables
replicated, and let XLA insert any collectives.  Classification needs
zero cross-device communication — reads are independent — so scaling is
bounded only by host IO and batch skew.
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


def sharded_rel_dp(mesh: Mesh, batch_args: tuple, relp, fwd: bool, max_m: int):
    """Run the reliable-interval DP with the batch axis sharded over the
    mesh (each chip processes its block of reads; no collectives)."""
    from classpro_tpu.tpu.rel_dev import rel_dp_pass

    b, e, ccb, cce, pe, m, plen, cov = shard_batch(mesh, *batch_args)
    return rel_dp_pass(b, e, ccb, cce, pe, m, plen, cov, relp,
                       fwd=fwd, max_m=max_m)
