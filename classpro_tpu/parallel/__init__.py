"""Device-mesh data parallelism (multi-chip / multi-host).

The method has no model state to shard: parallelism is pure DP over
reads (mirroring the reference's pthread block partition,
ClassPro.c:574-578), expressed as a 1-D `jax.sharding.Mesh` with the
batch axis sharded and all probability tables replicated.  The only
collective in the entire program is one `psum` of per-host partial count
histograms during global estimation (replaces the single-threaded
process_global_hist, hist.c:28).
"""

from classpro_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_mesh,
    psum_histogram,
    shard_batch,
    sharded_classify,
)
