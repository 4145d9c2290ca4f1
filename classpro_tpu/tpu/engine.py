"""Batched classification engine (the production path).

Stage split (see ARCHITECTURE.md):
  host C++  (csrc/classpro_host.cpp): FASTK profile decode, sequence
            context, wall-detection walk, reliable-interval selection,
            the two unreliable-relaxation sweeps, and assignment ->
            class-character expansion — the branchy, irregular work.
  device    (device_pipeline.rel_only_dev): the merged fw/bw
            reliable-interval Viterbi DP with rescue, demotion and
            reconciliation heuristics — the regular, batched f64 math.

The production entry is `classify_stream`: a depth-3 software pipeline
in which chunk k+1's host stages overlap chunk k's device program and
its result round trip (the ctypes calls and the background fetch
thread's device wait all release the GIL).  `classify_chunk` is the
synchronous single-chunk form; `_chunk_alldev` is a no-compiler
fallback that runs relaxation on device too (classify_batch_dev, also
used by the data-parallel mesh path).  Every path carries the
exactness guard: the stream recomputes flagged rows' rel stage with
the exact oracle; the all-device paths return per-read flags from
classify_batch_dev and flagged reads are reclassified whole by the
oracle.

Interval arrays are padded to bucketed shapes to bound jit
recompilation.  Byte-identity vs the reference binary is a measured
quantity (tests/test_tpu_engine.py), not an assumption.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)  # f64 decision path (ARCHITECTURE.md)

# NOTE on compilation: each (R, max_m) shape bucket compiles once per
# process (~30-40s on this platform's remote-compile path; the coarse
# _bucket_m ladder keeps the count low).  The persistent XLA
# compilation cache is deliberately NOT enabled: on this platform a
# cache-deserialized executable's FIRST execution takes ~7 minutes
# (measured 430s vs 0.1s after an in-process compile) — worse than
# recompiling.

from classpro_tpu.constants import DEFAULTS
from classpro_tpu.estimation import GlobalModel, build_global_model
from classpro_tpu.io.classfile import ClassRecord, class_header
from classpro_tpu.io.fastk import load_histogram, open_profiles
from classpro_tpu.io.fastx import read_fastx_checked
from classpro_tpu.numerics import LOGFACT
from classpro_tpu.tpu.device_pipeline import (build_pipeline_params,
                                              classify_batch_dev,
                                              rel_only_dev)

ERROR, REPEAT, HAPLO, DIPLO, N_STATE = 0, 1, 2, 3, 4
NEG_INF = float("-inf")

_IVDT = np.dtype([
    ("b", "<i4"), ("e", "<i4"), ("cb", "<i4"), ("ce", "<i4"),
    ("ccb", "<i4"), ("cce", "<i4"), ("is_rel", "<i4"), ("pad", "<i4"),
    ("pe", "<f8"), ("pe_o_b", "<f8"), ("pe_o_e", "<f8")])


def _bucket(x: int, lo: int = 8) -> int:
    """Round up to the next power of two (bounds jit recompilations)."""
    b = lo
    while b < x:
        b *= 2
    return b


def _bucket32(x: int) -> int:
    """Round up to a multiple of 32 (scan-length padding granularity)."""
    return max(32, (x + 31) // 32 * 32)


_M_LADDER = (32, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def _bucket_m(x: int) -> int:
    """Coarse interval-count buckets: the dynamic-trip scans make the
    padding nearly free, while each distinct shape is a separately
    compiled program (expensive on this platform even with the
    persistent cache)."""
    for b in _M_LADDER:
        if x <= b:
            return b
    b = _M_LADDER[-1]
    while b < x:
        b *= 2
    return b


class _PyWall:
    """Fallback wall stage via the Python oracle (no compiler available)."""

    def __init__(self, gm: GlobalModel):
        from classpro_tpu.exact.wall import WallFinder

        self.wf = WallFinder(gm)

    def wall_stage(self, seq: bytes, profile: np.ndarray):
        from classpro_tpu.context import seq_context

        lctx, rctx = seq_context(seq)
        ivs = self.wf.find_wall(profile, lctx, rctx)
        rel = self.wf.find_rel_intvl(ivs)
        arr = np.zeros(len(ivs), dtype=_IVDT)
        for j, I in enumerate(ivs):
            arr[j] = (I.b, I.e, I.cb, I.ce, I.ccb, I.cce,
                      1 if I.is_rel else 0, 0, I.pe, I.pe_o_b, I.pe_o_e)
        return arr, len(rel)


def _prefetch_iter(chunks, depth: int):
    """Re-yield ``chunks`` produced on a background thread through a
    bounded queue (order preserved; generator exceptions re-raised at
    the consumer).  The producer runs the caller's generator body, so
    input production (file parse, profile decode) overlaps the
    consumer's host stages and device waits.  If the consumer abandons
    the iterator early the daemon producer parks on a full queue — one
    buffered chunk is retained until process exit (streaming callers
    consume to completion)."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def produce():
        try:
            for c in chunks:
                q.put(c)
            q.put(_END)
        except BaseException as e:  # re-raised below, in order
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _fetch_flat(arrays) -> np.ndarray:
    """Bring several device arrays back in ONE transfer (each separate
    synchronisation costs a ~30ms round trip on this platform)."""
    import jax.numpy as jnp

    if len(arrays) == 1:
        return np.asarray(arrays[0]).ravel()
    return np.asarray(jnp.concatenate([a.ravel() for a in arrays]))


def make_wall_stage(gm: GlobalModel):
    try:
        from classpro_tpu.native import NativeWall

        return NativeWall(gm)
    except Exception:
        return _PyWall(gm)


def expand_asgn(asgn_fin, meta, res, K) -> None:
    """Per-interval assignments -> class strings (one flat repeat);
    writes res[i] for each read index i in meta's rows (the interval
    expansion of ClassPro.c:265-270)."""
    rows, ns, cat, row_flat, col_flat = meta[:5]
    stoc_lut = np.frombuffer(b"ERHD", dtype=np.uint8)
    lens_flat = (cat["e"] - cat["b"]).astype(np.int64)
    asgn_flat = np.clip(asgn_fin[row_flat, col_flat], 0, 3).astype(np.int64)
    body_all = stoc_lut[np.repeat(asgn_flat, lens_flat)].tobytes()
    read_off = np.zeros(len(rows) + 1, np.int64)
    np.cumsum(np.add.reduceat(lens_flat, np.cumsum([0] + ns[:-1])),
              out=read_off[1:])
    prefix = "N" * (K - 1)
    for r, i in enumerate(rows):
        res[i] = prefix + body_all[
            read_off[r]: read_off[r + 1]].decode("ascii")


def pack_chunk(rows, ivs, nrels, plens):
    """Pack one read group's wall-stage records into the two transfer
    blobs (layout: device_pipeline.py docstring).  Returns
    (fblob, iblob, static dims, expand metadata)."""
    ns = [len(ivs[i]) for i in rows]
    Bn = _bucket(len(rows))
    max_n = _bucket32(max(ns))
    cols_n = np.arange(max_n)

    # vectorized scatter of the concatenated wall-stage records
    cat = np.concatenate([ivs[i] for i in rows])
    n_pad = np.zeros(Bn, np.int32)
    n_pad[: len(rows)] = ns
    row_flat = np.repeat(np.arange(len(rows)), ns)
    col_flat = np.arange(len(cat)) - np.repeat(
        np.cumsum([0] + ns[:-1]), ns)

    fI = {}
    for k in ("b", "e", "cb", "ce", "ccb", "cce"):
        v = np.zeros((Bn, max_n), np.int32)
        if k == "e":
            v[:] = 1
        v[row_flat, col_flat] = cat[k]
        fI[k] = v
    fF = {}
    for k, src in (("pe", "pe"), ("peob", "pe_o_b"), ("peoe", "pe_o_e")):
        v = np.full((Bn, max_n), NEG_INF)
        v[row_flat, col_flat] = cat[src]
        fF[k] = v
    for k, cnt in (("lf_cb", "cb"), ("lf_ce", "ce")):
        v = np.zeros((Bn, max_n))
        v[row_flat, col_flat] = LOGFACT[np.minimum(cat[cnt], 32767)]
        fF[k] = v
    is_rel = np.zeros((Bn, max_n), np.int32)
    is_rel[row_flat, col_flat] = cat["is_rel"]

    live_n = cols_n[None, :] < n_pad[:, None]
    keys = np.where(live_n, np.minimum(fI["cb"], fI["ce"]),
                    np.int64(1) << 40)
    iord = np.argsort(keys, axis=1, kind="stable").astype(np.int32)
    pos_desc = np.clip(n_pad[:, None] - 1 - cols_n[None, :], 0, max_n - 1)
    idx_desc = np.take_along_axis(iord, pos_desc, axis=1)
    idx_desc[~live_n] = 0
    idx_asc = np.where(live_n, iord, 0)

    # ---- reliable-interval batch (merged fw + bw rows) ---------------
    rel_flat = np.nonzero(cat["is_rel"])[0]
    rows_of_rel = row_flat[rel_flat]
    counts = np.bincount(rows_of_rel, minlength=len(rows))
    rel_pos = np.nonzero(counts)[0]
    R = _bucket(max(len(rel_pos), 1))
    max_m = _bucket32(int(counts.max()) if len(rel_pos) else 1)

    # row index in the rel batch for each read row; column within row
    j_of_row = np.full(len(rows), -1, np.int64)
    j_of_row[rel_pos] = np.arange(len(rel_pos))
    start = np.zeros(len(rows) + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    within = np.arange(len(rel_flat)) - start[rows_of_rel]
    jj = j_of_row[rows_of_rel]

    rb = {k: np.zeros((R, max_m), np.int32)
          for k in ("b", "e", "ccb", "cce")}
    rb["e"][:] = 1
    rb["ccb"][:] = 1
    rb["cce"][:] = 1
    rb_pe = np.full((R, max_m), NEG_INF)
    for k in ("b", "e", "ccb", "cce"):
        rb[k][jj, within] = cat[k][rel_flat]
    rb_pe[jj, within] = cat["pe"][rel_flat]
    m_rel = np.ones(R, np.int32)
    m_rel[: len(rel_pos)] = counts[rel_pos]
    plen_rel = np.ones(R, np.int32)
    plen_rel[: len(rel_pos)] = [plens[rows[r]] for r in rel_pos]
    rel_rows_arr = np.full(R, Bn, np.int32)            # sentinel: drop
    rel_rows_arr[: len(rel_pos)] = rel_pos
    rel_cols = np.full((R, max_m), max_n, np.int32)    # sentinel: drop
    rel_cols[jj, within] = col_flat[rel_flat]
    cols_m = np.arange(max_m)

    max_cc_o = np.maximum(rb["ccb"], rb["cce"])
    lf_ccb = LOGFACT[np.minimum(rb["ccb"], 32767)]
    lf_cce = LOGFACT[np.minimum(rb["cce"], 32767)]
    flip = np.where(cols_m[None, :] < m_rel[:, None],
                    m_rel[:, None] - 1 - cols_m[None, :],
                    cols_m[None, :])

    def rev(a):
        return np.take_along_axis(a, flip, axis=1)

    # ---- TWO transfer blobs (per-array transfer costs ~20ms) ---------
    iblob = np.concatenate([
        fI["b"].ravel(), fI["e"].ravel(), fI["cb"].ravel(),
        fI["ce"].ravel(), fI["ccb"].ravel(), fI["cce"].ravel(),
        idx_desc.ravel(), idx_asc.ravel(), is_rel.ravel(),
        live_n.astype(np.int32).ravel(), n_pad,
        np.concatenate([rb["b"], rev(rb["e"]) - 1]).ravel(),
        np.concatenate([rb["ccb"], rev(rb["cce"])]).ravel(),
        np.concatenate([rb["e"] - 1, rev(rb["b"])]).ravel(),
        np.concatenate([rb["cce"], rev(rb["ccb"])]).ravel(),
        np.concatenate([max_cc_o, rev(max_cc_o)]).ravel(),
        rel_cols.ravel(),
        np.concatenate([m_rel, m_rel]),
        np.concatenate([plen_rel, plen_rel]),
        np.concatenate([np.ones(R, np.int32), np.zeros(R, np.int32)]),
        rel_rows_arr,
    ]).astype(np.int32)
    fblob = np.concatenate([
        fF["pe"].ravel(), fF["peob"].ravel(), fF["peoe"].ravel(),
        fF["lf_cb"].ravel(), fF["lf_ce"].ravel(),
        np.concatenate([rb_pe, rev(rb_pe)]).ravel(),
        np.concatenate([lf_ccb, rev(lf_cce)]).ravel(),
        np.concatenate([lf_cce, rev(lf_ccb)]).ravel()])

    meta = (rows, ns, cat, row_flat, col_flat, is_rel, live_n,
            idx_desc, idx_asc, rel_rows_arr, rel_cols)
    return fblob, iblob, (Bn, max_n, 2 * R, max_m), meta


# process-global AOT executable cache (see _rel_exec): one warmed
# device program per (R, max_m, device, pp-avals) bucket, shared by
# every TpuEngine in the process — first execution costs minutes on
# this platform, and multi-dataset tools construct many engines.
_AOT_CACHE: dict = {}

# one successful bounded backend init per process (see _ensure_backend)
_BACKEND_OK = False


def _ensure_backend(timeout: float | None = None, _init=None) -> None:
    """Bounded watchdog on the first jax backend init of this process.

    Two observed hang classes on this platform (CLAUDE.md):
    - a down axon tunnel blocks backend init for ~20 minutes before
      failing;
    - an in-process engine created AFTER a child process has used the
      tunnel in the same session wedged axon init indefinitely
      (round-4 gotcha — use one child process per shard instead, as
      tools/soak.py and parallel/driver.py do).

    Backend init runs on a daemon thread with a join timeout
    (CP_INIT_TIMEOUT_S, default 180s; 0 disables) so both classes
    surface as a clear RuntimeError naming the cause instead of a
    silent multi-minute hang.  Normal init over the tunnel is ~5-20s;
    nothing after a timeout can use the device in this process, so
    callers should exit or fall back to a child process / --platform
    cpu."""
    global _BACKEND_OK
    if _BACKEND_OK:
        return
    import os as _os
    import threading as _threading

    if timeout is None:
        timeout = float(_os.environ.get("CP_INIT_TIMEOUT_S", "180"))
    if timeout <= 0:
        _BACKEND_OK = True
        return
    box: dict = {}

    def init(fn=_init or jax.devices):
        try:
            box["devs"] = fn()
        except BaseException as e:   # re-raised on the caller thread
            box["err"] = e

    th = _threading.Thread(target=init, daemon=True,
                           name="classpro-backend-init")
    th.start()
    th.join(timeout)
    if th.is_alive():
        raise RuntimeError(
            f"jax backend init did not complete within {timeout:.0f}s "
            f"(CP_INIT_TIMEOUT_S). Known causes on this platform: the "
            f"axon TPU tunnel is down (init blocks ~20 min before "
            f"failing), or this process created an engine after a "
            f"CHILD process used the tunnel in the same session (use "
            f"one child process per shard, as parallel/driver.py "
            f"does). Retry with --platform cpu for a host-only run, "
            f"or raise CP_INIT_TIMEOUT_S if the service is just slow.")
    if "err" in box:
        raise box["err"]
    _BACKEND_OK = True


class TpuEngine:
    # batch_size default 200 = the measured-optimal production chunk
    # (bench.py sweep: 160 worse, 240 noise-equal, 512 slower)
    def __init__(self, gm: GlobalModel, batch_size: int = 200,
                 threads: int = 0, verbose: bool = False, devices=None):
        _ensure_backend()           # bounded: a wedged tunnel raises
        self.gm = gm
        self.batch_size = batch_size
        self.threads = threads      # host-side C++ worker count (-T)
        self.verbose = verbose      # stderr notice on cold program builds
        # devices: round-robin chunk dispatch over the host's local
        # chips (the reference's per-thread read ranges, §2.5, mapped to
        # chips).  Each chunk's rel DP is one single-device program —
        # zero cross-device traffic, so N chips divide the device cost
        # by N.  None = the process default device (single-chip).
        self.devices = list(devices) if devices else None
        self._rr = 0
        self._pp_on: dict = {}      # device -> device-resident tables
        self.wall = make_wall_stage(gm)
        self.pp = build_pipeline_params(gm)
        self._exec_cache: dict = {}
        self._ppsig_cache: dict = {}
        # exactness-guard telemetry (surfaced in bench JSON and the -v
        # report): cumulative count of reads recomputed by the exact
        # oracle, and the smallest positive decision margin observed —
        # a margin collapse on new data shows up here, not silently as
        # an oracle-speed slowdown (VERDICT r2 weak #6)
        self.guard_flagged = 0
        self.guard_min_margin = float("inf")
        self.chunks_done = 0        # stream telemetry (--stats-json)
        self.absorbed_chunks = 0    # chunks re-bucketed into a warm shape

    def _next_device(self):
        """Round-robin device for the next chunk (None = default)."""
        if not self.devices:
            return None
        dev = self.devices[self._rr % len(self.devices)]
        self._rr += 1
        return dev

    def _pp_for(self, dev):
        """Device-resident pipeline tables (replicated per chip, the
        reference's shared read-only model, §2.5)."""
        if dev is None:
            return self.pp
        pp = self._pp_on.get(dev)
        if pp is None:
            pp = self._pp_on[dev] = jax.device_put(self.pp, dev)
        return pp

    # ------------------------------------------------------------------
    def _rel_pp_sig(self, dev=None):
        """(RelOnlyParams, aval signature) for this engine's tables on
        ``dev``.  Scalar NamedTuple fields (read_len, r_logp, ...) are
        pytree leaves too: sign them by python type, arrays by
        (shape, dtype) — executables are reusable across engines whose
        pp avals match (the tables ride as runtime arguments)."""
        cached = self._ppsig_cache.get(dev)
        if cached is not None:
            return cached
        from classpro_tpu.tpu.device_pipeline import RelOnlyParams

        full = self._pp_for(dev)
        pp = RelOnlyParams(rel=full.rel, gcov=full.gcov)
        ppsig = tuple(
            (tuple(leaf.shape), str(leaf.dtype))
            if hasattr(leaf, "shape") and hasattr(leaf, "dtype")
            else (type(leaf).__name__,)
            for leaf in jax.tree_util.tree_leaves(pp))
        self._ppsig_cache[dev] = (pp, ppsig)
        return pp, ppsig

    def _rel_exec(self, R: int, max_m: int, dev=None):
        """AOT-compiled rel program per (R, max_m[, device]) bucket:
        each dispatch skips the jit cache/arg-hashing machinery
        (~3 ms/call on this host).  The executable itself is cached
        PROCESS-GLOBALLY (keyed by bucket + device + table shapes): PP
        is a runtime argument, so engines over different datasets/
        models share one warmed program per bucket — on this platform
        the real device build happens at FIRST EXECUTION and can take
        minutes, so a per-engine cache would re-pay it for every
        dataset (tools/tpu_parity.py runs dozens per process)."""
        key = (R, max_m) if dev is None else (R, max_m, dev)
        ex = self._exec_cache.get(key)
        if ex is None:
            pp, ppsig = self._rel_pp_sig(dev)
            gkey = (R, max_m, dev, ppsig)
            aot = _AOT_CACHE.get(gkey)
            if aot is None:
                self._cold_notice(key)
                import jax.numpy as jnp

                fb_s = jax.ShapeDtypeStruct((R * max_m,), jnp.float64)
                ib_s = jax.ShapeDtypeStruct((4 * R * max_m + 2 * R,),
                                            jnp.int32)
                # PP stays a runtime argument: closing over it would
                # bake the ~100MB Skellam tables into the HLO as
                # constants (4x compile time, bloated persistent-cache
                # entries) — and would also defeat this cross-engine
                # executable reuse (lowering with a concrete pp still
                # traces it as an argument, not a constant)
                if dev is None:
                    jitted = jax.jit(rel_only_dev,
                                     static_argnames=("R", "max_m"))
                    aot = jitted.lower(fb_s, ib_s, pp,
                                       R=R, max_m=max_m).compile()
                else:
                    # pjit rejects kwargs alongside in_shardings: bake
                    # the static dims into a positional-only wrapper
                    from jax.sharding import SingleDeviceSharding

                    sd = SingleDeviceSharding(dev)
                    fn = lambda fb, ib, p: rel_only_dev(fb, ib, p,
                                                        R=R, max_m=max_m)
                    aot = jax.jit(fn, in_shardings=sd, out_shardings=sd
                                  ).lower(fb_s, ib_s, pp).compile()
                _AOT_CACHE[gkey] = aot
            ex = lambda fb, ib: aot(fb, ib, pp)
            self._exec_cache[key] = ex
        return ex

    def _cold_notice(self, key) -> None:
        """Cold shape bucket: on this platform the real device build is
        deferred to FIRST EXECUTION and can take minutes (CLAUDE.md);
        say so instead of stalling silently (VERDICT r1 weak #6)."""
        if self.verbose:
            import sys

            print(f"building device program for shape bucket {key} — "
                  f"first execution may take minutes on a cold service "
                  f"(pre-build with warmup)", file=sys.stderr)

    # ------------------------------------------------------------------
    def warmup(self, shapes=((256, 128), (256, 192))) -> None:
        """Pre-build and first-execute the rel programs for the given
        (R, max_m) buckets.  This platform defers the actual TPU build
        to first execution (CLAUDE.md), so services should warm up
        before taking traffic."""
        for R, max_m in shapes:
            fb = np.full(R * max_m, NEG_INF)
            ib = np.ones(4 * R * max_m + 2 * R, np.int32)
            for dev in (self.devices or [None]):
                # fetch, don't block_until_ready: on the 08-18 relay
                # only a host fetch waits for real completion
                np.asarray(self._rel_exec(R, max_m, dev)(fb, ib))

    # ------------------------------------------------------------------
    def classify_chunk(self, seqs: list[str], profiles: list[np.ndarray]) -> list[str]:
        """Synchronous single-chunk classification (= one submit +
        finish of the pipelined stream)."""
        return self._finish(self._submit(seqs, profiles))

    # ------------------------------------------------------------------
    # Pipelined streaming path: chunk k+1's host stages (C++ wall walk,
    # numpy pack) and chunk k's device DP + result round trip run
    # concurrently — the wall/relaxation ctypes calls and the fetch's
    # device wait all release the GIL, so a depth-3 software pipeline
    # with background fetch threads keeps host and device both busy.
    # ------------------------------------------------------------------
    def classify_stream(self, chunks, prefetch: int = 2,
                        sort_window: int = 0):
        """Yield one list of class strings per (seqs, profiles) chunk,
        in order, with cross-chunk host/device overlap.

        ``prefetch`` > 0 pulls the input iterable on a bounded
        background thread: in end-to-end use the chunk generator does
        real work (native FASTA parse + FASTK profile decode, both
        GIL-releasing), which would otherwise serialize with the host
        stages and the device round trip (measured ~34 ms per 4M-kmer
        pass on the medium fixture).

        ``sort_window`` > 1 re-composes device batches from windows of
        that many input chunks, ordered by profile length: the rel DP's
        dynamic trip count is the batch MAX interval count, so batching
        similar-length reads together cuts the summed trip count ~20%
        on long-read/high-coverage geometries (measured on the 0.5 Gbp
        soak dataset: 36046 -> 28624 steps at W=8; plen~n_rel corr
        0.91).  Results are re-assembled into the ORIGINAL chunk
        structure and order, so output bytes are unchanged (per-read
        independence; asserted by tests)."""
        import collections
        import os as _os

        prefetch = int(_os.environ.get("CP_PREFETCH", prefetch))
        sort_window = int(_os.environ.get("CP_SORT_WINDOW", sort_window))
        if sort_window > 1:
            yield from self._sorted_stream(chunks, prefetch, sort_window)
            return
        if prefetch > 0:
            chunks = _prefetch_iter(chunks, prefetch)
        # depth 3 covers one device (host k+1 || device k || finish
        # k-1); with N round-robin devices keep ~2 chunks in flight per
        # chip so every chip always has a program running.
        # CP_STREAM_DEPTH: measurement-only override for probing the
        # relay's cross-program overlap ceiling.
        import os as _os

        depth = 3 if not self.devices else max(3, 2 * len(self.devices) + 1)
        depth = int(_os.environ.get("CP_STREAM_DEPTH", depth))
        pending: collections.deque = collections.deque()
        for seqs, profiles in chunks:
            pending.append(self._submit(seqs, profiles))
            if len(pending) >= depth:
                yield self._finish(pending.popleft())
        while pending:
            yield self._finish(pending.popleft())

    def _sorted_stream(self, chunks, prefetch: int, W: int):
        """classify_stream body for sort_window: flatten windows of W
        input chunks, order reads by profile length, run the SAME
        continuous depth-3 pipeline over the re-composed batches (no
        barrier at window boundaries — the inner stream's chunk
        generator spans windows), then un-sort each window's results
        back into the original chunk structure."""
        import itertools

        B = self.batch_size
        if prefetch > 0:
            chunks = _prefetch_iter(chunks, prefetch)
        win_meta: list = []    # (orig chunk sizes, sort order, n subchunks)

        def sorted_chunks():
            it = iter(chunks)
            while True:
                win = list(itertools.islice(it, W))
                if not win:
                    return
                seqs = [s for ss, _ in win for s in ss]
                profs = [p for _, pp in win for p in pp]
                order = sorted(range(len(seqs)),
                               key=lambda i: len(profs[i]))
                subs = [order[k: k + B] for k in range(0, len(order), B)]
                win_meta.append(([len(ss) for ss, _ in win], order,
                                 len(subs)))
                for idx in subs:
                    yield ([seqs[i] for i in idx],
                           [profs[i] for i in idx])

        # the generator runs ahead of the consumer (depth-3 in-flight
        # chunks), so win_meta[wi] always exists when its last subchunk
        # finishes
        pending: list = []
        wi = 0
        for res in self.classify_stream(sorted_chunks(), prefetch=0):
            pending.append(res)
            sizes, order, nsub = win_meta[wi]
            if len(pending) < nsub:
                continue
            flat = [c for r in pending for c in r]
            unsort = [None] * len(flat)
            for j, i in enumerate(order):
                unsort[i] = flat[j]
            off = 0
            for sz in sizes:
                yield unsort[off: off + sz]
                off += sz
            pending = []
            wi += 1

    def _stage(self, seqs, profiles):
        """Wall stage (C++) for one chunk; bucket sizing recorded for a
        later pack+dispatch (no device work yet)."""
        todo = [i for i in range(len(seqs)) if len(profiles[i]) > 0]
        st = {"seqs": seqs, "profiles": profiles, "todo": todo}
        if not todo or not hasattr(self.wall, "wall_stage_slab"):
            return st
        g = sorted(todo, key=lambda i: len(profiles[i]))
        slab, n_out, n_rel, slot = self.wall.wall_stage_slab(
            [seqs[i].encode("ascii") for i in g],
            [profiles[i] for i in g], threads=self.threads)
        st.update(g=g, slab=slab, n_out=n_out, n_rel=n_rel, slot=slot,
                  max_m=0)
        sel_n = int((n_rel > 0).sum())
        if sel_n:
            st["_plens"] = np.array([len(profiles[i]) for i in g],
                                    np.int64)
            st["_R"] = _bucket(sel_n)
            st["_mm"] = _bucket_m(int(n_rel.max()))
            self._absorb_shape(st, sel_n, int(n_rel.max()))
        return st

    def _absorb_shape(self, st, sel_n: int, mm_need: int) -> None:
        """Cold-start absorption: if this chunk's natural (R, max_m)
        bucket has no warmed executable yet but a LARGER cached shape
        fits, use that instead.  Every distinct shape pays a multi-
        minute first execution on this platform (CLAUDE.md), and the
        classic victim is the TAIL chunk of a dataset (nreads % B
        rows -> a smaller R bucket seen exactly once).  Padding into a
        warm shape costs only upload bytes on that one chunk (~11 ms/
        790KB serial) vs minutes of cold build.  Warm steady state is
        unaffected: exact-bucket hits keep their shape."""
        if any(k[0] == st["_R"] and k[1] == st["_mm"]
               for k in self._exec_cache):
            return
        # warm shapes = this engine's executables PLUS the process-
        # global AOT cache entries this engine can reuse (same device
        # + table avals) — so a fresh engine in a warm process (the
        # `cli serve` daemon's per-job engines) absorbs into shapes a
        # previous job already built instead of compiling its own
        warm = {(k[0], k[1]) for k in self._exec_cache}
        try:
            for dev in (self.devices or [None]):
                _, ppsig = self._rel_pp_sig(dev)
                warm |= {(k[0], k[1]) for k in _AOT_CACHE
                         if k[2] == dev and k[3] == ppsig}
        except Exception:
            pass    # absorption is an optimization, never a failure
        cands = sorted(
            {k for k in warm if k[0] >= sel_n and k[1] >= mm_need},
            key=lambda k: k[0] * k[1])
        if cands:
            st["_R"], st["_mm"] = cands[0]
            self.absorbed_chunks += 1

    def _pack_st(self, st, R: int, max_m: int):
        """C++ rel pack for a staged chunk at the given bucket; records
        the views the host-side fw/bw reconciliation needs."""
        fb, ib = self.wall.pack_rel(st["slab"], st["slot"], st["n_out"],
                                    st["n_rel"], st["_plens"], R, max_m)
        st["max_m"] = max_m
        sz = R * max_m
        st["rel_b"] = ib[0:sz].reshape(R, max_m)
        st["rel_e"] = ib[sz:2 * sz].reshape(R, max_m)
        st["rel_ccb"] = ib[2 * sz:3 * sz].reshape(R, max_m)
        st["rel_cce"] = ib[3 * sz:4 * sz].reshape(R, max_m)
        st["rel_m"] = ib[4 * sz:4 * sz + R]
        return fb, ib

    def _submit(self, seqs, profiles):
        """Wall stage + rel pack (both C++) + async device dispatch for
        one chunk; the result transfer starts immediately on a fetch
        thread."""
        import threading

        st = self._stage(seqs, profiles)
        self.chunks_done += 1
        if "_plens" in st:
            fb, ib = self._pack_st(st, st["_R"], st["_mm"])
            out = self._rel_exec(st["_R"], st["_mm"],
                                 self._next_device())(fb, ib)
            box = {}

            def fetch():
                try:
                    from classpro_tpu.tpu.device_pipeline import unpack_out

                    # ONE fused fetch: each np.asarray is a synchronous
                    # ~25-30 ms round trip on this relay; the device
                    # packs all three outputs into one uint8 blob
                    buf = np.asarray(out)
                    (box["v"], box["risky"], box["rescue"],
                     box["mm"]) = unpack_out(buf, st["max_m"])
                except BaseException as e:   # surfaced at _finish
                    box["err"] = e

            th = threading.Thread(target=fetch, daemon=True)
            th.start()
            st["box"], st["thread"] = box, th
        return st

    # minimum decision margin below which a read's rel stage is
    # recomputed on the host with exact arithmetic.  Device error
    # budget: Skellam-table interpolation ~1e-9/term, accumulated over
    # a <=127-step dp chain <= ~2e-7 per compared score (division is
    # exact on device via _div_cr; add/mul/log errors ~1e-13).  EPS =
    # 1e-5 is 50x that bound, so no decision with margin > EPS can
    # flip, while flagged decisions (including C's exact-tie
    # first-wins order seen through perturbed values, fuzz seed 8339)
    # are made by the oracle's bit-exact reference arithmetic.  On the
    # committed corpus the smallest genuine nonzero margin is 1.63e-4
    # (COVERAGE.md), so the steady-state flag rate is ~0.
    REL_MARGIN_EPS = 1e-5

    def _exact_guard(self, st, rel_out) -> None:
        """Host-exact recompute of flagged rows (in place)."""
        risky = st["box"].get("risky")
        if risky is None:
            return
        R = rel_out.shape[0]
        # margin EXACTLY 0 = a bit-equal (same-expression) tie that
        # resolves first-wins identically on device and in C — exempt.
        # The dangerous class shows as tiny NONZERO margins (a true
        # exact tie seen through perturbed table values, fuzz seed
        # 8339) or genuine near-ties.  The risky comparison ran on
        # DEVICE in f64 (device_pipeline._pack_out); the fetched f32
        # margin is telemetry only.
        mm = st["box"]["mm"]
        pos = mm[(mm > 0.0) & np.isfinite(mm)]
        if pos.size:
            self.guard_min_margin = min(self.guard_min_margin,
                                        float(pos.min()))
        flagged = risky[:R] | risky[R:]
        if not flagged.any():
            return
        self.guard_flagged += int(flagged.sum())
        if self.verbose:
            import sys

            n = int(flagged.sum())
            print(f"exactness guard: {n} read(s) within the decision-"
                  f"margin epsilon — recomputing exactly on the host",
                  file=sys.stderr)
        g, slab, slot = st["g"], st["slab"], st["slot"]
        n_out, n_rel = st["n_out"], st["n_rel"]
        live = np.nonzero(n_rel > 0)[0]          # row j -> slab read
        native = hasattr(self.wall, "exact_rel")
        if not native:
            from classpro_tpu.exact.rel import RelClassifier
            from classpro_tpu.exact.wall import Intvl

            rc = getattr(self, "_exact_rel", None)
            if rc is None:
                rc = self._exact_rel = RelClassifier(self.gm)
        for j in np.nonzero(flagged)[0]:
            if j >= len(live):
                continue                          # padded dead row
            i = int(live[j])
            recs = slab[i * slot: i * slot + int(n_out[i])]
            rel_recs = recs[recs["is_rel"] != 0]
            if native:
                # C++ oracle port (native.exact_rel): ~us per read vs
                # ~100 ms for the Python oracle — on the live TPU a
                # recurring flagged read otherwise becomes the
                # steady-state bottleneck
                rel_out[j, :len(rel_recs)] = self.wall.exact_rel(
                    rel_recs, int(st["_plens"][i]))
                continue
            rels = [Intvl(b=int(r["b"]), e=int(r["e"]), cb=int(r["cb"]),
                          ce=int(r["ce"]), ccb=int(r["ccb"]),
                          cce=int(r["cce"]), is_rel=True,
                          pe=float(r["pe"]), pe_o_b=float(r["pe_o_b"]),
                          pe_o_e=float(r["pe_o_e"]))
                    for r in rel_recs]
            rc.classify(rels, rels, int(st["_plens"][i]))
            rel_out[j, :len(rels)] = [I.asgn for I in rels]

    def _finish(self, st) -> list[str]:
        """Join the fetch, then ONE C++ call: scatter rel assignments,
        relaxation sweeps, class expansion."""
        seqs = st["seqs"]
        res = [""] * len(seqs)
        if "g" in st:
            g, slab, slot = st["g"], st["slab"], st["slot"]
            n_out, n_rel = st["n_out"], st["n_rel"]
            n = len(g)
            rel_out = None
            if "thread" in st:
                from classpro_tpu.tpu.device_pipeline import (
                    demote_host, reconcile_fwbw)

                st["thread"].join()
                if "err" in st["box"]:
                    raise st["box"]["err"]
                # device ships BOTH direction rows post-rescue; the
                # integer demotions (class_rel.c:650-713) and the
                # hdrr-tie reconciliation run here with exact host
                # arithmetic (the demotions cost ~15 ms of relay
                # reduction kernels on device, ~0.3 ms in numpy)
                st["box"]["v"] = demote_host(
                    st["box"]["v"], st["box"]["rescue"],
                    st["rel_b"], st["rel_e"], st["rel_ccb"],
                    st["rel_cce"], st["rel_m"],
                    int(self.gm.cov[HAPLO]), int(self.gm.cov[DIPLO]))
                rel_out = reconcile_fwbw(st["box"]["v"], st["rel_ccb"],
                                         st["rel_cce"], st["rel_m"])
                self._exact_guard(st, rel_out)
            out_off = np.zeros(n + 1, np.int64)
            out_off[1:] = np.cumsum([len(seqs[i]) for i in g])
            buf = self.wall.finish_batch(slab, slot, n_out, n_rel,
                                         rel_out, st["max_m"], out_off,
                                         threads=self.threads)
            if hasattr(self.wall, "release_slab"):
                self.wall.release_slab(slab)
            mv = memoryview(buf)  # str() decodes straight from the slab
            for r, i in enumerate(g):
                res[i] = str(mv[out_off[r]: out_off[r + 1]], "ascii")
        elif st["todo"]:
            self._chunk_alldev(seqs, st["profiles"], st["todo"], res)
        for i in range(len(seqs)):
            if not res[i]:
                res[i] = "N" * len(seqs[i])
        return res

    # ------------------------------------------------------------------
    def _chunk_alldev(self, seqs, profiles, todo, res) -> None:
        """All-device fallback (no native library): wall stage via the
        Python oracle, full DP + relaxation in classify_batch_dev."""
        gm = self.gm
        K = gm.kmer
        B = len(seqs)
        order = sorted(todo, key=lambda i: len(profiles[i]))
        nsub = max(1, min(4, len(order) // 64))
        cuts = [len(order) * j // nsub for j in range(nsub + 1)]
        raw_groups = [order[cuts[j]: cuts[j + 1]] for j in range(nsub)]
        ivs: list = [None] * B
        nrels: list[int] = [0] * B
        pending = []
        batched = hasattr(self.wall, "wall_stage_batch")
        for g in raw_groups:
            if not g:
                continue
            if batched:
                res_w = self.wall.wall_stage_batch(
                    [seqs[i].encode("ascii") for i in g],
                    [profiles[i] for i in g])
                for i, (arr, nrel) in zip(g, res_w):
                    ivs[i], nrels[i] = arr, nrel
            else:
                for i in g:
                    ivs[i], nrels[i] = self.wall.wall_stage(
                        seqs[i].encode("ascii"), profiles[i])
            rows = [i for i in g if len(ivs[i]) > 0]
            if rows:
                pending.append(self._dispatch(rows, ivs, nrels, profiles))
        # ONE combined fetch for BOTH payloads (each separate
        # synchronisation costs a full relay round trip): assignments
        # and guard flags ride one int32 vector, split back on host
        both = _fetch_flat(
            [o.ravel() for o, _f, _m in pending]
            + [f.ravel().astype("int32") for _o, f, _m in pending])
        n_out = sum(int(np.prod(o.shape)) for o, _f, _m in pending)
        out_all, flg_all = both[:n_out], both[n_out:]
        off = foff = 0
        for out, flags, meta in pending:
            cnt = int(np.prod(out.shape))
            self._expand(out_all[off: off + cnt].reshape(out.shape),
                         meta, res, K)
            off += cnt
            # exactness guard (same contract as the stream path):
            # flagged reads are recomputed by the exact oracle
            rows = meta[0]
            fl = flg_all[foff: foff + int(flags.shape[0])]
            foff += int(flags.shape[0])
            for r, i in enumerate(rows):
                if fl[r]:
                    self.guard_flagged += 1
                    res[i] = self._exact_full(seqs[i], profiles[i])

    # ------------------------------------------------------------------
    def _dispatch(self, rows, ivs, nrels, profiles):
        """Pack one read group into the two transfer blobs and dispatch
        the device program (async; caller synchronises)."""
        fblob, iblob, dims, meta = pack_chunk(rows, ivs, nrels,
                                              [len(p) for p in profiles])
        out, flags = classify_batch_dev(fblob, iblob, self.pp, *dims)
        return out, flags, meta

    def _exact_full(self, seq, profile) -> str:
        """Whole-read exact-oracle classification (guard fallback for
        the all-device path)."""
        from classpro_tpu.exact.pipeline import ReadClassifier

        rc = getattr(self, "_exact_full_rc", None)
        if rc is None:
            rc = self._exact_full_rc = ReadClassifier(self.gm)
        return rc.classify(seq, profile)

    # ------------------------------------------------------------------
    def _expand(self, asgn_fin, meta, res, K):
        expand_asgn(asgn_fin, meta, res, K)


def classify_file_tpu(fastx_path: str, fastk_root: str, coverage: int = 0,
                      read_len: int = 20000, model_path: str | None = None,
                      batch_size: int = 200, threads: int = 0,
                      verbose: bool = False, warmup: bool = False,
                      devices: int = 0,
                      stats_out: dict | None = None) -> Iterator[ClassRecord]:
    # setup (model build + optional device warmup) runs EAGERLY at call
    # time — the streaming body is the inner generator
    hist = load_histogram(fastk_root)
    gm = build_global_model(hist, coverage=coverage, read_len=read_len,
                            model_path=model_path)
    P = open_profiles(fastk_root)
    if P.kmer != gm.kmer:
        raise ValueError(f"{fastk_root}: .hist k-mer size ({gm.kmer}) != "
                         f".prof k-mer size ({P.kmer})")
    devs = jax.local_devices()[:devices] if devices > 0 else None
    eng = TpuEngine(gm, batch_size=batch_size, threads=threads,
                    verbose=verbose, devices=devs)
    if warmup:
        # Dataset-aware: sample the host wall stage (cheap, ~ms/read)
        # over the first reads to find the max_m bucket this dataset
        # actually needs, and warm exactly ONE shape — smaller chunks
        # absorb into it (engine._absorb_shape), so a fresh process
        # pays one multi-minute first execution instead of one per
        # bucket.  Reads beyond the sample can still exceed the
        # sampled bucket (rare; those compile on demand as before).
        import itertools as _it
        import sys as _sys

        sample_n = max(batch_size, 200)
        nrel_max = 1
        for rid, rec in enumerate(
                _it.islice(read_fastx_checked(fastx_path,
                                              DEFAULTS.max_read_len),
                           sample_n)):
            prof = P.fetch(rid)
            if len(prof) == 0:
                continue
            _, nr = eng.wall.wall_stage(rec.seq.encode("ascii"), prof)
            nrel_max = max(nrel_max, nr)
        # Warm ONE LADDER STEP above the sampled bucket: the first-chunk
        # sample underestimates the dataset max (SOAK_r05: sampled 192,
        # later chunks hit 256 and paid a second multi-minute mid-stream
        # build), absorption only goes UPWARD, and the extra mm padding
        # is measured free (mm-256-for-all vs natural on the soak
        # geometry: 36.2-37.3 vs 36.9-37.5 Mk/s — inside noise).
        mb = _bucket_m(nrel_max)
        nxt = next((b for b in _M_LADDER if b > mb), mb * 2)
        shapes = ((_bucket(batch_size), nxt),)
        print(f"warming up device program for shape {shapes[0]} "
              f"(sampled {sample_n} reads, max n_rel {nrel_max}; first "
              f"execution builds the TPU program — minutes on a cold "
              f"service)...", file=_sys.stderr)
        eng.warmup(shapes)
        print("warmup done", file=_sys.stderr)

    recs: list = []

    K = gm.kmer

    def flush(chunk, rid0):
        recs.append(chunk)
        plens = [max(len(r.seq) - K + 1, 0) for r in chunk]
        profs = P.fetch_batch(list(range(rid0, rid0 + len(chunk))), plens)
        for j, p in enumerate(profs):   # ClassPro.c:184-187 rlen check
            if len(p) != plens[j]:
                rlen = len(chunk[j].seq)
                raise ValueError(
                    f"Read {rid0 + j}: rlen ({rlen}) != plen+Km1 "
                    f"({len(p) + K - 1}) — profile/read mismatch")
        return [r.seq for r in chunk], profs

    def chunk_iter():
        chunk: list = []
        rid = 0
        for rec in read_fastx_checked(fastx_path,
                                      DEFAULTS.max_read_len):
            chunk.append(rec)
            rid += 1
            if len(chunk) >= batch_size:
                yield flush(chunk, rid - len(chunk))
                chunk = []
        if chunk:
            yield flush(chunk, rid - len(chunk))

    def stream():
        import time as _time

        t0 = _time.time()
        # sort_window=8: device batches composed from plen-ordered
        # windows (same bytes, ~20% fewer DP steps on long-read
        # geometries; see classify_stream docstring)
        for classes in eng.classify_stream(chunk_iter(), sort_window=8):
            chunk_recs = recs.pop(0)
            for rec, cls in zip(chunk_recs, classes):
                yield ClassRecord(class_header(rec.name, rec.comment),
                                  rec.seq, cls)
        if stats_out is not None:
            # exactness + stream telemetry for artifacts (SOAK_r05 /
            # --stats-json): the guard's flag rate and worst margin are
            # the exactness backstop's health signals at scale
            stats_out.update(
                stream_wall_s=round(_time.time() - t0, 2),
                chunks=eng.chunks_done,
                absorbed_chunks=eng.absorbed_chunks,
                guard_flagged=int(eng.guard_flagged),
                min_margin=(None if eng.guard_min_margin == float("inf")
                            else float(eng.guard_min_margin)),
                shapes=[list(k[:2]) for k in eng._exec_cache])

    return stream()
