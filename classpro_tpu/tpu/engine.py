"""Batched classification engine (the production path).

Stage split (see ARCHITECTURE.md):
  host C++: FASTK profile decode, sequence context, wall-detection walk,
            reliable-interval selection (csrc/classpro_host.cpp — branchy
            integer scan, bit-identical to the oracle)
  device:   reliable-interval DP (fw/bw + rescues) and unreliable-interval
            relaxation, batched over reads

Reads are processed in chunks; interval arrays are padded to power-of-two
buckets to bound jit recompilation.  Concordance vs the oracle engine is a
measured quantity (tests/test_tpu_engine.py), not an assumption.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)  # f64 decision path (see ARCHITECTURE.md)

import jax.numpy as jnp

from classpro_tpu.constants import STOC
from classpro_tpu.estimation import GlobalModel, build_global_model
from classpro_tpu.io.classfile import ClassRecord
from classpro_tpu.io.fastk import load_histogram, open_profiles
from classpro_tpu.io.fastx import read_fastx
from classpro_tpu.tpu.rel_batch import RelBatch, classify_rel_batch, make_rel_params
from classpro_tpu.tpu.tables import build_tables
from classpro_tpu.tpu.unrel_dev import UnrelParams, unrel_sweeps

N_STATE = 4
NEG_INF = float("-inf")

_IVDT = np.dtype([
    ("b", "<i4"), ("e", "<i4"), ("cb", "<i4"), ("ce", "<i4"),
    ("ccb", "<i4"), ("cce", "<i4"), ("is_rel", "<i4"), ("pad", "<i4"),
    ("pe", "<f8"), ("pe_o_b", "<f8"), ("pe_o_e", "<f8")])


def make_unrel_params(gm: GlobalModel) -> UnrelParams:
    from classpro_tpu.tpu.skellam_dev import build_skellam_tables

    st = build_skellam_tables()
    dt = build_tables(gm)
    d = gm.defaults
    return UnrelParams(
        ta=jnp.asarray(st.table_a), tb=jnp.asarray(st.table_b),
        logfact=jnp.asarray(st.logfact), btg_log=jnp.asarray(dt.btg_log()),
        unrel_idx=dt.unrel_idx, n_cap=dt.n_cap, read_len=float(gm.read_len),
        r_logp=d.r_logp, e_po_base=d.e_po_base,
        log_1m_pe_mean=math.log(1 - d.pe_mean),
        log_pe_mean=math.log(d.pe_mean), dr_ratio=gm.dr_ratio,
        cov_e=int(gm.cov[0]), cov_r=int(gm.cov[1]),
        cov_h=int(gm.cov[2]), cov_d=int(gm.cov[3]))


def _bucket(x: int, lo: int = 8) -> int:
    """Round up to the next power of two (bounds jit recompilations)."""
    b = lo
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


def make_wall_stage(gm: GlobalModel):
    try:
        from classpro_tpu.native import NativeWall

        return NativeWall(gm)
    except Exception:
        return _PyWall(gm)


class TpuEngine:
    def __init__(self, gm: GlobalModel, batch_size: int = 128):
        self.gm = gm
        self.batch_size = batch_size
        self.wall = make_wall_stage(gm)
        self.relp = make_rel_params(gm)
        self.unrelp = make_unrel_params(gm)

    # ------------------------------------------------------------------
    def classify_chunk(self, seqs: list[str], profiles: list[np.ndarray]) -> list[str]:
        gm = self.gm
        K = gm.kmer
        B = len(seqs)

        ivs: list = []     # per-read structured interval arrays
        nrels: list[int] = []
        for i in range(B):
            if len(profiles[i]) == 0:
                ivs.append(None)
                nrels.append(0)
                continue
            arr, nrel = self.wall.wall_stage(seqs[i].encode("ascii"),
                                             profiles[i])
            ivs.append(arr)
            nrels.append(nrel)

        asgns = [None if a is None else np.full(len(a), N_STATE, np.int8)
                 for a in ivs]

        # ---- device rel DP over reads with >= 1 reliable interval ------
        rel_rows = [i for i in range(B) if nrels[i] > 0]
        if rel_rows:
            ms = [nrels[i] for i in rel_rows]
            max_m = _bucket(max(ms))
            Bm = _bucket(len(rel_rows))
            rb = RelBatch(
                b=np.zeros((Bm, max_m), np.int64),
                e=np.ones((Bm, max_m), np.int64),
                ccb=np.ones((Bm, max_m), np.int64),
                cce=np.ones((Bm, max_m), np.int64),
                pe=np.full((Bm, max_m), NEG_INF),
                m=np.ones(Bm, np.int64),
                plen=np.ones(Bm, np.int64))
            rb.m[: len(rel_rows)] = ms
            rb.plen[: len(rel_rows)] = [len(profiles[i]) for i in rel_rows]
            rel_sel = []
            for r, i in enumerate(rel_rows):
                a = ivs[i]
                sel = np.nonzero(a["is_rel"])[0]
                rel_sel.append(sel)
                mm = len(sel)
                rb.b[r, :mm] = a["b"][sel]
                rb.e[r, :mm] = a["e"][sel]
                rb.ccb[r, :mm] = a["ccb"][sel]
                rb.cce[r, :mm] = a["cce"][sel]
                rb.pe[r, :mm] = a["pe"][sel]
            asgn_rel = classify_rel_batch(rb, gm, self.relp)
            for r, i in enumerate(rel_rows):
                asgns[i][rel_sel[r]] = asgn_rel[r, : len(rel_sel[r])]

        # ---- device unrel relaxation -----------------------------------
        rows = [i for i in range(B) if ivs[i] is not None and len(ivs[i]) > 0]
        if rows:
            ns = [len(ivs[i]) for i in rows]
            max_n = _bucket(max(ns))
            Bn = _bucket(len(rows))
            F = {k: np.zeros((Bn, max_n), np.int64)
                 for k in ["b", "e", "cb", "ce", "ccb", "cce"]}
            for k in ["pe", "pe_o_b", "pe_o_e"]:
                F[k] = np.full((Bn, max_n), NEG_INF)
            F["is_rel"] = np.zeros((Bn, max_n), bool)
            F["asgn"] = np.full((Bn, max_n), N_STATE, np.int8)
            iord = np.zeros((Bn, max_n), np.int32)
            for r, i in enumerate(rows):
                a, nn = ivs[i], ns[r]
                for k in ["b", "e", "cb", "ce", "ccb", "cce"]:
                    F[k][r, :nn] = a[k]
                for k in ["pe", "pe_o_b", "pe_o_e"]:
                    F[k][r, :nn] = a[k]
                F["is_rel"][r, :nn] = a["is_rel"] != 0
                F["asgn"][r, :nn] = asgns[i]
                keys = np.minimum(a["cb"], a["ce"])
                iord[r, :nn] = np.argsort(keys, kind="stable")
            n_pad = np.zeros(Bn, np.int32)
            n_pad[: len(rows)] = ns
            asgn_fin = np.asarray(unrel_sweeps(
                {k: jnp.asarray(v) for k, v in F.items()},
                jnp.asarray(iord), jnp.asarray(n_pad),
                self.unrelp, max_n=max_n))
            for r, i in enumerate(rows):
                asgns[i] = asgn_fin[r, : ns[r]]

        # ---- expand to class strings ------------------------------------
        stoc_lut = np.frombuffer(b"ERHD", dtype=np.uint8)
        out = []
        for i in range(B):
            rlen = len(seqs[i])
            if ivs[i] is None or len(ivs[i]) == 0:
                out.append("N" * rlen)
                continue
            a = ivs[i]
            lens = (a["e"] - a["b"]).astype(np.int64)
            body = stoc_lut[np.repeat(asgns[i].astype(np.int64), lens)]
            out.append("N" * (K - 1) + body.tobytes().decode("ascii"))
        return out


def classify_file_tpu(fastx_path: str, fastk_root: str, coverage: int = 0,
                      read_len: int = 20000, model_path: str | None = None,
                      batch_size: int = 128,
                      verbose: bool = False) -> Iterator[ClassRecord]:
    hist = load_histogram(fastk_root)
    gm = build_global_model(hist, coverage=coverage, read_len=read_len,
                            model_path=model_path)
    P = open_profiles(fastk_root)
    eng = TpuEngine(gm, batch_size=batch_size)

    chunk: list = []
    rid = 0
    for rec in read_fastx(fastx_path):
        chunk.append((rec, P.fetch(rid)))
        rid += 1
        if len(chunk) >= batch_size:
            yield from _emit(eng, chunk)
            chunk = []
    if chunk:
        yield from _emit(eng, chunk)


def _emit(eng: TpuEngine, chunk) -> Iterator[ClassRecord]:
    seqs = [rec.seq for rec, _ in chunk]
    profs = [p for _, p in chunk]
    classes = eng.classify_chunk(seqs, profs)
    for (rec, _), cls in zip(chunk, classes):
        yield ClassRecord(f"@{rec.name} {rec.comment}", rec.seq, cls)
