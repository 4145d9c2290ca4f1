"""Batched classification engine (the production path).

Stage split (see ARCHITECTURE.md):
  host C++: FASTK profile decode, sequence context, wall-detection walk,
            reliable-interval selection (csrc/classpro_host.cpp — branchy
            integer scan, bit-identical to the oracle)
  device:   ONE jitted program per chunk (device_pipeline.py): merged
            fw/bw reliable-interval DP + rescues + reconciliation +
            unreliable-interval relaxation.  One dispatch, one
            synchronisation — the platform charges ~30ms per round trip,
            so the host packs everything up front and reads back only
            the final (B, max_n) assignment.

Host-side precomputation (numpy, libm) covers every *static* term the
device kernels need — Poisson emissions, log-factorials, processing
orders — matching the reference's libm arithmetic exactly; the device
computes only the path-dependent parts.

Reads are processed in chunks; interval arrays are padded to power-of-two
buckets to bound jit recompilation.  Byte-identity vs the reference
binary is a measured quantity (tests/test_tpu_engine.py), not an
assumption.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)  # f64 decision path (ARCHITECTURE.md)

from classpro_tpu.estimation import GlobalModel, build_global_model
from classpro_tpu.io.classfile import ClassRecord
from classpro_tpu.io.fastk import load_histogram, open_profiles
from classpro_tpu.io.fastx import read_fastx
from classpro_tpu.numerics import LOGFACT
from classpro_tpu.tpu.device_pipeline import (build_pipeline_params,
                                              classify_batch_dev)

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


def _pois(k: np.ndarray, lam: float) -> np.ndarray:
    """k*log(lam) - lam - logfact[k], C/libm arithmetic (prob.c:33)."""
    kc = np.minimum(k, 32767)
    return kc * math.log(lam) - lam - LOGFACT[kc]


class TpuEngine:
    def __init__(self, gm: GlobalModel, batch_size: int = 512):
        self.gm = gm
        self.batch_size = batch_size
        self.wall = make_wall_stage(gm)
        self.pp = build_pipeline_params(gm)

    # ------------------------------------------------------------------
    def classify_chunk(self, seqs: list[str], profiles: list[np.ndarray]) -> list[str]:
        gm = self.gm
        K = gm.kmer
        B = len(seqs)
        covE = float(gm.cov[ERROR])
        covH = float(gm.cov[HAPLO])
        covD = float(gm.cov[DIPLO])
        d = gm.defaults

        ivs: list = []
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

        rows = [i for i in range(B) if ivs[i] is not None and len(ivs[i]) > 0]
        if not rows:
            return ["N" * len(seqs[i]) for i in range(B)]

        # ---- full interval layout (original order) ----------------------
        ns = [len(ivs[i]) for i in rows]
        Bn = _bucket(len(rows))
        max_n = _bucket(max(ns))
        cols_n = np.arange(max_n)

        fI = {k: np.zeros((Bn, max_n), np.int64)
              for k in ("b", "e", "cb", "ce", "ccb", "cce")}
        fF = {k: np.full((Bn, max_n), NEG_INF)
              for k in ("pe", "peob", "peoe")}
        is_rel = np.zeros((Bn, max_n), bool)
        n_pad = np.zeros(Bn, np.int32)
        fI["e"][:] = 1
        for r, i in enumerate(rows):
            a, nn = ivs[i], ns[r]
            n_pad[r] = nn
            for k in ("b", "e", "cb", "ce", "ccb", "cce"):
                fI[k][r, :nn] = a[k]
            fF["pe"][r, :nn] = a["pe"]
            fF["peob"][r, :nn] = a["pe_o_b"]
            fF["peoe"][r, :nn] = a["pe_o_e"]
            is_rel[r, :nn] = a["is_rel"] != 0

        live_n = cols_n[None, :] < n_pad[:, None]
        keys = np.where(live_n, np.minimum(fI["cb"], fI["ce"]), 1 << 62)
        iord = np.argsort(keys, axis=1, kind="stable").astype(np.int32)

        # host precompute (libm-exact static terms, class_unrel.c:53,181)
        lf_cb = LOGFACT[np.minimum(fI["cb"], 32767)]
        lf_ce = LOGFACT[np.minimum(fI["ce"], 32767)]
        po_cb_e = np.minimum(fI["cb"], 32767) * math.log(covE) - covE - lf_cb
        po_ce_e = np.minimum(fI["ce"], 32767) * math.log(covE) - covE - lf_ce
        lE = np.maximum(fF["pe"], po_cb_e + po_ce_e + d.e_po_base)
        orig = {
            "cb": fI["cb"], "ce": fI["ce"], "lf_cb": lf_cb, "lf_ce": lf_ce,
            "x_l": fI["b"].astype(np.float64),
            "x_r": (fI["e"] - 1).astype(np.float64),
            "lE": lE,
            "po_h_b": _pois(fI["cb"], covH), "po_h_e": _pois(fI["ce"], covH),
            "po_d_b": _pois(fI["cb"], covD), "po_d_e": _pois(fI["ce"], covD),
            "peob": fF["peob"], "peoe": fF["peoe"],
        }

        def reorder(idx):
            xs = {k: np.take_along_axis(v, idx, axis=1)
                  for k, v in orig.items()}
            xs["idx"] = idx
            return xs

        pos_desc = np.clip(n_pad[:, None] - 1 - cols_n[None, :], 0, max_n - 1)
        idx_desc = np.take_along_axis(iord, pos_desc, axis=1)
        idx_desc[~live_n] = 0
        idx_asc = np.where(live_n, iord, 0)
        xs_desc = reorder(idx_desc)
        xs_asc = reorder(idx_asc)
        xs_desc["live"] = live_n
        xs_asc["live"] = live_n

        undyn = {
            "is_rel": is_rel,
            "asgn": np.full((Bn, max_n), N_STATE, np.int32),
            "packL": np.stack([fI["cce"].astype(np.float64),
                               (fI["e"] - 1).astype(np.float64),
                               fI["ce"].astype(np.float64)], axis=-1),
            "packR": np.stack([fI["ccb"].astype(np.float64),
                               fI["b"].astype(np.float64),
                               fI["cb"].astype(np.float64)], axis=-1),
        }

        # ---- reliable-interval batch (merged fw + bw rows) ---------------
        rel_pos = [r for r, i in enumerate(rows) if nrels[i] > 0]
        R = _bucket(max(len(rel_pos), 1))
        ms = [nrels[rows[r]] for r in rel_pos]
        max_m = _bucket(max(ms) if ms else 1)
        cols_m = np.arange(max_m)

        rb = {k: np.zeros((R, max_m), np.int64)
              for k in ("b", "e", "ccb", "cce")}
        rb["e"][:] = 1
        rb["ccb"][:] = 1
        rb["cce"][:] = 1
        rb_pe = np.full((R, max_m), NEG_INF)
        m_rel = np.ones(R, np.int64)
        plen_rel = np.ones(R, np.int64)
        rel_rows_arr = np.full(R, Bn, np.int32)            # sentinel: drop
        rel_cols = np.full((R, max_m), max_n, np.int32)    # sentinel: drop
        for j, r in enumerate(rel_pos):
            i = rows[r]
            a = ivs[i]
            sel = np.nonzero(a["is_rel"])[0]
            mm = len(sel)
            m_rel[j] = mm
            plen_rel[j] = len(profiles[i])
            rel_rows_arr[j] = r
            rel_cols[j, :mm] = sel
            rb["b"][j, :mm] = a["b"][sel]
            rb["e"][j, :mm] = a["e"][sel]
            rb["ccb"][j, :mm] = a["ccb"][sel]
            rb["cce"][j, :mm] = a["cce"][sel]
            rb_pe[j, :mm] = a["pe"][sel]

        max_cc_o = np.maximum(rb["ccb"], rb["cce"])
        lf_ccb = LOGFACT[np.minimum(rb["ccb"], 32767)]
        lf_cce = LOGFACT[np.minimum(rb["cce"], 32767)]
        logpE_o = np.maximum(
            rb_pe, _pois(rb["ccb"], covE) + _pois(rb["cce"], covE)
            + d.e_po_base)

        flip = np.where(cols_m[None, :] < m_rel[:, None],
                        m_rel[:, None] - 1 - cols_m[None, :],
                        cols_m[None, :])

        def rev(a):
            return np.take_along_axis(a, flip, axis=1)

        rel = {
            "bpos": np.concatenate([rb["b"], rev(rb["e"]) - 1]),
            "bcnt": np.concatenate([rb["ccb"], rev(rb["cce"])]),
            "epos": np.concatenate([rb["e"] - 1, rev(rb["b"])]),
            "ecnt": np.concatenate([rb["cce"], rev(rb["ccb"])]),
            "max_cc": np.concatenate([max_cc_o, rev(max_cc_o)]),
            "lf_bcnt": np.concatenate([lf_ccb, rev(lf_cce)]),
            "logpE": np.concatenate([logpE_o, rev(logpE_o)]),
            "m": np.concatenate([m_rel, m_rel]),
            "plen": np.concatenate([plen_rel, plen_rel]),
            "fwd": np.concatenate([np.ones(R, bool), np.zeros(R, bool)]),
        }

        # ---- ONE device dispatch + ONE sync ------------------------------
        out = classify_batch_dev(rel, undyn, xs_desc, xs_asc, n_pad,
                                 rel_rows_arr, rel_cols, self.pp,
                                 max_m, max_n)
        asgn_fin = np.asarray(out)

        # ---- expand to class strings --------------------------------------
        stoc_lut = np.frombuffer(b"ERHD", dtype=np.uint8)
        res: list[str] = [""] * B
        for r, i in enumerate(rows):
            nn = n_pad[r]
            lens = (fI["e"][r, :nn] - fI["b"][r, :nn])
            body = stoc_lut[np.repeat(
                np.clip(asgn_fin[r, :nn], 0, 3).astype(np.int64), lens)]
            res[i] = "N" * (K - 1) + body.tobytes().decode("ascii")
        for i in range(B):
            if not res[i]:
                res[i] = "N" * len(seqs[i])
        return res


def classify_file_tpu(fastx_path: str, fastk_root: str, coverage: int = 0,
                      read_len: int = 20000, model_path: str | None = None,
                      batch_size: int = 512,
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
