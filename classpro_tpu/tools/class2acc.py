"""class2acc: accuracy evaluation of an estimated vs truth .class file
(ref class2acc.c).

Computes the 4x4 confusion matrix, overall / Normal / Repeat accuracy and
false-negative-error rates, plus the reference's full diagnostic flag set
(class2acc.c:33-48):

* ``-f`` skip reads with %E-mer above a cap (real-dataset guard)
* ``-r`` reads with %R-mer above a threshold count as Repeat reads
* ``-e`` per-read misclassification report above a threshold
* ``-s`` (with -e) print truth + masked-estimate class strings per read
* ``-m``/``-n`` (with -e) min/max %R-mer of a read to be shown
* ``-p`` read profile for per-read / per-window H1/H2 coverage
* ``-w`` (with -p) per-window %error + coverage lines (class2acc.c:223-238)

Output is byte-identical to the reference binary's stdout (tested across
flag combos in tests/test_tools.py).
"""

from __future__ import annotations

import dataclasses
import io
import math
import sys
from typing import TextIO

import numpy as np

from classpro_tpu.io.classfile import read_class

_CTOS = np.zeros(256, dtype=np.int64)
for c, v in zip(b"ERHD", [0, 1, 2, 3]):
    _CTOS[c] = v


def _cfmt(v: float, spec: str) -> str:
    """C printf %<spec>lf, incl. glibc's rendering of 0.0/0.0 as '-nan'
    (x86-64 SSE division produces a negative quiet NaN)."""
    if math.isnan(v):
        width = spec.split(".")[0]
        return f"{'-nan':>{width or ''}s}" if width else "-nan"
    return f"{v:{spec}f}"


@dataclasses.dataclass
class Accuracy:
    cfm: np.ndarray  # (4,4) truth x est, classes E,R,H,D
    ntot: int
    ncor: int
    nfne: int
    ntot_normal: int
    ncor_normal: int
    nfne_normal: int
    ntot_repeat: int
    ncor_repeat: int
    nfne_repeat: int

    @property
    def accuracy(self) -> float:
        return self.ncor / self.ntot * 100 if self.ntot else float("nan")

    @property
    def fn_error(self) -> float:
        return self.nfne / self.ntot * 100 if self.ntot else float("nan")

    def report(self) -> str:
        lines = ["", "Confusion Matrix (Truth\\Est):", "  "
                 + "".join(f"{c:>15}" for c in "ERHD")]
        for i, c in enumerate("ERHD"):
            lines.append(f"{c}:" + "".join(f"{int(v):15d}" for v in self.cfm[i]))
        lines.append("")
        lines.append(f"Accuracy = {_cfmt(self.accuracy, '4.2')} % "
                     f"(= {self.ncor} / {self.ntot}), "
                     f"FN Error = {_cfmt(self.fn_error, '4.2')} %")
        for name, (nc, nt, nf) in [
            ("Normal", (self.ncor_normal, self.ntot_normal, self.nfne_normal)),
            ("Repeat", (self.ncor_repeat, self.ntot_repeat, self.nfne_repeat)),
        ]:
            acc = nc / nt * 100 if nt else float("nan")
            fne = nf / nt * 100 if nt else float("nan")
            lines.append(f"[{name}] Accuracy = {_cfmt(acc, '4.2')} % "
                         f"(= {nc} / {nt}), "
                         f"FN Error = {_cfmt(fne, '4.2')} %")
        return "\n".join(lines)


def class2acc(est_path: str, truth_path: str, thres_e: int = 100,
              thres_r: int = 0, thres_lq: int | None = None,
              show_class: bool = False, min_r: int = 0, max_r: int = 100,
              window: int | None = None, prof_root: str | None = None,
              out: TextIO | None = None) -> Accuracy:
    """Stream both .class files, emit per-read/per-window diagnostics to
    ``out`` in the reference's order, and return the aggregate Accuracy.

    ``thres_lq`` is the -e value (None = -e absent); ``window``/-w and
    the coverage fields need ``prof_root``/-p, exactly as in the C tool
    (the window loop lives inside the ``P != NULL`` branch,
    class2acc.c:220-238).
    """
    if out is None:
        out = io.StringIO()
    P = None
    km1 = -1
    if prof_root is not None:
        from classpro_tpu.io.fastk import open_profiles

        P = open_profiles(prof_root)
        km1 = P.kmer - 1

    cfm = np.zeros((4, 4), dtype=np.int64)
    ntot = ncor = nfne = 0
    ntot_n = ncor_n = nfne_n = 0
    ntot_r = ncor_r = nfne_r = 0
    cov = [-1.0, -1.0]
    truth_iter = read_class(truth_path)
    rid = 0
    for rid, est in enumerate(read_class(est_path), start=1):
        try:
            tru = next(truth_iter)
        except StopIteration:
            raise ValueError("estimate has more reads than truth") from None
        if est.header.split()[0] != tru.header.split()[0]:
            raise ValueError(f"read {rid} name mismatch")
        if len(est.classes) != len(tru.classes) or \
                len(est.seq) != len(est.classes) or \
                len(tru.seq) != len(tru.classes):
            raise ValueError(f"read {rid} length mismatch")
        e = np.frombuffer(est.classes.encode(), dtype=np.uint8)
        t = np.frombuffer(tru.classes.encode(), dtype=np.uint8)
        prof = None
        if P is not None:
            prof = P.fetch(rid - 1)
            if len(prof) + km1 != len(e):
                raise ValueError(f"read {rid} profile length mismatch")
        # skip the K-1 prefix Ns (must agree between the two files)
        i0 = 0
        while i0 < len(e) and e[i0] == ord("N"):
            if t[i0] != ord("N"):
                raise ValueError(f"read {rid} inconsistent # of prefix Ns")
            i0 += 1
        e, t = e[i0:], t[i0:]
        rtot = len(t)
        eq = e == t
        rcor = int(np.sum(eq))
        rfne = int(np.sum((t == ord("E")) & (e != ord("E"))))
        ti, ei = _CTOS[t], _CTOS[e]
        np.add.at(cfm, (ti, ei), 1)
        # truth composition in E,H,D,R order (rcomp, class2acc.c:207-219)
        rcomp = [int(np.sum(t == ord(ch))) for ch in "EHDR"]
        scnts = [0, 0]
        if P is not None:
            h_mask = t == ord("H")
            d_mask = t == ord("D")
            pr = prof[i0 - km1: i0 - km1 + rtot].astype(np.int64)
            scnts[0] = int(pr[h_mask].sum())
            scnts[1] = int(pr[d_mask].sum())
            if window is not None and window > 0:
                w = window
                for wlo in range(0, rtot - rtot % w, w):
                    wsl = slice(wlo, wlo + w)
                    wcor = int(np.sum(eq[wsl]))
                    wh = int(np.sum(h_mask[wsl]))
                    wd = int(np.sum(d_mask[wsl]))
                    sh = int(pr[wsl][h_mask[wsl]].sum())
                    sd = int(pr[wsl][d_mask[wsl]].sum())
                    cov[0] = sh / wh if wh > 0 else -1
                    cov[1] = sd / wd if wd > 0 else -1
                    if cov[0] == -1 or cov[1] == -1 or cov[0] > cov[1]:
                        cov[0] = cov[1] = -1
                    else:
                        cov[1] -= cov[0]
                    out.write(f"%error = {_cfmt((w - wcor) / w * 100, '4.1')}"
                              f" [H1-cov={_cfmt(cov[0], '.0')},"
                              f"H2-cov={_cfmt(cov[1], '.0')}]\n")
                # reference quirk (class2acc.c:236,259-260): scnts is
                # zeroed per window but rcomp is not, so the per-read
                # coverage below divides the post-last-window remainder
                # sums by the FULL-read H/D counts
                rem = rtot % w
                if rem:
                    scnts[0] = int(pr[rtot - rem:][h_mask[rtot - rem:]].sum())
                    scnts[1] = int(pr[rtot - rem:][d_mask[rtot - rem:]].sum())
                else:
                    scnts = [0, 0]
        if rcomp[0] / rtot * 100 > thres_e:
            # reference increments cfm before this filter (class2acc.c:241)
            continue
        ntot += rtot
        ncor += rcor
        nfne += rfne
        if rcomp[3] / rtot * 100 > thres_r:
            ntot_r += rtot
            ncor_r += rcor
            nfne_r += rfne
        else:
            ntot_n += rtot
            ncor_n += rcor
            nfne_n += rfne
        if P is not None:
            cov[0] = scnts[0] / rcomp[1] if rcomp[1] > 0 else -1
            cov[1] = scnts[1] / rcomp[2] if rcomp[2] > 0 else -1
            if cov[0] == -1 or cov[1] == -1 or cov[0] > cov[1]:
                cov[0] = cov[1] = -1
            else:
                cov[1] -= cov[0]
        if thres_lq is not None and \
                (rtot - rcor) / rtot * 100 >= thres_lq and \
                min_r <= rcomp[3] / rtot * 100 <= max_r:
            out.write(
                f"Read {rid:6d} ({len(tru.seq)} bp, {rtot} classes): "
                f"%error = {_cfmt((rtot - rcor) / rtot * 100, '4.1')} "
                f"[%E={_cfmt(rcomp[0] / rtot * 100, '4.1')},"
                f"%H={_cfmt(rcomp[1] / rtot * 100, '4.1')},"
                f"%D={_cfmt(rcomp[2] / rtot * 100, '4.1')},"
                f"%R={_cfmt(rcomp[3] / rtot * 100, '4.1')}] "
                f"[H1-cov={_cfmt(cov[0], '.0')},"
                f"H2-cov={_cfmt(cov[1], '.0')}]\n")
            if show_class:
                full_e = est.classes
                full_t = tru.classes
                masked = "".join(ec if ec != tc else "-"
                                 for ec, tc in zip(full_e, full_t))
                out.write(f"truth: {full_t}\n  est: {masked}\n")
    try:
        next(truth_iter)
        raise ValueError("truth has more reads than estimate")
    except StopIteration:
        pass
    return Accuracy(cfm, ntot, ncor, nfne, ntot_n, ncor_n, nfne_n,
                    ntot_r, ncor_r, nfne_r)


def main_run(est_path: str, truth_path: str, *, thres_e: int = 100,
             thres_r: int = 0, thres_lq: int | None = None,
             show_class: bool = False, min_r: int = 0, max_r: int = 100,
             window: int | None = None, prof_root: str | None = None,
             out: TextIO = sys.stdout) -> int:
    """CLI driver: stream diagnostics + final report to ``out``."""
    acc = class2acc(est_path, truth_path, thres_e=thres_e, thres_r=thres_r,
                    thres_lq=thres_lq, show_class=show_class, min_r=min_r,
                    max_r=max_r, window=window, prof_root=prof_root, out=out)
    out.write(acc.report() + "\n")
    return 0
