"""class2acc: accuracy evaluation of an estimated vs truth .class file
(ref class2acc.c:141-316).

Computes the 4x4 confusion matrix, overall / Normal / Repeat accuracy and
false-negative-error rates, with the reference's read filters:
``-f`` (skip reads with %E-mer above a cap) and ``-r`` (reads with %R-mer
above a threshold count as Repeat reads).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from classpro_tpu.io.classfile import read_class

_CTOS = np.zeros(256, dtype=np.int64)
for c, v in zip(b"ERHD", [0, 1, 2, 3]):
    _CTOS[c] = v


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
        lines.append(f"Accuracy = {self.accuracy:4.2f} % (= {self.ncor} / {self.ntot}), "
                     f"FN Error = {self.fn_error:4.2f} %")
        for name, (nc, nt, nf) in [
            ("Normal", (self.ncor_normal, self.ntot_normal, self.nfne_normal)),
            ("Repeat", (self.ncor_repeat, self.ntot_repeat, self.nfne_repeat)),
        ]:
            acc = nc / nt * 100 if nt else float("nan")
            fne = nf / nt * 100 if nt else float("nan")
            lines.append(f"[{name}] Accuracy = {acc:4.2f} % (= {nc} / {nt}), "
                         f"FN Error = {fne:4.2f} %")
        return "\n".join(lines)


def class2acc(est_path: str, truth_path: str, thres_e: int = 100,
              thres_r: int = 0) -> Accuracy:
    cfm = np.zeros((4, 4), dtype=np.int64)
    ntot = ncor = nfne = 0
    ntot_n = ncor_n = nfne_n = 0
    ntot_r = ncor_r = nfne_r = 0
    truth_iter = read_class(truth_path)
    for rid, est in enumerate(read_class(est_path)):
        try:
            tru = next(truth_iter)
        except StopIteration:
            raise ValueError("estimate has more reads than truth") from None
        if est.header.split()[0] != tru.header.split()[0]:
            raise ValueError(f"read {rid} name mismatch")
        if len(est.classes) != len(tru.classes):
            raise ValueError(f"read {rid} length mismatch")
        e = np.frombuffer(est.classes.encode(), dtype=np.uint8)
        t = np.frombuffer(tru.classes.encode(), dtype=np.uint8)
        body = t != ord("N")
        e, t = e[body], t[body]
        rtot = len(t)
        rcor = int(np.sum(e == t))
        rfne = int(np.sum((t == ord("E")) & (e != ord("E"))))
        rcomp_e = int(np.sum(t == ord("E")))
        rcomp_r = int(np.sum(t == ord("R")))
        ti, ei = _CTOS[t], _CTOS[e]
        np.add.at(cfm, (ti, ei), 1)
        if rcomp_e / rtot * 100 > thres_e:
            # reference increments cfm before this filter (class2acc.c:206,247)
            continue
        ntot += rtot
        ncor += rcor
        nfne += rfne
        if rcomp_r / rtot * 100 > thres_r:
            ntot_r += rtot
            ncor_r += rcor
            nfne_r += rfne
        else:
            ntot_n += rtot
            ncor_n += rcor
            nfne_n += rfne
    return Accuracy(cfm, ntot, ncor, nfne, ntot_n, ncor_n, nfne_n,
                    ntot_r, ncor_r, nfne_r)
