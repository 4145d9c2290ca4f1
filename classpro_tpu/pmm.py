"""Per-read Poisson-mixture coverage estimation via variational
inference (ref hist.c:145-310, the optional DO_PMM feature).

The reference computes, per read, a 2-component Poisson mixture fit of
the "normal" counts (within [H - 3*sqrt(H), D + 3*sqrt(D)]) to get local
H/D coverages; in the released code the result only feeds diagnostics
(ClassPro.c:255-259 — it is compiled out by default and its output is
not consumed by classification), so this port is the same opt-in
analysis: classify --pmm reports per-read coverage estimates.

Same equations as hist.c: the same prior construction (hist.c:106-127,
fed the Modify_Histogram instance-count view) and the same VI
updates/convergence/isolation rules (pmm_vi, hist.c:159-310).

Digamma quirk, measured not assumed: the reference NEVER calls
precompute_digamma — ClassPro.c:540 comments the call out — so in
every binary the project can build (-DDO_PMM only takes effect after
also removing ClassPro.h:36's `#undef DO_PMM`), the 1e7-entry digamma
table is ZERO.  The parity default here replicates that compiled
behavior (digamma(n) = 0 everywhere) and is byte-checked against a
`pmm_harness` build of the reference (tools/build_reference.py,
tests/test_aux.py golden.pmm.gz: 398/398 reads bitwise-equal on the
medium fixture).  ``PmmModel(..., corrected=True)`` instead uses the
harmonic-series table precompute_digamma would have built
(hist.c:20-26, grown on demand instead of a fixed 1e7-entry table) —
the estimator the code plainly intended.
"""

from __future__ import annotations

import math

import numpy as np

from classpro_tpu.estimation import GlobalModel
from classpro_tpu.numerics import logp_poisson, minus_sigma, plus_sigma

PMM_MAX_NITER = 10
GAMMA_WEIGHT = (1, 1)
ALPHA_WEIGHT = 1

_EULER = -0.57721566490153


class _Digamma:
    """digamma at integer arguments, digamma[n+1] = digamma[n] + 1/n
    with left-to-right accumulation (identical rounding to hist.c)."""

    def __init__(self):
        self.tab = np.array([0.0, _EULER])

    def __call__(self, n: int) -> float:
        if n >= len(self.tab):
            old = self.tab
            grow = max(n + 1, 2 * len(old))
            tab = np.empty(grow)
            tab[: len(old)] = old
            for i in range(len(old), grow):   # sequential, C order
                tab[i] = tab[i - 1] + 1.0 / (i - 1)
            self.tab = tab
        return float(self.tab[n])


_harmonic_digamma = _Digamma()


def _zero_digamma(n: int) -> float:
    """The as-compiled reference's digamma: the table is never
    initialized (ClassPro.c:540), so every lookup reads 0.0."""
    return 0.0


class PmmModel:
    """Priors derived from the global histogram (hist.c:106-127).

    ``hist`` must be the instance-count view (unique counts multiplied
    by their count — Modify_Histogram semantics, libfastk.c:100-148),
    indexed absolutely by count; ``Histogram.instance_counts()``
    provides it.  ``corrected=False`` (default) replicates the
    as-compiled reference bit-for-bit (zero digamma, see module
    docstring); ``corrected=True`` uses the real harmonic-series
    digamma."""

    def __init__(self, gm: GlobalModel, hist: np.ndarray,
                 corrected: bool = False):
        _digamma = _harmonic_digamma if corrected else _zero_digamma
        self._digamma = _digamma
        lam = (int(gm.cov[2]), int(gm.cov[3]))     # (H, D)
        self.lambda_prior = lam
        self.b_prior = list(GAMMA_WEIGHT)
        self.a_prior = [lam[k] * self.b_prior[k] for k in range(2)]
        totpk = []
        for k in range(2):
            p = math.exp(logp_poisson(lam[k], lam[k]))
            h = hist[lam[k]] if lam[k] < len(hist) else 0
            totpk.append(float(h) / p)
        minidx = 0 if totpk[0] < totpk[1] else 1
        self.alpha_prior = [0, 0]
        self.alpha_prior[minidx] = ALPHA_WEIGHT
        self.alpha_prior[1 - minidx] = int(
            ALPHA_WEIGHT * (totpk[1 - minidx] / totpk[minidx]))
        dg_sum = _digamma(self.alpha_prior[0] + self.alpha_prior[1])
        self.dg_sum_alpha_prior = dg_sum
        self.eta_weight_k_prior = [
            _digamma(self.a_prior[k]) - math.log(self.b_prior[k])
            for k in range(2)]
        self.eta_const_k_prior = [
            _digamma(self.alpha_prior[k]) - dg_sum
            - self.a_prior[k] / self.b_prior[k] for k in range(2)]

    def pmm_vi(self, profile: np.ndarray) -> tuple[int, list[float]]:
        """One read's VI fit (pmm_vi, hist.c:159-310).  Returns
        (#normal counts, [local H cov, local D cov])."""
        lamH, lamD = self.lambda_prior
        ethres = minus_sigma(lamH, 3)
        rthres = plus_sigma(lamD, 3)
        a = list(self.a_prior)
        b = list(self.b_prior)
        alpha = list(self.alpha_prior)
        lam = [float(lamH), float(lamD)]

        nprof = profile[(profile >= ethres) & (profile <= rthres)]
        nprof = nprof.astype(np.float64)
        N = len(nprof)
        if N < 2:
            return N, lam

        for t in range(PMM_MAX_NITER):
            if t == 0:
                ew = list(self.eta_weight_k_prior)
                ec = list(self.eta_const_k_prior)
            else:
                dg = self._digamma
                dg_sum = dg(int(alpha[0] + alpha[1]))
                ew = [dg(int(a[k])) - math.log(b[k]) for k in range(2)]
                ec = [dg(int(alpha[k])) - dg_sum - a[k] / b[k]
                      for k in range(2)]
            eta = np.exp(nprof[:, None] * np.asarray(ew)[None, :]
                         + np.asarray(ec)[None, :])
            eta /= eta.sum(axis=1, keepdims=True)

            a_new = (eta * nprof[:, None]).sum(axis=0)
            b_new = eta.sum(axis=0)
            alpha = [b_new[k] + self.alpha_prior[k] for k in range(2)]
            a = [a_new[k] + self.a_prior[k] for k in range(2)]
            b = [b_new[k] + self.b_prior[k] for k in range(2)]

            converged = True
            for k in range(2):
                new = a[k] / b[k]
                if abs(lam[k] - new) >= 0.1:
                    converged = False
                lam[k] = new
            if converged:
                break

        # isolate H and D if too close (hist.c:285-308)
        if abs(lam[0] - lam[1]) < math.sqrt(lam[1]):
            mean = (lam[0] + lam[1]) / 2
            if abs(mean - lamH) < abs(mean - lamD):
                lam[1] = lam[0] * 2
            else:
                lam[0] = lam[1] / 2
        return N, lam
