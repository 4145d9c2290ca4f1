#!/usr/bin/env python3
"""Build the reference oracle binaries into /tmp/refbuild (dev-time only).

Copies /root/reference/src (read-only upstream) into /tmp/refbuild, applies
the single GSL-free patch (replace `polynomialfit` in wall.c — which uses
gsl_multifit_linear — with closed-form normal equations + Gaussian
elimination with partial pivoting; replicated op-for-op by
`classpro_tpu.estimation._quadfit` so -M runs stay bit-comparable), and
compiles every tool.  Optionally builds a --coverage instrumented copy into
/tmp/refcov for gcov-driven branch-coverage work.

Usage:
    python3 tools/build_reference.py [--coverage]
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys

SRC = "/root/reference/src"

PATCH = """\
static void polynomialfit(int N, int degree, double *data_x, double *data_y, double *coef)
{ double A[16][16], b[16], px[16];
  int i, j, k, l, piv;
  for (j = 0; j < degree; j++)
    { b[j] = 0.;
      for (k = 0; k < degree; k++)
        A[j][k] = 0.;
    }
  for (i = 0; i < N; i++)
    { px[0] = 1.;
      for (j = 1; j < degree; j++)
        px[j] = px[j-1]*data_x[i];
      for (j = 0; j < degree; j++)
        { b[j] += px[j]*data_y[i];
          for (k = 0; k < degree; k++)
            A[j][k] += px[j]*px[k];
        }
    }
  for (j = 0; j < degree; j++)
    { piv = j;
      for (k = j+1; k < degree; k++)
        if (fabs(A[k][j]) > fabs(A[piv][j]))
          piv = k;
      if (piv != j)
        { double tmp;
          for (l = 0; l < degree; l++)
            { tmp = A[j][l]; A[j][l] = A[piv][l]; A[piv][l] = tmp; }
          tmp = b[j]; b[j] = b[piv]; b[piv] = tmp;
        }
      for (k = j+1; k < degree; k++)
        { double f = A[k][j]/A[j][j];
          for (l = j; l < degree; l++)
            A[k][l] -= f*A[j][l];
          b[k] -= f*b[j];
        }
    }
  for (j = degree-1; j >= 0; j--)
    { double s = b[j];
      for (k = j+1; k < degree; k++)
        s -= A[j][k]*coef[k];
      coef[j] = s/A[j][j];
    }
  return;
}
"""

TOOLS = {
    "ClassPro": ["ClassPro.c", "benchmark.c", "libfastk.c", "DB.c", "QV.c"],
    "ClassGS": ["ClassGS.c", "libfastk.c", "DB.c", "QV.c"],
    "class2acc": ["class2acc.c", "libfastk.c", "DB.c", "QV.c"],
    "class2cns": ["class2cns.c", "libfastk.c", "DB.c", "QV.c"],
    "prof2class": ["prof2class.c", "libfastk.c", "DB.c", "QV.c"],
    "RepDepAnno": ["RepDepAnno.c", "libfastk.c", "DB.c", "QV.c"],
    "ShowSeeds": ["ShowSeeds.c", "libfastk.c", "DB.c", "QV.c"],
}

# Dev-only parity harness: per-read pmm_vi from the as-compiled
# reference (hist.c:159-310).  Two deliberate reference quirks are
# preserved, measured not assumed: ClassPro.h:36 force-#undefs DO_PMM
# (so -DDO_PMM alone is a no-op — it must be re-defined after the
# header), and ClassPro.c:540 never calls precompute_digamma (so the
# digamma table every real build would use is all zeros).  Output: one
# "N lambda_H lambda_D" line per read (%.17g) — the source of
# tests/fixtures/medium/golden.pmm.gz.
PMM_HARNESS = """\
#include <stdio.h>
#include <stdlib.h>
#include <stdbool.h>
#include <string.h>
#include <math.h>
#include <float.h>
#include "ClassPro.h"
#undef DO_PMM
#define DO_PMM   /* ClassPro.h force-undefs it; re-enable for the harness */
#include "const.c"
#include "prob.c"
#include "util.c"
#include "hist.c"

bool VERBOSE = false;
char *Prog_Name = "pmm_harness";

int main(int argc, char **argv)
{ if (argc < 2)
    { fprintf(stderr, "usage: pmm_harness <fastk_root> [coverage]\\n");
      exit(1);
    }
  int cov = (argc > 2) ? atoi(argv[2]) : 0;
  precompute_logfact();
  process_global_hist(argv[1], cov);
  Profile_Index *P = Open_Profiles(argv[1]);
  if (P == NULL)
    { fprintf(stderr, "cannot open profiles\\n"); exit(1); }
  int rlen_max = 1000000;
  PMM_Arg *parg = alloc_pmm_arg(rlen_max);
  cnt_t *profile = malloc(rlen_max * sizeof(cnt_t));
  double lambda[2];
  for (int64 id = 0; id < P->nreads; id++)
    { int plen = Fetch_Profile(P, id, rlen_max, profile);
      int n = pmm_vi(parg, profile, plen, lambda);
      printf("%d %.17g %.17g\\n", n, lambda[0], lambda[1]);
    }
  return 0;
}
"""


def patch_wall(path: str) -> None:
    with open(path) as f:
        text = f.read()
    text = text.replace("#include <gsl/gsl_multifit.h>\n", "")
    # Replace the original polynomialfit body (up to its closing brace line)
    m = re.search(
        r"static void polynomialfit\(.*?\n\}\n", text, flags=re.S)
    assert m is not None, "polynomialfit not found in wall.c"
    text = text[: m.start()] + PATCH + text[m.end():]
    with open(path, "w") as f:
        f.write(text)


def build(dest: str, coverage: bool) -> None:
    os.makedirs(dest, exist_ok=True)
    for fn in os.listdir(SRC):
        if fn.endswith((".c", ".h")):
            shutil.copy(os.path.join(SRC, fn), dest)
    patch_wall(os.path.join(dest, "wall.c"))
    flags = ["-O3", "-w"]
    if coverage:
        flags = ["-O0", "-w", "--coverage"]
    for name, srcs in TOOLS.items():
        cmd = ["gcc", *flags, "-o", name, *srcs, "-lm", "-lz", "-lpthread"]
        subprocess.run(cmd, cwd=dest, check=True)
        print(f"built {dest}/{name}")
    with open(os.path.join(dest, "pmm_harness.c"), "w") as f:
        f.write(PMM_HARNESS)
    subprocess.run(["gcc", *flags, "-o", "pmm_harness", "pmm_harness.c",
                    "libfastk.c", "-lm", "-lz", "-lpthread"],
                   cwd=dest, check=True)
    print(f"built {dest}/pmm_harness")


def main() -> None:
    coverage = "--coverage" in sys.argv
    build("/tmp/refcov" if coverage else "/tmp/refbuild", coverage)


if __name__ == "__main__":
    main()
