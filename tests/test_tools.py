"""ClassGS / prof2class / class2acc golden and behavior tests."""
import gzip
import json
import pathlib

import numpy as np

from classpro_tpu.io.fastk import open_profiles
from classpro_tpu.io.fastx import read_fastx
from classpro_tpu.tools.classgs import classify_gs_profile, classify_gs_file
from classpro_tpu.tools.class2acc import class2acc
from classpro_tpu.tools.prof2class import truth_from_profile

FIX = pathlib.Path(__file__).parent / "fixtures"


def test_classgs_golden_tiny():
    meta = json.loads((FIX / "tiny" / "meta.json").read_text())
    thres = tuple(meta["gs_thres"])
    gold_lines = gzip.open(FIX / "tiny" / "golden.gs.class.gz", "rt").read().splitlines()
    recs = list(classify_gs_file(str(FIX / "tiny" / "reads.fasta.gz"),
                                 str(FIX / "tiny" / "reads"), thres))
    ours = []
    for r in recs:
        ours += [r.header, r.seq, "+", r.classes]
    assert ours == gold_lines


def test_classgs_profile_mapping():
    prof = np.array([0, 5, 6, 20, 21, 40, 41, 100], dtype=np.uint16)
    assert classify_gs_profile(prof, (6, 21, 41)) == "EEHHDDRR"


def test_truth_from_profile():
    prof = np.array([0, 1, 2, 3, 40], dtype=np.uint16)
    assert truth_from_profile(prof) == "EHDRR"


def test_class2acc_self_is_perfect(tmp_path):
    src = FIX / "tiny" / "golden.class.gz"
    p = tmp_path / "x.class"
    p.write_bytes(gzip.decompress(src.read_bytes()))
    acc = class2acc(str(p), str(p))
    assert acc.accuracy == 100.0
    assert acc.fn_error == 0.0


def test_class2acc_vs_reference_numbers(tmp_path):
    est = tmp_path / "est.class"
    tru = tmp_path / "tru.class"
    est.write_bytes(gzip.decompress((FIX / "tiny" / "golden.class.gz").read_bytes()))
    tru.write_bytes(gzip.decompress((FIX / "tiny" / "reads.truth.class.gz").read_bytes()))
    acc = class2acc(str(est), str(tru))
    # numbers printed by the reference class2acc on this fixture pair
    assert acc.ntot == 892969
    assert acc.ncor == 857290
    assert abs(acc.accuracy - 96.00) < 0.005


def test_class2acc_full_flag_goldens(tmp_path):
    """Full-flag stdout is byte-equal to the reference class2acc binary
    (goldens produced by /tmp/refbuild/class2acc on the tiny fixture;
    covers -e/-s/-m/-n/-p/-w/-f/-r, class2acc.c:33-48)."""
    import io

    from classpro_tpu.tools.class2acc import main_run

    est = tmp_path / "est.class"
    tru = tmp_path / "tru.class"
    est.write_bytes(gzip.decompress((FIX / "tiny" / "golden.class.gz").read_bytes()))
    tru.write_bytes(gzip.decompress((FIX / "tiny" / "reads.truth.class.gz").read_bytes()))
    for fn in ("reads.prof", ".reads.pidx.1", ".reads.prof.1"):
        (tmp_path / fn).write_bytes((FIX / "tiny" / fn).read_bytes())
    prof = str(tmp_path / "reads")
    cases = {
        "golden.c2a.e0spw500.txt.gz": dict(thres_lq=0, show_class=True,
                                           prof_root=prof, window=500),
        "golden.c2a.e2m20n95p.txt.gz": dict(thres_lq=2, min_r=20, max_r=95,
                                            prof_root=prof),
        "golden.c2a.f30r60.txt.gz": dict(thres_e=30, thres_r=60),
    }
    for name, kw in cases.items():
        out = io.StringIO()
        main_run(str(est), str(tru), out=out, **kw)
        want = gzip.decompress((FIX / "tiny" / name).read_bytes()).decode()
        assert out.getvalue() == want, name
