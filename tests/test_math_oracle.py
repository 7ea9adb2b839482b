"""Pin the python math kernels against the COMPILED reference functions.

tools/math_oracle.py builds main_conversion.hpp (+ the two indel-phred
functions from main.hpp) with plain g++ behind a 20-line htslib shim, so
these sweeps compare against the reference itself rather than a
reimplementation (VERDICT round-1, task 2).  Floats must agree to <=1e-12
relative, integers exactly.
"""

import itertools
import math
import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import math_oracle  # noqa: E402
from uvc_tpu.ops import math as m  # noqa: E402
from uvc_tpu.pileup import strscan  # noqa: E402

REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")
pytestmark = pytest.mark.skipif(
    not (os.path.exists(os.path.join(REF, "main_conversion.hpp"))
         and shutil.which("g++")),
    reason="reference source or g++ unavailable")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    work = tmp_path_factory.mktemp("math_oracle")
    return math_oracle.build_oracle(str(work))


def _close(a, b, rtol=1e-12):
    return math.isclose(a, b, rel_tol=rtol, abs_tol=1e-12)


def test_binom_lr_sweep(oracle):
    probs = [0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    counts = [0.0, 0.5, 1.0, 2.0, 5.0, 10.0, 37.0, 100.0, 1234.5]
    queries, args = [], []
    for p, a, b in itertools.product(probs, counts, counts):
        queries.append(f"binom {p!r} {a!r} {b!r}")
        args.append((p, a, b))
    out = math_oracle.query(oracle, queries)
    for (p, a, b), line in zip(args, out):
        uni, bi = map(float, line.split())
        got_uni = float(m.binom_10log10_likeratio(p, a, b))
        got_bi = float(m.binom_10log10_likeratio(p, a, b,
                                                 bidirectional=True))
        assert _close(got_uni, uni), (p, a, b, got_uni, uni)
        assert _close(got_bi, bi), (p, a, b, got_bi, bi)


def test_dp4_to_pcFA_sweep(oracle):
    rng = np.random.RandomState(0)
    cases = []
    for _ in range(400):
        dpp = rng.uniform(0.0, 200.0)
        dpf = rng.uniform(0.0, 200.0)
        adp = rng.uniform(0.0, 1.0) * dpp
        adf = rng.uniform(0.0, 1.0) * dpf
        osf = rng.uniform(0.05, 1.0)
        pl = rng.choice([2.0, 3.0, 5.0])
        nats = rng.choice([math.log(31 + 1), math.log(500 + 1)])
        if rng.rand() < 0.3:
            adk, dpk = rng.uniform(0, 100), rng.uniform(0, 100)
        else:
            adk = dpk = -1.0
        pad = rng.choice([0.5, 1.0])
        pdp = rng.choice([1.0, 2.0])
        bidir = int(rng.rand() < 0.5)
        osf_dis = int(rng.rand() < 0.5)
        cases.append((bidir, osf_dis, osf, adp, adf, dpp, dpf, pl, nats,
                      adk, dpk, pad, pdp))
    out = math_oracle.query(
        oracle, [f"dp4 {c[0]} {c[1]} "
                 + " ".join(repr(float(x)) for x in c[2:]) for c in cases])
    for c, line in zip(cases, out):
        bidir, osf_dis, osf, adp, adf, dpp, dpf, pl, nats, adk, dpk, pad, pdp = c
        want0, want1 = map(float, line.split())
        got = m.dp4_to_pcFA(osf, adp, adf, dpp, dpf, pl, nats,
                            aADavgKeyVal=adk, aDPavgKeyVal=dpk,
                            priorAD=pad, priorDP=pdp,
                            bidirectional=bool(bidir),
                            overseq_frac_disabled=bool(osf_dis))
        got0 = float(np.asarray(got[0]).ravel()[0])
        got1 = float(np.asarray(got[1]).ravel()[0])
        assert _close(got0, want0, 1e-11), (c, got0, want0)
        assert _close(got1, want1, 1e-11), (c, got1, want1)


def test_infer_max_qual_sweep(oracle):
    rng = np.random.RandomState(1)
    cases = []
    for _ in range(300):
        distr = rng.poisson(2, size=16).astype(int)
        max_qual = int(rng.choice([40, 50, 60, 64]))
        dec_qual = int(rng.choice([2, 3, 4]))
        totdp = int(distr.sum() + rng.randint(0, 50))
        cases.append((max_qual, dec_qual, distr, totdp))
    q = [f"imq {mq} {dq} " + " ".join(map(str, d)) + f" {t}"
         for mq, dq, d, t in cases]
    out = math_oracle.query(oracle, q)
    for (mq, dq, d, t), line in zip(cases, out):
        want = tuple(map(int, line.split()))
        maxv, argad, argbq = m.infer_max_qual_assuming_independence(
            mq, dq, np.asarray(d, dtype=np.int64)[None, :], np.array([t]))
        got = (int(np.asarray(maxv).ravel()[0]),
               int(np.asarray(argad).ravel()[0]),
               int(np.asarray(argbq).ravel()[0]))
        assert got == want, (mq, dq, list(d), t, got, want)


def test_proton_cigarlen2phred_exact(oracle):
    lens = list(range(1, 20))
    out = math_oracle.query(oracle, [f"proton {l}" for l in lens])
    for l, line in zip(lens, out):
        assert int(m.proton_cigarlen2phred(l)) == int(line), l


def test_indel_phred_exact(oracle):
    cases = [(af, rs, rn)
             for af in (5.0, 18.0, 75.0, 100.0)
             for rs in (1, 2, 3, 6)
             for rn in (1, 2, 5, 10, 40, 100)]
    out = math_oracle.query(
        oracle, [f"indelphred {af!r} {rs} {rn}" for af, rs, rn in cases])
    for (af, rs, rn), line in zip(cases, out):
        got = int(np.asarray(strscan.indel_phred(af, rs, rn)).ravel()[0])
        assert got == int(line), (af, rs, rn, got, line)


def test_indel_len_rusize_phred_exact(oracle):
    cases = [(il, ru) for il in range(1, 40) for ru in (1, 2, 3, 6)]
    out = math_oracle.query(oracle,
                            [f"rusize {il} {ru}" for il, ru in cases])
    for (il, ru), line in zip(cases, out):
        got = int(np.asarray(strscan.indel_len_rusize_phred(il, ru)).ravel()[0])
        assert got == int(line), (il, ru, got, line)


def test_calc_non_negative_and_prob2phred(oracle):
    vals = [-50.0, -10.0, -1.0, 0.0, 0.5, 5.0, 9.999, 10.0, 35.5, 200.0]
    out = math_oracle.query(oracle, [f"nonneg {v!r}" for v in vals])
    for v, line in zip(vals, out):
        assert _close(float(m.calc_non_negative(v)), float(line), 1e-12), v
    probs = [1e-9, 1e-4, 0.01, 0.5, 0.9, 0.999, 1.0]
    out = math_oracle.query(oracle, [f"prob2phred {p!r}" for p in probs])
    for p, line in zip(probs, out):
        ip, rp = line.split()
        assert int(m.prob2phred(p)) == int(ip), p
        assert _close(float(m.prob2realphred(p)), float(rp)), p
