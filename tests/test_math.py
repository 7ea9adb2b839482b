"""Golden-value and oracle tests for the core statistical kernels.

Golden numbers come from the reference's compile-time static_asserts
(main_conversion.hpp:205-254) and hand-computed closed forms. The pure-python
oracles here are independent scalar transliterations of the documented
behavior; the jnp kernels must match them exactly in float64.
"""

import math

import numpy as np
import pytest

from uvc_tpu.ops import math as um

DBL_EPSILON = 2.220446049250313e-16


# ---------------------------------------------------------------------------
# scalar oracles (pure python, scalar, independent of the jnp implementation)


def oracle_binom_lr(prob, a, b, bidirectional=False, set_max_prob_to_one=False):
    if set_max_prob_to_one:
        prob = min(1.0, prob)
    prob = (prob + DBL_EPSILON) / (1.0 + 2.0 * DBL_EPSILON)
    a += DBL_EPSILON
    b += DBL_EPSILON
    A = prob * (a + b)
    B = (1.0 - prob) * (a + b)
    if bidirectional or a > A:
        return 10.0 / math.log(10.0) * (a * math.log(a / A) + b * math.log(b / B))
    return 0.0


def oracle_dp4_to_pcFA(overseq_frac, adp, adf, dpp, dpf,
                       pl_exponent=3.0, n_nats=math.log(501),
                       ad_avg=-1.0, dp_avg=-1.0, priorAD=0.5, priorDP=1.0,
                       bidirectional=True, overseq_frac_disabled=False):
    if not overseq_frac_disabled:
        dpf *= overseq_frac
        dpp *= overseq_frac
        adf *= overseq_frac
        adp *= overseq_frac
    dpf += priorDP
    dpp += priorDP
    adf += priorAD
    adp += priorAD
    nobiasFA = (adf + adp) / (dpf + dpp)
    if (adp / dpp) >= (adf / dpf):
        if bidirectional:
            dpf, dpp = dpp, dpf
            adf, adp = adp, adf
        else:
            return adp / dpp, nobiasFA
    bdf = dpf * 2 - adf
    bdp = dpp * 2 - adp
    adpassfrac = adp / (adp + adf)
    bdpassfrac = bdp / (bdp + bdf)
    if (not bidirectional) and ad_avg >= 0 and dp_avg >= 0:
        adpassfrac = ad_avg / (ad_avg + dp_avg * 0.9)
        bdpassfrac = 1.0 - adpassfrac
    infogain = adf * math.log((1.0 - adpassfrac) / (1.0 - bdpassfrac))
    if bidirectional:
        infogain += adp * math.log(adpassfrac / bdpassfrac)
    if infogain <= n_nats:
        return adf / dpf, nobiasFA
    return (max(adp / dpp, (adf / dpf) * math.exp((n_nats - infogain) / pl_exponent)),
            nobiasFA)


def oracle_infer_max_qual(max_qual, dec_qual, qual_distr, totDP):
    currvqual = 0
    currAD = 0
    maxvqual, argmaxAD, argmaxBQ = 0, 0, 0
    for idx in range(min(16, max_qual // dec_qual)):
        qd = qual_distr[idx]
        if qd == 0:
            continue
        currAD += qd
        currBQ = max_qual - dec_qual * idx
        expBQ = 10.0 / math.log(10.0) * math.log(totDP / currAD + DBL_EPSILON)
        currvqual = int(currAD * (currBQ - expBQ))
        if currvqual > maxvqual:
            argmaxAD, argmaxBQ, maxvqual = currAD, currBQ, currvqual
    return maxvqual, argmaxAD, argmaxBQ


# ---------------------------------------------------------------------------


def test_binom_lr_static_assert_goldens():
    assert abs(float(um.binom_10log10_likeratio(0.1, 10, 90))) < 1e-4
    v = float(um.binom_10log10_likeratio(0.1, 90, 10))
    assert 763 < v < 764
    assert abs(float(um.binom_10log10_likeratio(0.1, 1, 99))) < 1e-4
    # closed form: 10/log(10) * (90*log(9) + 10*log(1/9))
    closed = 10.0 / math.log(10.0) * (90 * math.log(9) + 10 * math.log(1.0 / 9.0))
    assert abs(v - closed) < 0.5


def test_binom_lr_matches_oracle():
    # XLA CPU's vectorized f64 log differs from libm by ~2e-9 relative, so
    # exact bit parity is impossible; final Phreds are integer-rounded, making
    # 1e-7 relative agreement sufficient for output parity.
    rng = np.random.default_rng(0)
    n = 200
    probs = rng.uniform(0.001, 0.999, n)
    a = rng.uniform(0, 200, n)
    b = rng.uniform(0, 200, n)
    for bidir in (False, True):
        got = np.asarray(um.binom_10log10_likeratio(probs, a, b, bidirectional=bidir))
        for i in range(n):
            want = oracle_binom_lr(probs[i], a[i], b[i], bidirectional=bidir)
            assert got[i] == pytest.approx(want, rel=1e-7, abs=1e-6), (probs[i], a[i], b[i], bidir)


def test_binom_lr_vectorized():
    probs = np.array([0.1, 0.1, 0.5])
    a = np.array([10.0, 90.0, 3.0])
    b = np.array([90.0, 10.0, 3.0])
    got = np.asarray(um.binom_10log10_likeratio(probs, a, b))
    for i in range(3):
        assert got[i] == pytest.approx(oracle_binom_lr(probs[i], a[i], b[i]), abs=1e-9)


def test_dp4_to_pcFA_matches_oracle():
    rng = np.random.default_rng(1)
    n = 300
    dpp = rng.uniform(0.0, 500.0, n)
    dpf = rng.uniform(0.0, 500.0, n)
    adp = rng.uniform(0.0, 1.0, n) * dpp
    adf = rng.uniform(0.0, 1.0, n) * dpf
    osf = rng.uniform(0.1, 3.0, n)
    for bidir in (True, False):
        for dis in (True, False):
            pc, nb = um.dp4_to_pcFA(osf, adp, adf, dpp, dpf,
                                    bidirectional=bidir, overseq_frac_disabled=dis)
            pc, nb = np.asarray(pc), np.asarray(nb)
            for i in range(n):
                want = oracle_dp4_to_pcFA(osf[i], adp[i], adf[i], dpp[i], dpf[i],
                                          bidirectional=bidir, overseq_frac_disabled=dis)
                assert pc[i] == pytest.approx(want[0], rel=1e-7), (adp[i], adf[i], dpp[i], dpf[i], bidir, dis)
                assert nb[i] == pytest.approx(want[1], rel=1e-7)


def test_dp4_to_pcFA_interpolation_branch():
    # non-bidirectional with avg key values >= 0 takes the interpolation path
    got = um.dp4_to_pcFA(1.0, 5.0, 50.0, 100.0, 100.0,
                         aADavgKeyVal=30.0, aDPavgKeyVal=60.0,
                         bidirectional=False)
    want = oracle_dp4_to_pcFA(1.0, 5.0, 50.0, 100.0, 100.0,
                              ad_avg=30.0, dp_avg=60.0, bidirectional=False)
    assert float(got[0]) == pytest.approx(want[0], rel=1e-10)


def test_dp4_no_bias_returns_fail_fraction():
    # pass and fail strata identical -> no info gain -> raw fail fraction
    pc, nobias = um.dp4_to_pcFA(1.0, 10.0, 10.0, 100.0, 100.0)
    assert float(pc) == pytest.approx((10.0 + 0.5) / (100.0 + 1.0), rel=1e-9)
    assert float(nobias) == pytest.approx(21.0 / 202.0, rel=1e-9)


def test_infer_max_qual_matches_oracle():
    rng = np.random.default_rng(2)
    n = 300
    distr = rng.integers(0, 30, size=(n, 16))
    distr[rng.random((n, 16)) < 0.4] = 0
    tot = (distr.sum(axis=1) + rng.integers(0, 100, n)).astype(np.int32)
    max_qual, dec_qual = 37, 2
    mv, ad, bq = um.infer_max_qual_assuming_independence(
        max_qual, dec_qual, distr.astype(np.int32), tot)
    mv, ad, bq = np.asarray(mv), np.asarray(ad), np.asarray(bq)
    for i in range(n):
        want = oracle_infer_max_qual(max_qual, dec_qual, list(distr[i]), int(tot[i]))
        assert (int(mv[i]), int(ad[i]), int(bq[i])) == want, (list(distr[i]), int(tot[i]))


def test_infer_max_qual_batched():
    distr = np.zeros((4, 16), dtype=np.int32)
    distr[1, 0] = 50
    distr[2, 3] = 10
    distr[3] = 5
    tot = np.array([10, 60, 20, 80], dtype=np.int32)
    mv, ad, bq = um.infer_max_qual_assuming_independence(37, 2, distr, tot)
    for i in range(4):
        want = oracle_infer_max_qual(37, 2, list(distr[i]), int(tot[i]))
        assert (int(mv[i]), int(ad[i]), int(bq[i])) == want


def test_phred_conversions():
    assert float(um.phred2prob(10)) == pytest.approx(0.1)
    # libm gives -10*log10(0.1) = 9.999999999999998, so the reference's
    # floor() yields 9 (verified against the compiled oracle in
    # tests/test_math_oracle.py)
    assert int(um.prob2phred(0.1)) == 9
    assert int(um.prob2phred(0.10001)) == 9  # floor semantics
    assert float(um.prob2realphred(0.01)) == pytest.approx(20.0)
    assert float(um.phred2nat(10.0)) == pytest.approx(math.log(10.0))
    assert float(um.nat2phred(math.log(10.0))) == pytest.approx(10.0)
    assert float(um.numstates2phred(10.0)) == pytest.approx(10.0)
    assert int(um.numstates2deciphred(10.0)) == 100


def test_prob_odds_logit():
    assert float(um.prob2odds(0.5)) == pytest.approx(1.0)
    assert float(um.odds2prob(1.0)) == pytest.approx(0.5)
    assert float(um.odds2prob(um.prob2odds(0.66))) == pytest.approx(0.66)
    assert float(um.logit2(1.0, 1.0)) == pytest.approx(0.0, abs=1e-12)


def test_calc_non_negative():
    # above threshold: identity
    assert float(um.calc_non_negative(15.0)) == 15.0
    # below: log1p(base^v)/log(base), smooth positive floor
    base = 10.0 ** 0.1
    v = -5.0
    assert float(um.calc_non_negative(v)) == pytest.approx(
        math.log1p(base ** v) / math.log(base))
    assert float(um.calc_non_negative(-100.0)) > 0.0


def test_proton_cigarlen2phred():
    # round(10*log10(len^3)) table (main_conversion.hpp:922-941)
    want = [0, 0, 9, 14, 18, 21, 23, 25, 27, 29, 30, 31, 32]
    got = [int(um.proton_cigarlen2phred(i)) for i in range(13)]
    assert got == want
    assert int(um.proton_cigarlen2phred(100)) == 32  # capped at 12


def test_calc_indel_weight():
    assert int(um.calc_indel_weight(2, 4)) == 1024 * 1024 * 8 // 512
    assert int(um.calc_indel_weight(1, 100)) == 1024 * 1024 // (100 ** 3)


def test_non_neg_minus():
    assert int(um.non_neg_minus(5, 3)) == 2
    assert int(um.non_neg_minus(3, 5)) == 0
