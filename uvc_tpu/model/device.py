"""TPU device model: the jittable per-column quality pipeline.

This is the VPU hot loop of the caller (SURVEY.md §7 "model/"): given the
dense per-(region, position, symbol) count tensors produced by the pileup
engines, compute the bias-corrected effective depths (the dp4_to_pcFA
battery of BcfFormat_symbol_calc_DPv) and the final variant qualities
(calc_qual power-law/binomial tiers) for every column — pure elementwise
jnp math over [B, P, 14] tensors, fully shardable over a device mesh:

  dp  - region-batch axis B (data parallel)
  sp  - position axis P (sequence parallel; all ops are local to a
        position except symboltype sums over the last axis, which is
        replicated, so no halo is needed here — halos live in the pileup
        tensorization)

The host (numpy) model in dpv.py/qual.py is the bit-faithful reference;
this device model carries the throughput-critical math and is validated
against it in tests (f32 vs f64 tolerances).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NUM_SYMBOLS
from ..ops import math as um

NS = NUM_SYMBOLS
F32 = jnp.float32

# count-tensor channels consumed by the device model, in layout order
CHANNELS = (
    "aDPff aDPfr aDPrf aDPrr aLP1 aLP2 aLPL aRP1 aRP2 aRPL "
    "aLB1 aLB2 aLBL aRB1 aRB2 aRBL aLI1 aLI2 aRI1 aRI2 aRIf aLIr "
    "aBQ2 aPF1 aPF2 aP1 aP2 aP3 "
    "bDPf bDPr bTAf bTAr bTBf bTBr bIAQb bIADb "
    "cDP1f cDP1r cDP12f cDP12r cDP2f cDP2r cDP3f cDP3r "
    "cIAQf cIADf cIDQf cIAQr cIADr cIDQr "
    "bMQ aBQQ bNMQ gapLen bDPa cDP0a aMQs"
).split()
N_CHANNELS = len(CHANNELS)
CH = {nm: i for i, nm in enumerate(CHANNELS)}


def type_sum(x):
    """Symboltype sums broadcast back over the symbol axis ([..., 14])."""
    base = jnp.sum(x[..., :6], axis=-1, keepdims=True)
    link = jnp.sum(x[..., 6:], axis=-1, keepdims=True)
    return jnp.concatenate([jnp.repeat(base, 6, axis=-1),
                            jnp.repeat(link, 8, axis=-1)], axis=-1)


@partial(jax.jit, static_argnames=("powlaw_exponent", "anyvar_base",
                                   "use_pallas"))
def quality_model(counts, powlaw_exponent=3.0, anyvar_base=90.0,
                  use_pallas=False):
    """counts: [B, P, N_CHANNELS, 14] float32 -> dict of [B, P, 14] outputs.

    The core DPv + calc_qual math (main.hpp:4253-5343, principal terms):
    positional/BAQ/insert-end/strand/orientation dp4 batteries, v/w/x
    effective-depth reductions, power-law + binomial quality tiers, and
    the final cVQ1/cVQ2 minima, plus the tumor-only TLODQ join.
    """
    c = {nm: counts[..., i, :] for nm, i in CH.items()}
    pl = powlaw_exponent

    aDP = c["aDPff"] + c["aDPfr"] + c["aDPrf"] + c["aDPrr"]
    ADP = type_sum(aDP)
    bDP = c["bDPf"] + c["bDPr"]
    BDP = type_sum(bDP)
    cDP1 = c["cDP1f"] + c["cDP1r"]
    CDP1 = type_sum(cDP1)
    cDP2 = c["cDP2f"] + c["cDP2r"]
    CDP2 = type_sum(cDP2)
    cDP3 = c["cDP3f"] + c["cDP3r"]
    CDP3 = type_sum(cDP3)
    cDP12 = c["cDP12f"] + c["cDP12r"]
    CDP12 = type_sum(cDP12)

    pfa = 0.5
    aDPFA = (aDP + pfa) / (ADP + 1.0)
    bFA = (c["bDPa"] + pfa) / (BDP + 1.0)
    cFA0 = (c["cDP0a"] + pfa) / (CDP1 + 1.0)
    c2altpc = 0.025
    cFA2 = (cDP2 + c2altpc) / (CDP2 + 1.0)
    cFA3 = (cDP3 + c2altpc) / (CDP3 + 1.0)
    aPFFA = (c["aPF1"] + pfa * 100.0) / (type_sum(c["aPF2"])
                                         + (c["aPF1"] - c["aPF2"]) + 100.0)

    dedup_frac = jnp.maximum(
        jnp.minimum(1.0, jnp.maximum(CDP1, 800.0) / jnp.maximum(type_sum(aDP), 1.0)),
        jnp.minimum(1.0, jnp.maximum(cDP1, 3.0) / jnp.maximum(aDP, 1.0)))

    prior_pos = um.phred2nat(40.0)

    def battery_args(a1, A2, a2, aL, AL, aB, AB):
        adkv = jnp.maximum(1.0, aL) / jnp.maximum(1.0, aB)
        dpkv = jnp.maximum(1.0, AL) / jnp.maximum(1.0, AB)
        return a1, A2 + a1 - a2, adkv, dpkv

    batt = [
        battery_args(c["aLP1"], type_sum(c["aLP2"]), c["aLP2"],
                     c["aLPL"], type_sum(c["aLPL"]), c["aBQ2"],
                     type_sum(c["aBQ2"])),
        battery_args(c["aRP1"], type_sum(c["aRP2"]), c["aRP2"],
                     c["aRPL"], type_sum(c["aRPL"]), c["aBQ2"],
                     type_sum(c["aBQ2"])),
        battery_args(c["aLB1"], type_sum(c["aLB2"]), c["aLB2"],
                     c["aLBL"], type_sum(c["aLBL"]), c["aBQ2"],
                     type_sum(c["aBQ2"])),
        battery_args(c["aRB1"], type_sum(c["aRB2"]), c["aRB2"],
                     c["aRBL"], type_sum(c["aRBL"]), c["aBQ2"],
                     type_sum(c["aBQ2"])),
    ]
    if use_pallas:
        from ..ops import pallas_kernels as pk
        aLPFA, aRPFA, aLBFA, aRBFA = pk.dp4_battery4(
            dedup_frac, aDP, ADP, batt, pl_exp=pl, n_nats=prior_pos)
    else:
        res = [um.dp4_to_pcFA(dedup_frac, a1, aDP, a2m, ADP, pl, prior_pos,
                              adkv, dpkv, 0.5, 1.0, bidirectional=False)[0]
               for a1, a2m, adkv, dpkv in batt]
        aLPFA, aRPFA, aLBFA, aRBFA = res

    ADPxr = type_sum(c["aDPfr"] + c["aDPrr"])
    ALI2 = type_sum(c["aLI2"])
    ALpd = (ALI2 + 0.5) / (ADPxr - ALI2 + 0.5)
    aLpd = (c["aLI1"] + ALpd / (1 + ALpd)) / (
        c["aDPfr"] + c["aDPrr"] - c["aLI1"] + 1.0 / (1 + ALpd))
    aLIFA, aLI_nb = um.dp4_to_pcFA(
        dedup_frac, c["aLI1"], c["aDPfr"] + c["aDPrr"],
        ALI2 + c["aLI1"] - c["aLI2"], ADPxr, pl, um.phred2nat(45.0),
        aLpd, ALpd, 0.25, 0.5, bidirectional=False)
    aLIFA = aLIFA * jnp.maximum(1.0, aDPFA / aLI_nb)
    ADPxf = type_sum(c["aDPff"] + c["aDPrf"])
    ARI2 = type_sum(c["aRI2"])
    ARpd = (ARI2 + 0.5) / (ADPxf - ARI2 + 0.5)
    aRpd = (c["aRI1"] + ARpd / (1 + ARpd)) / (
        c["aDPff"] + c["aDPrf"] - c["aRI1"] + 1.0 / (1 + ARpd))
    aRIFA, aRI_nb = um.dp4_to_pcFA(
        dedup_frac, c["aRI1"], c["aDPff"] + c["aDPrf"],
        ARI2 + c["aRI1"] - c["aRI2"], ADPxf, pl, um.phred2nat(45.0),
        aRpd, ARpd, 0.25, 0.5, bidirectional=False)
    aRIFA = aRIFA * jnp.maximum(1.0, aDPFA / aRI_nb)
    aSIFA = jnp.maximum(
        (c["aLI1"] + 0.5) / (ALI2 + c["aLI1"] - c["aLI2"] + 1.0),
        (c["aRI1"] + 0.5) / (ARI2 + c["aRI1"] - c["aRI2"] + 1.0))

    aSSprior = um.phred2nat(jnp.minimum(c["aBQ"] if "aBQ" in c else 30.0,
                                        c["bMQ"]) + 10.0)
    aSSFA, aSS_nb = um.dp4_to_pcFA(dedup_frac, c["aRIf"], c["aLIr"],
                                   type_sum(c["aRIf"]), type_sum(c["aLIr"]),
                                   pl, aSSprior, bidirectional=True)
    ori_prior = jnp.log(jnp.square(jnp.maximum(aDPFA, 0.004))) + um.phred2nat(45.0)
    cROFA1, _ = um.dp4_to_pcFA(dedup_frac, c["cDP1f"], c["cDP1r"],
                               type_sum(c["cDP1f"]), type_sum(c["cDP1r"]),
                               pl, ori_prior, bidirectional=True)
    cROFA2, _ = um.dp4_to_pcFA(-1.0, c["cDP2f"], c["cDP2r"],
                               type_sum(c["cDP2f"]), type_sum(c["cDP2r"]),
                               pl, ori_prior, priorAD=c2altpc, priorDP=1.0,
                               bidirectional=True, overseq_frac_disabled=True)

    aLPFA2 = jnp.maximum(aDPFA * 0.01, aLPFA)
    aRPFA2 = jnp.maximum(aDPFA * 0.01, aRPFA)
    aLBFA2 = jnp.maximum(aDPFA * 0.01, aLBFA)
    aRBFA2 = jnp.maximum(aDPFA * 0.01, aRBFA)
    aLIFA2 = jnp.maximum(aDPFA * 0.01, aLIFA)
    aRIFA2 = jnp.maximum(aDPFA * 0.01, aRIFA)
    aSSFA2 = jnp.maximum(aDPFA * 0.05, aSSFA)
    cROFA1 = jnp.maximum(aDPFA * 1e-4, cROFA1)
    cROFA2 = jnp.maximum(aDPFA * 1e-4, cROFA2)

    fBTA = type_sum(c["bTAf"] + c["bTAr"]) + 200.0
    fBTB = type_sum(c["bTBf"] + c["bTBr"]) + 6.0
    fbTA = c["bTAf"] + c["bTAr"] + 100.0
    fbTB = c["bTBf"] + c["bTBr"] + 3.0
    alt_frac = fbTB / fbTA

    t1_selfonly = jnp.minimum(
        jnp.minimum(jnp.minimum(cROFA1, aLPFA2), jnp.minimum(aRPFA2, aLBFA2)),
        jnp.minimum(jnp.minimum(aRBFA2, cFA0),
                    jnp.minimum(aDPFA * jnp.clip(1.0 + aDPFA - alt_frac, 0.1, 1.0),
                                aPFFA * aSSFA2 / jnp.maximum(aSSFA2, aSS_nb))))
    t1_selfplus = jnp.minimum(
        jnp.minimum(aSSFA2, jnp.minimum(aLIFA2, aRIFA2)),
        jnp.minimum(jnp.maximum(aDPFA * 0.01, aSIFA), bFA))
    t2_selfonly = jnp.minimum(
        jnp.minimum(jnp.minimum(cROFA2, cFA2), cFA3),
        jnp.ones_like(cFA2))

    min_v = jnp.minimum(t1_selfplus, t1_selfonly)
    cDP1v = min_v * CDP1 * 100.0
    min_w = jnp.minimum(jnp.minimum(jnp.minimum(aLPFA2, aRPFA2),
                                    jnp.minimum(aLBFA2, aRBFA2)), bFA)
    cDP1w = min_w * CDP1 * 100.0
    cDP1x = 1.0 + jnp.minimum(aPFFA, jnp.minimum(bFA, cFA0)) * CDP1 * 100.0
    min_c2v = jnp.minimum(t1_selfplus, t2_selfonly)
    cDP2v = min_c2v * CDP2 * 100.0
    cDP2x = 1.0 + jnp.minimum(aPFFA, cFA2) * CDP2 * 100.0

    CDP1v = type_sum(cDP1v)
    CDP1x = type_sum(cDP1x)
    CDP2x = type_sum(cDP2x)

    # power-law and binomial quality tiers
    nb1 = c["bIADb"] * 100.0 + 1.0
    nb2 = jnp.minimum(nb1, cDP1v + 1.0)
    pb1 = 10.0 * c["bIAQb"] / jnp.maximum(1.0, c["bIADb"])
    pb2 = pb1 + 10.0 * um.numstates2phred(nb2 / nb1)
    bIAQ = pb2 * nb2 / (10.0 * 100.0)

    min_bcFA_v = (cDP1v + 0.5) / (CDP1 * 100.0 + 1.0)
    cPLQ1 = pl * um.numstates2phred(min_bcFA_v) + anyvar_base + 5.0
    umi_cFA = (cDP2v + 0.5) / (CDP2 * 100.0 + 1.0)
    cPLQ2 = pl * um.numstates2phred(umi_cFA) + anyvar_base + 8.0 + 10.0

    sscs_fw = c["cIAQf"] + c["cIAQr"] * jnp.minimum(
        58.0 - c["cIDQf"], c["cIDQr"]) / jnp.maximum(c["cIDQr"], 1.0)
    sscs_rv = c["cIAQr"] + c["cIAQf"] * jnp.minimum(
        58.0 - c["cIDQr"], c["cIDQf"]) / jnp.maximum(c["cIDQf"], 1.0)
    cIADn = (c["cIADf"] + c["cIADr"]) * 100.0 + 1.0
    cIADmin = jnp.minimum(cIADn, cDP2v + 1.0)
    cIAQ = (jnp.maximum(jnp.maximum(sscs_fw, sscs_rv)
                        - um.numstates2phred(cIADn / cIADmin) * cIADn / 100.0,
                        0.0) * cIADmin) / cIADn

    sysMQ = c["bMQ"] * (60.0 - 40.0) / 60.0 + 40.0 \
        - c["bNMQ"] - um.numstates2phred((ADP + 1.0) / (aDP + 0.5))
    sysVQ = jnp.maximum(jnp.minimum(c["aBQQ"], sysMQ)
                        - (15.0 - jnp.minimum(jnp.minimum(ADP * 0.15, aDP), 15.0)),
                        0.0)
    cVQ1 = jnp.maximum(0.0, jnp.minimum(jnp.minimum(sysVQ, bIAQ), cPLQ1))
    cVQ2 = jnp.maximum(0.0, jnp.minimum(jnp.minimum(sysVQ, cIAQ), cPLQ2))

    # tumor-only TLODQ join with the zero normal
    tAD1 = (cDP1x + 0.5) / 100.0
    tDP1 = (CDP1x + 1.0) / 100.0
    bjp = ((tAD1 + 0.5) / (tDP1 + 1.0)) / (0.505 / 1.01)
    powl = pl * um.numstates2phred(bjp)
    binom = um.binom_10log10_likeratio((tDP1 - jnp.minimum(tAD1, tDP1)) / tDP1,
                                       0.005, 0.005)
    inc = jnp.maximum(-3.0, jnp.minimum(binom - 3.0, powl - 3.0))
    dec = jnp.minimum(9.0, jnp.clip(c["bNMQ"], 30.0, 42.0) - 30.0)
    b4 = jnp.minimum(cPLQ1 + 9.0, cVQ1 + inc) - dec
    tAD2 = (cDP2x + 0.5) / 100.0
    tDP2 = (CDP2x + 1.0) / 100.0
    bjp2 = ((tAD2 + 0.5) / (tDP2 + 1.0)) / (0.505 / 1.01)
    powl2 = pl * um.numstates2phred(bjp2)
    binom2 = um.binom_10log10_likeratio((tDP2 - jnp.minimum(tAD2, tDP2)) / tDP2,
                                        0.005, 0.005)
    inc2 = jnp.maximum(-3.0, jnp.minimum(binom2 - 3.0, powl2 - 3.0))
    c4 = jnp.minimum(cPLQ2 + 9.0, cVQ2 + inc2) - dec
    tlodq1 = jnp.maximum(b4, c4)
    tlodq = jnp.where(tlodq1 >= 10.0, tlodq1, tlodq1 * 3.0 - 20.0)

    return {"cDP1v": cDP1v, "cDP1w": cDP1w, "cDP1x": cDP1x,
            "cDP2v": cDP2v, "cDP2x": cDP2x, "CDP1v": CDP1v,
            "cVQ1": cVQ1, "cVQ2": cVQ2, "bIAQ": bIAQ, "cIAQ": cIAQ,
            "cPLQ1": cPLQ1, "cPLQ2": cPLQ2, "TLODQ": tlodq}


def counts_from_host(F):
    """Pack the host model's F-dict into the [P, N_CHANNELS, 14] tensor."""
    P = F["P"]
    out = np.zeros((P, N_CHANNELS, NS), dtype=np.float32)
    for nm, i in CH.items():
        if nm in F:
            out[:, i, :] = F[nm]
    return out


def synthetic_counts(B, P, seed=0):
    """Deterministic synthetic count tensors shaped like real pileups,
    for compile checks and benchmarking."""
    rng = np.random.default_rng(seed)
    x = np.zeros((B, P, N_CHANNELS, NS), dtype=np.float32)
    depth = rng.integers(20, 300, (B, P, 1))
    ref = rng.integers(0, 4, (B, P))
    alt_frac = rng.beta(0.3, 6.0, (B, P))
    for q, nm in ((0, "aDPff"), (1, "aDPfr"), (2, "aDPrf"), (3, "aDPrr")):
        arr = np.zeros((B, P, NS), dtype=np.float32)
        b_idx, p_idx = np.meshgrid(np.arange(B), np.arange(P), indexing="ij")
        arr[b_idx, p_idx, ref] = depth[..., 0] // 4
        arr[b_idx, p_idx, (ref + 1) % 4] = (depth[..., 0] * alt_frac // 4)
        arr[:, :, 6] = depth[..., 0] // 4
        x[:, :, CH[nm], :] = arr
    base = x[:, :, CH["aDPff"], :] * 4
    for nm in ("aLP1 aLP2 aRP1 aRP2 aLB1 aLB2 aRB1 aRB2 aLI1 aLI2 aRI1 "
               "aRI2 aRIf aLIr aBQ2 aP1 aP2 aP3").split():
        x[:, :, CH[nm], :] = base * rng.uniform(0.6, 1.0, (B, P, NS))
    x[:, :, CH["aPF1"], :] = base * 90
    x[:, :, CH["aPF2"], :] = base * 85
    x[:, :, CH["aLPL"], :] = base * 40
    x[:, :, CH["aRPL"], :] = base * 40
    x[:, :, CH["aLBL"], :] = base * 200
    x[:, :, CH["aRBL"], :] = base * 200
    x[:, :, CH["bDPf"], :] = base * 0.5
    x[:, :, CH["bDPr"], :] = base * 0.5
    x[:, :, CH["bDPa"], :] = base
    x[:, :, CH["cDP0a"], :] = base * 0.8
    x[:, :, CH["cDP1f"], :] = base * 0.4
    x[:, :, CH["cDP1r"], :] = base * 0.4
    x[:, :, CH["cDP12f"], :] = base * 0.4
    x[:, :, CH["cDP12r"], :] = base * 0.4
    x[:, :, CH["cDP2f"], :] = base * 0.2
    x[:, :, CH["cDP2r"], :] = base * 0.2
    x[:, :, CH["cDP3f"], :] = base * 0.1
    x[:, :, CH["cDP3r"], :] = base * 0.1
    x[:, :, CH["bTAf"], :] = base * 100
    x[:, :, CH["bTAr"], :] = base * 100
    x[:, :, CH["bTBf"], :] = base * 2
    x[:, :, CH["bTBr"], :] = base * 2
    x[:, :, CH["bIAQb"], :] = base * 25
    x[:, :, CH["bIADb"], :] = base * 0.9
    for nm in ("cIAQf", "cIAQr"):
        x[:, :, CH[nm], :] = base * 20
    for nm in ("cIADf", "cIADr"):
        x[:, :, CH[nm], :] = base * 0.4
    for nm in ("cIDQf", "cIDQr"):
        x[:, :, CH[nm], :] = 30
    x[:, :, CH["bMQ"], :] = 60
    x[:, :, CH["aBQQ"], :] = 80
    x[:, :, CH["aMQs"], :] = base * 60
    return x
