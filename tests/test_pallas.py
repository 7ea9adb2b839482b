"""Pallas dp4-battery kernel parity vs the reference jnp math
(interpret mode on CPU; the kernel body traces the same dp4_to_pcFA)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from uvc_tpu.ops import math as um
from uvc_tpu.ops import pallas_kernels as pk


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
def test_dp4_battery_parity():
    rng = np.random.default_rng(7)
    shape = (3, 300, 14)
    of = rng.uniform(0.1, 1.0, shape).astype(np.float32)
    a1 = rng.uniform(0, 50, shape).astype(np.float32)
    adp = a1 + rng.uniform(0, 100, shape).astype(np.float32)
    a2m = rng.uniform(0, 80, shape).astype(np.float32)
    ADP = adp + rng.uniform(0, 400, shape).astype(np.float32)
    adkv = rng.uniform(1, 60, shape).astype(np.float32)
    dpkv = rng.uniform(1, 60, shape).astype(np.float32)
    ref, _ = um.dp4_to_pcFA(of, a1, adp, a2m, ADP, 3.0, math.log(501.0),
                            adkv, dpkv, 0.5, 1.0, bidirectional=False)
    got = pk.dp4_battery(of, a1, adp, a2m, ADP, adkv, dpkv,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=1e-6)


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
def test_dp4_battery_padding_edge():
    # non-multiple-of-block sizes exercise the pad/slice path
    shape = (1, 7, 14)
    rng = np.random.default_rng(8)
    a1 = rng.uniform(0, 5, shape).astype(np.float32)
    adp = a1 + 1.0
    ref, _ = um.dp4_to_pcFA(1.0, a1, adp, a1, adp * 4, 3.0, math.log(501.0),
                            1.0, 1.0, 0.5, 1.0, bidirectional=False)
    got = pk.dp4_battery(np.float32(1.0), a1, adp, a1, adp * 4,
                         np.float32(1.0), np.float32(1.0), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=1e-6)


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
def test_quality_model_pallas_parity():
    """quality_model with the fused 4-battery Pallas kernel matches the
    XLA path (CPU interpret mode; bit-identical on TPU hardware)."""
    from uvc_tpu.model import device
    counts = device.synthetic_counts(B=1, P=256, seed=3).astype(np.float32)
    a = device.quality_model(counts, use_pallas=False)
    b = device.quality_model(counts, use_pallas=True)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_device_model_tracks_host_on_real_pileup(tmp_path):
    """The device quality model, fed real pileup tensors through
    counts_from_host, ranks the same variant candidates as the host
    (float64 numpy) model."""
    import numpy as np
    from uvc_tpu import calling
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.constants import CHAR_TO_SYMBOL
    from uvc_tpu.io import bam, simulate
    from uvc_tpu.model import device

    d = str(tmp_path)
    ref = simulate.random_ref(3000, 77)
    variants = [simulate.Variant(800, f"{ref[800]}>"
                                 + ("A" if ref[800] != "A" else "C"), 0.35),
                simulate.Variant(2000, f"{ref[2000]}>"
                                 + ("G" if ref[2000] != "G" else "T"), 0.35)]
    path = d + "/dv.bam"
    simulate.build_bam(path, ref, depth=120, variants=variants, seed=5)
    hdr, batch = bam.read_bam(path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    ctx = calling.prepare_region(batch, syms, 0, cfg)
    calling.model_stage(ctx["F"], ctx["cand"], cfg, True, None, None)
    F = ctx["F"]
    counts = device.counts_from_host(F)[None, ...]  # [1, P, C, 14]
    out = device.quality_model(counts)
    dev_cvq1 = np.asarray(out["cVQ1"])[0]
    host_cvq1 = np.asarray(F["cVQ1"], dtype=np.float64)
    # the device model is the throughput mirror (f32, principal terms):
    # it must rank the true variant columns at the top like the host
    for v in variants:
        alt = v.spec.split(">")[1]
        s = "ACGT".index(alt)
        assert host_cvq1[v.pos, s] > 40
        assert dev_cvq1[v.pos, s] > 40, (v.pos, s, dev_cvq1[v.pos, s])
    # and keep non-variant substitution columns quiet where the host does
    quiet = (host_cvq1[:, :4] <= 5)
    frac_quiet_dev = float((dev_cvq1[:, :4][quiet] <= 15).mean())
    assert frac_quiet_dev > 0.98, frac_quiet_dev
