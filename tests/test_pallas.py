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
