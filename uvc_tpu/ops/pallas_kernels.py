"""Pallas TPU kernels for the device model's hot ops.

The dp4_to_pcFA battery (main_conversion.hpp:798-849) is evaluated four
times per column (left/right position, left/right BAQ) over [B, P, 14]
tensors in model/device.quality_model.  XLA fuses the elementwise chains
well, but each battery re-reads its seven operand tensors from HBM; the
fused Pallas kernel evaluates one battery per block with all operands
VMEM-resident, tiled (BLOCK_ROWS, 128) over a flattened element axis.

The math inside the kernel is the SAME jnp code as ops.math.dp4_to_pcFA
(traced into the kernel body), so parity with the reference path is by
construction; tests/test_pallas.py pins it numerically via interpret
mode on CPU.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import math as um

try:  # pallas is part of jax, but keep a soft gate for stripped builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANE = 128
BLOCK_ROWS = 256  # (256, 128) f32 blocks = 128 KiB per operand


def _battery_kernel(of_ref, a1_ref, adp_ref, a2m_ref, ADP_ref,
                    adkv_ref, dpkv_ref, out_ref, *, pl_exp, n_nats,
                    prior_ad, prior_dp):
    pc, _ = um.dp4_to_pcFA(
        of_ref[:], a1_ref[:], adp_ref[:], a2m_ref[:], ADP_ref[:],
        pl_exp, n_nats, adkv_ref[:], dpkv_ref[:], prior_ad, prior_dp,
        bidirectional=False)
    out_ref[:] = pc


def _battery4_kernel(of_ref, adp_ref, ADP_ref, *rest, pl_exp, n_nats,
                     prior_ad, prior_dp):
    # rest = 4x (a1, a2m, adkv, dpkv) input refs, then 4 output refs
    ins, outs = rest[:16], rest[16:]
    of, adp, ADP = of_ref[:], adp_ref[:], ADP_ref[:]
    for b in range(4):
        a1, a2m, adkv, dpkv = (r[:] for r in ins[b * 4:(b + 1) * 4])
        pc, _ = um.dp4_to_pcFA(of, a1, adp, a2m, ADP, pl_exp, n_nats,
                               adkv, dpkv, prior_ad, prior_dp,
                               bidirectional=False)
        outs[b][:] = pc


def dp4_battery4(of, adp, ADP, batteries, pl_exp=3.0,
                 n_nats=math.log(501.0), prior_ad=0.5, prior_dp=1.0,
                 interpret=None):
    """Four fused non-bidirectional dp4 batteries sharing (of, adp, ADP).

    batteries: sequence of 4 tuples (a1, a2m, adkv, dpkv).  Returns a
    list of 4 pcFA arrays.  One kernel launch loads the shared operands
    once instead of four times."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    all_ins = [of, adp, ADP] + [x for b in batteries for x in b]
    shape = jnp.broadcast_shapes(*(jnp.shape(x) for x in all_ins))
    flat = [jnp.broadcast_to(jnp.asarray(x, jnp.float32), shape).reshape(-1)
            for x in all_ins]
    n = int(np.prod(shape)) if shape else 1
    rows = -(-n // LANE)
    rows_pad = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    total = rows_pad * LANE
    pads = [1.0, 2.0, 4.0] + [1.0, 1.0, 1.0, 1.0] * 4
    tiles = [jnp.concatenate([x, jnp.full(total - n, pv, jnp.float32)]
                             ).reshape(rows_pad, LANE)
             for x, pv in zip(flat, pads)]
    spec = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i: (i, 0))
    kern = functools.partial(_battery4_kernel, pl_exp=float(pl_exp),
                             n_nats=float(n_nats),
                             prior_ad=float(prior_ad),
                             prior_dp=float(prior_dp))
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, LANE), jnp.float32)] * 4,
        grid=(rows_pad // BLOCK_ROWS,),
        in_specs=[spec] * 19,
        out_specs=[spec] * 4,
        interpret=interpret,
    )(*tiles)
    return [o.reshape(-1)[:n].reshape(shape) for o in outs]


def dp4_battery(of, a1, adp, a2m, ADP, adkv, dpkv,
                pl_exp=3.0, n_nats=math.log(501.0),
                prior_ad=0.5, prior_dp=1.0, interpret=None):
    """Fused non-bidirectional dp4_to_pcFA over broadcastable operands.

    Returns pcFA with the broadcast shape.  `interpret` defaults to True
    on the CPU backend (Pallas interpreter) and False on TPU."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                   (of, a1, adp, a2m, ADP, adkv, dpkv)))
    flat = [jnp.broadcast_to(jnp.asarray(x, jnp.float32), shape).reshape(-1)
            for x in (of, a1, adp, a2m, ADP, adkv, dpkv)]
    n = int(np.prod(shape)) if shape else 1
    rows = -(-n // LANE)
    rows_pad = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    total = rows_pad * LANE
    # benign pad values keep logs/divisions finite in the dead lanes
    pads = (1.0, 1.0, 2.0, 1.0, 4.0, 1.0, 1.0)
    tiles = []
    for x, pv in zip(flat, pads):
        x = jnp.concatenate([x, jnp.full(total - n, pv, jnp.float32)])
        tiles.append(x.reshape(rows_pad, LANE))
    grid = (rows_pad // BLOCK_ROWS,)
    spec = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i: (i, 0))
    kern = functools.partial(_battery_kernel, pl_exp=float(pl_exp),
                             n_nats=float(n_nats),
                             prior_ad=float(prior_ad),
                             prior_dp=float(prior_dp))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANE), jnp.float32),
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=spec,
        interpret=interpret,
    )(*tiles)
    return out.reshape(-1)[:n].reshape(shape)
