"""Test configuration: force an 8-virtual-device CPU platform before JAX
initializes, and enable x64 so kernels can be validated against the
reference's double-precision semantics. The production TPU path runs the same
kernels in float32."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU-tunnel backend and
# forces jax_platforms="axon,cpu"; initializing axon costs ~2 minutes of
# tunnel handshake. Override back to cpu BEFORE any backend is touched.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def expected_indel_symbol(ref, rpos, length, is_del):
    """Expected LINK_{I,D}{1,2,3P} symbol for an indel at reference position
    rpos (ref is the contig sequence string): classification uses the
    STR-unit-normalized n_units from ref_to_phredvalue (main.hpp:917-921,
    2076, 2191), not the raw length."""
    import numpy as np
    from uvc_tpu.pileup import strscan
    from uvc_tpu.constants import Symbol, CHAR_TO_SYMBOL
    from uvc_tpu.config import UVCConfig
    cfg = UVCConfig()
    ref_syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), dtype=np.uint8)]
    tracks = strscan.scan_repeats(
        ref_syms, cfg.indel_str_repeatsize_max, cfg.indel_vntr_repeatsize_max,
        cfg.indel_BQ_max, cfg.indel_polymerase_slip_rate,
        cfg.indel_del_to_ins_err_ratio)
    _, n_units, _, _ = strscan.ref_to_phredvalue(
        tracks, np.array([rpos]),
        np.array([length]), np.array([bool(is_del)]))
    n = int(n_units[0])
    if is_del:
        return int(Symbol.LINK_D1 if n == 1
                   else Symbol.LINK_D2 if n == 2 else Symbol.LINK_D3P)
    return int(Symbol.LINK_I1 if n == 1
               else Symbol.LINK_I2 if n == 2 else Symbol.LINK_I3P)
