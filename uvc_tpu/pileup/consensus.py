"""Segmented consensus reductions shared by the fragment (BQ) and family
(FQ) tiers.

Implements GenericSymbol2Count::fillConsensusCounts semantics
(main.hpp:374-417) as sorted segmented reductions over flat
(group, pos, symbol, value) event tables:

  - BASE consensus: plain first-maximum argmax over symbols 0..5,
    count_sum = sum over all six.
  - LINK consensus with TIsRefCountedOnceInLink=true: any nonzero non-LINK_M
    symbol overrides LINK_M regardless of count; among the non-LINK_M
    symbols, first strict maximum wins; count_sum = winner count only.
  - LINK consensus plain (TIsRefCountedOnceInLink=false): same rule as BASE
    over symbols 6..13 with full sum.
"""

from dataclasses import dataclass

import numpy as np

from uvc_tpu.ops.scatter import fast_add_at


def _argsort64(keys):
    """Native radix argsort for int64 keys when built, else numpy."""
    from ..ops import native_rowpile
    if native_rowpile.available() and keys.dtype == np.int64 and len(keys) > 4096:
        return native_rowpile.radix_argsort(keys)
    return np.argsort(keys, kind="stable")

from ..constants import Symbol, NUM_SYMBOLS

NS = NUM_SYMBOLS


@dataclass
class GroupConsensus:
    """Per-(group, pos, symboltype) consensus rows (tot > 0 only)."""

    group: np.ndarray
    pos: np.ndarray
    st: np.ndarray        # 0 BASE, 1 LINK
    con_sym: np.ndarray
    con_cnt: np.ndarray
    tot: np.ndarray       # per the symboltype's count_sum rule


def segment_reduce_max(group, pos, sym, val, P):
    """Collapse duplicate (group,pos,sym) rows by max(val).
    Returns (ugroup, upos, usym, maxval)."""
    key = (group * P + pos) * NS + sym
    order = _argsort64(key)
    sk = key[order]
    sv = val[order]
    if len(sk) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    seg_start = np.concatenate([[True], sk[1:] != sk[:-1]])
    seg_id = np.cumsum(seg_start) - 1
    nseg = int(seg_id[-1]) + 1
    maxv = np.zeros(nseg, dtype=np.int64)
    np.maximum.at(maxv, seg_id, sv)
    ukey = sk[seg_start]
    return (ukey // (NS * P), (ukey // NS) % P, ukey % NS, maxv)


def segment_reduce_sum(group, pos, sym, val, P):
    """Collapse duplicate (group,pos,sym) rows by sum(val)."""
    key = (group * P + pos) * NS + sym
    order = _argsort64(key)
    sk = key[order]
    sv = val[order]
    if len(sk) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    seg_start = np.concatenate([[True], sk[1:] != sk[:-1]])
    seg_id = np.cumsum(seg_start) - 1
    sums = np.zeros(int(seg_id[-1]) + 1, dtype=np.int64)
    fast_add_at(sums, seg_id, sv)
    ukey = sk[seg_start]
    return (ukey // (NS * P), (ukey // NS) % P, ukey % NS, sums)


def consensus_by_group(ugroup, upos, usym, uval, P,
                       link_m_overridden: bool) -> GroupConsensus:
    """Consensus per (group, pos, symboltype) from unique symbol rows.

    link_m_overridden selects the TIsRefCountedOnceInLink rule for LINK.
    Rows with uval == 0 are treated as absent. Returns only groups with
    tot > 0.
    """
    m = uval > 0
    ugroup, upos, usym, uval = ugroup[m], upos[m], usym[m], uval[m]
    if len(ugroup) == 0:
        z = np.zeros(0, dtype=np.int64)
        return GroupConsensus(z, z.copy(), z.copy(), z.copy(), z.copy(), z.copy())
    ust = (usym >= 6).astype(np.int64)
    gkey = (ugroup * P + upos) * 2 + ust
    # single packed sort key instead of a 4-key lexsort (~3x faster):
    # [gkey | link_cls | inverted clamped value | sym]
    VAL_BITS = 20
    VAL_MAX = (1 << VAL_BITS) - 1
    if link_m_overridden:
        link_cls = ((usym == int(Symbol.LINK_M)) & (ust == 1)).astype(np.int64)
    else:
        link_cls = np.zeros(len(usym), dtype=np.int64)
    if len(gkey) and int(gkey.max()) < (1 << 37):
        packed = (((gkey << 1) | link_cls) << (VAL_BITS + 4)) \
            | ((VAL_MAX - np.minimum(uval, VAL_MAX)) << 4) | usym
        order = _argsort64(packed)
    else:  # key would overflow int64: fall back to lexsort
        order = np.lexsort((usym, -uval, link_cls, gkey))
    g2 = gkey[order]
    gstart = np.concatenate([[True], g2[1:] != g2[:-1]])
    gid = np.cumsum(gstart) - 1
    first_idx = order[gstart]
    con_sym = usym[first_idx]
    con_cnt = uval[first_idx]
    tot = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
    fast_add_at(tot, gid, uval[order])
    st_g = ust[first_idx]
    if link_m_overridden:
        tot = np.where(st_g == 1, con_cnt, tot)
    return GroupConsensus(group=ugroup[first_idx], pos=upos[first_idx],
                          st=st_g, con_sym=con_sym, con_cnt=con_cnt, tot=tot)


def reduce_and_consensus(group, pos, sym, val, P, mode: str,
                         link_m_overridden: bool):
    """Fused segmented reduce + consensus: returns ((ugroup, upos, usym,
    uval), GroupConsensus).  mode is "max" or "sum".  Uses the native
    kernel when built (exact parity with the python pair below)."""
    from ..ops import native_rowpile as nr
    if nr.available() and nr.has_reduce_consensus() and len(group) > 4096:
        uniq, c = nr.reduce_consensus(
            group, pos, sym, val, P, 0 if mode == "max" else 1,
            link_m_overridden)
        return uniq, GroupConsensus(*c)
    if mode == "max":
        uniq = segment_reduce_max(group, pos, sym, val, P)
    else:
        uniq = segment_reduce_sum(group, pos, sym, val, P)
    return uniq, consensus_by_group(*uniq, P,
                                    link_m_overridden=link_m_overridden)


def sum_by_symboltype(arr):
    """[.., 14] -> per-symbol broadcast of the symboltype sums [.., 14]."""
    out = np.empty_like(arr)
    out[..., :6] = arr[..., :6].sum(axis=-1, keepdims=True)
    out[..., 6:] = arr[..., 6:].sum(axis=-1, keepdims=True)
    return out
