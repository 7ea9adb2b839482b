"""Tandem-repeat scanning of the reference sequence, vectorized.

Produces per-position short-tandem-repeat (STR, unit 1..6) and VNTR
(unit 1..35) track annotations plus the polymerase-slippage indel error
model, and the BAQ (base-alignment-quality budget) prefix-sum arrays.

Behavioral reference:
  - refstring2repeatvec:        /root/reference/main.hpp:803-874
  - indel_phred slippage model: /root/reference/main.hpp:794-801
  - indel_len_rusize_phred:     /root/reference/main.hpp:757-790
  - ref_to_phredvalue:          /root/reference/main.hpp:876-922
  - is_indel_context_more_STR:  /root/reference/main.hpp:699-721
  - region_repeatvec_to_baq_offsetarr: /root/reference/main.cpp:400-429

The reference scans repeat sizes with nested per-position loops; here each
repeat size is one vectorized run-length pass over the region (numpy), and
the priority rule collapses to a first-maximum argmax of the rank key
(rank = (repeatnum-1)*unitlen for repeatnum >= 2; positions with no repeat
resolve to (unit=1, num=1) — including the reference's use of the
candidate's unitlen on both sides of the comparison when repeatnum <= 1,
which makes those comparisons always false).
"""

from dataclasses import dataclass

import numpy as np

DBL_EPSILON = 2.220446049250313e-16


def _runlens(ref: np.ndarray, r: int) -> np.ndarray:
    """For each i: number of consecutive j >= i with ref[j] == ref[j+r]
    (j+r < len). Vectorized backward maximal-run computation."""
    n = len(ref)
    run = np.zeros(n, dtype=np.int32)
    if r >= n:
        return run
    m = ref[:-r] == ref[r:]  # [n-r]
    # backward: run[i] = m[i] ? run[i+1]+1 : 0 -> via cumsum-reset trick
    idx = np.arange(len(m))
    # positions of False, mark next reset after each i
    rev = m[::-1]
    c = np.cumsum(rev)
    reset = np.where(~rev, c, 0)
    filled = np.maximum.accumulate(reset)
    run_rev = c - filled
    run[:len(m)] = run_rev[::-1]
    return run


def best_repeat_context(ref: np.ndarray, repeatsize_max: int):
    """Per-position (repeatnum, unitlen, qidx_end) of the highest-priority
    repeat context among unit sizes 1..repeatsize_max.

    Matches the sequential is_indel_context_more_STR scan: first maximum of
    rank (repeatnum-1)*unitlen wins; all-singleton positions give (1, 1).
    Returns (repeatnum[P], unitlen[P], endpos[P]) where endpos = qidx +
    unitlen (exclusive end of the repeat track starting at each position).
    """
    n = len(ref)
    nr = repeatsize_max
    repeatnum = np.empty((nr, n), dtype=np.int64)
    qidx = np.empty((nr, n), dtype=np.int64)
    pos = np.arange(n, dtype=np.int64)
    for r in range(1, nr + 1):
        run = _runlens(ref, r)
        q = pos + run
        repeatnum[r - 1] = run // r + 1
        qidx[r - 1] = q
    rank = (repeatnum - 1) * np.arange(1, nr + 1, dtype=np.int64)[:, None]
    rank = np.where(repeatnum >= 2, rank, -1)
    best = np.argmax(rank, axis=0)  # first max wins, matching sequential scan
    has_repeat = rank[best, pos] >= 1
    unitlen = np.where(has_repeat, best + 1, 1)
    num = np.where(has_repeat, repeatnum[best, pos], 1)
    end = np.where(has_repeat, qidx[best, pos] + unitlen, pos + 1)
    return num.astype(np.int32), unitlen.astype(np.int32), end.astype(np.int64)


def indel_phred(ampfact, repeatsize, repeatnum):
    """Polymerase slippage error phred (main.hpp:794-801), vectorized."""
    repeatsize = np.asarray(repeatsize, dtype=np.float64)
    region_size = repeatsize * np.asarray(repeatnum, dtype=np.float64)
    num_slips = np.where(region_size > 64, region_size - 8.0,
                         np.log1p(np.exp(np.minimum(region_size, 65.0) - 8.0)))
    num_slips = num_slips * ampfact / (repeatsize * repeatsize)
    prob = (1.0 - DBL_EPSILON) / (num_slips + 1.0)
    return np.floor(-10.0 * np.log10(prob)).astype(np.int64)


_N_UNITS_TO_PHRED = np.array(
    [0, 0, 3, 5, 6, 7, 8, 8, 9, 10, 10, 10, 11, 11, 11, 12, 12, 12, 13],
    dtype=np.int64)


def indel_len_rusize_phred(indel_len, repeatunit_size):
    """Length/unit-count phred reward (main.hpp:757-790), vectorized."""
    indel_len = np.asarray(indel_len, dtype=np.int64)
    ru = np.asarray(repeatunit_size, dtype=np.int64)
    exact = indel_len % ru == 0
    n_units = np.where(exact, indel_len // ru, indel_len)
    return _N_UNITS_TO_PHRED[np.minimum(n_units, len(_N_UNITS_TO_PHRED) - 1)]


@dataclass
class RepeatTracks:
    """Per-position repeat-track annotation (RegionalTandemRepeat SoA)."""

    begpos: np.ndarray        # int32 [P+1] region-relative track start
    tracklen: np.ndarray      # int32 [P+1]
    unitlen: np.ndarray       # int32 [P+1]
    indelphred: np.ndarray    # int64 [P+1] slippage-adjusted indel quality
    anyTR_begpos: np.ndarray
    anyTR_tracklen: np.ndarray
    anyTR_unitlen: np.ndarray
    # per-position STR context for ref_to_phredvalue (argmax over units 1..6)
    ctx_repeatnum: np.ndarray  # int32 [P]
    ctx_unitlen: np.ndarray    # int32 [P]


def scan_repeats(ref_bytes, str_max: int = 6, vntr_max: int = 35,
                 indel_BQ_max: int = 42, slip_rate: float = 8.0,
                 del_to_ins: float = 5.0) -> RepeatTracks:
    """refstring2repeatvec equivalent (main.hpp:803-874).

    The reference's outer loop skips ahead inside long repeat tracks; the
    interval writes use "longer track wins" per position. All per-position
    candidates are precomputed vectorized; the outer loop replicates the
    exact skip/priority semantics in a cheap scalar pass.
    """
    ref = np.frombuffer(bytes(ref_bytes), dtype=np.uint8) if not isinstance(
        ref_bytes, np.ndarray) else ref_bytes
    n = len(ref)
    str_num, str_unit, str_end = best_repeat_context(ref, str_max)
    any_num, any_unit, any_end = best_repeat_context(ref, vntr_max)

    # slippage phred per candidate start position, vectorized once
    tl_vec = np.minimum(str_end, n) - np.arange(n, dtype=np.int64)
    dec_vec = indel_phred(slip_rate * del_to_ins, np.maximum(str_unit, 1),
                          tl_vec // np.maximum(str_unit, 1))

    from ..ops import native_rowpile
    lib = native_rowpile._load()
    if lib is not None and hasattr(lib, "str_track_kernel"):
        import ctypes

        def cp(a):
            return np.ascontiguousarray(a, dtype=np.int64).ctypes.data_as(
                ctypes.c_void_p)

        begpos64 = np.zeros(n, dtype=np.int64)
        tracklen64 = np.zeros(n, dtype=np.int64)
        unitlen64 = np.zeros(n, dtype=np.int64)
        indelphred = np.full(n, indel_BQ_max, dtype=np.int64)
        a_begpos64 = np.zeros(n, dtype=np.int64)
        a_tracklen64 = np.zeros(n, dtype=np.int64)
        a_unitlen64 = np.zeros(n, dtype=np.int64)
        lib.str_track_kernel(
            ctypes.c_int64(n), cp(str_unit), cp(str_num), cp(str_end),
            cp(any_unit), cp(any_end), cp(dec_vec),
            ctypes.c_int64(str_max), ctypes.c_int64(indel_BQ_max),
            begpos64.ctypes.data_as(ctypes.c_void_p),
            tracklen64.ctypes.data_as(ctypes.c_void_p),
            unitlen64.ctypes.data_as(ctypes.c_void_p),
            indelphred.ctypes.data_as(ctypes.c_void_p),
            a_begpos64.ctypes.data_as(ctypes.c_void_p),
            a_tracklen64.ctypes.data_as(ctypes.c_void_p),
            a_unitlen64.ctypes.data_as(ctypes.c_void_p))
        begpos = begpos64.astype(np.int32)
        tracklen = tracklen64.astype(np.int32)
        unitlen = unitlen64.astype(np.int32)
        a_begpos = a_begpos64.astype(np.int32)
        a_tracklen = a_tracklen64.astype(np.int32)
        a_unitlen = a_unitlen64.astype(np.int32)
    else:
        begpos = np.zeros(n, dtype=np.int32)
        tracklen = np.zeros(n, dtype=np.int32)
        unitlen = np.zeros(n, dtype=np.int32)
        indelphred = np.full(n, indel_BQ_max, dtype=np.int64)
        a_begpos = np.zeros(n, dtype=np.int32)
        a_tracklen = np.zeros(n, dtype=np.int32)
        a_unitlen = np.zeros(n, dtype=np.int32)

        refpos = 0
        while refpos < n:
            rs = int(str_unit[refpos])
            rn = int(str_num[refpos])
            rep_end = min(int(str_end[refpos]), n)
            tl = rep_end - refpos
            dec = int(dec_vec[refpos])
            sl = slice(refpos, rep_end)
            win = tl > tracklen[sl]
            begpos[sl] = np.where(win, refpos, begpos[sl])
            unitlen[sl] = np.where(win, rs, unitlen[sl])
            indelphred[sl] = np.where(
                win, indel_BQ_max - min(indel_BQ_max - 1, dec), indelphred[sl])
            tracklen[sl] = np.where(win, tl, tracklen[sl])

            a_end = min(int(any_end[refpos]), n)
            atl = a_end - refpos
            sl2 = slice(refpos, a_end)
            win2 = atl > a_tracklen[sl2]
            a_begpos[sl2] = np.where(win2, refpos, a_begpos[sl2])
            a_unitlen[sl2] = np.where(win2, int(any_unit[refpos]),
                                      a_unitlen[sl2])
            a_tracklen[sl2] = np.where(win2, atl, a_tracklen[sl2])

            nbases_to_next = str_max + rs
            refpos += max(rs * rn, nbases_to_next + 1) - nbases_to_next

    # trailing sentinel element (reference pushes back LAST())
    def ext(a):
        return np.concatenate([a, a[-1:]])

    return RepeatTracks(
        begpos=ext(begpos), tracklen=ext(tracklen), unitlen=ext(unitlen),
        indelphred=ext(indelphred), anyTR_begpos=ext(a_begpos),
        anyTR_tracklen=ext(a_tracklen), anyTR_unitlen=ext(a_unitlen),
        ctx_repeatnum=str_num, ctx_unitlen=str_unit)


def ref_to_phredvalue(tracks: RepeatTracks, pos_idx, oplen, is_del,
                      max_phred: int = 42, ampfact: float = 8.0,
                      del_to_ins: float = 5.0):
    """Vectorized ref_to_phredvalue (main.hpp:876-922) for indel events.

    pos_idx/oplen/is_del are per-event arrays; the STR context is gathered
    from the per-position precomputation at each event's region position.
    Returns (phredvalue, n_units, max_repeatnum, repeatsize).
    """
    rnum = tracks.ctx_repeatnum[pos_idx].astype(np.int64)
    rsize = tracks.ctx_unitlen[pos_idx].astype(np.int64)
    oplen = np.asarray(oplen, dtype=np.int64)
    amp = np.where(np.logical_and(oplen == rsize, is_del),
                   ampfact * del_to_ins, ampfact)
    dec = indel_phred(amp, rsize, rnum)
    in_str = rsize * (rnum - 1) >= 6 - 1
    exact = oplen % rsize == 0
    n_units = np.where(
        in_str,
        np.where(exact, oplen // rsize, np.where(oplen == 1, 1, 0)),
        1 + oplen // 6)
    phred = (max_phred - np.minimum(max_phred, dec)
             + indel_len_rusize_phred(oplen, rsize))
    return phred, n_units, rnum, rsize


def baq_offsets(tracks: RepeatTracks, use_anyTR: bool,
                indel_str_phred_per_region: int = 10,
                indel_nonSTR_phred_per_base: int = 5,
                indel_polymerase_size: float = 8.0) -> np.ndarray:
    """BAQ budget prefix-sum (main.cpp:400-429): +5/base outside repeat
    tracks, +10/track spread across the track inside. int64 [P+1]."""
    tl = (tracks.anyTR_tracklen if use_anyTR else tracks.tracklen)
    ul = tracks.unitlen
    n = len(tl)
    is_str = np.logical_or(
        tl // np.maximum(ul, 1) >= 3,
        np.logical_and(tl // np.maximum(ul, 1) >= 2,
                       tl >= round(indel_polymerase_size)))
    inc = np.where(is_str,
                   (indel_str_phred_per_region * 10) // np.maximum(tl, 1) + 1,
                   indel_nonSTR_phred_per_base * 10)
    return np.cumsum(inc.astype(np.int64)) // 10
