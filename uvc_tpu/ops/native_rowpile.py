"""ctypes bindings for the fused native row kernels (native/rowpile.cpp).

pass_c_native is the drop-in accelerated path for
engine_bq.pass_c_scatter; the python implementation stays as the
behavioral reference (parity-tested)."""

import ctypes
import os

import numpy as np

from ..constants import MAX_INSERT_SIZE

_LIB = None
_TRIED = False

# int32 planes (reference int32 counter fields) + the int64 "big" sums
# (uvc1_readpos_big_t aLBL/aRBL/aLIT/aRIT + the BQ-sum plane bg), kept in
# a small side tensor so the hot scatter rows are half as wide
PLANES = ("a2XM2 a2BM2 aPF1 aPF2 aBQ2 aMQs aP1 aP2 aP3 aNC "
          "aDPff aDPfr aDPrf aDPrr aLP1 aLP2 aLPL aRP1 aRP2 aRPL "
          "aLB1 aLB2 aRB1 aRB2 aLI1 aLI2 aRI1 aRI2 "
          "aRIf aLIr a1BQf a1BQr a2BQf a2BQr").split()
BIG_PLANES = "aLBL aRBL aLIT aRIT bg".split()
N_RF = 14
N_TH = 14
N_CFG = 13


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    # UVC_TPU_NATIVE_SUFFIX=".asan"/".ubsan"/".debug" selects a sanitizer
    # build flavor (native/Makefile `make flavors`), mirroring the
    # reference's sanitizer binaries (Makefile:29-53)
    suffix = os.environ.get("UVC_TPU_NATIVE_SUFFIX", "")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "bin",
        f"rowpile{suffix}.so")
    if not os.path.exists(path) and not suffix:
        from ..utils.nativebuild import ensure_built
        ensure_built()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.pass_c_kernel.restype = ctypes.c_int
    lib.radix_argsort_u64.restype = None
    try:
        lib.pass_d_kernel.restype = ctypes.c_int
        lib.rc_run.restype = ctypes.c_int64
        lib.rc_n_groups.restype = ctypes.c_int64
        lib.rc_fetch_unique.restype = None
        lib.rc_fetch_consensus.restype = None
    except AttributeError:
        pass
    _LIB = lib
    return lib


def available():
    return _load() is not None


def radix_argsort(keys: np.ndarray) -> np.ndarray:
    """Permutation sorting uint64/int64 keys ascending (stable)."""
    lib = _load()
    keys = np.ascontiguousarray(keys.view(np.uint64)
                                if keys.dtype == np.int64 else keys)
    order = np.empty(len(keys), dtype=np.int64)
    lib.radix_argsort_u64(keys.ctypes.data_as(ctypes.c_void_p),
                          ctypes.c_int64(len(keys)),
                          order.ctypes.data_as(ctypes.c_void_p))
    return order


def iid_scan(max_qual, dec_qual, hist, totDP):
    """infer_max_qual_assuming_independence scan; hist [..,16].
    Returns (q, ad, bq) with max_qual's shape, or None if not built."""
    lib = _load()
    if lib is None or not hasattr(lib, "iid_scan_kernel"):
        return None
    shape = np.shape(max_qual)
    mq = np.ascontiguousarray(max_qual, dtype=np.int64).reshape(-1)
    h = np.ascontiguousarray(hist, dtype=np.int32).reshape(-1, 16)
    td = np.ascontiguousarray(np.broadcast_to(totDP, shape),
                              dtype=np.int64).reshape(-1)
    n = len(mq)
    q = np.empty(n, dtype=np.int64)
    ad = np.empty(n, dtype=np.int64)
    bq = np.empty(n, dtype=np.int64)
    lib.iid_scan_kernel(
        ctypes.c_int64(n), mq.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(int(dec_qual)), h.ctypes.data_as(ctypes.c_void_p),
        td.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p),
        ad.ctypes.data_as(ctypes.c_void_p),
        bq.ctypes.data_as(ctypes.c_void_p))
    return q.reshape(shape), ad.reshape(shape), bq.reshape(shape)


def reduce_consensus(group, pos, sym, val, P, mode, link_m_overridden):
    """Fused segmented reduce (mode 0=max, 1=sum) + consensus.

    Returns ((ugroup, upos, usym, uval), (cgroup, cpos, cst, con_sym,
    con_cnt, tot)); rows sorted by key, matching the python
    segment_reduce_* / consensus_by_group output order exactly."""
    lib = _load()

    def cp(a):
        return np.ascontiguousarray(a, dtype=np.int64).ctypes.data_as(
            ctypes.c_void_p)

    nu = lib.rc_run(ctypes.c_int64(len(group)), cp(group), cp(pos), cp(sym),
                    cp(val), ctypes.c_int64(P), ctypes.c_int64(mode),
                    ctypes.c_int64(1 if link_m_overridden else 0))
    ng = lib.rc_n_groups()
    uniq = tuple(np.empty(nu, dtype=np.int64) for _ in range(4))
    lib.rc_fetch_unique(*(a.ctypes.data_as(ctypes.c_void_p) for a in uniq))
    cons = tuple(np.empty(ng, dtype=np.int64) for _ in range(6))
    lib.rc_fetch_consensus(*(a.ctypes.data_as(ctypes.c_void_p) for a in cons))
    return uniq, cons


def has_reduce_consensus():
    lib = _load()
    return lib is not None and hasattr(lib, "rc_run")


def reduce_consensus2(group, pos, sym, val, filt, P):
    """Fused dual sum-reduce sharing ONE sort: set 1 counts rows where filt
    is set, set 2 sums val; both with plain (non-overridden) consensus.

    Returns ((ug, up, us, uv) set-1 uniques, set-1 consensus 6-tuple,
    set-2 consensus 6-tuple), or None when the kernel is unavailable or
    the values exceed the packed-field range."""
    lib = _load()
    if lib is None or not hasattr(lib, "rc2_run"):
        return None

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    lib.rc2_run.restype = ctypes.c_int64
    rc = lib.rc2_run(ctypes.c_int64(len(group)), cp(group), cp(pos),
                     cp(sym), cp(val), cp(filt, np.uint8),
                     ctypes.c_int64(P))
    if rc < 0:
        return None
    sizes = np.empty(4, dtype=np.int64)
    lib.rc2_sizes(sizes.ctypes.data_as(ctypes.c_void_p))
    nu1, ng1, _, ng2 = (int(x) for x in sizes)
    uniq = tuple(np.empty(nu1, dtype=np.int64) for _ in range(4))
    lib.rc_fetch_unique(*(a.ctypes.data_as(ctypes.c_void_p) for a in uniq))
    cons1 = tuple(np.empty(ng1, dtype=np.int64) for _ in range(6))
    lib.rc_fetch_consensus(*(a.ctypes.data_as(ctypes.c_void_p)
                             for a in cons1))
    cons2 = tuple(np.empty(ng2, dtype=np.int64) for _ in range(6))
    lib.rc2_fetch_consensus2(*(a.ctypes.data_as(ctypes.c_void_p)
                               for a in cons2))
    return uniq, cons1, cons2


class StaticFragCons:
    """Handle to fragment-consensus rows resident in the .so's
    thread_local statics (frag_cons_direct(fetch=False)).  Valid on the
    producing thread until the next consensus-producing kernel call; use
    fetch_frag_cons() to materialize the rows for the fallback paths."""

    __slots__ = ("n",)

    def __init__(self, n):
        self.n = int(n)


def fetch_frag_cons(n):
    """Copy the resident consensus rows out as the usual 6-tuple."""
    lib = _load()
    cons = tuple(np.empty(n, dtype=np.int64) for _ in range(6))
    lib.rc_fetch_consensus(*(a.ctypes.data_as(ctypes.c_void_p)
                             for a in cons))
    return cons


def frag_cons_direct(allev, frag_of_read, n_frags, P,
                     link_m_overridden=True, fetch=True):
    """Sort-free fragment MAX-merge: k-way merges the per-read event
    streams (strictly key-sorted within each read) per fragment instead of
    radix-sorting the whole event table.  Exact parity with
    reduce_consensus(mode=max) -- same row order, same consensus rule.
    Returns a 6-tuple of consensus arrays (or, with fetch=False, a
    StaticFragCons handle leaving the rows resident in the .so), or None
    when the kernel is unavailable, the event table has no stream map, or
    a stream violates the per-read sort invariant (caller falls back to
    the sorting path)."""
    lib = _load()
    so = getattr(allev, "stream_off", None)
    if lib is None or not hasattr(lib, "frag_cons_direct") or so is None:
        return None

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    so = np.ascontiguousarray(so, dtype=np.int64)
    lib.frag_cons_direct.restype = ctypes.c_int64
    nrows = lib.frag_cons_direct(
        ctypes.c_int64(len(so) - 1), cp(so),
        cp(allev.pos), cp(allev.sym), cp(allev.val), cp(allev.read),
        ctypes.c_int64(len(frag_of_read)), cp(frag_of_read),
        ctypes.c_int64(int(n_frags)), ctypes.c_int64(P),
        ctypes.c_int64(1 if link_m_overridden else 0))
    if nrows < 0:
        return None
    if not fetch:
        return StaticFragCons(nrows)
    return fetch_frag_cons(nrows)


def frag_cons_with_pass_d(allev, frag_of_read, n_frags, P, bg, aDP4,
                          ref_syms, frag_strand, normMQ, highbq_thres,
                          mut_window):
    """Fragment MAX-merge with the pass-D consensus scatter fused into
    the per-fragment flush (rows processed while cache-hot).  Returns
    (StaticFragCons, (bdp, bta, btb, hist, vq_bMQ, mut_rows, win_rows))
    or None on fallback (the caller then runs the separate kernels)."""
    lib = _load()
    so = getattr(allev, "stream_off", None)
    if lib is None or so is None \
            or not hasattr(lib, "frag_cons_arm_pass_d"):
        return None
    bdp = np.zeros((P, 14, 2), dtype=np.int32)
    bta = np.zeros((P, 14, 2), dtype=np.int32)
    btb = np.zeros((P, 14, 2), dtype=np.int32)
    vq_bmq = np.zeros((P, 14), dtype=np.int32)
    hist = np.zeros((P, 14, 16), dtype=np.int32)

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    # keep the converted operand arrays alive across the merge call
    holds = [np.ascontiguousarray(a, dtype=np.int64)
             for a in (bg, aDP4, ref_syms, frag_strand, normMQ)]
    lib.frag_cons_arm_pass_d(
        *(h.ctypes.data_as(ctypes.c_void_p) for h in holds),
        ctypes.c_int64(P), ctypes.c_int64(highbq_thres),
        ctypes.c_int64(mut_window),
        bdp.ctypes.data_as(ctypes.c_void_p),
        bta.ctypes.data_as(ctypes.c_void_p),
        btb.ctypes.data_as(ctypes.c_void_p),
        vq_bmq.ctypes.data_as(ctypes.c_void_p),
        hist.ctypes.data_as(ctypes.c_void_p))
    handle = frag_cons_direct(allev, frag_of_read, n_frags, P,
                              link_m_overridden=True, fetch=False)
    counts = np.zeros(2, dtype=np.int64)
    lib.frag_cons_pass_d_counts(counts.ctypes.data_as(ctypes.c_void_p))
    if not isinstance(handle, StaticFragCons):
        return None          # merge fell back; pass-D outputs discarded
    n_mut, n_win = int(counts[0]), int(counts[1])
    mut = tuple(np.empty(n_mut, dtype=np.int64) for _ in range(4))
    lib.pass_d_fetch_mut(*(a.ctypes.data_as(ctypes.c_void_p) for a in mut))
    win = tuple(np.empty(n_win, dtype=np.int64) for _ in range(3))
    lib.pass_d_fetch_win(*(a.ctypes.data_as(ctypes.c_void_p) for a in win))
    return handle, (bdp, bta, btb, hist, vq_bmq, mut, win)


def has_statics_path():
    """True when the statics-resident pass_d + family chain is built."""
    lib = _load()
    return lib is not None and all(
        hasattr(lib, nm) for nm in
        ("pass_d_statics", "fam_cons_statics", "fq_sweep1_statics",
         "fq_sweep2_statics"))


def pass_d_statics(bg, aDP4, ref_syms, frag_strand, normMQ, P, n_frags,
                   highbq_thres, mut_window):
    """pass_d_kernel over the resident rows; returns (bdp, bta, btb, hist,
    vq_bMQ, (mut frag,pos,st,sym), (win frag,pos,sym)) or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "pass_d_statics"):
        return None
    bdp = np.zeros((P, 14, 2), dtype=np.int32)
    bta = np.zeros((P, 14, 2), dtype=np.int32)
    btb = np.zeros((P, 14, 2), dtype=np.int32)
    vq_bmq = np.zeros((P, 14), dtype=np.int32)
    hist = np.zeros((P, 14, 16), dtype=np.int32)
    counts = np.zeros(2, dtype=np.int64)

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    rc = lib.pass_d_statics(
        cp(bg), cp(aDP4), cp(ref_syms), cp(frag_strand), cp(normMQ),
        ctypes.c_int64(P), ctypes.c_int64(int(n_frags)),
        ctypes.c_int64(highbq_thres), ctypes.c_int64(mut_window),
        bdp.ctypes.data_as(ctypes.c_void_p),
        bta.ctypes.data_as(ctypes.c_void_p),
        btb.ctypes.data_as(ctypes.c_void_p),
        vq_bmq.ctypes.data_as(ctypes.c_void_p),
        hist.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError("pass_d_statics failed")
    n_mut, n_win = int(counts[0]), int(counts[1])
    mut = tuple(np.empty(n_mut, dtype=np.int64) for _ in range(4))
    lib.pass_d_fetch_mut(*(a.ctypes.data_as(ctypes.c_void_p) for a in mut))
    win = tuple(np.empty(n_win, dtype=np.int64) for _ in range(3))
    lib.pass_d_fetch_win(*(a.ctypes.data_as(ctypes.c_void_p) for a in win))
    return bdp, bta, btb, hist, vq_bmq, mut, win


def fam_cons_statics(fam_of_frag, n_fams, highbq_snv, P, pdel_ign=0):
    """Family merge over the resident rows; returns (n_famcov_uniques,
    fbeg [n_fams], fend [n_fams]) or None on a validation failure (the
    rows are then restored for fetch_frag_cons)."""
    lib = _load()
    fbeg = np.empty(int(n_fams), dtype=np.int64)
    fend = np.empty(int(n_fams), dtype=np.int64)
    fam_of_frag = np.ascontiguousarray(fam_of_frag, dtype=np.int64)
    lib.fam_cons_statics.restype = ctypes.c_int64
    w1 = lib.fam_cons_statics(
        fam_of_frag.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(fam_of_frag)), ctypes.c_int64(int(n_fams)),
        ctypes.c_int64(highbq_snv), ctypes.c_int64(P),
        ctypes.c_int64(int(pdel_ign)),
        fbeg.ctypes.data_as(ctypes.c_void_p),
        fend.ctypes.data_as(ctypes.c_void_p))
    if w1 < 0:
        return None
    return int(w1), fbeg, fend


def fq_sweep1_statics(fam_strand, fam_dflag, P, cfg, cdp12, cdp21, cdp2,
                      cdp3, cdpm, cdpM):
    """Sweep 1 over the resident famcov consensus; fills the cdp planes
    and returns the sparse good-family rows (g, pos, st, sym, cnt, tot)."""
    lib = _load()

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    lib.fq_sweep1_statics.restype = ctypes.c_int64
    n_good = lib.fq_sweep1_statics(
        cp(fam_strand), cp(fam_dflag), ctypes.c_int64(P),
        ctypes.c_int64(cfg.fam_thres_dup1add),
        ctypes.c_int64(cfg.fam_thres_dup1perc),
        ctypes.c_int64(cfg.fam_thres_dup2add),
        ctypes.c_int64(cfg.fam_thres_dup2perc),
        ctypes.c_int64(cfg.fam_flag),
        ctypes.c_int64(cfg.fam_thres_emperr_all_flat_snv),
        ctypes.c_int64(cfg.fam_thres_emperr_con_perc_snv),
        ctypes.c_int64(cfg.fam_thres_emperr_all_flat_indel),
        ctypes.c_int64(cfg.fam_thres_emperr_con_perc_indel),
        cdp12.ctypes.data_as(ctypes.c_void_p),
        cdp21.ctypes.data_as(ctypes.c_void_p),
        cdp2.ctypes.data_as(ctypes.c_void_p),
        cdp3.ctypes.data_as(ctypes.c_void_p),
        cdpm.ctypes.data_as(ctypes.c_void_p),
        cdpM.ctypes.data_as(ctypes.c_void_p))
    good = tuple(np.empty(int(n_good), dtype=np.int64) for _ in range(6))
    lib.fq_fetch_good(*(a.ctypes.data_as(ctypes.c_void_p) for a in good))
    return good


def fam_chain_statics(famgrp, P, cfg, ref_syms, sscs_table, rescue_add,
                      cdp12, cdp21, cdp2, cdp3, cdpm, cdpM, cdp1, hist,
                      pdel_ign=0):
    """Fully fused family chain over the resident rows: ONE call does the
    family merge, both consensus scans, sweep 1 and sweep 2.  Returns
    (good rows 6-tuple, mut rows 5-tuple, fbeg, fend), or None when the
    kernel is unavailable or rejects its input (rows stay resident)."""
    lib = _load()
    if lib is None or not hasattr(lib, "fam_chain_statics"):
        return None
    n_fams = int(famgrp.n_fams)
    fbeg = np.empty(n_fams, dtype=np.int64)
    fend = np.empty(n_fams, dtype=np.int64)
    counts = np.zeros(2, dtype=np.int64)
    fam_of_frag = np.ascontiguousarray(famgrp.fam_of_frag, dtype=np.int64)

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    lib.fam_chain_statics.restype = ctypes.c_int64
    rc = lib.fam_chain_statics(
        fam_of_frag.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(fam_of_frag)), ctypes.c_int64(n_fams),
        ctypes.c_int64(cfg.fam_thres_highBQ_snv), ctypes.c_int64(P),
        ctypes.c_int64(int(pdel_ign)),
        cp(famgrp.fam_strand), cp(famgrp.fam_dflag),
        ctypes.c_int64(cfg.fam_thres_dup1add),
        ctypes.c_int64(cfg.fam_thres_dup1perc),
        ctypes.c_int64(cfg.fam_thres_dup2add),
        ctypes.c_int64(cfg.fam_thres_dup2perc),
        ctypes.c_int64(cfg.fam_flag),
        ctypes.c_int64(cfg.fam_thres_emperr_all_flat_snv),
        ctypes.c_int64(cfg.fam_thres_emperr_con_perc_snv),
        ctypes.c_int64(cfg.fam_thres_emperr_all_flat_indel),
        ctypes.c_int64(cfg.fam_thres_emperr_con_perc_indel),
        cp(ref_syms), cp(sscs_table),
        ctypes.c_int64(rescue_add),
        ctypes.c_int64(cfg.fam_phred_indel_inc_before_barcode_labeling),
        ctypes.c_int64(cfg.bias_thres_highBQ),
        cdp12.ctypes.data_as(ctypes.c_void_p),
        cdp21.ctypes.data_as(ctypes.c_void_p),
        cdp2.ctypes.data_as(ctypes.c_void_p),
        cdp3.ctypes.data_as(ctypes.c_void_p),
        cdpm.ctypes.data_as(ctypes.c_void_p),
        cdpM.ctypes.data_as(ctypes.c_void_p),
        cdp1.ctypes.data_as(ctypes.c_void_p),
        hist.ctypes.data_as(ctypes.c_void_p),
        fbeg.ctypes.data_as(ctypes.c_void_p),
        fend.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p))
    if rc < 0:
        return None
    n_good, n_mut = int(counts[0]), int(counts[1])
    good = tuple(np.empty(n_good, dtype=np.int64) for _ in range(6))
    lib.fq_fetch_good(*(a.ctypes.data_as(ctypes.c_void_p) for a in good))
    mut = tuple(np.empty(n_mut, dtype=np.int64) for _ in range(5))
    lib.fq_fetch_mut2(*(a.ctypes.data_as(ctypes.c_void_p) for a in mut))
    return good, mut, fbeg, fend


def fq_sweep2_statics(fam_strand, ref_syms, sscs_table, cdpM, cdpm, P,
                      rescue_add, cfg, cdp1, hist):
    """Sweep 2 over the resident fammmm consensus; fills cdp1/hist and
    returns the sparse phase-eligible rows (g, pos, st, sym, confam_ok),
    or None on a stale-table state."""
    lib = _load()

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    lib.fq_sweep2_statics.restype = ctypes.c_int64
    n_mut = lib.fq_sweep2_statics(
        cp(fam_strand), cp(ref_syms), cp(sscs_table), cp(cdpM), cp(cdpm),
        ctypes.c_int64(P), ctypes.c_int64(rescue_add),
        ctypes.c_int64(cfg.fam_phred_indel_inc_before_barcode_labeling),
        ctypes.c_int64(cfg.fam_thres_dup1add),
        ctypes.c_int64(cfg.fam_thres_dup1perc),
        ctypes.c_int64(cfg.bias_thres_highBQ),
        cdp1.ctypes.data_as(ctypes.c_void_p),
        hist.ctypes.data_as(ctypes.c_void_p))
    if n_mut < 0:
        return None
    mut = tuple(np.empty(int(n_mut), dtype=np.int64) for _ in range(5))
    lib.fq_fetch_mut2(*(a.ctypes.data_as(ctypes.c_void_p) for a in mut))
    return mut


def pass_d_native(gc, bg, aDP4, ref_syms, frag_strand, normMQ, P, n_frags,
                  highbq_thres, mut_window):
    """Runs the fused pass-D consensus scatter (rows sorted by frag,pos,st).

    Returns (bdp [P,14,2], bta, btb, hist [P,14,16], vq_bMQ [P,14],
    is_mut [n] bool)."""
    lib = _load()
    n = len(gc.group)
    if n and (int(gc.pos.min()) < 0 or int(gc.pos.max()) >= P):
        raise ValueError(f"pass_d_native: pos outside [0,{P})")
    bdp = np.zeros((P, 14, 2), dtype=np.int32)
    bta = np.zeros((P, 14, 2), dtype=np.int32)
    btb = np.zeros((P, 14, 2), dtype=np.int32)
    vq_bmq = np.zeros((P, 14), dtype=np.int32)
    hist = np.zeros((P, 14, 16), dtype=np.int32)
    is_mut = np.zeros(n, dtype=np.uint8)

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    rc = lib.pass_d_kernel(
        ctypes.c_int64(n), cp(gc.group), cp(gc.pos), cp(gc.st),
        cp(gc.con_sym), cp(gc.con_cnt), cp(gc.tot),
        cp(bg), cp(aDP4), cp(ref_syms), cp(frag_strand), cp(normMQ),
        ctypes.c_int64(P), ctypes.c_int64(n_frags),
        ctypes.c_int64(highbq_thres), ctypes.c_int64(mut_window),
        bdp.ctypes.data_as(ctypes.c_void_p),
        bta.ctypes.data_as(ctypes.c_void_p),
        btb.ctypes.data_as(ctypes.c_void_p),
        vq_bmq.ctypes.data_as(ctypes.c_void_p),
        hist.ctypes.data_as(ctypes.c_void_p),
        is_mut.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError("pass_d_kernel failed")
    return bdp, bta, btb, hist, vq_bmq, is_mut.astype(bool)


def pass_c_native(allev, table, baq, baq2, thres, off, P, cfg, dflag):
    """Runs the fused kernel; returns (planes dict of [P,14] int64)."""
    lib = _load()
    e = allev
    n = len(e.pos)
    r = table.reads
    n_reads = len(r.pos)
    reads = np.zeros((n_reads, N_RF), dtype=np.int64)
    reads[:, 0] = r.pos - off
    reads[:, 1] = r.rend - off
    reads[:, 2] = r.isrc
    reads[:, 3] = r.strand
    reads[:, 4] = r.isize
    reads[:, 5] = r.is_paired
    reads[:, 6] = r.flag
    reads[:, 7] = r.mapq
    reads[:, 8] = r.clip_cnt
    reads[:, 9] = r.frag_pos_L - off
    reads[:, 10] = r.frag_pos_R - off
    reads[:, 11] = r.xm1500
    is_amp = ((dflag & 0x4) != 0) | ((cfg.primerlen > 0)
                                     and not (0x2 & cfg.primer_flag))
    reads[:, 12] = is_amp
    reads[:, 13] = (dflag & 0x1) != 0

    th = np.zeros((P, N_TH), dtype=np.int64)
    for i, nm in enumerate(("aLPxT", "aRPxT", "aLP1t", "aLP2t", "aRP1t",
                            "aRP2t", "aLI1t", "aLI1T", "aLI2t", "aLI2T",
                            "aRI1t", "aRI1T", "aRI2t", "aRI2T")):
        th[:, i] = getattr(thres, nm)

    cfgv = np.array([
        cfg.bias_thres_interfering_indel, cfg.primerlen2,
        int(cfg.central_readlen >= cfg.microadjust_median_readlen_thres),
        cfg.microadjust_BAQ_per_base_x1024, cfg.bias_thres_highBAQ,
        cfg.bias_thres_highBQ, cfg.bias_thres_PFBQ1, cfg.bias_thres_PFBQ2,
        cfg.bias_thres_BAQ1, cfg.bias_thres_BAQ2,
        cfg.microadjust_nobias_pos_indel_maxlen, MAX_INSERT_SIZE, 0],
        dtype=np.int64)

    # [P,14,N_PLANES]: the kernel accumulates in place (calloc-zeroed
    # pages, no kernel-side staging/transpose); planes are strided views
    out = np.zeros((P, 14, len(PLANES)), dtype=np.int32)
    out_big = np.zeros((P, 14, len(BIG_PLANES)), dtype=np.int64)

    def cp(a):
        return np.ascontiguousarray(a).ctypes.data_as(ctypes.c_void_p)

    e_pos = np.ascontiguousarray(e.pos, dtype=np.int64)
    if len(e_pos) and (int(e_pos.min()) < 0 or int(e_pos.max()) >= P):
        raise ValueError(
            f"pass_c_native: event pos outside [0,{P}) "
            f"(min={e_pos.min()}, max={e_pos.max()}); region window does "
            "not cover all reads")
    e_sym = np.ascontiguousarray(e.sym, dtype=np.int64)
    e_val = np.ascontiguousarray(e.val, dtype=np.int64)
    e_read = np.ascontiguousarray(e.read, dtype=np.int64)
    e_isgap = np.ascontiguousarray(e.is_gap, dtype=np.uint8)
    e_cop = np.ascontiguousarray(e.cigar_op, dtype=np.int64)
    e_il = np.ascontiguousarray(e.indel_len, dtype=np.int64)
    e_dist = np.ascontiguousarray(e.dist, dtype=np.int64)
    baq64 = np.ascontiguousarray(baq, dtype=np.int64)
    baq264 = np.ascontiguousarray(baq2, dtype=np.int64)

    bm = getattr(e, "bm1500", None)
    if bm is None:
        bm = np.zeros((n_reads, 6), dtype=np.int64)
    rc = lib.pass_c_kernel(
        ctypes.c_int64(n), cp(e_pos), cp(e_sym), cp(e_val), cp(e_read),
        cp(e_isgap), cp(e_cop), cp(e_il), cp(e_dist), cp(reads),
        cp(np.ascontiguousarray(bm, dtype=np.int64)), cp(th),
        cp(baq64), cp(baq264), cfgv.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(P), out.ctypes.data_as(ctypes.c_void_p),
        out_big.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError("pass_c_kernel failed")
    d = {nm: out[:, :, i] for i, nm in enumerate(PLANES)}
    d.update({nm: out_big[:, :, i] for i, nm in enumerate(BIG_PLANES)})
    return d


PASS_A_PLANES = ("a_pcr_dp a_umi_dp a_dp a_qlen a_XM1500 a_GO1500 a_GAPLEN "
                 "a_LI a_LIDP a_RI a_RIDP a_l_dist_sum a_r_dist_sum "
                 "a_inslen_sum a_dellen_sum a_l_BAQ_sum a_r_BAQ_sum "
                 "a_insBAQ_sum a_delBAQ_sum a_highBQ_dp a_snv_dp "
                 "a_dnv_dp").split()
N_PAR = 13


def pass_a_native(table, batch, ref_syms, baq, off, P, highbq_thres,
                  max_insert, pcr_inc, umi_inc):
    """Fused M-base pass-A accumulation; returns (planes dict [P],
    insbaq [n_reads], delbaq [n_reads]) or None when not built.  batch
    supplies the raw sequence codes for the op-boundary-crossing
    mismatch-run continuation scan (main.hpp:1027-1037)."""
    lib = _load()
    if lib is None or not hasattr(lib, "pass_a_kernel"):
        return None
    r = table.reads
    b = table.bases
    g = table.gaps
    n_reads = len(r.pos)
    reads = np.zeros((n_reads, N_PAR), dtype=np.int64)
    for i, arr in enumerate((r.pos, r.rend, r.isrc, r.isize, r.frag_pos_L,
                             r.frag_pos_R, r.xm1500, r.go1500, r.avg_gaplen,
                             r.inslen_sum, r.dellen_sum, pcr_inc, umi_inc)):
        reads[:, i] = arr
    out = np.zeros((len(PASS_A_PLANES), P), dtype=np.int64)
    insbaq = np.zeros(n_reads, dtype=np.int64)
    delbaq = np.zeros(n_reads, dtype=np.int64)

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    rc = lib.pass_a_kernel(
        ctypes.c_int64(len(b.rpos)), cp(b.rpos), cp(b.read), cp(b.qpos),
        cp(b.bq), cp(b.sym), cp(ref_syms),
        cp(batch.seq, np.uint8), cp(batch.seq_off),
        ctypes.c_int64(n_reads), cp(reads),
        ctypes.c_int64(len(g.read)), cp(g.read), cp(g.rpos), cp(g.oplen),
        cp(g.is_del, np.uint8), cp(baq),
        ctypes.c_int64(off), ctypes.c_int64(P),
        ctypes.c_int64(highbq_thres), ctypes.c_int64(max_insert),
        out.ctypes.data_as(ctypes.c_void_p),
        insbaq.ctypes.data_as(ctypes.c_void_p),
        delbaq.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("pass_a_kernel: base position outside region")
    return {nm: out[i] for i, nm in enumerate(PASS_A_PLANES)}, insbaq, delbaq


def reduce_consensus2_fc(frag, pos, sym, con_cnt, tot, st, fam_of_frag,
                         highbq_snv, P, fetch_unique=True, pdel_ign=0):
    """reduce_consensus2 variant taking raw fragment-consensus rows: the
    adj/filter/fam-map row prep runs inside the kernel.  Returns the same
    triple (uniq is None when fetch_unique=False -- the sweep-2 kernel can
    read the table from the .so statics), or None when unavailable / out
    of packed range."""
    lib = _load()
    if lib is None or not hasattr(lib, "rc2_run_fc"):
        return None

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    lib.rc2_run_fc.restype = ctypes.c_int64
    rc = lib.rc2_run_fc(ctypes.c_int64(len(frag)), cp(frag), cp(pos),
                        cp(sym), cp(con_cnt), cp(tot), cp(st),
                        cp(fam_of_frag), ctypes.c_int64(highbq_snv),
                        ctypes.c_int64(P), ctypes.c_int64(int(pdel_ign)))
    if rc < 0:
        return None
    sizes = np.empty(4, dtype=np.int64)
    lib.rc2_sizes(sizes.ctypes.data_as(ctypes.c_void_p))
    nu1, ng1, _, ng2 = (int(x) for x in sizes)
    uniq = None
    if fetch_unique:
        uniq = tuple(np.empty(nu1, dtype=np.int64) for _ in range(4))
        lib.rc_fetch_unique(*(a.ctypes.data_as(ctypes.c_void_p)
                              for a in uniq))
    cons1 = tuple(np.empty(ng1, dtype=np.int64) for _ in range(6))
    lib.rc_fetch_consensus(*(a.ctypes.data_as(ctypes.c_void_p)
                             for a in cons1))
    cons2 = tuple(np.empty(ng2, dtype=np.int64) for _ in range(6))
    lib.rc2_fetch_consensus2(*(a.ctypes.data_as(ctypes.c_void_p)
                               for a in cons2))
    return uniq, cons1, cons2


def fam_cons_direct(frag, pos, sym, con_cnt, tot, st, fam_of_frag, n_fams,
                    highbq_snv, P, fetch_unique=True, pdel_ign=0):
    """Sort-free variant of reduce_consensus2_fc: fragment-consensus rows
    are already frag-grouped and key-sorted, so the family reduction is a
    counting sort + per-family merge.  Same returns/fallback contract as
    reduce_consensus2_fc."""
    lib = _load()
    if lib is None or not hasattr(lib, "fam_cons_direct"):
        return None

    def cp(a, dt=np.int64):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    lib.fam_cons_direct.restype = ctypes.c_int64
    rc = lib.fam_cons_direct(
        ctypes.c_int64(len(frag)), cp(frag), cp(pos), cp(sym), cp(con_cnt),
        cp(tot), cp(st), cp(fam_of_frag),
        ctypes.c_int64(len(fam_of_frag)), ctypes.c_int64(int(n_fams)),
        ctypes.c_int64(highbq_snv), ctypes.c_int64(P),
        ctypes.c_int64(int(pdel_ign)))
    if rc < 0:
        return None
    sizes = np.empty(4, dtype=np.int64)
    lib.rc2_sizes(sizes.ctypes.data_as(ctypes.c_void_p))
    nu1, ng1, _, ng2 = (int(x) for x in sizes)
    uniq = None
    if fetch_unique:
        uniq = tuple(np.empty(nu1, dtype=np.int64) for _ in range(4))
        lib.rc_fetch_unique(*(a.ctypes.data_as(ctypes.c_void_p)
                              for a in uniq))
    cons1 = tuple(np.empty(ng1, dtype=np.int64) for _ in range(6))
    lib.rc_fetch_consensus(*(a.ctypes.data_as(ctypes.c_void_p)
                             for a in cons1))
    cons2 = tuple(np.empty(ng2, dtype=np.int64) for _ in range(6))
    lib.rc2_fetch_consensus2(*(a.ctypes.data_as(ctypes.c_void_p)
                               for a in cons2))
    return uniq, cons1, cons2


def dp4_native(adp, adf, dpp, dpf, osf, pl_exp, n_nats, ad_avg, dp_avg,
               priorAD, priorDP, bidirectional, osf_disabled, shape):
    """Native dp4_to_pcFA over pre-broadcast float64 operands; the log/exp
    transcendentals run through numpy so results are bit-identical to the
    python reference. Returns (pc, nobias) shaped `shape`, or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "dp4_stage1"):
        return None
    n = 1
    for d in shape:
        n *= d

    def bc(a):
        return np.ascontiguousarray(
            np.broadcast_to(np.asarray(a, np.float64), shape)).reshape(-1)

    adp = bc(adp)
    adf = bc(adf)
    dpp = bc(dpp)
    dpf = bc(dpf)
    nn = bc(n_nats)
    osf_arr = None if osf_disabled else bc(osf)
    ad_arr = None if ad_avg is None else bc(ad_avg)
    dp_arr = None if dp_avg is None else bc(dp_avg)
    pad = bc(priorAD)
    pdp = bc(priorDP)
    la1 = np.empty(n, dtype=np.float64)
    la2 = np.empty(n, dtype=np.float64) if bidirectional else None
    nobias = np.empty(n, dtype=np.float64)
    exparg = np.empty(n, dtype=np.float64)
    pc = np.empty(n, dtype=np.float64)

    def cp(a):
        return (a.ctypes.data_as(ctypes.c_void_p) if a is not None
                else ctypes.c_void_p(0))

    lib.dp4_stage1(
        ctypes.c_int64(n), cp(adp), cp(adf), cp(dpp), cp(dpf), cp(osf_arr),
        cp(pad), cp(pdp),
        ctypes.c_int64(1 if bidirectional else 0), cp(ad_arr), cp(dp_arr),
        cp(la1), cp(la2), cp(nobias))
    with np.errstate(divide="ignore", invalid="ignore"):
        l1 = np.log(la1)
        l2 = np.log(la2) if bidirectional else None
        lib.dp4_stage2(cp(l1), cp(l2), cp(nn),
                       ctypes.c_double(float(pl_exp)), cp(exparg))
        e = np.exp(exparg)
    lib.dp4_stage3(cp(e), cp(nn), cp(pc))
    return pc.reshape(shape), nobias.reshape(shape)
