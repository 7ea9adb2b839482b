"""UMI dedup and family grouping.

Behavioral reference: grouping.cpp:608-997 (two-pass family builder),
MolecularID.hpp:20-68 (dedup key), SURVEY.md §A.2 (dedup_idflag decision
table).

Key bits: 0x1 fragment-begin, 0x2 fragment-end, 0x4 QNAME, 0x8 UMI.
Families group fragments by the masked key per template strand
(strand = isrc ^ isr2). The UMI is the QNAME suffix after '#'
('#ACGT' single-strand, '#AGTA+TGGT' duplex; duplex UMIs are
orientation-normalized so both strands of one molecule share a family
pair).

This vectorized implementation covers the core decision table; the
reference's centroid attraction of fragment endpoints (±3bp PCR-stutter
absorption, grouping.cpp:422-442) is implemented as a histogram-peak
snap. Amplicon detection from border/insert coverage is in `infer_assay`.
"""

from dataclasses import dataclass

import numpy as np

from ..constants import (MoleculeTag, AssayType, MAX_INSERT_SIZE,
                         SequencingPlatform)


@dataclass
class FamilyGrouping:
    frag_of_read: np.ndarray   # int64 [n_reads] fragment (template) id
    fam_of_frag: np.ndarray    # int64 [n_frags] family id
    frag_strand: np.ndarray    # int64 [n_frags] template strand 0/1
    fam_strand: np.ndarray     # int64 [n_fams]
    fam_dflag: np.ndarray      # int64 [n_fams] duplex/umi/amplicon flags
    frag_dflag: np.ndarray     # int64 [n_frags]
    n_frags: int
    n_fams: int
    umi_of_fam: list           # umi string per family ("" if none)
    duplex_pair: np.ndarray    # int64 [n_fams] molecule id shared across strands
    pcrpassed: int = 0         # fragments flagged amplicon (grouping.cpp:851)
    frag_amplicon: np.ndarray = None  # bool [n_frags]
    # per-family MolecularBarcode of the FIRST read inserted with the
    # family's key (grouping.cpp:926-941): dict with beg/end tidpos
    # pairs, duplexflag (incl. the 0x8 borders-preserved bit),
    # dedup_idflag, raw umistring, and the reference calcHash of the
    # NORMALIZED key -- consumed by the consensus-FASTQ read names
    fam_mb: list = None


def _hash2hash(h1, h2):
    return (h1 * 0x7FFFFFFF + h2) & 0xFFFFFFFFFFFFFFFF


def _strhash(s: bytes, base=31):
    ret = 0
    for c in s:
        if c == 0:
            break
        ret = (ret * base + c) & 0xFFFFFFFFFFFFFFFF
    return ret


def mb_calc_hash(beg_pair, end_pair, qnamestring, umistring, duplexflag,
                 dedup_idflag):
    """MolecularBarcode::calcHash (MolecularID.cpp:5-15) over the
    createKey-normalized fields."""
    def u64(x):
        return x & 0xFFFFFFFFFFFFFFFF

    ret = 0
    ret = u64(ret + _hash2hash(ret, _hash2hash(u64(beg_pair[0]),
                                               u64(beg_pair[1]))))
    ret = u64(ret + _hash2hash(ret, _hash2hash(u64(end_pair[0]),
                                               u64(end_pair[1]))))
    ret = u64(ret + _hash2hash(ret, _strhash(qnamestring)))
    ret = u64(ret + _hash2hash(ret, _strhash(umistring)))
    ret = u64(ret + _hash2hash(ret, duplexflag))
    ret = u64(ret + _hash2hash(ret, dedup_idflag))
    return ret


def mb_create_key(beg_pair, end_pair, qnamestring, umistring, dedup_idflag):
    """MolecularBarcode::createKey field normalization
    (MolecularID.hpp:20-51)."""
    if (dedup_idflag & 0x3) == 0x3:
        kb, ke = min(beg_pair, end_pair), max(beg_pair, end_pair)
    elif dedup_idflag & 0x1:
        kb, ke = beg_pair, (-1, -1)
    elif dedup_idflag & 0x2:
        kb, ke = (-1, -1), end_pair
    else:
        kb, ke = (-1, -1), (-1, -1)
    kq = qnamestring if (dedup_idflag & 0x4) else b""
    ku = umistring if (dedup_idflag & 0x8) else b""
    return kb, ke, kq, ku


def parse_umis(qnames):
    """Extract UMI strings (after '#') and duplex flags from QNAMEs."""
    umis = []
    is_duplex = []
    for q in qnames:
        i = q.rfind(b"#")
        if i < 0:
            umis.append(b"")
            is_duplex.append(False)
        else:
            u = q[i + 1:]
            umis.append(u)
            is_duplex.append(b"+" in u)
    return umis, is_duplex


def normalize_duplex_umi(umi: bytes):
    """alpha+beta ordered canonically; returns (canonical, flipped)."""
    a, _, b = umi.partition(b"+")
    if a <= b:
        return a + b"+" + b, False
    return b + b"+" + a, True


def snap_positions(pos: np.ndarray, counts_window: int = 3,
                   center_mult: float = 5.0) -> np.ndarray:
    """Centroid attraction (grouping.cpp:422-442): snap each endpoint to a
    nearby higher-count position within +-window if its count times
    center_mult^distance is exceeded by the neighbor's count."""
    if len(pos) == 0:
        return pos
    lo = pos.min()
    hist = np.bincount(pos - lo)
    snapped = pos.copy()
    cnt = hist[pos - lo]
    best_cnt = cnt.astype(np.float64)
    for d in range(1, counts_window + 1):
        for sgn in (-1, 1):
            q = pos + sgn * d
            ok = (q >= lo) & (q < lo + len(hist))
            qc = np.where(ok, hist[np.clip(q - lo, 0, len(hist) - 1)], 0)
            better = qc > best_cnt * (center_mult ** d)
            snapped = np.where(better, q, snapped)
            best_cnt = np.where(better, qc / (center_mult ** d), best_cnt)
    return snapped


def detect_amplicon(frag_beg, frag_end, lane, cfg):
    """Per-fragment amplicon detection from border-vs-insert coverage
    (grouping.cpp:780-860).

    Per (isrc, isr2) lane: histogram fragment begin/end positions, snap
    each to its centroid, and compare border-peak coverage against the
    average insert coverage between the (snapped) borders.  Returns
    (is_assay_amplicon, is_beg_amplicon, is_end_amplicon,
    is_beg_strong, is_end_strong, beg2count, end2count) per fragment.
    The reference computes this per alignment; both mates share the
    fragment borders so a per-fragment computation is equivalent up to
    the lane of the mate (we use the fragment's lane)."""
    nf = len(frag_beg)
    z = np.zeros(nf, dtype=bool)
    zi = np.zeros(nf, dtype=np.int64)
    if nf == 0:
        return z, z.copy(), z.copy(), z.copy(), z.copy(), zi, zi.copy()
    lo = int(min(frag_beg.min(), frag_end.min()))
    hi = int(max(frag_beg.max(), frag_end.max())) + 8
    span = hi - lo + 1
    beg2 = np.empty(nf, dtype=np.int64)
    end2 = np.empty(nf, dtype=np.int64)
    beg2count = np.zeros(nf, dtype=np.int64)
    end2count = np.zeros(nf, dtype=np.int64)
    tot_ins = np.zeros(nf, dtype=np.int64)
    width = np.zeros(nf, dtype=np.int64)
    for ln in range(4):
        m = lane == ln
        if not m.any():
            continue
        fb = frag_beg[m] - lo
        fe = frag_end[m] - lo
        beg_hist = np.bincount(fb, minlength=span)
        end_hist = np.bincount(fe, minlength=span)
        b2 = snap_positions(fb, center_mult=cfg.dedup_center_mult)
        e2 = snap_positions(fe, center_mult=cfg.dedup_center_mult)
        # border_count_prefixsum[i+1] = sum(beg+end counts up to i)
        prefix = np.concatenate([[0], np.cumsum(beg_hist + end_hist)])
        L = np.minimum(b2 + 6, e2)
        R = np.maximum(b2, np.maximum(e2 - 6, 0))
        beg2[m] = b2
        end2[m] = e2
        beg2count[m] = beg_hist[b2]
        end2count[m] = end_hist[e2]
        tot_ins[m] = prefix[R] - prefix[L]
        width[m] = R - L
    begratio = (beg2count * width + 1.0) / (tot_ins + width + 1.0)
    endratio = (end2count * width + 1.0) / (tot_ins + width + 1.0)

    def _amp(ratio, cnt, avg_thr, min_dp, tot_thr):
        return ((ratio > avg_thr) & (cnt >= min_dp) & (cnt >= tot_ins * tot_thr))

    beg_w = _amp(begratio, beg2count,
                 cfg.dedup_amplicon_border_to_insert_cov_weak_avgDP_ratio,
                 cfg.dedup_amplicon_border_weak_minDP,
                 cfg.dedup_amplicon_border_to_insert_cov_weak_totDP_ratio)
    end_w = _amp(endratio, end2count,
                 cfg.dedup_amplicon_border_to_insert_cov_weak_avgDP_ratio,
                 cfg.dedup_amplicon_border_weak_minDP,
                 cfg.dedup_amplicon_border_to_insert_cov_weak_totDP_ratio)
    beg_s = _amp(begratio, beg2count,
                 cfg.dedup_amplicon_border_to_insert_cov_strong_avgDP_ratio,
                 cfg.dedup_amplicon_border_strong_minDP,
                 cfg.dedup_amplicon_border_to_insert_cov_strong_totDP_ratio)
    end_s = _amp(endratio, end2count,
                 cfg.dedup_amplicon_border_to_insert_cov_strong_avgDP_ratio,
                 cfg.dedup_amplicon_border_strong_minDP,
                 cfg.dedup_amplicon_border_to_insert_cov_strong_totDP_ratio)
    is_amp = beg_s | end_s | (beg_w & end_w)
    return is_amp, beg_w, end_w, beg_s, end_s, beg2count, end2count


def _group_by_qname(batch):
    """(frag_of_read [n], first_read [n_frags], qhash [n] or None) with
    fragment ids in first-occurrence order; grouping key is the qname
    FNV-1a 64-bit hash (the reference's map<qnamehash, ...>,
    grouping.cpp:925).  qhash is reused by the family-key grouping."""
    n = batch.n
    from ..ops import native_rowpile as _nr
    lib = _nr._load()
    if lib is not None and hasattr(lib, "qname_hash64") and n:
        import ctypes
        h = np.empty(n, dtype=np.uint64)
        qd = np.frombuffer(bytes(batch.qname_data), dtype=np.uint8)
        qo = np.ascontiguousarray(batch.qname_off, dtype=np.int64)
        lib.qname_hash64(qd.ctypes.data_as(ctypes.c_void_p),
                         qo.ctypes.data_as(ctypes.c_void_p),
                         ctypes.c_int64(n),
                         h.ctypes.data_as(ctypes.c_void_p))
        _, first_idx, inv = np.unique(h, return_index=True,
                                      return_inverse=True)
        order = np.argsort(first_idx, kind="stable")
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order))
        frag_of_read = rank[inv]
        first_read = first_idx[order].astype(np.int64)
        return frag_of_read, first_read, h
    qd = batch.qname_data
    off = batch.qname_off
    uniq = {}
    frag_of_read = np.empty(n, dtype=np.int64)
    first_read = []
    for i in range(n):
        q = bytes(qd[off[i]:off[i + 1]])
        j = uniq.setdefault(q, len(uniq))
        frag_of_read[i] = j
        if j == len(first_read):
            first_read.append(i)
    return frag_of_read, np.asarray(first_read, dtype=np.int64), None


def group_families(batch, table, cfg,
                   assay_type=AssayType.CAPTURE,
                   platform=SequencingPlatform.ILLUMINA) -> FamilyGrouping:
    """Build fragments (by QNAME) and families (by dedup key)."""
    n = batch.n
    # fragments: group reads by QNAME hash (the reference's fragment map
    # is keyed by qnamehash, grouping.cpp:925); fragment ids keep
    # first-occurrence order like the previous dict-based grouping
    frag_of_read, first_read, qhash = _group_by_qname(batch)
    n_frags = len(first_read)

    r = table.reads
    frag_strand = np.zeros(n_frags, dtype=np.int64)
    frag_beg = np.full(n_frags, np.iinfo(np.int64).max, dtype=np.int64)
    frag_end = np.zeros(n_frags, dtype=np.int64)
    np.minimum.at(frag_beg, frag_of_read, np.minimum(r.pos, np.minimum(
        batch.mpos.astype(np.int64), r.frag_pos_L)))
    np.maximum.at(frag_end, frag_of_read,
                  np.where(r.isize != 0, r.frag_pos_R, r.rend))
    frag_strand[frag_of_read] = r.strand.astype(np.int64)

    # UMI per fragment (from the first read's qname); one vectorized scan
    # for the '#' marker skips per-qname parsing on barcode-free data
    qd, qoff = batch.qname_data, batch.qname_off

    def _qname(i):
        return bytes(qd[qoff[i]:qoff[i + 1]])

    if n and bool((np.frombuffer(bytes(qd), np.uint8) == ord("#")).any()):
        umis, is_dupx = parse_umis([_qname(int(i)) for i in first_read])
    else:
        umis = [b""] * n_frags
        is_dupx = [False] * n_frags

    has_umi = any(len(u) > 0 for u in umis)
    molecule_tag = cfg.molecule_tag
    if molecule_tag == MoleculeTag.AUTO:
        molecule_tag = (MoleculeTag.DUPLEX if any(is_dupx)
                        else (MoleculeTag.BARCODING if has_umi
                              else MoleculeTag.NONE))

    # per-fragment amplicon detection (grouping.cpp:780-860); an explicit
    # --assay-type overrides the detection wholesale
    isrc64 = r.isrc.astype(np.int64)
    isr2_64 = isrc64 ^ r.strand.astype(np.int64)
    lane_of_read = isrc64 * 2 + isr2_64
    frag_lane = lane_of_read[first_read]
    if assay_type == AssayType.AMPLICON:
        is_amp = np.ones(n_frags, dtype=bool)
        beg_w = end_w = beg_strong = end_strong = is_amp
        beg2c = end2c = np.ones(n_frags, dtype=np.int64)
    elif assay_type == AssayType.CAPTURE:
        is_amp = np.zeros(n_frags, dtype=bool)
        beg_w = end_w = beg_strong = end_strong = is_amp
        beg2c = end2c = np.zeros(n_frags, dtype=np.int64)
    else:
        (is_amp, beg_w, end_w, beg_strong, end_strong,
         beg2c, end2c) = detect_amplicon(frag_beg, frag_end, frag_lane, cfg)

    # per-fragment dedup key selection (grouping.cpp:863-895, SURVEY.md A.2)
    e2e = cfg.dedup_amplicon_end2end_ratio
    has_umi_frag = (np.fromiter((len(u) > 0 for u in umis), bool, n_frags)
                    if has_umi else np.zeros(n_frags, dtype=bool))
    if cfg.dedup_flag != 0:
        idflag_of_frag = np.full(n_frags, cfg.dedup_flag, dtype=np.int64)
    elif platform == SequencingPlatform.IONTORRENT:
        idflag_of_frag = np.where(has_umi_frag, 0x9,
                                  np.where(is_amp, 0x7, 0x3)).astype(np.int64)
    else:
        one_beg = beg_strong & end_w & (beg2c > end2c * e2e)
        one_end = end_strong & beg_w & (end2c > beg2c * e2e)
        umi_flag = np.where(one_beg, 0x9, np.where(one_end, 0xA, 0xB))
        idflag_of_frag = np.where(has_umi_frag, umi_flag,
                                  np.where(is_amp, 0x7, 0x3)).astype(np.int64)

    beg_s = snap_positions(frag_beg, center_mult=cfg.dedup_center_mult)
    end_s = snap_positions(frag_end, center_mult=cfg.dedup_center_mult)

    def _fam_mb_of_frag(j, dflag_bits):
        """MolecularBarcode of the family's first read (grouping.cpp:
        896-941), for the consensus-FASTQ names."""
        i0 = int(first_read[j])
        flag = int(batch.flag[i0])
        isize = int(r.isize[i0])          # NORM_INSERT_SIZE applied
        borders = ((flag & 0x1) and not (flag & 0x4) and not (flag & 0x8)
                   and (abs(isize) >= MAX_INSERT_SIZE * 3 // 4
                        or isize == 0))
        begtid = int(batch.tid[i0]) if not (flag & 0x4) else (2**31 - 2)
        endtid = (int(batch.mtid[i0])
                  if (flag & 0x1) and not (flag & 0x8) else (2**31 - 2))
        beg3 = int(batch.pos[i0]) if borders else int(beg_s[j])
        # tEnd is INCLUSIVE in the reference (fill_isrc_isr2_beg_end,
        # grouping.cpp:349-416); our snapped fragment end is exclusive
        end3 = int(batch.mpos[i0]) if borders else int(end_s[j]) - 1
        duplexflag = int(dflag_bits) | (0x8 if borders else 0)
        idflag = int(idflag_of_frag[j])
        qn = _qname(i0)
        kb, ke, kq, ku = mb_create_key((begtid, beg3), (endtid, end3),
                                       qn, umis[j], idflag)
        hv = mb_calc_hash(kb, ke, kq, ku, duplexflag, idflag)
        return dict(beg_pair=(begtid, beg3), end_pair=(endtid, end3),
                    duplexflag=duplexflag, dedup_idflag=idflag,
                    umistring=umis[j].decode(),
                    hashvalue=hv,
                    # MolecularBarcode::operator< order of the map key
                    # (MolecularID.hpp:52-68): alns3 iterates in this order
                    sort_key=(kb, ke, kq, ku, duplexflag, idflag, hv))

    if not has_umi and qhash is not None:
        # vectorized family grouping (barcode-free fast path): the key is
        # (strand, masked beg, masked end, masked qname-hash); grouping by
        # the 64-bit FNV-1a qname hash instead of the qname bytes matches
        # the reference, whose fragment map is likewise hash-keyed
        # (grouping.cpp:925)
        frag_dflag = np.where(is_amp, 0x4, 0).astype(np.int64)
        bkey = np.where(idflag_of_frag & 0x1, beg_s, -1)
        ekey = np.where(idflag_of_frag & 0x2, end_s, -1)
        qkey = np.where(idflag_of_frag & 0x4,
                        qhash[first_read].view(np.int64), 0)
        order = np.lexsort((qkey, ekey, bkey, frag_strand))
        n_g = 0
        gid = np.zeros(n_frags, dtype=np.int64)
        if n_frags:
            ss, bs, es, qs = (frag_strand[order], bkey[order], ekey[order],
                              qkey[order])
            new = np.ones(n_frags, dtype=bool)
            new[1:] = ((ss[1:] != ss[:-1]) | (bs[1:] != bs[:-1])
                       | (es[1:] != es[:-1]) | (qs[1:] != qs[:-1]))
            gid_sorted = np.cumsum(new) - 1
            gid[order] = gid_sorted
            n_g = int(gid_sorted[-1]) + 1
        # family ids in first-occurrence order (dict-setdefault semantics)
        ffirst = np.full(n_g, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(ffirst, gid, np.arange(n_frags, dtype=np.int64))
        rank = np.empty(n_g, dtype=np.int64)
        rank[np.argsort(ffirst, kind="stable")] = np.arange(n_g)
        fam_of_frag = rank[gid]
        fam_first = np.sort(ffirst)  # fam k's first fragment index
        # the MolecularBarcode info only feeds the consensus-FASTQ names:
        # skip the per-family python work on the hot path
        fam_mb = ([_fam_mb_of_frag(int(j), int(frag_dflag[int(j)]))
                   for j in fam_first]
                  if cfg.fam_consensus_out_fastq else None)
        return FamilyGrouping(
            frag_of_read=frag_of_read, fam_of_frag=fam_of_frag,
            frag_strand=frag_strand, fam_strand=frag_strand[fam_first],
            fam_dflag=frag_dflag[fam_first], frag_dflag=frag_dflag,
            n_frags=n_frags, n_fams=n_g,
            umi_of_fam=[""] * n_g,
            duplex_pair=np.full(n_g, -1, dtype=np.int64),
            pcrpassed=int(is_amp.sum()), frag_amplicon=is_amp,
            fam_mb=fam_mb)

    fam_keys = {}
    fam_of_frag = np.empty(n_frags, dtype=np.int64)
    want_mb = bool(cfg.fam_consensus_out_fastq)
    fam_mb_l = []
    fam_strand_l = []
    fam_dflag_l = []
    fam_umi_l = []
    duplex_mol = {}
    duplex_pair_l = []
    frag_dflag = np.zeros(n_frags, dtype=np.int64)
    for j in range(n_frags):
        umi = umis[j]
        dflag = 0
        umi_norm = umi
        if is_dupx[j]:
            umi_norm, _ = normalize_duplex_umi(umi)
            dflag |= 0x2 | 0x1
        elif len(umi):
            dflag |= 0x1
        if is_amp[j]:
            dflag |= 0x4
        frag_dflag[j] = dflag
        idflag = int(idflag_of_frag[j])
        key = (int(frag_strand[j]),
               int(beg_s[j]) if idflag & 0x1 else -1,
               int(end_s[j]) if idflag & 0x2 else -1,
               _qname(int(first_read[j])) if idflag & 0x4 else b"",
               umi_norm if idflag & 0x8 else b"")
        f = fam_keys.setdefault(key, len(fam_keys))
        fam_of_frag[j] = f
        if f == len(fam_strand_l):
            fam_strand_l.append(int(frag_strand[j]))
            fam_dflag_l.append(dflag)
            fam_umi_l.append(umi_norm.decode() if umi_norm else "")
            if want_mb:
                fam_mb_l.append(_fam_mb_of_frag(j, dflag))
            if dflag & 0x2:
                mkey = (int(beg_s[j]) if idflag & 0x1 else -1,
                        int(end_s[j]) if idflag & 0x2 else -1, umi_norm)
                duplex_pair_l.append(duplex_mol.setdefault(mkey, len(duplex_mol)))
            else:
                duplex_pair_l.append(-1)

    return FamilyGrouping(
        frag_of_read=frag_of_read, fam_of_frag=fam_of_frag,
        frag_strand=frag_strand, fam_strand=np.asarray(fam_strand_l, np.int64),
        fam_dflag=np.asarray(fam_dflag_l, np.int64), frag_dflag=frag_dflag,
        n_frags=n_frags, n_fams=len(fam_strand_l),
        umi_of_fam=fam_umi_l,
        duplex_pair=np.asarray(duplex_pair_l, np.int64),
        pcrpassed=int(is_amp.sum()), frag_amplicon=is_amp,
        fam_mb=fam_mb_l if want_mb else None)
