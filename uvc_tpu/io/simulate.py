"""Synthetic read/BAM simulation for tests and benchmarks.

The reference ships no test data; SURVEY.md §4 calls for tiny synthetic BAMs
(plain, UMI, duplex, amplicon, tumor-normal) as the golden-file corpus. This
module builds them: deterministic reference sequences, planted SNVs/indels at
chosen allele fractions, paired-end reads with optional #UMI / #A+B duplex
QNAMEs, written coordinate-sorted.
"""

import numpy as np

from . import bam
from .bam import (BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CSOFT_CLIP,
                  FPAIRED, FPROPER_PAIR, FREVERSE, FMREVERSE, FREAD1, FREAD2)
from .fasta import write_fasta

BASES = "ACGT"


def random_ref(length: int, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    return "".join(BASES[i] for i in rng.integers(0, 4, length))


class Variant:
    """Planted variant: SNV ('X>Y'), insertion ('+SEQ'), deletion ('-N')."""

    def __init__(self, pos: int, spec: str, fraction: float):
        self.pos = pos          # 0-based ref position (anchor base for indels)
        self.spec = spec
        self.fraction = fraction

    def apply(self, ref: str, frag_beg: int, frag_end: int, rng):
        """Returns (haplotype_seq, covers) for fragment [frag_beg, frag_end)."""
        if not (frag_beg <= self.pos < frag_end):
            return None
        rel = self.pos - frag_beg
        seq = ref[frag_beg:frag_end]
        if ">" in self.spec:
            alt = self.spec.split(">")[1]
            return seq[:rel] + alt + seq[rel + 1:]
        if self.spec.startswith("+"):
            ins = self.spec[1:]
            return seq[:rel + 1] + ins + seq[rel + 1:]
        if self.spec.startswith("-"):
            dlen = int(self.spec[1:])
            return seq[:rel + 1] + seq[rel + 1 + dlen:]
        raise ValueError(self.spec)


def simulate_reads(ref: str, depth: int, read_len: int = 100,
                   frag_len: int = 250, variants=(), seed: int = 1,
                   umi: bool = False, duplex: bool = False,
                   base_qual: int = 35, chrom_len: int = None,
                   n_umi_families: int = None, region=(0, None)):
    """Yield (qname, flag, pos, cigar, seq, qual, mpos, isize, strand) tuples
    for paired-end fragments tiling [region[0], region[1]).

    Variant-carrying fragments get modified haplotypes; CIGARs are emitted
    against the unmodified reference (M/I/D), mimicking a perfect aligner.
    """
    rng = np.random.default_rng(seed)
    beg, end = region[0], region[1] or len(ref)
    n_frags = max(1, depth * (end - beg) // (2 * read_len))
    out = []
    for i in range(n_frags):
        is_fam_sim = umi and n_umi_families
        # template orientation: duplex alternates per replicate so each
        # molecule gets both strands; otherwise alternate per fragment
        parity = ((i // n_umi_families) % 2) if (is_fam_sim and duplex) else (i % 2)
        if is_fam_sim:
            # PCR replicates of one tagged molecule share the fragment span
            fam0 = i % n_umi_families
            fb = beg + (fam0 * 131) % max(1, (end - frag_len) - beg)
        else:
            fb = int(rng.integers(beg, max(beg + 1, end - frag_len)))
        fe = min(fb + frag_len, len(ref))
        # choose haplotype
        hap = ref[fb:fe]
        cig_events = []  # (relpos_in_fragment_ref, kind, arg)
        for vi, v in enumerate(variants):
            if is_fam_sim:
                # variant presence is a property of the tagged molecule: all
                # PCR replicates of one family share the same haplotype
                fam0 = i % n_umi_families
                carries = ((fam0 * 2654435761 + vi * 40503) % 1000) / 1000.0 < v.fraction
            else:
                carries = rng.random() < v.fraction
            if carries:
                if ">" in v.spec and not cig_events:
                    # SNVs stack on the current haplotype (CIGAR
                    # unchanged), so one fragment can carry several —
                    # needed to exercise the phasing haplotype machinery
                    if fb <= v.pos < fe:
                        rel = v.pos - fb
                        hap = (hap[:rel] + v.spec.split(">")[1]
                               + hap[rel + 1:])
                    continue
                # indels only on an otherwise-unmodified haplotype (the
                # single-event CIGAR model)
                applied = (v.apply(ref, fb, fe, rng)
                           if hap == ref[fb:fe] else None)
                if applied is not None:
                    hap = applied
                    rel = v.pos - fb
                    if ">" in v.spec:
                        pass  # SNV: CIGAR unchanged
                    elif v.spec.startswith("+"):
                        cig_events.append((rel, "I", len(v.spec) - 1))
                    else:
                        cig_events.append((rel, "D", int(v.spec[1:])))
                    break  # one indel per fragment for simplicity
        umi_tag = ""
        if umi:
            fam = (i % n_umi_families) if n_umi_families else i
            u = "".join(BASES[(fam >> (2 * k)) & 3] for k in range(6))
            if duplex:
                u2 = "".join(BASES[((fam + 7) >> (2 * k)) & 3] for k in range(6))
                # the two template strands of one molecule carry the two UMI
                # orientations (alpha+beta vs beta+alpha)
                umi_tag = "#" + (u + "+" + u2 if parity == 0 else u2 + "+" + u)
            else:
                umi_tag = "#" + u
        qname = f"sim{i:06d}{umi_tag}"
        # R1 = left (forward), R2 = right (reverse) of the fragment
        r1_seq, r1_cig = _extract_read(hap, cig_events, 0, read_len)
        r2_off = len(hap) - read_len
        r2_seq, r2_cig = _extract_read(hap, cig_events, r2_off, read_len)
        r1_pos = fb
        r2_pos = fb + _ref_advance(cig_events, r2_off)
        isize = fe - fb
        qv = chr(base_qual + 33) * read_len
        if parity == 0:
            # F1R2 template (strand 0): R1 is the left forward read
            out.append((qname, FPAIRED | FPROPER_PAIR | FMREVERSE | FREAD1,
                        r1_pos, r1_cig, r1_seq, qv, r2_pos, isize))
            out.append((qname, FPAIRED | FPROPER_PAIR | FREVERSE | FREAD2,
                        r2_pos, r2_cig, r2_seq, qv, r1_pos, -isize))
        else:
            # F2R1 template (strand 1): R1 is the right reverse read
            out.append((qname, FPAIRED | FPROPER_PAIR | FREVERSE | FREAD1,
                        r2_pos, r2_cig, r2_seq, qv, r1_pos, -isize))
            out.append((qname, FPAIRED | FPROPER_PAIR | FMREVERSE | FREAD2,
                        r1_pos, r1_cig, r1_seq, qv, r2_pos, isize))
    return out


def _extract_read(hap: str, cig_events, offset: int, read_len: int):
    """Take read_len bases of haplotype from `offset`, build CIGAR vs ref."""
    seq = hap[offset:offset + read_len]
    # translate events from fragment-ref coords into the read
    # simple model: at most one event per fragment
    if not cig_events:
        return seq, [(BAM_CMATCH, len(seq))]
    rel, kind, arg = cig_events[0]
    if kind == "I":
        ins_start_in_hap = rel + 1
        s, e = offset, offset + read_len
        if ins_start_in_hap <= s or ins_start_in_hap + arg >= e:
            # insertion fully outside or clipped at boundary: treat as match
            return seq, [(BAM_CMATCH, len(seq))]
        left = ins_start_in_hap - s
        return seq, [(BAM_CMATCH, left), (BAM_CINS, arg),
                     (BAM_CMATCH, len(seq) - left - arg)]
    else:  # deletion
        del_after_in_hap = rel + 1  # deletion occurs after this hap index
        s, e = offset, offset + read_len
        if del_after_in_hap <= s or del_after_in_hap >= e:
            return seq, [(BAM_CMATCH, len(seq))]
        left = del_after_in_hap - s
        return seq, [(BAM_CMATCH, left), (BAM_CDEL, arg),
                     (BAM_CMATCH, len(seq) - left)]


def _ref_advance(cig_events, hap_offset: int) -> int:
    """Reference distance corresponding to hap_offset haplotype bases."""
    adv = hap_offset
    for rel, kind, arg in cig_events:
        if kind == "I" and rel + 1 < hap_offset:
            adv -= min(arg, hap_offset - (rel + 1))
        elif kind == "D" and rel + 1 <= hap_offset:
            adv += arg
    return adv


def calc_nm(ref: str, pos: int, cigar, seq: str) -> int:
    """Edit distance to the reference over the alignment (the NM aux tag
    as samtools calmd defines it: mismatches in M/=/X plus I/D lengths)."""
    nm = 0
    rp, qp = pos, 0
    for op, ln in cigar:
        if op in (BAM_CMATCH, 7, 8):
            a = np.frombuffer(seq[qp:qp + ln].encode(), np.uint8)
            b = np.frombuffer(ref[rp:rp + ln].encode(), np.uint8)
            nm += int((a != b).sum())
            rp += ln
            qp += ln
        elif op == BAM_CINS:
            nm += ln
            qp += ln
        elif op == BAM_CDEL:
            nm += ln
            rp += ln
        elif op == BAM_CSOFT_CLIP:
            qp += ln
        elif op == 3:  # N
            rp += ln
    return nm


def build_bam(path: str, ref: str, chrom: str = "chr1", with_nm: bool = True,
              **sim_kwargs):
    """Simulate reads over `ref` and write a coordinate-sorted BAM.

    Writes the NM aux tag per read (as real aligners do) unless
    with_nm=False, which exercises the reference's NM-absent fallback."""
    reads = simulate_reads(ref, **sim_kwargs)
    reads.sort(key=lambda r: r[2])
    header = (f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{chrom}\tLN:{len(ref)}\n"
              f"@PG\tID:uvc_tpu_sim\tPN:uvc_tpu_sim\n")
    records = []
    for (qname, flag, pos, cigar, seq, qual, mpos, isize) in reads:
        aux = (bam.encode_aux_int("NM", calc_nm(ref, pos, cigar, seq))
               if with_nm else b"")
        records.append((qname, flag, 0, pos, 60, cigar, 0, mpos, isize,
                        seq, qual, aux))
    bam.write_bam(path, header, [(chrom, len(ref))], records)
    return len(records)


def build_bam_multi(path: str, contigs, **sim_kwargs):
    """Multi-contig coordinate-sorted BAM.

    contigs: list of (chrom, ref_seq, variants) triples; reads are
    simulated per contig and written in (tid, pos) order, mirroring the
    reference's whole-genome BAM layout (one @SQ per chromosome)."""
    sq = "".join(f"@SQ\tSN:{c}\tLN:{len(r)}\n" for c, r, _ in contigs)
    header = ("@HD\tVN:1.6\tSO:coordinate\n" + sq
              + "@PG\tID:uvc_tpu_sim\tPN:uvc_tpu_sim\n")
    records = []
    base_seed = sim_kwargs.pop("seed", 0)
    for tid, (chrom, ref, variants) in enumerate(contigs):
        reads = simulate_reads(ref, variants=variants,
                               seed=base_seed + tid, **sim_kwargs)
        reads.sort(key=lambda r: r[2])
        for (qname, flag, pos, cigar, seq, qual, mpos, isize) in reads:
            aux = bam.encode_aux_int("NM", calc_nm(ref, pos, cigar, seq))
            records.append((f"t{tid}-{qname}", flag, tid, pos, 60, cigar,
                            tid, mpos, isize, seq, qual, aux))
    bam.write_bam(path, header, [(c, len(r)) for c, r, _ in contigs],
                  records)
    return len(records)


def build_test_dataset(dirpath: str, seed: int = 0):
    """Reference FASTA + tumor BAM with planted SNV/ins/del."""
    import os
    os.makedirs(dirpath, exist_ok=True)
    ref = random_ref(3000, seed)
    fa = f"{dirpath}/ref.fa"
    write_fasta(fa, [("chr1", ref)])
    variants = [
        Variant(1000, f"{ref[1000]}>" + ("A" if ref[1000] != "A" else "C"), 0.3),
        Variant(1500, "+TT", 0.25),
        Variant(2000, "-2", 0.25),
    ]
    bam_path = f"{dirpath}/tumor.bam"
    n = build_bam(bam_path, ref, depth=120, variants=variants, seed=seed + 1)
    return fa, bam_path, ref, variants, n
