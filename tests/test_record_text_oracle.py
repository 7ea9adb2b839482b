"""Record-TEXT parity: the final VCF emission layer vs the COMPILED
reference (VERDICT round-4 missing #2).

tools/record_oracle.py round-5 additions compile the reference's
`fill_tki` / `fill_conditional_tki` / `calc_binom_powlaw_syserr_normv_quals{,2}`
/ `append_vcf_record` (main.hpp:5912-6272), `generate_vcf_header`
(main.hpp:5778-5883), and — sliced verbatim from main.cpp — the cVQ1M/cVQ2M
consensus-allele ranking (main.cpp:1000-1015) and the tumor-normal NLODQ
composition (main.cpp:1104-1147).  These tests run the REAL python pipeline
on simulated BAMs (plain / UMI / IonTorrent / tumor-normal) and pin, per
emitted record, the ENTIRE reference-produced VCF line (CHROM..FORMAT
column text) against vcf_writer.render_record's bytes — so every byte
between the model planes and the bgzf stream is reference-backed, and the
golden_*.vcf files stop being self-pinned.
"""

import os
import sys

import numpy as np
import pytest

REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "main.hpp")),
    reason="reference source unavailable")

import record_oracle  # noqa: E402

from test_record_oracle import (_run_pipeline, _run_tn_pipeline,  # noqa: E402
                                _ps_lines)

from uvc_tpu import calling  # noqa: E402
from uvc_tpu.constants import Symbol, SYMBOL_TO_DESC  # noqa: E402
from uvc_tpu.vcfout import writer as vcf_writer  # noqa: E402

NS = int(Symbol.END_SYMBOLS) if hasattr(Symbol, "END_SYMBOLS") else 14
DESC_TO_SYMBOL = {d: i for i, d in enumerate(SYMBOL_TO_DESC)}


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("record_text_oracle"))
    exe = record_oracle.build_oracle(d)
    orc = record_oracle.Oracle(exe)
    yield orc
    orc.close()


def _feed_rvec(orc, tracks):
    """Ship the region's RegionalTandemRepeat vector (sparse rows only)."""
    n = len(tracks.begpos)
    orc.send(f"rvec {n}")
    nz = np.nonzero(np.asarray(tracks.tracklen)
                    | np.asarray(tracks.anyTR_tracklen))[0]
    for i in nz.tolist():
        orc.send(f"rvecrow {i} {int(tracks.begpos[i])} "
                 f"{int(tracks.tracklen[i])} {int(tracks.unitlen[i])} "
                 f"{int(tracks.anyTR_begpos[i])} "
                 f"{int(tracks.anyTR_tracklen[i])} "
                 f"{int(tracks.anyTR_unitlen[i])}")


def _feed_record_fmt(orc, rec):
    """Mirror one VariantRecord's fmt dict into the oracle BcfFormat."""
    FF = record_oracle.FMT_FIELDS
    parts = []
    for k, v in rec.fmt.items():
        if k.startswith("_"):
            continue
        spec = FF.get(k)
        assert spec is not None, f"record fmt key {k} not in BcfFormat"
        kind = spec[0]
        if isinstance(v, (tuple, list)):
            vals = list(v)
        elif isinstance(v, str):
            if kind == "vector" and v == ".":
                continue       # deliberately-empty Number=D vector -> "."
            vals = v.split(",") if kind == "vector" else [v]
        else:
            vals = [v]
        enc = ",".join(record_oracle.esc(str(x)) for x in vals)
        parts.append(f"{k}={enc}")
    parts.append("enable_tier2_consensus_format_tags=%d"
                 % int(bool(rec.fmt.get("_sscs"))))
    orc.send("fmt " + " ".join(parts))


def _feed_tki(orc, t):
    orc.send("tki " + " ".join(
        f"{k}={int(getattr(t, a))}" for k, a in (
            ("VTI", "VTI"), ("pos", "pos"), ("BDP", "BDP"), ("bDP", "bDP"),
            ("CDP1x", "CDP1x"), ("cDP1x", "cDP1x"), ("cVQ1", "cVQ1"),
            ("cPCQ1", "cPCQ1"), ("CDP2x", "CDP2x"), ("cDP2x", "cDP2x"),
            ("cVQ2", "cVQ2"), ("cPCQ2", "cPCQ2"), ("bNMQ", "bNMQ"),
            ("vHGQ", "vHGQ"), ("tDP", "tDP"), ("tDPC", "tDPC"),
            ("enable_tier2_consensus_format_tags", "enable_tier2"))))
    orc.send(f"tki tADR={t.tAD_ref},{t.tAD_alt} "
             f"tADCR={t.tADC_ref},{t.tADC_alt}")
    orc.send("tki ref_alt=" + record_oracle.esc(t.ref_alt))
    if getattr(t, "tumor_format_text", ""):
        # bcf1_to_string (main.hpp:5897-5910) returns the last column
        # INCLUDING its leading tab
        orc.send("tumorfmt " + record_oracle.esc("\t" + t.tumor_format_text))


def _replay_record(orc, rctx, rec, cfg, ps_line, chrom, region_offset,
                   is_tumor_only):
    """Feed one assembled record through the compiled append_vcf_record and
    return the reference-emitted line (without trailing newline)."""
    F = rctx["F"]
    p, s = rec.pos, rec.symbol
    orc.send("reset")
    orc.send(ps_line)
    if not is_tumor_only:
        orc.send("ps vcf_tumor_fname=oracle-tumor.vcf.gz "
                 "is_tumor_format_retrieved=1")
    _feed_rvec(orc, rctx["res"].tracks)
    _feed_record_fmt(orc, rec)
    tkis = rctx.get("rescued", {}).get((p, s))
    if tkis:
        _feed_tki(orc, tkis[0])
    refsym = int(F["ref_syms"][p]) if s < 6 else int(Symbol.LINK_M)
    nlodq1 = int(rec.info["NLODQ"])
    argmin = DESC_TO_SYMBOL.get(rec.info["NLODV"], 14)
    ru = rec.info.get("RU", "") or "A"
    rnum = int(rec.info.get("RC", 0))
    rs = record_oracle.esc(rctx["_refstring"].decode())
    out = orc.ask(
        f"record {record_oracle.esc(chrom)} {p + region_offset} "
        f"{region_offset} {refsym} {s} {nlodq1} {argmin} 0 "
        f"{record_oracle.esc(ru)} {rnum} {rs}")
    assert out.startswith("REC ")
    return record_oracle.unesc(out[4:])


def _check_pipeline_records(orc, prepared, cfg, is_tumor_only, errs,
                            chrom="chrT"):
    n = 0
    ps_line = _ps_lines(cfg)
    for rctx in prepared:
        refstring = rctx["_refstring"]
        recs = calling.assemble_records(rctx, refstring, 0, chrom, cfg,
                                        is_tumor_only=is_tumor_only)
        for rec in recs:
            ref_line = _replay_record(orc, rctx, rec, cfg, ps_line, chrom,
                                      0, is_tumor_only)
            ours = vcf_writer.render_record(chrom, rec) + "\n"
            if ref_line != ours:
                errs.append(f"(p={rec.pos},s={rec.symbol})\n"
                            f"ref: {ref_line!r}\npy:  {ours!r}")
            n += 1
    return n


def test_record_text_parity_plain(oracle, tmp_path):
    prepared, cfg = _run_pipeline(tmp_path, seed=7)
    errs = []
    n = _check_pipeline_records(oracle, prepared, cfg, True, errs)
    assert n >= 4, f"too few records exercised: {n}"
    assert not errs, f"{len(errs)} of {n} records differ:\n" + \
        "\n".join(errs[:6])


def test_record_text_parity_umi(oracle, tmp_path):
    prepared, cfg = _run_pipeline(tmp_path, seed=11, depth=120,
                                  umi=dict(umi=True, n_umi_families=400))
    errs = []
    n = _check_pipeline_records(oracle, prepared, cfg, True, errs)
    assert n >= 2, f"too few records exercised: {n}"
    assert not errs, f"{len(errs)} of {n} records differ:\n" + \
        "\n".join(errs[:6])


def test_record_text_parity_tumor_normal(oracle, tmp_path):
    prepared, cfg = _run_tn_pipeline(tmp_path)
    errs = []
    n = _check_pipeline_records(oracle, prepared, cfg, False, errs)
    assert n >= 3, f"too few rescued records exercised: {n}"
    assert not errs, f"{len(errs)} of {n} records differ:\n" + \
        "\n".join(errs[:6])


def _st_range(s):
    return (0, 0, 6) if s < 6 else (1, 6, 14)


def test_tnjoin_parity(oracle, tmp_path):
    """The tumor-normal NLODQ composition (main.cpp:1104-1147, sliced
    verbatim into the oracle driver) vs calling.assemble_records'
    nlodq_inc loop: germline group -> output_germline -> tn_nlodq_compose
    must reproduce our records' INFO NLODQ/NLODV for every rescued
    candidate."""
    from test_record_oracle import _germ_feed_fields
    import record_oracle as ro

    prepared, cfg = _run_tn_pipeline(tmp_path)
    ps_line = _ps_lines(cfg)
    n = 0
    errs = []
    for rctx in prepared:
        F, res = rctx["F"], rctx["res"]
        cand = np.asarray(rctx["cand"])
        refstring = rctx["_refstring"]
        recs = calling.assemble_records(rctx, refstring, 0, "chrT", cfg,
                                        is_tumor_only=False)
        for rec in recs:
            p, s = rec.pos, rec.symbol
            tkis = rctx["rescued"].get((p, s))
            if not tkis:
                continue
            st, lo, hi = _st_range(s)
            refsym = int(F["ref_syms"][p]) if st == 0 else int(Symbol.LINK_M)
            syms = [x for x in range(lo, hi) if cand[p, x]]
            if refsym not in syms:
                continue
            oracle.send("reset")
            oracle.send(ps_line)
            oracle.send("ps vcf_tumor_fname=oracle-tumor.vcf.gz")
            for x in syms:
                if x == 5:          # BASE_NN excluded (main.cpp:1042)
                    continue
                fmtd = calling.plan_fmt(F, res, p, x, refsym, 0)
                line = _germ_feed_fields(fmtd, F, p, x)
                # the tnjoin block additionally reads cDP1x/CDP1x of the
                # top-2 germline fmts (main.cpp:1109-1113)
                line += (f" cDP1x={fmtd['cDP1x'][0]},{fmtd['cDP1x'][1]}"
                         f" CDP1x={fmtd['CDP1x'][0]},{fmtd['CDP1x'][1]}")
                oracle.send(line)
            rs = ro.esc(refstring.decode())
            out = oracle.ask(f"germline {refsym} {p} 0 {rs}")
            nlodq_ss = int(out.split(" ", 2)[1])
            _feed_record_fmt(oracle, rec)
            _feed_tki(oracle, tkis[0])
            gp = (cfg.germ_phred_hetero_snp if st == 0
                  else cfg.germ_phred_hetero_indel)
            out = oracle.ask(f"tnjoin {s} {gp} {gp} {nlodq_ss} "
                             f"{nlodq_ss - 3 + gp}")
            parts_o = out.split(" ")
            _, nlodq_c, argmin_c = parts_o[:3]
            diag = " ".join(parts_o[3:])
            ours_nlodq = int(rec.info["NLODQ"])
            ours_nlodv = rec.info["NLODV"]
            if int(nlodq_c) != ours_nlodq:
                st_g = F["_germ"][st]
                errs.append(f"(p={p},s={s}) NLODQ ref={nlodq_c} "
                            f"py={ours_nlodq} diag[{diag}] "
                            f"alts=({int(st_g['alt1_sym'][p])},"
                            f"{int(st_g['alt1_cDP1x'][p])};"
                            f"{int(st_g['alt2_sym'][p])},"
                            f"{int(st_g['alt2_cDP1x'][p])}) "
                            f"CDP1x={int(F['CDP1x'][p, s])} "
                            f"vHGQ={tkis[0].vHGQ} tcDP1x={tkis[0].cDP1x} "
                            f"tCDP1x={tkis[0].CDP1x}")
            if SYMBOL_TO_DESC[min(int(argmin_c), 14)] != ours_nlodv:
                errs.append(f"(p={p},s={s}) NLODV "
                            f"ref={SYMBOL_TO_DESC[min(int(argmin_c), 14)]} "
                            f"py={ours_nlodv}")
            n += 1
    assert n >= 4, f"too few rescued candidates: {n}"
    assert not errs, f"{len(errs)} of {n}:\n" + "\n".join(errs[:12])


def test_cvqm_ranking_parity(oracle, tmp_path):
    """The cVQ1M/cVQ2M/cVQAM/cVQSM consensus-allele ranking
    (main.cpp:1000-1015, sliced verbatim) vs our rank dict."""
    import record_oracle as ro

    prepared, cfg = _run_pipeline(tmp_path, seed=7)
    ps_line = _ps_lines(cfg)
    n = 0
    errs = []
    for rctx in prepared:
        F, res = rctx["F"], rctx["res"]
        cand = np.asarray(rctx["cand"])
        recs = calling.assemble_records(rctx, rctx["_refstring"], 0, "chrT",
                                        cfg, is_tumor_only=True)
        by_pos = {}
        for rec in recs:
            st = _st_range(rec.symbol)[0]
            by_pos.setdefault((rec.pos, st), rec)
        for (p, st), rec in sorted(by_pos.items()):
            lo, hi = (0, 6) if st == 0 else (6, 14)
            refsym = int(F["ref_syms"][p]) if st == 0 else int(Symbol.LINK_M)
            oracle.send("reset")
            oracle.send(ps_line)
            oracle.send("gfmt %d VTI=%d,%d" % (rec.symbol, refsym,
                                               rec.symbol))
            for x in range(lo, hi):
                if not cand[p, x] or x == refsym:
                    continue
                cv1, cv2 = int(F["cVQ1"][p, x]), int(F["cVQ2"][p, x])
                gk = F["gapSa"].get((p, x))
                gs = gk.decode() if isinstance(gk, bytes) else ""
                oracle.send(f"cvqt {max(cv1, cv2)} {cv1} {cv2} {x} "
                            + ro.esc(gs))
            out = oracle.ask("cvqm")
            assert out.startswith("CVQ ")
            first = out[4:].split("|")[0]
            got = {}
            for part in first.split(";"):
                if part:
                    k, _, v = part.partition("=")
                    got[k] = [ro.unesc(x) for x in v.split(",")]
            for tag in ("cVQ1M", "cVQ2M", "cVQAM", "cVQSM"):
                ours = [str(x) for x in rec.fmt[tag]]
                if got[tag] != ours:
                    errs.append(f"(p={p},st={st}) {tag}: ref={got[tag]} "
                                f"py={ours}")
            n += 1
    assert n >= 4, n
    assert not errs, f"{len(errs)} of {n}:\n" + "\n".join(errs[:12])


def test_header_parity(oracle):
    """generate_vcf_header (main.hpp:5778-5883) vs vcfout.writer.
    Everything except the run-dependent fileDate / version lines must be
    byte-identical, including the tumor-sample column variant."""
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.constants import SequencingPlatform
    import record_oracle as ro

    cfg = UVCConfig()
    cfg.fasta_ref_fname = "ref.fa"
    cfg.sample_name = "S1"
    cfg.self_update_by_platform(SequencingPlatform.ILLUMINA, 150, 60)
    ps_line = _ps_lines(cfg)
    contigs = [("chr1", 248956422), ("chrM", 16569)]
    tokens = ["uvc1", "-f", "ref.fa", "-o", "out.vcf.gz", "in.bam"]

    def norm(h):
        return [l for l in h.splitlines()
                if not l.startswith(("##fileDate=",
                                     "##variantCallerVersion="))]

    for tumor_name, retrieved in ((None, 0), ("TUMOR", 1)):
        oracle.send("reset")
        oracle.send(ps_line)
        if retrieved:
            oracle.send("ps is_tumor_format_retrieved=1 "
                        "vcf_tumor_fname=t.vcf.gz")
        for nm, ln in contigs:
            oracle.send(f"contig {ro.esc(nm)} {ln}")
        out = oracle.ask("header " + (ro.esc(tumor_name) if tumor_name
                                      else "-")
                         + " " + " ".join(ro.esc(t) for t in tokens))
        assert out.startswith("HDR ")
        # unesc yields latin-1 code units; the header holds UTF-8 bytes
        ref_hdr = ro.unesc(out[4:]).encode("latin-1").decode("utf-8")
        ours = vcf_writer.generate_header(
            " ".join(tokens), contigs, "S1", cfg=cfg,
            tumor_sample=tumor_name)
        ref_l, our_l = norm(ref_hdr), norm(ours)
        assert len(ref_l) == len(our_l), (len(ref_l), len(our_l))
        for a, b in zip(ref_l, our_l):
            assert a == b, f"\nref: {a!r}\npy:  {b!r}"


def test_record_text_parity_iontorrent(oracle, tmp_path):
    """Record text under the IonTorrent platform shift (prior_phred 3+8
    in the TN quals, platform-shifted defaults in the FORMAT planes)."""
    from test_record_oracle import _run_tn_pipeline
    from uvc_tpu.constants import SequencingPlatform
    prepared, cfg = _run_tn_pipeline(tmp_path,
                                     platform=SequencingPlatform.IONTORRENT)
    errs = []
    n = _check_pipeline_records(oracle, prepared, cfg, False, errs)
    assert n >= 3, f"too few records exercised: {n}"
    assert not errs, f"{len(errs)} of {n} records differ:\n" + \
        "\n".join(errs[:6])


def test_rescue_decode_semantics():
    """vcfout/reader.read_tumor_vcf vs the reference's
    rescue_variants_from_vcf decode conventions (main.cpp:274-391): which
    FORMAT tag feeds which TumorKeyInfo field, per-allele index [1],
    capital index [0], the back-compat CDP1b/cDP1f+r (not DP/AD) sources,
    the link-symbol +1 position key, and the tier-2 gate."""
    from uvc_tpu.vcfout import reader as vcf_reader

    def mk(vti, pos, extra=""):
        keys = ("GT:VTI:BDPb:bDPf:bDPr:CDP1x:cDP1x:cVQ1:cPCQ1:CDP2x:cDP2x:"
                "cVQ2:cPCQ2:bNMQ:vHGQ:CDP1b:cDP1f:cDP1r:CDP2b:cDP2f:cDP2r"
                + extra)
        vals = (f"./1:{0},{vti}:11,22:1,2:3,4:500:100,77:10,20:30,40:600:"
                "200,88:50,60:70,80:5,6:9:41,42:7,8:9,10:43,44:11,12:13,14"
                + (":1" if extra else ""))
        return "\t".join(["chr9", str(pos), ".", "A", "T", "30.000000",
                          "PASS", "SOMATIC", keys, vals])

    text = mk(1, 101) + "\n" + mk(9, 200, extra=":c2LP1") + "\n"
    import tempfile
    p = tempfile.mktemp(suffix=".vcf")
    open(p, "w").write(text)
    tkis = vcf_reader.read_tumor_vcf(p, {"chr9": 0})
    os.remove(p)
    # SNV: symbolpos = POS-1; LINK: symbolpos = POS (main.cpp:281)
    assert set(tkis) == {(0, 100, 1), (0, 200, 9)}
    t = tkis[(0, 100, 1)][0]
    assert t.BDP == 11 + 22            # SUMPAIR(BDPb)
    assert t.bDP == 2 + 4              # bDPf[1] + bDPr[1]
    assert t.CDP1x == 500 and t.cDP1x == 77   # [0] capital, [1] allele
    assert (t.cVQ1, t.cPCQ1, t.CDP2x, t.cDP2x) == (20, 40, 600, 88)
    assert (t.cVQ2, t.cPCQ2, t.bNMQ, t.vHGQ) == (60, 80, 6, 9)
    # back-compat block (main.cpp:364-376): CDP1b / cDP1f+cDP1r sources
    assert t.tDP == 41 + 42
    assert (t.tAD_ref, t.tAD_alt) == (7 + 9, 8 + 10)
    assert t.tDPC == 43 + 44
    assert (t.tADC_ref, t.tADC_alt) == (11 + 13, 12 + 14)
    assert t.ref_alt == "A\tT"
    assert not t.enable_tier2           # no tier-2 tags on the first rec
    assert tkis[(0, 200, 9)][0].enable_tier2


def test_tumor_aux_column_literals():
    """The tumor column re-emitted next to a normal run's MGVCF /
    <ADDITIONAL_INDEL_CANDIDATE> lines (main.cpp:739-755, 784-797):
    exactly-one retrieved record -> verbatim column (leading tab);
    several -> the -1 placeholders; absent -> the dot placeholders."""
    from uvc_tpu.vcfout.aux_records import tumor_aux_column
    from uvc_tpu.vcfout.reader import TumorKeyInfo
    one = TumorKeyInfo(tumor_format_text=".:3,15:0,2,.,9,8,8,27,.,42")
    m = {(1000, 15): [one], (2000, 15): [one, one],
         (500, 16): [one], (600, 16): [one, one]}
    assert tumor_aux_column(m, 1000, 15) == "\t" + one.tumor_format_text
    assert tumor_aux_column(m, 2000, 15) == "\t.:.,.:-1"
    assert tumor_aux_column(m, 3000, 15) == "\t.:.,.:."
    assert tumor_aux_column(m, 500, 16) == "\t" + one.tumor_format_text
    assert tumor_aux_column(m, 600, 16) == "\t.:-1,-1:-1,-1"
    assert tumor_aux_column(m, 700, 16) == "\t.:.,.:.,."


def test_normal_run_emits_mgvcf_with_tumor_column(tmp_path):
    """End-to-end uvcTN-style pair: the NORMAL run's VCF must contain
    MGVCF_BLOCK lines with TWO value columns (its own + the tumor's
    retrieved block), like the reference's normal run."""
    import gzip
    import subprocess
    from uvc_tpu.io import simulate

    ref = simulate.random_ref(4000, 77)
    tbam, nbam = str(tmp_path / "t.bam"), str(tmp_path / "n.bam")
    v = [simulate.Variant(1500, f"{ref[1500]}>"
                          + ("A" if ref[1500] != "A" else "C"), 0.3)]
    simulate.build_bam(tbam, ref, depth=50, variants=v, seed=3)
    simulate.build_bam(nbam, ref, depth=40, seed=4, variants=[])
    fa = str(tmp_path / "r.fa")
    open(fa, "w").write(">chr1\n" + ref + "\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    tvcf = str(tmp_path / "t.vcf.gz")
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", tvcf, "-t", "1", "--tn-is-paired", "1", tbam],
                   check=True, env=env, cwd=REPO, capture_output=True,
                   timeout=600)
    nvcf = str(tmp_path / "n.vcf.gz")
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", nvcf, "-t", "1", "--tumor-vcf", tvcf, nbam],
                   check=True, env=env, cwd=REPO, capture_output=True,
                   timeout=600)
    body = gzip.decompress(open(nvcf, "rb").read()).decode()
    mg = [l for l in body.splitlines()
          if "MGVCF_BLOCK" in l and not l.startswith("#")]
    assert mg, "normal run emitted no MGVCF blocks"
    two_col = [l for l in mg if len(l.split("\t")) == 11]
    assert two_col, f"no MGVCF line carries the tumor column: {mg[0]}"
    # the verbatim tumor block at pos 1 must match the tumor VCF's own
    tbody = gzip.decompress(open(tvcf, "rb").read()).decode()
    t_mg = {l.split("\t")[1]: l.split("\t")[9]
            for l in tbody.splitlines()
            if "MGVCF_BLOCK" in l and not l.startswith("#")}
    for l in two_col:
        cols = l.split("\t")
        if cols[1] in t_mg:
            assert cols[10] == t_mg[cols[1]], (cols[10], t_mg[cols[1]])
            break
    else:
        assert False, "no overlapping MGVCF block position to compare"


def test_record_text_parity_multiallele_indel(oracle, tmp_path):
    """Two distinct insertion sequences at one locus: the extra-allele
    rerun path (indel_get_majority emitting one record per qualifying
    exact sequence, main.cpp:883-905) must produce byte-identical record
    text too, incl. the per-allele gapSa/gapSeq tables."""
    from uvc_tpu.io import simulate
    variants = [simulate.Variant(2000, "+CT", 0.35),
                simulate.Variant(2000, "+GA", 0.35),
                simulate.Variant(4000, "-2", 0.3)]
    prepared, cfg = _run_pipeline(tmp_path, seed=33, depth=120,
                                  variants=variants)
    errs = []
    n = _check_pipeline_records(oracle, prepared, cfg, True, errs)
    assert n >= 3, f"too few records exercised: {n}"
    # both exact insertion alleles must appear as separate records
    alts = set()
    for rctx in prepared:
        for rec in calling.assemble_records(rctx, rctx["_refstring"], 0,
                                            "chrT", cfg,
                                            is_tumor_only=True):
            if rec.vcfpos == 2001 and len(rec.alt) == 3:
                alts.add(rec.alt[1:])
    assert {"CT", "GA"} <= alts, alts
    assert not errs, f"{len(errs)} of {n} records differ:\n" + \
        "\n".join(errs[:6])


def test_record_text_parity_umi_duplex(oracle, tmp_path):
    """UMI+duplex workload: records carrying the duplex tiers (dDP1/dDP2,
    DDP planes, the duplex-rescued t2DP/t2AD composition via CDPDb+DDP2)
    must render byte-identical through the compiled append_vcf_record."""
    prepared, cfg = _run_pipeline(tmp_path, seed=13, depth=160,
                                  umi=dict(umi=True, duplex=True,
                                           n_umi_families=300))
    errs = []
    n = _check_pipeline_records(oracle, prepared, cfg, True, errs)
    assert n >= 2, f"too few records exercised: {n}"
    # at least one record must carry non-zero duplex depth
    has_duplex = False
    for rctx in prepared:
        recs = calling.assemble_records(rctx, rctx["_refstring"], 0,
                                        "chrT", cfg, is_tumor_only=True)
        for rec in recs:
            if any(x for x in rec.fmt.get("dDP1", ())):
                has_duplex = True
    assert has_duplex, "no duplex depth reached a record"
    assert not errs, f"{len(errs)} of {n} records differ:\n" + \
        "\n".join(errs[:6])
