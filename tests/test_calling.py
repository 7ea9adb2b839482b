"""End-to-end variant-calling tests: the full pileup -> DPv -> qual ->
record pipeline on simulated data."""

import numpy as np
import pytest

from uvc_tpu import calling
from uvc_tpu.config import UVCConfig
from uvc_tpu.constants import CHAR_TO_SYMBOL, SequencingPlatform
from uvc_tpu.io import bam, simulate


def _call(tmpdir, seed=21, depth=120, variants=None, ref_len=3000):
    ref = simulate.random_ref(ref_len, seed)
    if variants is None:
        variants = [
            simulate.Variant(1000, f"{ref[1000]}>" + ("A" if ref[1000] != "A" else "C"), 0.3),
            simulate.Variant(1500, "+TT", 0.25),
            simulate.Variant(2000, "-2", 0.25),
        ]
    p = str(tmpdir / "t.bam")
    simulate.build_bam(p, ref, depth=depth, variants=variants, seed=seed + 1)
    hdr, batch = bam.read_bam(p)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    cfg.self_update_by_platform(SequencingPlatform.ILLUMINA)
    ref_syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    recs, res, F = calling.call_variants(batch, ref_syms, ref.encode(), 0,
                                         "chr1", cfg)
    return ref, variants, recs


def test_planted_variants_called(tmp_path):
    ref, variants, recs = _call(tmp_path)
    by_pos = {r.vcfpos: r for r in recs}
    snv = variants[0]
    assert snv.pos + 1 in by_pos
    r = by_pos[snv.pos + 1]
    assert r.ref == snv.spec.split(">")[0]
    assert r.alt == snv.spec.split(">")[1]
    assert r.filter == "PASS"
    assert r.qual > 40
    # insertion: left-anchored REF/ALT at anchor position
    ins = by_pos[variants[1].pos + 1]
    assert ins.alt == ins.ref + "TT"
    # deletion: REF carries the deleted bases
    dele = by_pos[variants[2].pos + 1]
    assert dele.ref == dele.alt + ref[2001:2003]
    assert len(recs) == 3  # no false positives at depth 120 / q>=15


def test_no_variants_no_calls(tmp_path):
    ref, variants, recs = _call(tmp_path, seed=33, variants=[], ref_len=2000)
    assert recs == []


def test_low_fraction_not_called_high_fraction_called(tmp_path):
    ref = simulate.random_ref(2000, 44)
    alt = "A" if ref[900] != "A" else "G"
    variants = [simulate.Variant(900, f"{ref[900]}>{alt}", 0.01)]
    _, _, recs_low = _call(tmp_path, seed=44, variants=variants, ref_len=2000)
    lowq = [r for r in recs_low if r.vcfpos == 901]
    variants2 = [simulate.Variant(900, f"{ref[900]}>{alt}", 0.5)]
    _, _, recs_hi = _call(tmp_path, seed=44, variants=variants2, ref_len=2000)
    hi = [r for r in recs_hi if r.vcfpos == 901]
    assert len(hi) == 1 and hi[0].qual > 40
    if lowq:
        assert lowq[0].qual < hi[0].qual


def test_info_and_fmt_fields(tmp_path):
    ref, variants, recs = _call(tmp_path)
    r = recs[0]
    assert r.info["TLODQ"] == r.fmt["cVQ1"] or r.info["TLODQ"] >= 0
    assert r.fmt["DP"] >= r.fmt["AD"][1] > 0
    assert r.fmt["bDP"] >= r.fmt["bAD"][1] > 0
    assert r.fmt["FTS"] == "PASS"
    assert r.info["SomaticQ"] == min(r.info["TLODQ"], r.info["NLODQ"])


def test_tumor_normal_join(tmp_path):
    """Somatic variants survive the TN join; germline variants are
    filtered by the normal evidence."""
    from uvc_tpu.io.fasta import write_fasta
    from uvc_tpu.vcfout import reader as vcf_reader
    from uvc_tpu.io import bgzf
    from uvc_tpu.cli import uvctn

    ref = simulate.random_ref(3000, 50)
    write_fasta(str(tmp_path / "ref.fa"), [("chr1", ref)])
    tvars = [simulate.Variant(1000, f"{ref[1000]}>" + ("A" if ref[1000] != "A" else "C"), 0.3),
             simulate.Variant(1800, f"{ref[1800]}>" + ("G" if ref[1800] != "G" else "T"), 0.5),
             simulate.Variant(2200, "-2", 0.25)]
    nvars = [tvars[1]]
    simulate.build_bam(str(tmp_path / "tumor.bam"), ref, depth=150,
                       variants=tvars, seed=51)
    simulate.build_bam(str(tmp_path / "normal.bam"), ref, depth=150,
                       variants=nvars, seed=52)
    rc = uvctn.run([str(tmp_path / "ref.fa"), str(tmp_path / "tumor.bam"),
                    str(tmp_path / "normal.bam"), str(tmp_path / "out"),
                    "TS,NS"])
    assert rc == 0 or rc is None
    text = bgzf.read_file(str(tmp_path / "out.normal.vcf.gz")).decode()
    recs = [l.split("\t") for l in text.splitlines() if not l.startswith("#")]
    somatic = [r for r in recs if "MGVCF_BLOCK" not in r[7]
               and "ADDITIONAL_INDEL_CANDIDATE" not in r[7]]
    poss = {int(r[1]) for r in somatic}
    assert 1001 in poss          # somatic SNV kept
    assert 2201 in poss          # somatic deletion kept
    assert 1801 not in poss      # germline variant filtered
    for r in somatic:
        assert "SOMATIC" in r[7]
        assert len(r) == 11      # normal + appended tumor column
    # the normal run ALSO emits MGVCF blocks with the tumor's retrieved
    # column re-appended (main.cpp:655-757, round-5 fix)
    mg = [r for r in recs if "MGVCF_BLOCK" in r[7]]
    assert mg and all(len(r) == 11 for r in mg), \
        [len(r) for r in mg[:3]]


def test_thread_count_determinism(tmp_path):
    """Identical VCF output across worker counts (the reference's N-version
    invariant, README.md:51-61)."""
    from uvc_tpu.io.fasta import write_fasta
    from uvc_tpu.io import bgzf
    from uvc_tpu.cli import uvc1 as cli

    r1 = simulate.random_ref(2500, 11)
    r2 = simulate.random_ref(2000, 12)
    write_fasta(str(tmp_path / "ref.fa"), [("c1", r1), ("c2", r2)])
    v1 = [simulate.Variant(900, f"{r1[900]}>" + ("A" if r1[900] != "A" else "C"), 0.4)]
    reads1 = simulate.simulate_reads(r1, depth=80, variants=v1, seed=3)
    reads2 = simulate.simulate_reads(r2, depth=80, variants=[], seed=4)
    recs = [(q, f, 0, p, 60, c, 0, m, i, s, qu)
            for (q, f, p, c, s, qu, m, i) in sorted(reads1, key=lambda r: r[2])]
    recs += [(q + "b", f, 1, p, 60, c, 1, m, i, s, qu)
             for (q, f, p, c, s, qu, m, i) in sorted(reads2, key=lambda r: r[2])]
    bam.write_bam(str(tmp_path / "two.bam"), "@HD\tVN:1.6\tSO:coordinate\n",
                  [("c1", 2500), ("c2", 2000)], recs)
    outs = []
    for t in (1, 2):
        out = str(tmp_path / f"o{t}.vcf.gz")
        cli.run([str(tmp_path / "two.bam"), "-f", str(tmp_path / "ref.fa"),
                 "-o", out, "-t", str(t)])
        outs.append([l for l in bgzf.read_file(out).decode().splitlines()
                     if not l.startswith("##")])
    assert outs[0] == outs[1]


def test_multi_contig_cli(tmp_path):
    """Two contigs in one BAM: the scheduler cuts at tid changes and the
    CLI emits per-contig records (grouping.cpp tier-1 tid cuts)."""
    import subprocess, sys, os
    from uvc_tpu.io import bam as bam_mod
    from uvc_tpu.io import bgzf
    ref1 = simulate.random_ref(3000, 4)
    ref2 = simulate.random_ref(2500, 6)
    v1 = [simulate.Variant(1000, f"{ref1[1000]}>" + ("T" if ref1[1000] != "T" else "A"), 0.35)]
    v2 = [simulate.Variant(800, f"{ref2[800]}>" + ("C" if ref2[800] != "C" else "G"), 0.35)]
    path = str(tmp_path / "mc.bam")
    simulate.build_bam_multi(path, [("chrA", ref1, v1), ("chrB", ref2, v2)],
                             depth=80, seed=5)
    fa = str(tmp_path / "mc.fa")
    open(fa, "w").write(f">chrA\n{ref1}\n>chrB\n{ref2}\n")
    out = str(tmp_path / "mc.vcf.gz")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", out, "-t", "2", path], check=True, env=env,
                   capture_output=True)
    body = bgzf.decompress(open(out, "rb").read()).decode()
    calls = [l.split("\t")[:5] for l in body.splitlines()
             if "ANY_VAR" in l and not l.startswith("#")]
    chroms = {c[0] for c in calls}
    assert chroms == {"chrA", "chrB"}, calls
    assert any(c[0] == "chrA" and c[1] == "1001" for c in calls)
    assert any(c[0] == "chrB" and c[1] == "801" for c in calls)


def test_targets_restriction(tmp_path):
    """--targets chrom:beg-end restricts calls to the window
    (grouping.cpp:69-107 + emit-claim windows)."""
    import subprocess, sys, os
    from uvc_tpu.io import bgzf
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(
        str(tmp_path), seed=77)  # variants at 1000 (SNV), 1500 (+TT), 2000 (-2)
    out = str(tmp_path / "t.vcf.gz")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", out, "--targets", "chr1:1-1200", bam_path],
                   check=True, env=env, capture_output=True)
    body = bgzf.decompress(open(out, "rb").read()).decode()
    calls = [int(l.split("\t")[1]) for l in body.splitlines()
             if "ANY_VAR" in l and not l.startswith("#")]
    assert calls == [1001], calls


def test_model_stage_batched_parity(tmp_path):
    """model_stage_batched must be EXACTLY per-region equivalent (the CLI
    chunks regions arbitrarily, so any divergence corrupts VCF output)."""
    import numpy as np
    from uvc_tpu import calling
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.constants import CHAR_TO_SYMBOL
    from uvc_tpu.io import bam, simulate
    from uvc_tpu.schedule import regions as regions_mod

    d = str(tmp_path)
    ref = simulate.random_ref(6000, 42)
    variants = [
        simulate.Variant(1000, f"{ref[1000]}>"
                         + ("A" if ref[1000] != "A" else "G"), 0.3),
        simulate.Variant(2500, "+CT", 0.3),
        simulate.Variant(4200, "-2", 0.3),
    ]
    bam_path = d + "/g.bam"
    simulate.build_bam(bam_path, ref, depth=100, variants=variants, seed=1234)
    hdr, batch = bam.read_bam(bam_path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    rl = {i: ln for i, ln in enumerate(hdr.ref_lens)}
    plans = regions_mod.split_plans_into_units(
        regions_mod.plan(batch, rl, cfg.mem_per_thread), batch, rl)
    refb = ref.encode()

    def mk(plan):
        sub = regions_mod.slice_batch(batch, plan)
        syms = CHAR_TO_SYMBOL[
            np.frombuffer(refb[plan.ext_beg:plan.ext_end], np.uint8) & 0x7F]
        return calling.prepare_region(sub, syms, plan.ext_beg, cfg)

    A = [mk(p) for p in plans]
    B = [mk(p) for p in plans]
    for c in A:
        calling.model_stage(c["F"], c["cand"], cfg, True, None, None)
    calling.model_stage_batched(B, cfg, True)

    def cmp(pa, pb, rows, path):
        if isinstance(pa, np.ndarray):
            assert isinstance(pb, np.ndarray) and pa.shape == pb.shape, path
            # the batched stage is row-sparse: only rows consumed
            # downstream (positions with >= 1 candidate) must match
            a, b = pa[rows], pb[rows]
            assert np.array_equal(a, b,
                                  equal_nan=(a.dtype.kind == "f")), path
        elif isinstance(pa, dict):
            assert set(pa) == set(pb), path
            for k in pa:
                cmp(pa[k], pb[k], rows, f"{path}.{k}")
        elif isinstance(pa, (tuple, list)):
            assert len(pa) == len(pb), path
            for j, (x, y) in enumerate(zip(pa, pb)):
                cmp(x, y, rows, f"{path}[{j}]")

    for a, b in zip(A, B):
        rows = np.flatnonzero(a["cand"].any(axis=1))
        for key in set(a["F"]) | set(b["F"]):
            if key == "gapSa":
                assert a["F"][key] == b["F"][key]
                continue
            cmp(a["F"][key], b["F"][key], rows, f"F.{key}")

    # end-to-end: the assembled records must be byte-identical
    from uvc_tpu.vcfout import writer as vcf_writer
    for a, b, plan in zip(A, B, plans):
        ra = calling.assemble_records(a, refb[plan.ext_beg:plan.ext_end],
                                      plan.ext_beg, "chr1", cfg)
        rb = calling.assemble_records(b, refb[plan.ext_beg:plan.ext_end],
                                      plan.ext_beg, "chr1", cfg)
        ta = [vcf_writer.render_record("chr1", r) for r in ra]
        tb = [vcf_writer.render_record("chr1", r) for r in rb]
        assert ta == tb


def test_multiallele_exact_indels(tmp_path):
    """Two strong distinct insertion sequences at one position get their
    own VCF records (indel_get_majority multi-entry, main.cpp:883-905)."""
    import numpy as np
    from uvc_tpu import calling
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.constants import CHAR_TO_SYMBOL
    from uvc_tpu.io import bam, simulate

    d = str(tmp_path)
    ref = simulate.random_ref(3000, 11)
    variants = [simulate.Variant(1500, "+CT", 0.35),
                simulate.Variant(1500, "+GA", 0.35)]
    bam_path = d + "/m.bam"
    simulate.build_bam(bam_path, ref, depth=120, variants=variants, seed=3)
    hdr, batch = bam.read_bam(bam_path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    recs, res, F = calling.call_variants(batch, syms, ref.encode(), 0,
                                         "chr1", cfg)
    ins_recs = [r for r in recs if r.vcfpos == 1501 and len(r.alt) == 3]
    alts = {r.alt[1:] for r in ins_recs}
    assert {"CT", "GA"} <= alts, (alts, [(r.vcfpos, r.ref, r.alt)
                                         for r in recs])
    # each record carries its own allele's exact-indel depths
    by_alt = {r.alt[1:]: r for r in ins_recs}
    assert by_alt["CT"].fmt["cVQSM"][0] != "" and by_alt["GA"].fmt["gapSeq"]


def test_zero_candidate_regions_cli(tmp_path):
    """End-to-end CLI run on a variant-free BAM: the row-sparse batched
    model must handle regions with ZERO candidate positions (no records,
    but MGVCF <NON_REF> blocks still emitted from the pileup planes)."""
    import gzip
    from uvc_tpu.io import simulate
    from uvc_tpu.cli import uvc1 as uvc1_cli

    d = str(tmp_path)
    ref = simulate.random_ref(4000, 77)
    bam_path = d + "/clean.bam"
    simulate.build_bam(bam_path, ref, depth=60, variants=[], seed=77)
    fa = d + "/ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n" + ref + "\n")
    out = d + "/clean.vcf.gz"
    rc = uvc1_cli.run(["-f", fa, "-o", out, "-t", "1", bam_path])
    assert rc == 0
    body = gzip.decompress(open(out, "rb").read()).decode()
    data_lines = [l for l in body.splitlines() if l and not l.startswith("#")]
    assert data_lines, "MGVCF blocks expected even without variants"
    assert all("<NON_REF>" in l or "ADDITIONAL_INDEL_CANDIDATE" in l
               or "GERMLINE" in l for l in data_lines), data_lines[:5]


def test_model_read_planes_matches_discovery(tmp_path):
    """MODEL_READ_PLANES (the static list forked workers use to assemble
    model requests without touching jax) must equal a fresh abstract-trace
    discovery over both modes, plus cDP0a for the host germline stage."""
    ref, variants, recs = _call(tmp_path)
    # rebuild a prepared context to get a full F dict
    import numpy as np
    from uvc_tpu import calling
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.constants import CHAR_TO_SYMBOL
    from uvc_tpu.io.native import read_bam_native
    from uvc_tpu.io import simulate
    bam = str(tmp_path / "drift.bam")
    simulate.build_bam(bam, ref, depth=50, variants=variants, seed=7)
    _, batch = read_bam_native(bam)
    ref_syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8) & 0x7F]
    cfg = UVCConfig()
    ctx = calling.prepare_region(batch, ref_syms, 0, cfg)
    arrays = calling._model_input_arrays(ctx["F"])
    reads = set()
    for ito, rescued in ((True, False), (False, True)):
        reads |= set(calling._discover_model_reads(
            arrays, ctx["F"]["P"], cfg, ito, rescued))
    assert sorted(reads | {"cDP0a"}) == sorted(calling.MODEL_READ_PLANES)


def test_model_request_shards_over_local_devices(tmp_path):
    """Multi-device hosts run packed model requests SPMD over all local
    devices (SURVEY §2 parallelism row 1): under the 8-virtual-device CPU
    mesh the sharded evaluation must engage all devices and return
    bit-identical matrices to a single-device run."""
    import jax
    import numpy as np
    from uvc_tpu import calling
    from uvc_tpu.model.example import example_model_payload

    assert jax.local_device_count() == 8
    arrays, cand, cfg = example_model_payload(n_pos=512, seed=3, pad_to=512)
    packed = calling.pack_model_request((arrays, cand, None, None, True,
                                         False))
    oi, of, ospec = calling.model_eval_packed(packed, cfg)
    assert calling._LOCAL_MESH is not None
    assert calling._LOCAL_MESH.devices.size == 8
    # single-device reference: bypass the sharding helper
    pi, pf, ispec, is_tumor_only, rescued = packed
    fn, _ = calling._get_packed_model(cfg, True, False, ispec, "<f8")
    oi1, of1 = fn(pi, pf)
    np.testing.assert_array_equal(oi, np.asarray(oi1))
    np.testing.assert_array_equal(of, np.asarray(of1))


def test_bed_out_bed_in_roundtrip(tmp_path):
    """--bed-out writes the tier-1 schedule; --bed-in replays it as the
    region source (the reference aliases it onto the regions BED,
    CmdLineArgs.cpp:1028-1029).  The replayed run must emit the same
    variant records."""
    import subprocess, sys, os
    from uvc_tpu.io import bgzf
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(
        str(tmp_path), seed=13)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    out1 = str(tmp_path / "a.vcf.gz")
    bed = str(tmp_path / "sched.bed")
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", out1, "--bed-out-fname", bed, bam_path],
                   check=True, env=env, capture_output=True)
    assert os.path.getsize(bed) > 0
    out2 = str(tmp_path / "b.vcf.gz")
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", out2, "--bed-in-fname", bed, bam_path],
                   check=True, env=env, capture_output=True)

    def recs(p):
        return [l for l in bgzf.decompress(open(p, "rb").read())
                .decode().splitlines()
                if not l.startswith("#") and "ANY_VAR" in l]
    r1, r2 = recs(out1), recs(out2)
    assert r1 and r1 == r2
