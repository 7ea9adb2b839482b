"""Family (FQ) engine and dedup tests."""

import numpy as np
import pytest

from uvc_tpu.config import UVCConfig
from uvc_tpu.constants import CHAR_TO_SYMBOL, Symbol
from uvc_tpu.io import bam, simulate
from uvc_tpu.family import dedup
from uvc_tpu.model import sscs
from uvc_tpu.pileup import region, events


def _sym(s):
    return CHAR_TO_SYMBOL[np.frombuffer(s.encode(), np.uint8)]


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    d = tmp_path_factory.mktemp("fq")
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(str(d), seed=5)
    hdr, batch = bam.read_bam(bam_path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    res = region.call_region(batch, _sym(ref), 0, cfg)
    return ref, variants, batch, res


def test_dedup_merges_duplicates(result):
    ref, variants, batch, res = result
    # simulated start positions collide at depth 120 over 3000bp
    assert res.famgrp.n_fams < res.famgrp.n_frags
    assert res.famgrp.n_frags == batch.n // 2  # paired reads


def test_umi_parsing():
    umis, dupx = dedup.parse_umis([b"r1#ACGTAA", b"r2", b"r3#AGTA+TGGT"])
    assert umis == [b"ACGTAA", b"", b"AGTA+TGGT"]
    assert dupx == [False, False, True]
    canon_a, f_a = dedup.normalize_duplex_umi(b"AGTA+TGGT")
    canon_b, f_b = dedup.normalize_duplex_umi(b"TGGT+AGTA")
    assert canon_a == canon_b  # both strands of one molecule share a key


def test_fq_tiers_at_planted_variants(result):
    ref, variants, batch, res = result
    cdp1 = res.fq.cdp1.sum(axis=2)
    snv = variants[0]
    alt = "ACGT".index(snv.spec.split(">")[1])
    tot = cdp1[snv.pos, :6].sum()
    assert tot > 50
    assert 0.1 < cdp1[snv.pos, alt] / tot < 0.55
    # dedup tier <= fragment tier
    bdp = res.bq.bdp.sum(axis=2)
    assert cdp1[snv.pos, alt] <= bdp[snv.pos, alt]
    # cDP12 defined and bounded by family count
    assert res.fq.cdp12.sum() > 0
    assert res.fq.cdp1.sum(axis=(0, 2)).max() <= res.famgrp.n_fams * 3000


def test_fq_exact_indels(result):
    ref, variants, batch, res = result
    from conftest import expected_indel_symbol
    ins = variants[1]
    ins_sym = expected_indel_symbol(ref, ins.pos + 1, 2, False)
    key_ins = res.fq.fam_indel.get((ins.pos + 1, ins_sym), {})
    # values are [cADf, cADr, c2ADf, c2ADr, c2dADf, c2dADr]
    assert b"TT" in key_ins and sum(key_ins[b"TT"][:2]) > 5
    dele = variants[2]
    del_sym = expected_indel_symbol(ref, dele.pos + 1, 2, True)
    key_del = res.fq.fam_indel.get((dele.pos + 1, del_sym), {})
    assert sum(key_del.get(2, [0] * 6)[:2]) > 5


def test_no_umi_means_no_cdp2(result):
    ref, variants, batch, res = result
    # without UMIs, is_fam_good is always false -> cDP2 and c2 counters empty
    assert res.fq.cdp2.sum() == 0
    assert res.fq.c2info["c2BQ2"].sum() == 0


def test_umi_families_enable_cdp2(tmp_path):
    ref = simulate.random_ref(1500, 7)
    p = str(tmp_path / "umi.bam")
    variants = [simulate.Variant(700, f"{ref[700]}>" + ("A" if ref[700] != "A" else "G"), 0.4)]
    simulate.build_bam(p, ref, depth=200, variants=variants, seed=8,
                       umi=True, n_umi_families=60)
    hdr, batch = bam.read_bam(p)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    res = region.call_region(batch, _sym(ref), 0, cfg)
    # UMI grouping produces families with multiple fragments
    assert res.famgrp.n_fams < res.famgrp.n_frags
    assert res.fq.cdp2.sum() > 0          # tier-2 SSCS families exist
    assert res.fq.c2info["c2BQ2"].sum() > 0


def test_duplex_agreement(tmp_path):
    ref = simulate.random_ref(1200, 9)
    p = str(tmp_path / "dx.bam")
    simulate.build_bam(p, ref, depth=150, variants=[], seed=10,
                       umi=True, duplex=True, n_umi_families=30)
    hdr, batch = bam.read_bam(p)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    res = region.call_region(batch, _sym(ref), 0, cfg)
    assert res.fq.ddp1.sum() > 0
    # both strands of a duplex agree on ref bases -> dDP2 present
    assert res.fq.ddp2.sum() > 0


def test_sscs_table_values():
    cfg = UVCConfig()
    t = sscs.table_from_cfg(cfg)
    # quirk: default vcf_tumor_fname="." means +3 everywhere
    A, C, G, T = 0, 1, 2, 3
    assert t[C, T] == 40 + 3
    assert t[A, G] == 44 + 3
    assert t[C, A] == 48 + 3
    assert t[A, T] == 48 + 3
    assert t[int(Symbol.LINK_M), int(Symbol.LINK_D1)] == 58 + 3
    assert t[int(Symbol.LINK_I2), 0] == 58 + 3


def test_amplicon_detection():
    """Border-peaked fragments are flagged amplicon; tiled ones are not
    (grouping.cpp:780-860)."""
    from uvc_tpu.constants import AssayType
    cfg = UVCConfig()
    rng = np.random.default_rng(4)
    # amplicon-like: 800 fragments sharing primer-defined borders with a
    # small PCR-stutter tail
    nf = 800
    jit = np.where(rng.random(nf) < 0.85, 0, rng.integers(-1, 2, nf))
    beg = np.full(nf, 1000, dtype=np.int64) + jit
    end = np.full(nf, 1250, dtype=np.int64) + jit
    lane = rng.integers(0, 2, nf).astype(np.int64) * 2
    is_amp, *_ = dedup.detect_amplicon(beg, end, lane, cfg)
    assert is_amp.mean() > 0.9
    # capture-like: uniformly tiled fragments
    beg2 = rng.integers(0, 5000, nf).astype(np.int64)
    end2 = beg2 + 250
    is_amp2, *_ = dedup.detect_amplicon(beg2, end2, lane, cfg)
    assert is_amp2.mean() < 0.1


def test_assay_inference_from_amplicon_fraction(tmp_path):
    """Region-level assay type flips to AMPLICON when most fragments are
    border-peaked (main.cpp:510-511)."""
    from uvc_tpu.constants import AssayType
    ref = simulate.random_ref(3000, 8)
    path = str(tmp_path / "amp.bam")
    # depth high enough that the shared borders exceed border_weak_minDP
    simulate.build_bam(path, ref, depth=300, seed=9, umi=True,
                       n_umi_families=120)
    hdr, batch = bam.read_bam(path)
    cfg = UVCConfig()
    table = events.expand(batch)
    famgrp = dedup.group_families(batch, table, cfg)
    # families from a 120-molecule pool over 3kb share few distinct borders
    # -> some amplicon flags exist; explicit assay overrides either way
    assert famgrp.frag_amplicon is not None
    assert region.infer_assay(famgrp, cfg) in (AssayType.AMPLICON,
                                               AssayType.CAPTURE)
    cfg.assay_type = AssayType.AMPLICON
    assert region.infer_assay(famgrp, cfg) == AssayType.AMPLICON
