"""Golden-output regression: the full CLI VCF body for a fixed dataset is
pinned to a committed snapshot, catching unintended behavior drift.

Regenerate after INTENTIONAL behavior changes with:
    UPDATE_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

import os
import subprocess
import sys

from uvc_tpu.io import simulate, bgzf

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_small.vcf")


def _body(text):
    # skip ##-meta (carries date/cmdline); keep #CHROM + records
    return [l for l in text.splitlines() if not l.startswith("##")]


def test_golden_vcf_body(tmp_path):
    ref = simulate.random_ref(6000, 42)
    variants = [
        simulate.Variant(1000, f"{ref[1000]}>" + ("A" if ref[1000] != "A" else "G"), 0.3),
        simulate.Variant(2500, "+CT", 0.3),
        simulate.Variant(4200, "-2", 0.3),
    ]
    bam_path = str(tmp_path / "g.bam")
    simulate.build_bam(bam_path, ref, depth=100, variants=variants, seed=1234)
    fa = str(tmp_path / "ref.fa")
    open(fa, "w").write(">chr1\n" + ref + "\n")
    out = str(tmp_path / "g.vcf.gz")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", out, "-t", "1", bam_path], check=True, env=env,
                   capture_output=True)
    body = _body(bgzf.decompress(open(out, "rb").read()).decode())
    if os.environ.get("UPDATE_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        open(GOLDEN, "w").write("\n".join(body) + "\n")
    assert os.path.exists(GOLDEN), "golden file missing; run with UPDATE_GOLDEN=1"
    expect = open(GOLDEN).read().splitlines()
    assert body == expect
