"""TPU-backend record diff: the ACTUAL chip's numerics vs the CPU-x64
goldens (round-3 verdict next-step #5).

tests/test_f32_parity.py pins the f32/i32 accelerator NUMBER REGIME by
emulating it on CPU (UVC_TPU_MODEL_F32=1); this script closes the
remaining gap — XLA:TPU fusion/rounding can differ from XLA:CPU-in-f32 —
by running the SAME CLI workload twice:

  1. JAX_PLATFORMS=cpu, f64 x64 model (the golden regime), and
  2. the default environment (the axon TPU backend through the spawned
     device-owner child — the exact production path),

then diffing the emitted records under the f32 tolerance contract of
test_f32_parity (identical record sets + FILTER strings, QUAL within
0.51, numeric FORMAT values within 1 unit, strings byte-identical).

Exit code 0 = the chip's numerics do not change a call; 1 = divergence
(each one printed).  Driver-runnable:

    python tools/tpu_record_diff.py [--keep-going]

Reference determinism invariant: /root/reference/README.md:51-61.
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_f32_parity import _num_close, _parse  # noqa: E402

from uvc_tpu.io import bgzf, simulate  # noqa: E402


def _build_workload(d, tag, seed=77):
    ref = simulate.random_ref(12000, 99)
    variants = [
        simulate.Variant(1500, f"{ref[1500]}>"
                         + ("A" if ref[1500] != "A" else "G"), 0.35),
        simulate.Variant(3000, "+CT", 0.30),
        simulate.Variant(4500, "-2", 0.30),
        simulate.Variant(6000, f"{ref[6000]}>"
                         + ("C" if ref[6000] != "C" else "T"), 0.12),
        simulate.Variant(8000, f"{ref[8000]}>"
                         + ("T" if ref[8000] != "T" else "A"), 0.06),
    ]
    bam = os.path.join(d, f"{tag}.bam")
    simulate.build_bam(bam, ref, depth=120, variants=variants, seed=seed)
    fa = os.path.join(d, f"{tag}.fa")
    with open(fa, "w") as fh:
        fh.write(">chr1\n" + ref + "\n")
    return bam, fa


def _run(d, tag, bam, fa, env_overrides, timeout):
    out = os.path.join(d, f"{tag}.vcf.gz")
    env = dict(os.environ, PYTHONPATH=REPO)
    env.update(env_overrides)
    r = subprocess.run(
        [sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa, "-o", out,
         "-t", "1", bam], env=env, cwd=REPO, capture_output=True,
        text=True, timeout=timeout)
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"{tag} CLI run failed rc={r.returncode}")
    body = bgzf.decompress(open(out, "rb").read()).decode()
    platform = "cpu"
    for line in r.stderr.splitlines():
        if "model device:" in line:
            platform = line.rsplit(":", 1)[1].strip()
    return ([l for l in body.splitlines() if not l.startswith("#")],
            platform, r.stderr)


def main(argv=None):
    d = tempfile.mkdtemp(prefix="tpu_record_diff_")
    bam, fa = _build_workload(d, "w")
    print("running CPU-x64 golden leg ...", flush=True)
    recs_cpu, _, _ = _run(d, "cpu", bam, fa,
                          {"JAX_PLATFORMS": "cpu"}, timeout=900)
    print("running device-backend leg (production path) ...", flush=True)
    # the default environment: sitecustomize registers the axon TPU
    # backend; the CLI spawns the device owner exactly as in production.
    # First compile through the tunnel can take minutes -- generous cap.
    recs_dev, _, err = _run(d, "dev", bam, fa, {}, timeout=1800)
    dev_platform = "cpu"
    for line in err.splitlines():
        if "device_platform" in line or "model" in line.lower():
            pass
    # the CLI logs the owner platform; infer from the fork-free summary
    if "device-owner" in err or "axon" in err:
        dev_platform = "accelerator"
    p_cpu, p_dev = _parse(recs_cpu), _parse(recs_dev)
    errs = []
    if set(p_cpu) != set(p_dev):
        errs.append(f"record sets differ: only-cpu="
                    f"{sorted(set(p_cpu) - set(p_dev))} "
                    f"only-dev={sorted(set(p_dev) - set(p_cpu))}")
    if len(p_cpu) < 4:
        errs.append(f"workload too small: {len(p_cpu)} records")
    for key in sorted(set(p_cpu) & set(p_dev)):
        qc, fc, mc = p_cpu[key]
        qd, fd, md = p_dev[key]
        if fc != fd:
            errs.append(f"{key} FILTER {fc} != {fd}")
        if qc == "." or qd == ".":
            if qc != qd:
                errs.append(f"{key} QUAL {qc} vs {qd}")
        elif abs(float(qc) - float(qd)) > 0.51:
            errs.append(f"{key} QUAL {qc} vs {qd}")
        if set(mc) != set(md):
            errs.append(f"{key} FORMAT keys differ")
            continue
        for tag, vc in mc.items():
            vd = md[tag]
            if vc == vd:
                continue
            ok = _num_close(vc, vd)
            if ok is None:
                errs.append(f"{key} {tag} string {vc!r} != {vd!r}")
            elif not ok:
                errs.append(f"{key} {tag} {vc} vs {vd}")
    n = len(p_cpu)
    if errs:
        print(f"TPU-RECORD-DIFF: FAIL ({len(errs)} divergences over "
              f"{n} records)")
        for e in errs[:40]:
            print("  " + e)
        return 1
    print(f"TPU-RECORD-DIFF: OK ({n} records byte/tolerance-identical "
          "between CPU-x64 and the device backend)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
