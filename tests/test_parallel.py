"""Mesh factorization, plan partitioning, and shard-merge tests (CPU
virtual 8-device mesh from conftest)."""

import numpy as np
import pytest

import jax

from uvc_tpu.parallel import mesh as mesh_mod
from uvc_tpu.parallel import distributed as dist
from uvc_tpu.schedule.regions import RegionPlan
from uvc_tpu.io import bgzf


def test_factor_mesh():
    assert mesh_mod.factor_mesh(8) == (2, 4)
    assert mesh_mod.factor_mesh(4) == (2, 2)
    assert mesh_mod.factor_mesh(1) == (1, 1)
    assert mesh_mod.factor_mesh(6) == (2, 3)


def test_make_mesh_and_sharded_step():
    m = mesh_mod.make_mesh()
    assert m.devices.size == 8
    from uvc_tpu.model import device
    import jax.numpy as jnp
    counts = jnp.asarray(device.synthetic_counts(B=4, P=512, seed=3))
    counts = jax.device_put(counts, mesh_mod.counts_sharding(m))

    @jax.jit
    def step(c):
        out = device.quality_model(c)
        return jnp.sum((out["cVQ1"] >= 15).astype(jnp.int32))

    n = int(step(counts))
    # same result replicated
    n2 = int(step(jnp.asarray(device.synthetic_counts(B=4, P=512, seed=3))))
    assert n == n2


def test_plan_partition_balanced_and_complete():
    plans = [RegionPlan(tid=0, beg=i * 1000, end=(i + 1) * 1000,
                        read_beg=i * 100, read_end=i * 100 + 100 + (i % 3) * 50)
             for i in range(17)]
    seen = []
    for pid in range(4):
        mine, lo, hi = dist.my_plans(plans, process_id=pid, process_count=4)
        assert plans[lo:hi] == mine
        seen += mine
    assert seen == plans  # complete, ordered, disjoint


def test_merge_vcf_shards(tmp_path):
    header = "##fileformat=VCFv4.2\n#CHROM\t...\n"
    shard1 = bgzf.compress(b"chr1\t100\trec1\n")
    shard2 = bgzf.compress(b"chr1\t200\trec2\n")
    out = str(tmp_path / "m.vcf.gz")
    dist.merge_vcf_shards(header, [shard1, shard2], out)
    text = bgzf.read_file(out).decode()
    assert text.startswith("##fileformat")
    assert "rec1" in text and "rec2" in text
    assert text.index("rec1") < text.index("rec2")


def test_allgather_bytes_single_host():
    assert dist.allgather_bytes(b"hello") == [b"hello"]
