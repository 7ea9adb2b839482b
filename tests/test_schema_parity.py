"""Schema parity against the reference's build-time generator.

The reference's single source of truth for the VCF FILTER/FORMAT schema is
bcf_formats_generator1.cpp (run by its Makefile:55-59 to produce
bcf_formats.step1.hpp).  That generator compiles in this environment with
plain g++ (no htslib needed), so these tests re-derive the schema from the
compiled oracle and assert the checked-in uvc_tpu/vcfout/schema.py is
byte-identical to what tools/gen_schema.py would emit today.
"""

import io
import os
import shutil
import subprocess

import pytest

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gen_schema  # noqa: E402
from uvc_tpu.vcfout import schema  # noqa: E402

REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")
pytestmark = pytest.mark.skipif(
    not (os.path.exists(os.path.join(REF, "bcf_formats_generator1.cpp"))
         and shutil.which("g++")),
    reason="reference generator or g++ unavailable")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    work = tmp_path_factory.mktemp("schema_oracle")
    src = gen_schema.build_and_run_oracle(str(work))
    return gen_schema.parse_schema(src)


def test_filter_lines_match_oracle(oracle):
    assert schema.FILTER_LINES == oracle["FILTER_LINES"]


def test_format_lines_match_oracle(oracle):
    assert schema.FORMAT_LINES == oracle["FORMAT_LINES"]


def test_per_rec_format_strings_match_oracle(oracle):
    assert schema.FORMAT_STRING_PER_REC == oracle["FORMAT_STRING_PER_REC"]
    assert (schema.FORMAT_STRING_PER_REC_WITHOUT_SSCS
            == oracle["FORMAT_STRING_PER_REC_WITHOUT_SSCS"])


def test_per_rec_plan_matches_oracle(oracle):
    assert schema.PER_REC_PLAN == oracle["PER_REC_PLAN"]


def test_generated_module_is_current(oracle, tmp_path):
    """The checked-in schema.py must be byte-identical to a fresh emit."""
    out = tmp_path / "schema.py"
    gen_schema.emit_schema_py(oracle, str(out))
    here = os.path.join(os.path.dirname(__file__), "..",
                        "uvc_tpu", "vcfout", "schema.py")
    assert out.read_text() == open(here).read()


def test_plan_reproduces_format_strings():
    got = ":".join(t for t, g, k, a, e in schema.PER_REC_PLAN)
    assert got == schema.FORMAT_STRING_PER_REC
    got2 = ":".join(t for t, g, k, a, e in schema.PER_REC_PLAN if not g)
    assert got2 == schema.FORMAT_STRING_PER_REC_WITHOUT_SSCS


def test_counts():
    # bcf_formats_generator1.cpp:66-107 (28 FILTERs) and :135-529 FORMATs
    assert len(schema.FILTER_LINES) == 28
    assert len(schema.FORMAT_LINES) == 258
    assert len(schema.PER_REC_PLAN) == 250
