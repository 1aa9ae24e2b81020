"""Golden byte-parity (VERDICT r2 missing #2): the committed
tests/golden/expected/ directory was derived ONCE from the brute-force
oracle (tests/golden/make_golden.py) and pins the reference output format
at the byte level — bin file set, ascending k-mer order, tab separator,
EOF sentinel, directory naming.  Both engines must reproduce it exactly.
"""

import os

import pytest

from fastkmer_tpu.config import JobConfig
from fastkmer_tpu.pipeline import execute_job

from . import oracles
from .golden.make_golden import B, K, M, RECORDS

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_FA = os.path.join(HERE, "golden", "golden.fa")
EXPECTED = os.path.join(HERE, "golden", "expected")


def _read_dir_bytes(d: str) -> dict[str, bytes]:
    return {
        name: open(os.path.join(d, name), "rb").read()
        for name in os.listdir(d)
        if name.startswith("bin")
    }


def test_golden_files_match_oracle():
    """Guard against golden drift: the committed bytes must equal a fresh
    oracle derivation (anyone regenerating must not silently change them)."""
    binned = oracles.count_reads_binned([s for _, s in RECORDS], K, M, B)
    expect = {}
    for b, table in binned.items():
        body = b"".join(
            km.encode() + b"\t" + str(c).encode() + b"\n"
            for km, c in sorted(table.items())
        )
        expect[f"bin{b}"] = body + b"EOF"
    assert _read_dir_bytes(EXPECTED) == expect


@pytest.mark.parametrize("use_ht", [False, True])
def test_pipeline_output_matches_golden_bytes(tmp_path, use_ht):
    cfg = JobConfig(
        dataset=GOLDEN_FA, output_directory=str(tmp_path) + "/", prefix="gold_",
        k=K, m=M, x=3, max_b=B, sequence_type=0, write=True, use_ht=use_ht,
        reads_per_batch=4, read_len=64,
    )
    execute_job(cfg, verbose=False)
    # directory naming parity (test/package.scala:33)
    assert cfg.output_dir.endswith(f"gold_k{K}_m{M}_x3_b{B}_s0")

    got = _read_dir_bytes(cfg.output_dir)
    expect = _read_dir_bytes(EXPECTED)
    if use_ht:
        # the reference HT writer has no EOF footer (SparkBinKmerCounter
        # .scala:711-735); bytes must match modulo the sentinel
        expect = {name: data[: -len(b"EOF")] for name, data in expect.items()}
    assert got == expect
