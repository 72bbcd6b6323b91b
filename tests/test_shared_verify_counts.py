"""Shared raw verify-counts frame parity (bench.py VERIFY_SHARED contract).

bench.py builds minhash_verify_sha(documents, raw_counts=True) once per
session and passes it to dedup_vs_reference / dedup_threshold_sweep via
each query's shared_verify_counts kwarg; dedup_vs_reference derives its
rounded (est_jaccard, jaccard) columns from the raw counts through
minhash_verify_from_raw.  That is only legitimate if the shared path is
EXACTLY the standalone path — these tests pin shared == standalone
row-for-row on the driver's real sf0.001 parquet.
"""

from __future__ import annotations

import os

import pytest

from wellmeet_data_pipeline_spark.plans.queries import REGISTRY, table

SF_DIR = "/root/testdata/sf0.001"

FAMILY = ["dedup_vs_reference", "dedup_threshold_sweep"]


@pytest.fixture(scope="module")
def shared_counts(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_verify_sha

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    return minhash_verify_sha(
        table(spark, SF_DIR, "documents"), raw_counts=True
    ).localCheckpoint(eager=True)


@pytest.mark.parametrize("name", FAMILY)
def test_shared_matches_standalone(spark, shared_counts, name):
    fn = REGISTRY[name].fn
    standalone = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    shared = sorted(
        map(tuple, fn(spark, SF_DIR, shared_verify_counts=shared_counts).collect())
    )
    assert standalone == shared
    assert standalone  # the family must exercise real rows at sf0.001


def test_rounded_form_bit_identical_from_raw(spark):
    """minhash_verify_from_raw over the raw frame must reproduce the
    direct rounded output bit-for-bit (same doubles, not just close)."""
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_verify_from_raw,
        minhash_verify_sha,
    )

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    d = table(spark, SF_DIR, "documents")
    direct = sorted(map(tuple, minhash_verify_sha(d).collect()))
    derived = sorted(
        map(
            tuple,
            minhash_verify_from_raw(
                minhash_verify_sha(d, raw_counts=True)
            ).collect(),
        )
    )
    assert direct == derived
    assert direct
