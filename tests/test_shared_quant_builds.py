"""Shared quantized-index build parity (bench.py 16x/hd tier contract).

bench.py builds each quantization rung's index artifacts once per tier —
int8 candidate codes, binary sign-bit packs, PQ codebooks + residual
encodings — localCheckpoints them, and passes them into the repeated
(min-of-N) scans via the rungs' shared_* kwargs, billing the build to
its own entry.  That is only legitimate if the shared path is EXACTLY
the standalone path — these tests pin shared == standalone row-for-row
for every rung on the driver's real sf0.001 embeddings.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.similarity import (
    binary_hamming_top_k,
    binary_packed_candidates,
    clustered_embeddings,
    int8_candidate_codes,
    int8_dot_top_k,
    ivf_assignments,
    ivf_pq_top_k,
    pq_encoded_frame,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    return clustered_embeddings(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ).localCheckpoint(eager=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_int8_shared_codes_match_standalone(emb):
    q = emb.filter(F.col("vec_id") % 16 == 0)
    standalone = int8_dot_top_k(q, emb, k=5)
    arrs, cc = int8_candidate_codes(emb)
    shared = int8_dot_top_k(
        q,
        emb,
        k=5,
        shared_codes=(
            arrs.localCheckpoint(eager=True),
            cc.localCheckpoint(eager=True),
        ),
    )
    a, b = _rows(standalone), _rows(shared)
    assert a == b and len(a) > 0


def test_binary_shared_pack_matches_standalone(emb):
    q = emb.filter(F.col("vec_id") % 16 == 0)
    standalone = binary_hamming_top_k(q, emb, k=5, dim=64)
    packed = binary_packed_candidates(emb, dim=64).localCheckpoint(eager=True)
    shared = binary_hamming_top_k(q, emb, k=5, dim=64, shared_packed=packed)
    a, b = _rows(standalone), _rows(shared)
    assert a == b and len(a) > 0


def test_pq_shared_encode_matches_standalone(emb):
    kw = dict(
        k=5, n_centroids=16, nprobe=4, seed_mod=421, m_subspaces=16,
        n_codes=16, oversample=8, round_digits=4,
    )
    cids, C, assigned = ivf_assignments(emb, n_centroids=16, nprobe=4, seed_mod=421)
    shared = (cids, C, assigned.localCheckpoint(eager=True))
    standalone = ivf_pq_top_k(emb, shared=shared, **kw)
    books, encoded = pq_encoded_frame(emb, shared, m_subspaces=16, n_codes=16)
    shared_run = ivf_pq_top_k(
        emb,
        shared=shared,
        shared_pq=(books, encoded.localCheckpoint(eager=True)),
        **kw,
    )
    a, b = _rows(standalone), _rows(shared_run)
    assert a == b and len(a) > 0
