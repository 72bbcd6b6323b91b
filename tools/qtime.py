"""Isolated per-query timing + plan capture for the optimization rounds.

Fresh session, pricing_summary warmup (same as bench.py), then for each
named query: optional .explain("formatted") capture to a file, and
min-of-N timing of the same collect() action bench.py times.  Usage:

    python tools/qtime.py [--sf SF_DIR] [--runs N] [--explain-dir DIR] q1 q2 ...

Shared-frame queries (bench DEDUP_SHARED / LM_SHARED) get the same
shared kwargs bench passes, so the printed seconds are comparable to
BENCH_DETAIL entries.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    DEDUP_SHARED,
    LM_SHARED,
    PAIR_STATS_SHARED,
    SHINGLE_BASE_SHARED,
    VERIFY_SHARED,
)
from wellmeet_data_pipeline_spark.plans.queries import REGISTRY, table  # noqa: E402
from wellmeet_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="", help="explain file suffix, e.g. _before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["pricing_summary"].fn(spark, args.sf).collect()

    shared_edges = None
    shared_tokens = None

    def _edges():
        nonlocal shared_edges
        if shared_edges is None:
            from wellmeet_data_pipeline_spark.operators.dedup import (
                minhash_lsh_candidates_sha,
            )

            shared_edges = minhash_lsh_candidates_sha(
                table(spark, args.sf, "documents")
            ).localCheckpoint(eager=True)
        return shared_edges

    def _tokens():
        nonlocal shared_tokens
        if shared_tokens is None:
            from wellmeet_data_pipeline_spark.operators.scoring import _tokens_with_pos

            shared_tokens = _tokens_with_pos(
                table(spark, args.sf, "documents"), "text", "doc_id"
            ).localCheckpoint(eager=True)
        return shared_tokens

    shared_base = None

    def _base():
        nonlocal shared_base
        if shared_base is None:
            from wellmeet_data_pipeline_spark.operators.dedup import shingles_df
            from wellmeet_data_pipeline_spark.operators.skew import (
                fanout_small_scan,
            )

            shared_base = (
                shingles_df(
                    fanout_small_scan(table(spark, args.sf, "documents")),
                    "text",
                    "doc_id",
                    3,
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
        return shared_base

    shared_counts = None

    def _counts():
        nonlocal shared_counts
        if shared_counts is None:
            from wellmeet_data_pipeline_spark.operators.dedup import (
                minhash_verify_sha,
            )

            shared_counts = minhash_verify_sha(
                table(spark, args.sf, "documents"),
                raw_counts=True,
                shingle_base=_base(),
            ).localCheckpoint(eager=True)
        return shared_counts

    shared_stats = None

    def _stats():
        nonlocal shared_stats
        if shared_stats is None:
            from wellmeet_data_pipeline_spark.operators.dedup import (
                _shingle_pair_stats,
            )

            shared_stats = _shingle_pair_stats(
                table(spark, args.sf, "documents"), "text", "doc_id", 3, None, 10_000
            ).localCheckpoint(eager=True)
        return shared_stats

    out: dict[str, float] = {}
    for name in args.queries:
        kwargs = {}
        if name in DEDUP_SHARED:
            kwargs["shared_lsh_edges"] = _edges()
        if name in LM_SHARED:
            kwargs["shared_tokens"] = _tokens()
        if name in VERIFY_SHARED:
            kwargs["shared_verify_counts"] = _counts()
        if name in PAIR_STATS_SHARED:
            kwargs["shared_pair_stats"] = _stats()
        if name in SHINGLE_BASE_SHARED:
            kwargs["shared_shingle_base"] = _base()
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = REGISTRY[name].fn(spark, args.sf, **kwargs)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, args.sf, **kwargs).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
