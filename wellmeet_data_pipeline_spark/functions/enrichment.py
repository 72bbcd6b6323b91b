"""External-enrichment UDF patterns (SURVEY.md §2.9 F10, §2.11 X2/X5,
§4 custom piece #3).

The reference calls Nominatim per address inside the crawl loop
(restaurant-crawler/restaurant-crawler.py:39-53) and embeds reviews
behind an HTTP API (README.md:19-21, save-reviews/lambda_function.py:
69-76).  Two Spark-native shapes:

1. geocode_with_cache — Arrow-batched mapInPandas with a PER-PARTITION
   memo dict: each executor resolves a distinct address once per batch,
   the client is injected (tests use a deterministic local geocoder; the
   network never enters the correctness surface).

2. geocode_via_reference — the preferred 100 TB form: no external calls
   from executors at all; join against an offline geocode reference
   table (broadcast when it fits).  Dim lookups beat RPC fan-out at any
   scale — 1000 executors hammering a geocoder is an outage, not a plan.

3. embed_text — X5: batch embedding as a deterministic hash-projection
   into R^dim (unit-normalized), standing in for a model server /
   in-process model.  The Spark-side contract (array<float> column,
   Arrow batches) is exactly what a real encoder would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GeoFn = Callable[[str], tuple[float, float] | None]

# Executor-lifetime geocode memo.  Lives at module scope so it survives
# across tasks AND micro-batches within one Python worker process (workers
# are reused by default, spark.python.worker.reuse) — a per-closure dict
# would re-resolve every distinct address each batch.  Keyed by
# (namespace, address) so two different geocoders never cross-poison.
_GEO_MEMO: dict[tuple[str, str], tuple[float, float] | None] = {}
# soft cap: beyond this, new addresses resolve but aren't memoized — an
# unbounded per-worker dict would grow with every distinct address for the
# executor's lifetime
_GEO_MEMO_MAX = 1_000_000


def geocode_with_cache(
    df: DataFrame,
    geocoder: GeoFn,
    address_col: str = "address",
    cache_namespace: str | None = None,
) -> DataFrame:
    """F10: append latitude/longitude; distinct addresses resolved once per
    WORKER PROCESS (the reference re-geocodes every row; round-1 shape
    re-resolved once per partition per batch).  The memo is looked up via
    the worker's own module import, not a pickled snapshot — cloudpickle
    would otherwise ship a by-value copy of the dict per task and nothing
    would persist."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["latitude double", "longitude double"]
    )
    if cache_namespace is not None:
        ns = cache_namespace
    else:
        # qualname alone collides for distinct closures born at the same
        # code location (two make_geocoder('kr'/'us') lambdas share a
        # __qualname__ but must NOT share cache entries) — hash the pickled
        # closure, which captures the bound arguments
        try:
            from pyspark import cloudpickle

            ns = hashlib.sha1(cloudpickle.dumps(geocoder)).hexdigest()[:16]
        except Exception:
            ns = f"{getattr(geocoder, '__module__', '?')}.{getattr(geocoder, '__qualname__', repr(geocoder))}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resolve the memo through the module object loaded IN THIS worker:
        # the singleton shared by every task the process ever runs
        from wellmeet_data_pipeline_spark.functions import enrichment as _enr

        memo = _enr._GEO_MEMO
        # TASK-lifetime negative cache: a failing address is retried once
        # per task, not once per row (a down endpoint must not become a
        # per-row RPC storm) — and not memoized worker-lifetime, so the
        # next task retries after a transient blip
        failed: set[str] = set()
        for pdf in batches:
            lats, lons = [], []
            for addr in pdf[address_col]:
                key = (ns, "" if addr is None else str(addr))
                if key in memo:
                    hit = memo[key]
                elif key[1] in failed:
                    hit = None
                else:
                    try:
                        hit = geocoder(key[1])
                    except Exception:
                        # transient failure: null for this TASK but never
                        # memoized — a worker-lifetime cache would turn one
                        # network blip into a permanently unresolvable
                        # address (the reference's None-on-miss, :49-53,
                        # is only for a RESOLVED not-found, cached below)
                        hit = None
                        failed.add(key[1])
                    else:
                        if len(memo) < _GEO_MEMO_MAX:  # bound worker memory
                            memo[key] = hit
                lats.append(hit[0] if hit else None)
                lons.append(hit[1] if hit else None)
            pdf = pdf.copy()
            pdf["latitude"] = pd.Series(lats, dtype="float64")
            pdf["longitude"] = pd.Series(lons, dtype="float64")
            yield pdf

    return df.mapInPandas(run, out_schema)


def geocode_via_reference(
    df: DataFrame, geo_ref: DataFrame, address_col: str = "address"
) -> DataFrame:
    """F10 at scale: left join an offline (address, latitude, longitude)
    reference table; broadcast hint — geo dims are small next to facts."""
    ref = geo_ref.select(address_col, "latitude", "longitude")
    return df.join(F.broadcast(ref), on=address_col, how="left")


def _hash_embed(text: str, dim: int) -> np.ndarray:
    """Deterministic unit vector from sha256-seeded bytes — a fake encoder
    with the exact interface/shape of a real one."""
    h = hashlib.sha256((text or "").encode("utf-8")).digest()
    # expand digest to dim floats deterministically
    buf = bytearray()
    block = h
    while len(buf) < dim:
        block = hashlib.sha256(block).digest()
        buf.extend(block)
    v = np.frombuffer(bytes(buf[:dim]), dtype=np.uint8).astype(np.float64) - 127.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def embed_text(df: DataFrame, text_col: str = "content", dim: int = 64) -> DataFrame:
    """X5 (save-reviews/lambda_function.py:69-76 declares it; executed
    behind the API): append an `embedding array<float>` column, Arrow-
    batched.  Swap _hash_embed for a real model client per partition."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["embedding array<float>"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["embedding"] = [list(_hash_embed(t, dim)) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(run, out_schema)
