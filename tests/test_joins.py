"""Join-strategy operators: Bloom-filter join prefilter (exact FP accounting)."""



def test_bloom_prefilter_matches_pure_python(spark):
    """Differential vs an independent python Bloom on the same sha
    derivation: identical bit set, pass set, and FP accounting; no
    false negatives ever (every true match passes)."""
    import hashlib

    from wellmeet_data_pipeline_spark.operators.joins import bloom_prefilter_stats

    M, K = 16, 2  # tiny filter -> saturation -> false positives likely
    build_keys = [3, 7, 11, 19, None]
    probe_keys = list(range(40)) + [None]

    def positions(k):
        hx = hashlib.sha256(str(k).encode()).hexdigest()
        return [int(hx[8 * i : 8 * i + 8], 16) % M for i in range(K)]

    bits = {p for k in build_keys if k is not None for p in positions(k)}
    passes = {
        k for k in probe_keys
        if k is not None and all(p in bits for p in positions(k))
    }
    true = {k for k in probe_keys if k is not None and k in build_keys}
    assert true <= passes  # Bloom guarantee: no false negatives

    build = spark.createDataFrame([(k,) for k in build_keys], "c_custkey long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "o_custkey long")
    row = bloom_prefilter_stats(
        build, probe, "c_custkey", "o_custkey", m_bits=M, k_hashes=K
    ).collect()[0]
    assert row["n_build"] == 4 and row["n_probe"] == 40
    assert row["n_bits_set"] == len(bits)
    assert row["n_pass"] == len(passes)
    assert row["n_true_match"] == len(true)
    assert row["n_false_pos"] == len(passes) - len(true)
    assert row["fp_rate_micro"] == (len(passes) - len(true)) * 1_000_000 // (40 - len(true))
    # deterministic saturation: a 1-bit filter passes EVERY probe key
    sat = bloom_prefilter_stats(
        build, probe, "c_custkey", "o_custkey", m_bits=1, k_hashes=2
    ).collect()[0]
    assert sat["n_pass"] == 40 and sat["n_bits_set"] == 1
    assert sat["n_false_pos"] == 40 - sat["n_true_match"]


def test_bloom_bit_positions_bounds(spark):
    import pytest as _pytest

    from wellmeet_data_pipeline_spark.operators.joins import bloom_bit_positions
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError):
        bloom_bit_positions(F.lit(1), k_hashes=9)
    df = spark.range(100).select(
        bloom_bit_positions(F.col("id"), m_bits=256, k_hashes=8).alias("pos")
    )
    rows = df.select(F.explode("pos").alias("p")).agg(
        F.min("p").alias("lo"), F.max("p").alias("hi")
    ).collect()[0]
    assert 0 <= rows["lo"] and rows["hi"] < 256
