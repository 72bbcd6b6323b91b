"""Java-regex vs DuckDB-RE2 parity for the oracle SQL's text expressions.

Round-4 postmortem: Java's \\s is [ \\t\\n\\x0B\\f\\r] while RE2's \\s
excludes \\x0B (vertical tab), so generator data containing \\x0B made
`pack_sequences` / `corpus_end_to_end` hash-mismatch on the driver while
every local run (ASCII-only data that session) passed.  The oracles now
spell the Java whitespace set explicitly; this test pins the contract on
adversarial strings BOTH engines must agree on — including the very
characters where the engines' \\s / \\w classes differ.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.functions.text import token_count

# Strings chosen to straddle every known Java-vs-RE2 class divergence:
# \x0B (in Java \s, not RE2 \s), unicode spaces \xa0/ /　 (in
# neither), control chars \x1c-\x1f (in neither), plus ordinary shapes.
PROBES = [
    "a\x0bb",          # vertical tab — THE round-4 bug
    "\x0b lead vt",
    "trail vt\x0b",
    "a\xa0b",          # nbsp: word char to neither engine's \s
    "a b　c",
    "a\x1cb\x1dc",
    "tab\tand\nnewline\rand\fformfeed",
    "  double  spaces  ",
    "",
    " ",
    "\x0b",
    "one",
    "punct!? dense... #@$",
    "한국어 텍스트 와 ascii mix 123",
]

# The exact oracle-side expressions queries.py embeds (post-rewrite).
_WS = r"[ \t\n\r\f\x0B]"
ORACLE_TOKENS = (
    f"CASE WHEN trim(t) = '' THEN 0 ELSE len(string_split_regex(trim(t), '{_WS}+')) END"
)
ORACLE_PUNCT = f"len(regexp_extract_all(t, '[^\\w {_WS[1:-1]}]'))"


@pytest.fixture(scope="module")
def both(spark):
    sdf = spark.createDataFrame([(i, p) for i, p in enumerate(PROBES)], ["i", "t"])
    con = duckdb.connect()
    con.execute("CREATE TABLE probes (i INT, t TEXT)")
    con.executemany("INSERT INTO probes VALUES (?, ?)", list(enumerate(PROBES)))
    return sdf, con


def test_token_count_parity(both):
    sdf, con = both
    spark_n = {
        r["i"]: r["n"]
        for r in sdf.select("i", token_count("t").alias("n")).collect()
    }
    duck_n = dict(
        con.execute(f"SELECT i, {ORACLE_TOKENS} FROM probes").fetchall()
    )
    assert spark_n == duck_n, {
        i: (spark_n[i], duck_n[i], repr(PROBES[i]))
        for i in spark_n
        if spark_n[i] != duck_n[i]
    }


def test_punct_count_parity(both):
    sdf, con = both
    # Spark side mirrors quality_score's punct term: Java [^\w\s]
    spark_n = {
        r["i"]: r["n"]
        for r in sdf.select(
            "i", F.size(F.expr(r"regexp_extract_all(t, '[^\\w\\s]', 0)")).alias("n")
        ).collect()
    }
    duck_n = dict(con.execute(f"SELECT i, {ORACLE_PUNCT} FROM probes").fetchall())
    assert spark_n == duck_n, {
        i: (spark_n[i], duck_n[i], repr(PROBES[i]))
        for i in spark_n
        if spark_n[i] != duck_n[i]
    }
