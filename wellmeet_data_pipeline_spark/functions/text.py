"""Scalar/column function library (SURVEY.md §2.9, §2.11).

Everything here is a *Column expression builder* — pure pyspark.sql.functions
compositions that stay inside whole-stage codegen.  None of these are Python
UDFs: the reference applies plain Python functions per record (e.g.
clean_address at restaurant-crawler/restaurant-crawler.py:20-37); we express
the same logic JVM-side so it vectorizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Reference scalar functions (SURVEY.md §2.9 F1-F9)
# ---------------------------------------------------------------------------

# F1 — Korean road-address normalization.  The reference regex
# (restaurant-crawler/restaurant-crawler.py:20-37) extracts the admin-unit
# prefix "<province> <city/district> ... <road> <number>" and trims the rest
# (building names, floors).  Same pattern, JVM regexp_extract.
_ADDRESS_PATTERN = (
    r"([가-힣]+(?:특별시|광역시|특별자치시|도|특별자치도)?\s*"
    r"[가-힣]+(?:시|군|구)\s*[가-힣0-9]+(?:읍|면|동|가|로|길)\s*[0-9-]+)"
)


def clean_address(origin_address: Column | str) -> Column:
    """F1 (restaurant-crawler/restaurant-crawler.py:20-37): extract the
    normalized road-address prefix; empty string when no match, like the
    reference's fallback.  This is the *strengthened* pattern (anchored
    admin-unit chain); clean_address_reference() reproduces the
    reference's exact loose regex."""
    return F.trim(F.regexp_extract(origin_address, _ADDRESS_PATTERN, 1))


# The reference's regex verbatim (restaurant-crawler.py:26-33), including
# its quirks: the char classes contain literal commas, every group is
# optional (so it always matches — the `return address` fallback at :37 is
# unreachable), and it depends on Python's Unicode-aware \w.  Java regex
# \w is ASCII-only, so the (?U) flag is REQUIRED for parity — a verbatim
# port silently extracts nothing without it.
_REFERENCE_ADDRESS_REGEX = (
    r"(\w+[원,산,남,울,북,천,주,기,시,도]\s*)?"
    r"(\w+[구,시,군]\s*)?(\w+[구,시]\s*)?"
    r"(\w+[면,읍]\s*)"
    r"?(\w+\d*\w*[동,리,로,길]\s*)"
    r"?(\w*\d+-?\d*)?"
)


def clean_address_reference(origin_address: Column | str) -> Column:
    """Bit-for-bit behavioral twin of the reference's clean_address
    (match.group().strip() of the first search hit)."""
    return F.trim(F.regexp_extract(origin_address, "(?U)" + _REFERENCE_ADDRESS_REGEX, 0))


def extract_place_id(url: Column | str) -> Column:
    """F2 (restaurant-crawler/restaurant-crawler.py:193-196): pull the numeric
    place id out of a /place/<digits> URL."""
    return F.regexp_extract(url, r"/place/(\d+)", 1)


def review_surrogate_id(author: Column | str, content: Column | str, visit_date: Column | str) -> Column:
    """D3/F3/F4 (review-crawler/naver_crawler.py:172-177): stable review
    identity sha256(author|content|visit_date).  concat_ws + sha2 — the
    exact JVM-side form of the reference's hashlib call."""
    return F.sha2(F.concat_ws("|", author, content, visit_date), 256)


def cast_with_default(col: Column | str, default: str = "0") -> Column:
    """F5 (save-reviews/lambda_function.py:70): int(review.get('place_id', 0))
    — null-safe long cast with a default."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("long"), F.lit(default).cast("long"))


def url_decode(col: Column | str) -> Column:
    """F7 (submit-aws-batch-lambda/lambda_function.py:37): unquote_plus on S3
    keys.  Spark's url_decode handles %xx; '+'→space handled first to match
    unquote_plus semantics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.url_decode(F.replace(c, F.lit("+"), F.lit("%20")))


# ---------------------------------------------------------------------------
# North-star text analysis (SURVEY.md §2.11) over `documents`
# ---------------------------------------------------------------------------

_TOKEN_SPLIT = r"\s+"
# BPE-ish: runs of letters, runs of digits, or single punctuation — a cheap
# stand-in for a subword tokenizer that is still a pure regex.
_BPE_ISH = r"[A-Za-z가-힣]+|[0-9]+|[^A-Za-z가-힣0-9\s]"


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, _TOKEN_SPLIT))).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via regexp_count of the BPE-ish lexeme regex."""
    return F.regexp_count(text, F.lit(_BPE_ISH)).cast("long")


_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: penalize very short docs, high
    punctuation density, and very low stopword ratio (word-salad signal).
    Mirrors the C4/Gopher-style rule family, expressed as built-ins."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c).cast("double")
    n_tokens = token_count(c).cast("double")
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double")
    stop_rx = "(?i)\\b(" + "|".join(_STOPWORDS) + ")\\b"
    n_stop = F.regexp_count(c, F.lit(stop_rx)).cast("double")
    len_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(n_punct / F.greatest(n_chars, F.lit(1.0)) * F.lit(5.0), F.lit(1.0))
    stop_score = F.least(n_stop / F.greatest(n_tokens, F.lit(1.0)) * F.lit(10.0), F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / F.lit(3.0), 6)


def language_guess(text: Column | str) -> Column:
    """Character-class n-gram heuristic language ID: scores by script
    (Hangul/CJK/Cyrillic) then falls back to marker-word hits for latin
    languages.  Deliberately simple and deterministic — a real model would
    be a pandas_udf, but the plumbing (one label column out) is identical."""
    c = F.col(text) if isinstance(text, str) else text
    # script classes single-sourced from SCRIPT_PATTERNS (defined below,
    # resolved at call time) so presence-ID and proportion-stats
    # (script_counts) cannot drift apart
    scripts = dict(SCRIPT_PATTERNS)
    hangul = F.regexp_count(c, F.lit(scripts["hangul"]))
    cjk = F.regexp_count(c, F.lit(scripts["cjk"]))
    cyr = F.regexp_count(c, F.lit(scripts["cyrillic"]))
    de_hits = F.regexp_count(c, F.lit(r"(?i)\b(der|die|das|und|nicht|ist)\b"))
    es_hits = F.regexp_count(c, F.lit(r"(?i)\b(el|la|los|las|que|es|y)\b"))
    fr_hits = F.regexp_count(c, F.lit(r"(?i)\b(le|les|des|est|une|et)\b"))
    en_hits = F.regexp_count(c, F.lit(r"(?i)\b(the|and|is|of|to|it)\b"))
    return (
        F.when(hangul > 0, F.lit("ko"))
        .when(cjk > 0, F.lit("zh"))
        .when(cyr > 0, F.lit("ru"))
        .when((de_hits >= es_hits) & (de_hits >= fr_hits) & (de_hits > en_hits), F.lit("de"))
        .when((es_hits >= fr_hits) & (es_hits > en_hits), F.lit("es"))
        .when(fr_hits > en_hits, F.lit("fr"))
        .otherwise(F.lit("en"))
    )


def normalized_text(text: Column | str) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip punctuation.
    The canonical form hashed by document_fingerprint()."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", ""), r"\s+", " "))


def document_fingerprint(text: Column | str) -> Column:
    """Content fingerprint = sha256 of the normalized text (D3 generalized to
    documents; exact-dedup key at any scale — 64 hex chars shuffle cheaply)."""
    return F.sha2(normalized_text(text), 256)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles of the normalized text (MinHash input).
    Pure built-ins: split -> sliding windows via transform over indices."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(normalized_text(c), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(words, (i + F.lit(j + 1)).cast("int")) for j in range(n)]))
    )


def normalize_nfc(df: "DataFrame", text_col: str = "text", out_col: str = "nfc_text") -> "DataFrame":
    """Unicode NFC normalization — the canonical first step of any
    multilingual corpus pipeline (é as U+00E9 vs e+U+0301 must dedup and
    shingle identically).  The JVM has no built-in normalizer exposed
    through pyspark.sql.functions, so this is an Arrow-batched pandas
    iterator UDF (mapInPandas): one Python hop per BATCH, never per row,
    and the schema is declared so every downstream stage stays codegen'd.
    DuckDB's nfc_normalize() reproduces it exactly — the oracle runs the
    byte-identical transform."""
    from pyspark.sql.types import StringType, StructField, StructType

    # build a FRESH StructType: StructType.add mutates in place, and
    # df.schema hands back the DataFrame's own cached schema object —
    # mutating it desyncs the client-side column list from the JVM plan
    schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])

    def run(batches):
        import unicodedata

        for pdf in batches:
            pdf[out_col] = [
                unicodedata.normalize("NFC", t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema)


# HTML stripping — RE2-compatible (no lookaround) so the DuckDB oracle can
# run the byte-identical patterns; entity map covers the five XML
# predefined entities (a full HTML5 entity table is a reference-data join,
# not a regex).
_HTML_TAG = r"<[^>]*>"
# &amp; MUST decode LAST: decoding it first turns author-escaped text like
# '&amp;lt;' into '&lt;' which the later passes then wrongly decode again
# (double-decoding destroys intentional escaping).
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
)


def strip_html(text: Column | str) -> Column:
    """Web-corpus cleaning: drop tags, decode the predefined entities,
    collapse the whitespace the removals leave behind.  Pure
    regexp_replace chain — collapses into the scan projection."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for pat, rep in _HTML_ENTITIES:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# Unicode script classes single-sourced for language_guess (which keys
# on their PRESENCE) and script_mix_stats (which keys on their
# PROPORTIONS) — edit here and both detectors move together
SCRIPT_PATTERNS: tuple[tuple[str, str], ...] = (
    ("hangul", "[가-힣]"),
    ("cjk", "[一-鿿]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("latin", "[A-Za-z]"),
)


def script_counts(text: Column | str) -> list[Column]:
    """Per-script character counts (one JVM regexp_count per class —
    fused into the scan, no UDF): the input of code-switch / mixed-
    script detection in multilingual corpus triage."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in SCRIPT_PATTERNS
    ]


# Homoglyph fold map: the common Cyrillic / Greek / fullwidth characters
# that render identically (or near-identically) to Basic Latin — the
# substitutions spam and SEO text actually uses to dodge exact-hash
# dedup.  ONE module-level pair of parallel strings consumed by both the
# Spark translate() and (via the same constants interpolated into the
# oracle SQL) DuckDB's translate(), so the fold is definitionally
# identical cross-engine.  Deliberately small and high-precision:
# only visually-indistinguishable single-codepoint mappings, no
# transliteration.
CONFUSABLE_FROM = "аеіорсухАВЕКМНОРСТХѕјοΑΒΕΗΙΚΜΝΟΡΤΧ"
CONFUSABLE_TO = "aeiopcyxABEKMHOPCTXsjoABEHIKMNOPTX"

assert len(CONFUSABLE_FROM) == len(CONFUSABLE_TO), "fold map must be parallel"


def fold_confusables(text: Column | str) -> Column:
    """Map confusable homoglyphs to their Basic Latin look-alikes —
    the L3 rung of the dedup normalization ladder (see the
    dedup_normalization_ladder query).  Pure translate(): single-pass
    JVM codegen, no regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.translate(c, CONFUSABLE_FROM, CONFUSABLE_TO)
