"""SFT / conversation-data preparation: the post-pretraining half of an
LLM data pipeline — typed parsing of chat-structured JSON, turn-grain
structure validation, token budgeting, chat-template rendering, and
preference-pair construction for reward modeling.

Everything stays JVM-side: conversations parse once via `from_json`
into `array<struct<role,content>>` (F8's typed-extract pattern at
message grain) and every turn-grain read is a higher-order array
function over the parsed column — no explode/shuffle for per-doc stats,
no Python.  The DuckDB oracles parse the identical JSON with
`TRY_CAST(j AS STRUCT(role VARCHAR, content VARCHAR)[])` and mirror the
list ops (DuckDB list functions reduce sequentially, matching
F.aggregate's left fold — the NOTES ledger).

Generalizes the reference's JSON review ingestion (save-reviews/
lambda_function.py parses reviewer/content JSON bodies) to the
conversation-structured records an instruction-tuning corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONV_SCHEMA = "array<struct<role:string,content:string>>"


def parse_conversations(df: DataFrame, json_col: str, out_col: str = "turns") -> DataFrame:
    """Typed parse of a JSON conversation column; malformed rows yield
    NULL (errors-as-data), never a task failure."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), CONV_SCHEMA))


def turn_stats(
    df: DataFrame,
    json_col: str,
    id_col: str = "doc_id",
    expected_first: str = "user",
) -> DataFrame:
    """Per-conversation structure audit: turn count, strict role
    alternation starting from `expected_first` (the gate every SFT
    trainer applies before packing), per-side token counts, and total
    content chars.  All reads are array lambdas over ONE parsed column —
    zero shuffle, zero explode; token counts split on single spaces
    (contents are normalized upstream) and drop empty tokens, the
    filter-split convention."""
    parsed = parse_conversations(df, json_col)
    t = F.col("turns")
    roles = F.transform(t, lambda x: x["role"])
    # adjacent-pair check zips the first n-1 roles against the last n-1:
    # zipping the FULL array against the tail would pad with NULL and
    # poison forall on the last pair
    n_adj = F.greatest(F.size(t) - 1, F.lit(0))
    alternates = F.when(
        F.size(t) == 0, F.lit(0)
    ).otherwise(
        (
            (F.element_at(roles, 1) == expected_first)
            & F.forall(
                F.zip_with(
                    F.slice(roles, 1, n_adj),
                    F.slice(roles, 2, n_adj),
                    lambda a, b: a != b,
                ),
                lambda ok: ok,
            )
        ).cast("int")
    )

    # NULL contents (a turn missing the "content" key parses to a NULL
    # field on both engines) contribute ZERO, not a NULL total — the
    # DuckDB twin's list_sum skips NULL elements, and a fold without the
    # coalesce would null the whole accumulator (review catch)
    def _side_tokens(role: str) -> Column:
        return F.aggregate(
            F.filter(t, lambda x: x["role"] == role),
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.size(
                F.filter(
                    F.split(F.coalesce(x["content"], F.lit("")), " "),
                    lambda w: w != "",
                )
            ),
        )

    return parsed.select(
        F.col(id_col),
        F.size(t).cast("int").alias("n_turns"),
        alternates.alias("alternating"),
        _side_tokens("user").alias("n_user_tokens"),
        _side_tokens("assistant").alias("n_assistant_tokens"),
        F.aggregate(
            t,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.coalesce(F.length(x["content"]), F.lit(0)),
        ).alias("n_content_chars"),
    )


def render_chat_template(
    df: DataFrame,
    json_col: str,
    id_col: str = "doc_id",
    eos: str = "<|end|>",
) -> DataFrame:
    """Flatten a conversation into the training string: a left fold over
    the parsed turns emitting '<|role|>content' segments plus a final
    eos — one codegen expression per row, no explode, no window, so the
    render never shuffles (sequence order is the array order, exactly
    what a distributed sort would have to re-establish)."""
    parsed = parse_conversations(df, json_col)
    rendered = F.concat(
        F.aggregate(
            F.col("turns"),
            F.lit("").cast("string"),
            # coalesce per field: concat() NULL-propagates, so one turn
            # missing content would otherwise null the ENTIRE rendered
            # string (and diverge from the oracle, whose array_to_string
            # silently drops NULL elements).  A missing field renders as
            # the empty string — same rule turn_stats applies.
            lambda acc, x: F.concat(
                acc,
                F.lit("<|"),
                F.coalesce(x["role"], F.lit("")),
                F.lit("|>"),
                F.coalesce(x["content"], F.lit("")),
            ),
        ),
        F.lit(eos),
    )
    return parsed.select(
        F.col(id_col),
        F.when(F.col("turns").isNotNull(), rendered).alias("rendered"),
    )


def preference_pairs(
    responses: DataFrame,
    prompt_col: str,
    response_col: str,
    score_col: str,
    min_margin: int = 1,
) -> DataFrame:
    """Reward-model pair construction: per prompt, (highest, lowest)
    scored responses with a deterministic tie-break on the response id,
    kept only when the margin clears `min_margin` (equal-scored pairs
    teach nothing).  Scores must be integer-grid (cents/micros).

    Two map-side-combined max_by/min_by aggregations — one shuffle at
    prompt grain, no window, no self-join; the struct orderings make
    re-runs byte-stable."""
    hi = F.max_by(
        F.col(response_col), F.struct(F.col(score_col), F.col(response_col))
    )
    # min_by with an ASC struct: lowest score, tie -> lowest id
    lo = F.min_by(
        F.col(response_col), F.struct(F.col(score_col), F.col(response_col))
    )
    agg = responses.groupBy(prompt_col).agg(
        hi.alias("chosen"),
        F.max(F.col(score_col)).alias("chosen_score"),
        lo.alias("rejected"),
        F.min(F.col(score_col)).alias("rejected_score"),
    )
    return agg.filter(
        F.col("chosen_score") - F.col("rejected_score") >= min_margin
    ).select(
        prompt_col,
        "chosen",
        "rejected",
        (F.col("chosen_score") - F.col("rejected_score"))
        .cast("long")
        .alias("margin"),
    )


def loss_masking_plan(df: DataFrame, json_col: str, id_col: str = "doc_id") -> DataFrame:
    """Per-conversation loss-mask token budget: an SFT trainer computes
    loss only on ASSISTANT tokens, so before packing it needs, per
    conversation, how many tokens carry gradient (n_loss_tokens), where
    the first trainable span starts (first_loss_start, the prompt-prefix
    cost), how many contiguous assistant spans there are (n_spans —
    multi-span conversations can't be truncated at one cut), and the
    trainable fraction (mask_ratio_micro, cnt*1e6 div total — exact
    integer division, both engines truncate non-negatives identically).

    Token counts use the repo's filter-split convention (single-space
    split, empty tokens dropped, NULL content counts 0); malformed JSON
    rows yield NULL turns and propagate NULL stats (errors-as-data).
    All reads are array lambdas over one parsed column — zero shuffle,
    zero explode, exactly the turn_stats scale shape."""
    parsed = parse_conversations(df, json_col)
    tc = "transform(turns, x -> CAST(size(filter(split(coalesce(x.content, ''), ' '), w -> w <> '')) AS BIGINT))"
    mask = "transform(turns, x -> CAST(CASE WHEN x.role = 'assistant' THEN 1 ELSE 0 END AS BIGINT))"
    return parsed.select(
        id_col,
        F.expr(f"CAST(aggregate({tc}, 0L, (a, x) -> a + x) AS BIGINT)").alias(
            "n_total_tokens"
        ),
        F.expr(
            f"CAST(aggregate(zip_with({tc}, {mask}, (a, b) -> a * b), 0L,"
            " (a, x) -> a + x) AS BIGINT)"
        ).alias("n_loss_tokens"),
        F.expr(
            # size=0 guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) and
            # element_at(..., 0) errors — empty conversations short-circuit
            "CAST(CASE WHEN size(turns) = 0 THEN 0L ELSE"
            f" aggregate(transform(sequence(1, size(turns)), i ->"
            f" CASE WHEN element_at({mask}, i) = 1 AND"
            f" (i = 1 OR element_at({mask}, i - 1) = 0)"
            " THEN 1L ELSE 0L END), 0L, (a, x) -> a + x) END AS BIGINT)"
        ).alias("n_spans"),
        F.expr(
            f"CAST(CASE WHEN coalesce(array_position({mask}, 1L), 0) = 0"
            " THEN NULL ELSE"
            f" aggregate(slice({tc}, 1,"
            f" CAST(array_position({mask}, 1L) AS INT) - 1), 0L,"
            " (a, x) -> a + x) END AS BIGINT)"
        ).alias("first_loss_start"),
        F.expr(
            f"CAST(CASE WHEN aggregate({tc}, 0L, (a, x) -> a + x) = 0 THEN 0"
            f" ELSE aggregate(zip_with({tc}, {mask}, (a, b) -> a * b), 0L,"
            f" (a, x) -> a + x) * 1000000 div aggregate({tc}, 0L,"
            " (a, x) -> a + x) END AS BIGINT)"
        ).alias("mask_ratio_micro"),
    )
