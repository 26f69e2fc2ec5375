"""Text analysis for large-scale training-data pipelines (driver mandate):
language-ID heuristic, quality scoring, token counting (whitespace +
BPE-ish regex), and document fingerprinting.

All closed-form Catalyst expressions — value-checkable against the DuckDB
oracle and shuffle-free (narrow maps) except the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_ish_tokens


def _rhu4(c: Column) -> Column:
    """Half-up round to 4 decimals via floor(x*1e4+0.5)/1e4 — identical in
    every engine (SQL round() differs at .5 boundaries: Spark HALF_UP,
    DuckDB half-even), and integer-ratio inputs land exactly on those
    boundaries."""
    return F.floor(c * 10000.0 + 0.5) / 10000.0

# tiny deterministic stopword lists for the n-gram/lexicon language vote
_EN_MARKERS = ["the", "a", "data", "fast", "slow"]
_DE_MARKERS = ["der", "die", "das", "und", "nicht"]
_ES_MARKERS = ["el", "la", "los", "que", "de"]


def _marker_hits(tokens_expr: str, markers: list[str]) -> Column:
    arr = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter({tokens_expr}, t -> array_contains(array({arr}), t)))"
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, predicted_lang, en_hits, de_hits, es_hits): lexicon-vote
    language ID; 'und' (undetermined) when no list scores."""
    toks = f"split({text_col}, ' ')"
    out = (
        docs.withColumn("en_hits", _marker_hits(toks, _EN_MARKERS))
        .withColumn("de_hits", _marker_hits(toks, _DE_MARKERS))
        .withColumn("es_hits", _marker_hits(toks, _ES_MARKERS))
        .withColumn(
            "predicted_lang",
            F.when(
                (F.col("en_hits") >= F.col("de_hits"))
                & (F.col("en_hits") >= F.col("es_hits"))
                & (F.col("en_hits") > 0),
                F.lit("en"),
            )
            .when(
                (F.col("de_hits") >= F.col("es_hits")) & (F.col("de_hits") > 0),
                F.lit("de"),
            )
            .when(F.col("es_hits") > 0, F.lit("es"))
            .otherwise(F.lit("und")),
        )
    )
    return out.select("doc_id", "predicted_lang", "en_hits", "de_hits", "es_hits")


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio, alpha_ratio,
    quality): length/stopword/charset heuristics -> [0,1] score."""
    toks = f"split({text_col}, ' ')"
    n_tokens = F.expr(f"size({toks})")
    stop_hits = _marker_hits(toks, _EN_MARKERS)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    out = (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            _rhu4(
                (F.length(text_col) - (F.col("n_tokens") - 1))
                / F.col("n_tokens")
            ),
        )
        .withColumn(
            "stopword_ratio", _rhu4(stop_hits / F.col("n_tokens"))
        )
        .withColumn(
            "alpha_ratio", _rhu4(alpha_chars / F.length(text_col))
        )
        .withColumn(
            "quality",
            _rhu4(
                F.least(F.col("n_tokens") / 64.0, F.lit(1.0)) * 0.4
                + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
                + F.col("alpha_ratio") * 0.3
            ),
        )
    )
    return out.select(
        "doc_id", "n_tokens", "avg_token_len", "stopword_ratio",
        "alpha_ratio", "quality",
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace + BPE-ish regex
    token counts (the driver's 'token counting' mandate)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.size(bpe_ish_tokens(text_col)).alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): position-weighted rolling hash over tokens.

    h(tok) = first 8 hex chars of sha256 as int;
    fp = sum(h * ((pos % 31) + 1)) mod 1e9+7  — pure integer arithmetic,
    identical in any engine, order-independent given explicit positions.
    """
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    h = F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 8), 16, 10).cast("long")
    term = h * ((F.col("pos") % 31) + 1)
    return (
        toks.withColumn("term", term)
        .groupBy("doc_id")
        .agg((F.sum("term") % F.lit(1000000007)).alias("fingerprint"))
    )
