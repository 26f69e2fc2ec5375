"""E2/J3 — mention detection as a relational n-gram join (SURVEY.md §2.8 E2,
§2.3 J3).

Reference analog: anchor-span projection + flashtext ``KeywordProcessor``
alias matching in ``create_wiki_training_data.py`` [R]. The reference runs
a per-document Python automaton; at 10^12 documents that is a per-row
Python hot path, so this engine re-expresses dictionary matching as:

    tokens (posexplode + offsets via window sum)
      -> token n-grams (lead() windows, n = alias token lengths)
      -> broadcast equi-join against the alias dictionary

which Catalyst turns into scan -> codegen ngram expansion -> broadcast
hash join: no shuffles on the big side beyond the token window, and the
alias table (<= a few 100 MB) broadcasts (SURVEY.md §4 X3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CTX_CHARS = 80  # context window (chars) each side, surface masked out


def latest_snapshot(pages: DataFrame) -> DataFrame:
    """J7/W2 as-of dedup: keep the newest warc_ts per url.

    Window formulation of the as-of/latest join; at scale this shuffles
    once on url (the natural partitioning of every downstream step).
    """
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def english_pages(pages: DataFrame) -> DataFrame:
    """P1 article filter — applied BEFORE any UDF so the predicate reaches
    the parquet scan (pushdown is blocked through pandas UDFs)."""
    return pages.filter((F.col("lang") == "en") & (F.length("text") > 0))


def tokens_with_offsets(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, pos, tok, offset): char offset of each whitespace token."""
    toks = pages.select(
        "url", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    w = (
        Window.partitionBy("url")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.withColumn(
        "offset",
        F.coalesce(F.sum(F.length("tok") + 1).over(w), F.lit(0)).cast("int"),
    )


def detect_mentions(
    pages: DataFrame, aliases: DataFrame, max_alias_tokens: int = 3
) -> DataFrame:
    """Dictionary mention detection -> MENTIONS-shaped DataFrame
    (mention_id, url, begin, end, surface, ctx).

    One output row per (url, span) even when the alias is ambiguous —
    entity candidates are attached later by the candidate join (J2).
    """
    toks = tokens_with_offsets(pages)
    w = Window.partitionBy("url").orderBy("pos")
    grams = toks
    for k in range(1, max_alias_tokens):
        grams = grams.withColumn(f"_lead{k}", F.lead("tok", k).over(w))

    # ONE pass: all n-gram candidates come out of a single explode over
    # the lead columns (a 3-way union here would recompute the window
    # shuffle once per n — measured 2.1x scaling loss at 100k pages)
    gram_structs = [F.col("tok").alias("surface")]
    for n in range(2, max_alias_tokens + 1):
        parts = [F.col("tok")] + [F.col(f"_lead{k}") for k in range(1, n)]
        gram_structs.append(
            F.when(
                F.col(f"_lead{n - 1}").isNotNull(), F.concat_ws(" ", *parts)
            ).alias(f"surface{n}")
        )
    candidates = grams.select(
        "url",
        F.col("offset").alias("begin"),
        F.explode(
            F.array_compact(F.array(*gram_structs))
        ).alias("surface"),
    )

    surfaces = aliases.select("alias").distinct()
    mentions = candidates.join(
        F.broadcast(surfaces), candidates["surface"] == surfaces["alias"], "inner"
    ).select(
        "url",
        "begin",
        (F.col("begin") + F.length("surface")).cast("int").alias("end"),
        "surface",
    )

    # attach masked context from the page text (join back on url).
    # left/right halves are kept separate so the encoder can weight tokens
    # by distance from the mention (adjacent context >> far context —
    # mirrors BERT's locality and stops neighbor-mention leakage).
    ctx_left = F.expr(
        f"substring(text, greatest(1, begin - {CTX_CHARS}), "
        f"begin - greatest(1, begin - {CTX_CHARS}))"
    )
    ctx_right = F.expr(f"substring(text, `end` + 2, {CTX_CHARS})")
    out = (
        mentions.join(pages.select("url", "text"), "url")
        .withColumn("ctx_left", ctx_left)
        .withColumn("ctx_right", ctx_right)
        .withColumn("ctx", F.concat_ws(" ", F.col("ctx_left"), F.col("ctx_right")))
        .withColumn(
            "mention_id",
            F.xxhash64(F.col("url"), F.col("begin"), F.col("surface")),
        )
        .select(
            "mention_id", "url", "begin", "end", "surface",
            "ctx", "ctx_left", "ctx_right",
        )
    )
    return out


def candidate_entities(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """J2 — candidate generation: mention surface -> (entity_id, prior).

    The reference's pickled ``{surface: {entity: count}}`` dict lookup
    (``vocab.py`` [R]) as a broadcast hash join.
    """
    return mentions.join(
        F.broadcast(aliases.select("alias", "entity_id", "entity", "prior")),
        mentions["surface"] == aliases["alias"],
        "inner",
    ).drop("alias")
