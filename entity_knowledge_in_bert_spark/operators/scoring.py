"""E4 — pairwise match scoring (SURVEY.md §2.8 E4; BASELINE.json
north_star: "Jaro-Winkler/Levenshtein string similarity with frozen BERT
mention-embedding cosine scores").

Features per candidate pair:
  * ``string_sim``  = (jaro_winkler + levenshtein_ratio) / 2
                      (JW: Arrow pandas UDF; lev: JVM builtin)
  * ``ctx_cos``     = cosine of the frozen-encoder context embeddings
  * ``prior_dot``   = Σ_e p(e|m_a) · p(e|m_b) over shared candidate
                      entities — the probability both mentions denote the
                      same entity under the reference's mention-entity
                      prior alone (postprocess_mention_entity_counts.py
                      [R] re-expressed pairwise). 1.0 when both surfaces
                      are dictionary-unambiguous for the same entity;
                      ~Σp² < 1 for ambiguous surfaces; 0 when no shared
                      candidate.

Match decision (FROZEN v1, calibrated on the t4 fixture — the pairwise-F1
gate is conditioned on this + the blocking key):

  match :=  prior_dot >= 0.95                         -- dictionary-certain
        or (prior_dot >= 0.45 and ctx_cos >= 0.40)    -- ambiguity resolved
        or (prior_dot >= 0.08 and ctx_cos >= 0.50)    -- minority sense
        or (string_sim >= 0.90 and ctx_cos >= 0.40)   -- out-of-dictionary

Rationale: an ambiguous surface pair (identical strings!) must never merge
two entities on string evidence — only context can push it over; a
minority-sense surface (low prior on the true entity) needs strong
context; unknown surface variants fall back to string+context. A single
weighted sum cannot express "string similarity is necessary but never
sufficient", which is exactly the failure mode of head aliases.

``score`` (reported, used for ranking/threshold sweeps) remains the
calibrated linear blend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import (
    cosine_vec,
    levenshtein_ratio,
    make_gated_string_sim,
)

W_STRING = 0.25
W_COS = 0.45
W_PRIOR = 0.30
SCORING_VERSION = "v1"

# frozen rule thresholds (see module docstring)
T_PRIOR_CERTAIN = 0.95
T_PRIOR_AMBIG = 0.45
T_COS_AMBIG = 0.40
T_PRIOR_MINOR = 0.08
T_COS_MINOR = 0.50
T_STRING_OOD = 0.90
T_COS_OOD = 0.40

# JVM prefilter for the Jaro-Winkler Arrow boundary: string_sim =
# (jw + lev_ratio)/2 >= T_STRING_OOD requires jw >= 2*T_STRING_OOD -
# lev_ratio, so with lev_ratio < 2*T_STRING_OOD - 1 even jw = 1.0 cannot
# reach the OOD rule — the Python kernel can never change the match
# decision for those pairs and is skipped (string_sim falls back to
# lev_ratio there, which only perturbs the reported ranking `score` of
# pairs that are non-matches regardless).
T_JW_GATE = 2 * T_STRING_OOD - 1.0  # = 0.80


def prior_dot_table(aliases: DataFrame) -> DataFrame:
    """(alias_a, alias_b, prior_dot): Σ_e p(e|a)·p(e|b) for every surface
    pair sharing >= 1 candidate entity.

    The alias dictionary is broadcast-sized (X3): this self-join runs once
    over the dictionary, never over the pairs table, and broadcasts into
    the scorer — the pairs hot path stays shuffle-free for this feature.
    """
    a = aliases.select(
        F.col("alias").alias("alias_a"), "entity_id", F.col("prior").alias("_pa")
    )
    b = aliases.select(
        F.col("alias").alias("alias_b"), "entity_id", F.col("prior").alias("_pb")
    )
    return (
        a.join(b, "entity_id")
        .groupBy("alias_a", "alias_b")
        .agg(F.sum(F.col("_pa") * F.col("_pb")).alias("prior_dot"))
    )


def _with_string_sim(pairs_feat: DataFrame) -> DataFrame:
    """string_sim with the JW kernel gated (VERDICT r1 #7).

    Three tiers inside ONE Arrow-batched UDF, cheapest first: identical
    non-empty surfaces (the bulk of alias-blocked ER pairs) -> 1.0;
    lev_ratio < T_JW_GATE -> lev_ratio (JW provably cannot flip the
    match decision, see T_JW_GATE derivation); survivors run the
    O(len^2) Python Jaro-Winkler kernel. lev_ratio is computed JVM-side
    (builtin levenshtein) and fed in as a column. A single-branch plan
    on purpose: F.when would not skip a pandas UDF (Spark evaluates it
    in a separate ArrowEvalPython node for every row), and filter+union
    would recompute the upstream pair-feature joins once per branch.
    Empty==empty keeps JW's 0.0 semantics via the kernel path."""
    sim = make_gated_string_sim(T_JW_GATE)
    return pairs_feat.withColumn(
        "string_sim",
        sim(
            F.col("surface_a"),
            F.col("surface_b"),
            levenshtein_ratio(F.col("surface_a"), F.col("surface_b")),
        ),
    )


def score_pairs(pairs_feat: DataFrame, aliases: DataFrame) -> DataFrame:
    """pairs with (surface_a/b, vec_a/b) -> + string_sim, ctx_cos,
    prior_dot, score, match."""
    prior = prior_dot_table(aliases)
    scored = (
        _with_string_sim(pairs_feat)
        .withColumn(
            "ctx_cos",
            F.greatest(cosine_vec(F.col("vec_a"), F.col("vec_b")), F.lit(0.0)),
        )
        .join(
            F.broadcast(prior),
            (F.col("surface_a") == F.col("alias_a"))
            & (F.col("surface_b") == F.col("alias_b")),
            "left",
        )
        .withColumn("prior_dot", F.coalesce(F.col("prior_dot"), F.lit(0.0)))
        .drop("alias_a", "alias_b")
        .withColumn(
            "score",
            W_STRING * F.col("string_sim")
            + W_COS * F.col("ctx_cos")
            + W_PRIOR * F.col("prior_dot"),
        )
        .withColumn(
            "match",
            (F.col("prior_dot") >= T_PRIOR_CERTAIN)
            | (
                (F.col("prior_dot") >= T_PRIOR_AMBIG)
                & (F.col("ctx_cos") >= T_COS_AMBIG)
            )
            | (
                (F.col("prior_dot") >= T_PRIOR_MINOR)
                & (F.col("ctx_cos") >= T_COS_MINOR)
            )
            | (
                (F.col("string_sim") >= T_STRING_OOD)
                & (F.col("ctx_cos") >= T_COS_OOD)
            ),
        )
    )
    return scored


def match_edges(scored: DataFrame, keep: tuple = ()) -> DataFrame:
    """match rule -> EDGES (src, dst, score).

    ``keep``: extra columns to carry onto the edge table (e.g.
    ``("block_key",)`` so the cluster stage can group-contract each
    block's matched subgraph before the CC loop — see
    cluster.connected_components(contract_by=...))."""
    return scored.filter(F.col("match")).select(
        F.col("mention_a").alias("src"),
        F.col("mention_b").alias("dst"),
        F.col("score"),
        *[F.col(c) for c in keep],
    )
