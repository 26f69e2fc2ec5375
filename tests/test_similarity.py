"""F4/E4 — string-similarity kernels vs the DuckDB external oracle."""

import duckdb
import pytest

from entity_knowledge_in_bert_spark.functions.similarity import jaro_winkler_py

CASES = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("", ""),
    ("", "abc"),
    ("abc", "abc"),
    ("a", "b"),
    ("elm clover004", "elm cover004"),
    ("dahlia violet003", "dahlia violet003"),
    ("xylem v323", "xylem violet323"),
    ("abcdef", "abzzzz"),
    ("prefix", "pre"),
    ("aaaaaaaaaa", "aaaaaaaaab"),
    ("united states", "united kingdom"),
]


@pytest.mark.parametrize("a,b", CASES)
def test_jw_matches_duckdb(a, b):
    oracle = duckdb.sql(
        "select jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert abs(jaro_winkler_py(a, b) - oracle) < 1e-12, (a, b)


def test_jw_random_strings_vs_duckdb():
    import random

    rng = random.Random(42)
    alpha = "abcdefg "
    for _ in range(500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 15)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 15)))
        oracle = duckdb.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler_py(a, b) - oracle) < 1e-12, (a, b)


def test_gated_string_sim_never_flips_match(spark):
    """The JVM prefilter (T_JW_GATE) must be decision-equivalent: the
    gated scorer's `match` column equals the ungated full-JW compute on
    surface pairs spanning identical / near / far strings."""
    from pyspark.sql import functions as F

    from entity_knowledge_in_bert_spark.functions.similarity import (
        jaro_winkler,
        levenshtein_ratio,
    )
    from entity_knowledge_in_bert_spark.operators import scoring

    surfaces = [
        "berlin", "berlin", "berlln", "paris", "paris france",
        "new york", "new york city", "nyc", "spark", "sparc",
        "a", "ab", "completely different", "berlin city",
    ]
    rows = []
    pid = 0
    for i, sa in enumerate(surfaces):
        for sb in surfaces[i + 1:]:
            rows.append((pid, pid + 100000, sa, sb, [1.0, 0.0], [1.0, 0.0]))
            pid += 1
    pairs = spark.createDataFrame(
        rows,
        "mention_a long, mention_b long, surface_a string, "
        "surface_b string, vec_a array<float>, vec_b array<float>",
    )
    aliases = spark.createDataFrame(
        [("berlin", 1, 10, 1.0), ("paris", 2, 10, 1.0)],
        "alias string, entity_id long, cnt long, prior double",
    )
    got = {
        r["mention_a"]: (r["match"], r["string_sim"])
        for r in scoring.score_pairs(pairs, aliases).collect()
    }
    # ungated reference: full JW for every pair
    full = pairs.withColumn(
        "string_sim",
        (
            jaro_winkler(F.col("surface_a"), F.col("surface_b"))
            + levenshtein_ratio(F.col("surface_a"), F.col("surface_b"))
        )
        / 2.0,
    )
    for r in full.collect():
        ss = r["string_sim"]
        # decision-relevant region: gated string_sim must agree exactly
        if ss >= scoring.T_STRING_OOD:
            assert abs(got[r["mention_a"]][1] - ss) < 1e-12, r
    # matches identical to a scorer with the gate disabled (gate at -1
    # routes every pair through the hot branch)
    orig = scoring.T_JW_GATE
    try:
        scoring.T_JW_GATE = -1.0
        ungated = {
            r["mention_a"]: r["match"]
            for r in scoring.score_pairs(pairs, aliases).collect()
        }
    finally:
        scoring.T_JW_GATE = orig
    assert {k: v[0] for k, v in got.items()} == ungated


# ---------------------------------------------------------------------------
# Property: the pure-Python Jaro-Winkler kernel must agree with DuckDB's
# jaro_winkler_similarity on ARBITRARY strings, not just the fixed pairs
# above — this is the oracle contract the F4 queries and the score stage
# rest on. Pure python+duckdb (no Spark): cheap and deterministic.
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings, strategies as st

    import duckdb as _duck

    _ALPHA = st.text(
        alphabet=st.sampled_from("abcdxyz ABE-"), min_size=0, max_size=24
    )

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(_ALPHA, _ALPHA)
    def test_jaro_winkler_matches_duckdb_property(a, b):
        from entity_knowledge_in_bert_spark.functions.similarity import (
            jaro_winkler_py,
        )

        con = _duck.connect()
        got = jaro_winkler_py(a, b)
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        con.close()
        assert abs(got - want) < 1e-12, (a, b, got, want)

except ImportError:  # hypothesis is baked into this environment; belt+braces
    pass
