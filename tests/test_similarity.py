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
