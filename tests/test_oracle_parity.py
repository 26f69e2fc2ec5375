"""t2 — replicate the driver's correctness gate locally: for every
queries() entry with an oracle, run the Spark query AND the DuckDB SQL on
the same parquet tables and compare row count + column names + an
order-insensitive multiset of row values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and tiny representation noise beyond round()ed digits
        return f"{v + 0.0:.9g}"
    return repr(v)


def _row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck_con():
    con = _duck(SF_DIR)
    yield con
    con.close()


NAMES = sorted(entrymod.oracle_sql().keys())

# Spark simple dtype -> acceptable DuckDB column types. The driver's value
# hash tolerates int-width differences that still fit int64 (both engines
# fetch them as integer dtypes — r01 evidence: ann_bruteforce_topk passed
# with oracle BIGINT vs Spark int), but a DuckDB HUGEINT (e.g. SUM over an
# integer column) overflows int64 and fetches as float64/object, which the
# driver hashes differently even when every value is equal — and repr-level
# comparison can't see it because Python fetches both as plain `int`.
# Compare declared column types by family instead. Types not listed
# (timestamp, arrays, ...) are left to the value comparison — their
# cross-engine pairings are already driver-validated.
_INT64_FIT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER",
}
_TYPE_COMPAT = {
    "bigint": _INT64_FIT,
    "int": _INT64_FIT,
    "smallint": _INT64_FIT,
    "tinyint": _INT64_FIT,
    "double": {"DOUBLE", "FLOAT", "REAL"},
    "float": {"DOUBLE", "FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
}


def _assert_type_compat(name, sdf, rel):
    spark_types = dict(sdf.dtypes)
    for col, dtyp in zip(rel.columns, rel.types):
        allowed = _TYPE_COMPAT.get(spark_types.get(col, ""))
        if allowed is not None:
            assert str(dtyp) in allowed, (
                f"{name}.{col}: oracle type {dtyp} vs Spark "
                f"{spark_types[col]} — the driver hash is type-sensitive "
                f"(CAST the oracle expression)"
            )


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck_con, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = qfn(spark, SF_DIR)
    s_rows = sdf.collect()
    s_cols = sdf.columns

    rel = duck_con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    _assert_type_compat(name, sdf, rel)
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sm = _row_multiset(s_cols, [[r[c] for c in s_cols] for r in s_rows])
    dm = _row_multiset(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(sm, dm) if a != b
    ]
    assert sm == dm, f"{name}: value mismatch, first diffs: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"entity", "alias", "n_mentions", "n_docs"}


def test_all_queries_run(spark):
    """Every queries() entry (incl. rows-only ones) must at least run."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


@pytest.mark.parametrize("name", ["j9_anti_join", "o4_except"])
def test_degenerate_fixtures_are_now_discriminating(spark, name):
    """VERDICT r5 #4: both queries compared EMPTY sets for five rounds
    (every customer had orders; every clicker also errored) — a flipped
    join type would still have 'passed'. The restricted fixtures must
    return rows at the test SF so the hash actually discriminates."""
    assert entrymod.queries()[name](spark, SF_DIR).count() > 0
