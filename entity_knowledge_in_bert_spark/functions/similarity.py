"""String + vector similarity kernels (SURVEY.md §2.7 F4, §2.8 E4).

The north_star mandates Jaro-Winkler + Levenshtein string similarity and
embedding cosine for pair scoring, Arrow-vectorized (no per-row Python).

* Levenshtein: Spark builtin ``F.levenshtein`` (JVM-side).
* Jaro-Winkler: no Spark builtin -> numpy kernel inside a scalar pandas
  UDF. Semantics match DuckDB 1.0 ``jaro_winkler_similarity`` (standard
  Winkler: prefix cap 4, scaling 0.1, boost threshold 0.7), which is the
  external oracle in tests/test_oracle_parity.py.
* Cosine: pure-SQL ``zip_with``+``aggregate`` (JVM) for ad-hoc use, and a
  numpy pandas UDF for the scoring hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType


# ---------------------------------------------------------------------------
# Jaro-Winkler (pure Python kernel, Arrow-batched at the Spark boundary).
# ---------------------------------------------------------------------------
def jaro_winkler_py(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler similarity in [0,1] (DuckDB-compatible)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0  # DuckDB semantics: empty vs anything (incl. empty) = 0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched chars in order
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1.0 - jaro)


@pandas_udf(DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler over two string columns."""
    return pd.Series(
        [jaro_winkler_py(x, y) if x is not None and y is not None else None
         for x, y in zip(a, b)],
        dtype="float64",
    )


def make_gated_string_sim(gate: float):
    """Factory: Arrow-batched string_sim = (jw + lev_ratio)/2 with the
    O(len^2) Jaro-Winkler kernel SKIPPED whenever it provably cannot
    matter (see scoring.T_JW_GATE): identical non-empty strings ->
    string_sim = 1.0; lev_ratio < gate -> string_sim = lev_ratio; only
    the survivors run the quadratic kernel. The column still crosses the
    Arrow boundary once per batch (transfer is cheap); what the gate
    removes is the per-pair kernel cost. lev_ratio is computed JVM-side
    (builtin levenshtein) and passed in, so the plan stays one branch —
    a filter+union formulation would recompute the upstream pair-feature
    joins once per branch."""

    @pandas_udf(DoubleType())
    def gated_string_sim(
        a: pd.Series, b: pd.Series, lev_r: pd.Series
    ) -> pd.Series:
        # Vectorized tier masks; the Python JW kernel only runs on the
        # survivor indices (typically a small fraction of ER pairs).
        null = (a.isna() | b.isna()).to_numpy()
        lr_np = lev_r.to_numpy(dtype="float64", na_value=np.nan)
        ident = (
            ((a == b) & (a.str.len() > 0)).fillna(False).to_numpy(dtype=bool)
            & ~null
        )
        out = lr_np.copy()  # default tier: lr < gate -> lev_ratio
        out[ident] = 1.0  # jw == lev_ratio == 1 for identical strings
        surv = ~null & ~ident & (lr_np >= gate)
        av = a.to_numpy()
        bv = b.to_numpy()
        for i in np.nonzero(surv)[0]:
            out[i] = (jaro_winkler_py(av[i], bv[i]) + lr_np[i]) / 2.0
        out[null] = np.nan
        return pd.Series(out)

    return gated_string_sim


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(len) in [0,1]; all JVM-side."""
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / denom.cast("double")
    )


# ---------------------------------------------------------------------------
# Cosine similarity.
# ---------------------------------------------------------------------------
def cosine_sql(a_expr: str, b_expr: str) -> Column:
    """Pure-SQL cosine over two array<float/double> expressions: stays in
    whole-stage codegen; right choice for one-off relational queries."""
    dot = f"aggregate(zip_with({a_expr}, {b_expr}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a_expr}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    nb = f"sqrt(aggregate({b_expr}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    return F.expr(f"CASE WHEN {na} = 0 OR {nb} = 0 THEN 0.0 ELSE {dot} / ({na} * {nb}) END")


def _cosine_rows(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Row-wise cosine over two (n, d) float64 matrices — one einsum per
    batch instead of a Python loop per pair."""
    dots = np.einsum("ij,ij->i", X, Y)
    nx = np.sqrt(np.einsum("ij,ij->i", X, X))
    ny = np.sqrt(np.einsum("ij,ij->i", Y, Y))
    denom = nx * ny
    good = denom > 0
    return np.where(good, dots / np.where(good, denom, 1.0), 0.0)


@pandas_udf(DoubleType())
def cosine_vec(a: pd.Series, b: pd.Series) -> pd.Series:
    """numpy cosine over two array<float> columns (scoring hot path).

    Encoder embeddings are fixed-DIM, so the whole Arrow batch stacks into
    two (n, d) matrices and the dot/norm run as single vectorized einsums;
    ragged batches (mixed dims) fall back to a per-row loop.
    """
    out = np.full(len(a), np.nan, dtype="float64")
    valid = (~(a.isna() | b.isna())).to_numpy()
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return pd.Series(out)
    av = a.to_numpy()
    bv = b.to_numpy()
    try:
        X = np.stack([np.asarray(av[i], dtype="float64") for i in idx])
        Y = np.stack([np.asarray(bv[i], dtype="float64") for i in idx])
        if X.shape != Y.shape:
            raise ValueError("dim mismatch between sides")
        out[idx] = _cosine_rows(X, Y)
    except ValueError:  # ragged vectors: slow path, same semantics
        for i in idx:
            xv = np.asarray(av[i], dtype="float64")
            yv = np.asarray(bv[i], dtype="float64")
            n = np.linalg.norm(xv) * np.linalg.norm(yv)
            out[i] = float(xv @ yv / n) if n > 0 else 0.0
    return pd.Series(out)
