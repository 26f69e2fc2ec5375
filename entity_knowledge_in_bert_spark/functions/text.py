"""Text scalar functions (SURVEY.md §2.7 F1-F3), all JVM-side Catalyst
expressions — no Python in these paths.

Reference analogs: surface normalization in
``collect_mention_entity_counts.py`` [R], wordpiece/shingling in
``create_integerized_training_instances.py`` [R].

Functions taking an ``expr`` string build SQL expressions (needed for
lambda-taking builtins like ``transform``); callers pass column names or
SQL fragments.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(c: Column) -> Column:
    """P3: lowercase, collapse whitespace, trim (frozen normalization)."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokenize_ws(c: Column) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(normalize_text(c), " ")


def bpe_ish_tokens(expr: str) -> Column:
    """BPE-ish regex tokenization: word / number / punctuation-char tokens
    (driver mandate: token counting via 'whitespace + a BPE-ish regex')."""
    return F.expr(
        f"regexp_extract_all({expr}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
    )


def char_shingles_sql(expr: str, n: int = 3) -> Column:
    """Char n-gram shingles -> array<string> (F3), pure SQL:
    transform(sequence(1, len-n+1), i -> substring(s, i, n))."""
    return F.expr(
        f"CASE WHEN length({expr}) < {n} THEN array({expr}) ELSE "
        f"transform(sequence(1, length({expr}) - {n} + 1), "
        f"i -> substring({expr}, i, {n})) END"
    )


def word_shingles_sql(arr_expr: str, n: int = 3) -> Column:
    """Word n-gram shingles over an array<string> expression: join n
    consecutive tokens with a space."""
    return F.expr(
        f"CASE WHEN size({arr_expr}) < {n} THEN array(array_join({arr_expr}, ' ')) "
        f"ELSE transform(sequence(0, size({arr_expr}) - {n}), "
        f"i -> array_join(slice({arr_expr}, i + 1, {n}), ' ')) END"
    )


def nfkc_normalize_udf():
    """F1 NFKC unicode normalization — no Spark builtin; vectorized pandas
    UDF (the only permissible Python path)."""
    import unicodedata

    from pyspark.sql.functions import PandasUDFType
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import StringType

    # explicit functionType: annotation-based inference can't resolve
    # pd.Series under `from __future__ import annotations` with a
    # function-local pandas import
    @pandas_udf(StringType(), PandasUDFType.SCALAR)
    def nfkc(s):
        return s.map(
            lambda x: unicodedata.normalize("NFKC", x) if x is not None else None
        )

    return nfkc
