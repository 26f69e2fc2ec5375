"""S1-S3 — source connectors (SURVEY.md §2.1).

Reference analogs: Wikipedia dump download + WikiExtractor JSON shards
(``preprocess_all.py`` [R]) and AIDA-CoNLL TSV files
(``create_aida_conll.py`` [R]). The engine reads every format with an
EXPLICIT schema — inference is allowed only in tests (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES

# WikiExtractor-style JSON shard: one doc per line
EXTRACTOR_SHARD_SCHEMA = (
    "id long, title string, text string, "
    "links array<struct<begin:int, `end`:int, target:string>>"
)

# AIDA-CoNLL-style TSV: token, bio_tag, surface, entity
CONLL_TSV_SCHEMA = "token string, bio string, surface string, entity string"


def read_pages_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1: the bronze pages table (sandbox stand-in for the Iceberg scan
    ``spark.read.format('iceberg').load('crawl.pages')``)."""
    return spark.read.schema(PAGES).parquet(path)


def read_extractor_shards(spark: SparkSession, path: str) -> DataFrame:
    """S2: JSON-lines extractor shards with anchor-span structs."""
    return spark.read.schema(EXTRACTOR_SHARD_SCHEMA).json(path)


def read_conll_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S3: benchmark TSV (tab-separated, no header)."""
    return (
        spark.read.schema(CONLL_TSV_SCHEMA)
        .option("sep", "\t")
        .option("header", "false")
        .csv(path)
    )


def write_partitioned_shards(
    df: DataFrame, path: str, n_shards: int, key: str = "url"
) -> None:
    """S6: deterministic columnar shard sink (hash-sharded on `key`) —
    the reference's per-shard pickle layout as partitioned parquet."""
    df.repartition(n_shards, key).write.mode("overwrite").parquet(path)
