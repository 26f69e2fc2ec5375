"""PySpark-native entity-resolution engine.

A from-scratch re-expression of the capabilities of
``samuelbroscheit/entity_knowledge_in_bert`` (BERT-based end-to-end entity
linking; see SURVEY.md) as an idiomatic-Spark pipeline:

    pages -> extract_text -> detect_mentions -> blocking (MinHash-LSH +
    salted alias key) -> within-block pair generation -> pair scoring
    (string similarity + embedding cosine) -> transitive clustering
    (large-star/small-star connected components) -> clusters + lineage.

Everything is pyspark.sql.DataFrame + Arrow-vectorized pandas UDFs; no
per-row Python in any hot path (BASELINE.json:input_hint).
"""

__version__ = "0.1.0"
