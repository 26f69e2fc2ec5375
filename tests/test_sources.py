"""S1-S3/S6 source connectors: schema'd JSON / TSV / parquet round-trips."""

import json

from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark.sources import readers


def test_extractor_json_shards(spark, tmp_path):
    shard = tmp_path / "shard0.json"
    docs = [
        {"id": 1, "title": "A", "text": "alpha beta",
         "links": [{"begin": 0, "end": 5, "target": "Alpha"}]},
        {"id": 2, "title": "B", "text": "gamma", "links": []},
    ]
    shard.write_text("\n".join(json.dumps(d) for d in docs))
    df = readers.read_extractor_shards(spark, str(shard))
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["links"][0]["target"] == "Alpha"
    assert rows[2]["text"] == "gamma"
    # anchor spans explode into mention-shaped rows
    m = df.select("id", F.explode("links").alias("l")).select(
        "id", "l.begin", "l.end", "l.target"
    )
    assert m.count() == 1


def test_conll_tsv(spark, tmp_path):
    tsv = tmp_path / "aida.tsv"
    tsv.write_text("The\tO\t\t\nUS\tB\tUS\tUnited_States\n")
    df = readers.read_conll_tsv(spark, str(tsv))
    rows = df.collect()
    assert rows[0]["token"] == "The" and rows[0]["entity"] is None
    assert rows[1]["entity"] == "United_States"


def test_pages_parquet_roundtrip(spark, tmp_path):
    from entity_knowledge_in_bert_spark import datagen

    pages = datagen.gen_pages_df(spark, 30)
    p = str(tmp_path / "pages")
    pages.write.parquet(p)
    back = readers.read_pages_parquet(spark, p)
    assert back.count() == pages.count()
    assert back.schema["warc_ts"].dataType.typeName() == "timestamp"


def test_partitioned_shard_sink(spark, tmp_path):
    from entity_knowledge_in_bert_spark import datagen

    pages = datagen.gen_pages_df(spark, 50)
    p = str(tmp_path / "shards")
    readers.write_partitioned_shards(pages, p, n_shards=4)
    import os

    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 4
    assert spark.read.parquet(p).count() == pages.count()
