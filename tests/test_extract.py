"""t3 — extractor parity: byte-identical text per url, enforced by sha256
goldens (BASELINE.json:north_star). The golden file is generated once from
extractor v0 and committed; ANY drift in extraction fails here."""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark import datagen
from entity_knowledge_in_bert_spark.operators.extract import (
    extract_text,
    extract_text_py,
)

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_text_hashes.json")
N_GOLDEN_PAGES = 120


def _compute_goldens() -> dict:
    adf = datagen.alias_table()
    by_ent = datagen._alias_lookup(adf)
    sigs = datagen.entity_signatures()
    out = {}
    for pid in range(N_GOLDEN_PAGES):
        pages, _ = datagen.page_record(pid, by_ent, sigs)
        for url, ts, html, text, lang in pages:
            key = f"{url}@{ts.isoformat()}"
            out[key] = hashlib.sha256(
                extract_text_py(html).encode("utf-8")
            ).hexdigest()
    return out


def test_goldens_committed():
    assert os.path.exists(GOLDEN_PATH), (
        "golden_text_hashes.json missing — generate once with "
        "`python -m tests.gen_goldens` and commit it"
    )


def test_extractor_matches_goldens():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    now = _compute_goldens()
    assert now == golden, "extractor v0 output drifted from committed goldens"


def test_extracted_equals_generated_text(spark):
    """extract_text(html) must equal the generator's text column byte-for-
    byte, for every snapshot (the per-url invariant)."""
    pages = datagen.gen_pages_df(spark, 150)
    bad = (
        pages.withColumn("t2", extract_text(F.col("html")))
        .filter(F.col("t2") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extractor_is_pure():
    raw = b"<html><head><title>t</title></head><body>a &amp; b <b>c</b></body></html>"
    assert extract_text_py(raw) == "a & b c"
    assert extract_text_py(raw) == extract_text_py(raw)


@pytest.mark.parametrize(
    "raw,expected",
    [
        (b"<body>plain</body>", "plain"),
        (b"no body tag at all", "no body tag at all"),
        (b"<body><script>var x=1;</script>keep</body>", "keep"),
        (b"<body><style>p{}</style>keep</body>", "keep"),
        (b"<body>&lt;tag&gt; &quot;q&quot;</body>", '<tag> "q"'),
    ],
)
def test_extractor_cases(raw, expected):
    assert extract_text_py(raw) == expected
