"""E1 — text extraction from raw HTML (SURVEY.md §2.8 E1).

Re-expresses the reference's WikiExtractor wrapper job
(``bert_entity/preprocess_all.py`` download+extract stage [R]) as an
Arrow-vectorized scalar pandas UDF over the ``html:binary`` column.

**EXTRACTOR v0 IS FROZEN.** The north-star invariant is *byte-identical
extracted text per url* (BASELINE.json:north_star), enforced by per-url
sha256 goldens in ``tests/test_extract.py``. Any change to
``extract_text_py`` must bump EXTRACTOR_VERSION and regenerate goldens
deliberately — never as a drive-by cleanup.

Spec (v0):
  1. decode bytes as UTF-8 (strict);
  2. take the contents of the first ``<body ...> ... </body>`` span
     (DOTALL); if no body tag, use the whole document;
  3. drop ``<script>``/``<style>`` elements including their content;
  4. drop all remaining tags ``<...>`` (tags carry no implicit whitespace
     in v0 — the corpus generator guarantees word boundaries are real
     characters, as WikiExtractor output does);
  5. unescape HTML entities (&amp; &lt; &gt; &quot; &#x27;).

No whitespace collapsing: v0 is an exact inverse of the page templater.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

EXTRACTOR_VERSION = "v0"

_BODY_RE = re.compile(rb"<body[^>]*>(.*)</body>", re.S | re.I)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_py(raw: bytes) -> str:
    """Pure-Python extraction kernel (v0, frozen). One html blob -> text."""
    m = _BODY_RE.search(raw)
    body = m.group(1) if m else raw
    s = body.decode("utf-8")
    s = _SCRIPT_STYLE_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _html.unescape(s)


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow-batched extractor: Series[bytes] -> Series[str]."""
    return html.map(extract_text_py)


def with_extracted_text(pages, out_col: str = "text_extracted"):
    """pages(html:binary, ...) -> + text_extracted column.

    Filters (e.g. lang) must be applied BEFORE this call: Catalyst does
    not push predicates through an opaque pandas UDF (SURVEY.md §4 X10).
    """
    return pages.withColumn(out_col, extract_text(F.col("html")))
