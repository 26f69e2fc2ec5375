"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §A).

Replaces the reference's Wikipedia dump + AIDA-CoNLL downloads
(``bert_entity/preprocess_all.py`` download jobs [R]) with a fully
self-contained, seed=42 generator. No external data (driver mandate).

Three fixtures:
  * ``alias_table()``       — entity alias dictionary with Zipf counts
                              (head-entity skew on purpose, exercises J5/X8);
  * ``gen_pages_df()``      — pages(url, warc_ts, html, text, lang);
                              ~5%% of urls get a stale extra snapshot (J7);
  * ``gen_gold_df()``       — gold mentions (url, begin, end, surface,
                              entity_gold) for the LATEST en snapshot only.

Generation is per-page deterministic (RandomState(SEED+page_id)), so the
output is identical under any partitioning — the generator distributes via
``mapInPandas`` over ``spark.range`` and never loops on the driver.

The page HTML is an exact pre-image of ``operators.extract.extract_text_py``
(v0): escape(text) with mention surfaces wrapped in <a> tags, inside a
<body> with <title>/<style> noise. This gives the byte-identical
extraction invariant something real to check.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta, timezone
from typing import Iterator

import numpy as np
import pandas as pd

SEED = 42
N_ENTITIES = 500
MENTIONS_PER_PAGE = 6
FILLER_TOKENS_PER_PAGE = 90
ZIPF_S = 1.1  # skew exponent for entity popularity

# Small closed vocabularies -> deterministic, readable corpora.
_FILLER = (
    "the a data table scan join filter merge sort group agg window stream "
    "batch row column key value query spark hash part order line fast slow "
    "big small dup vector customer"
).split()

_ALIAS_WORDS = (
    "alder birch cedar dahlia elm fern ginkgo hazel iris juniper kale lotus "
    "maple nettle oak poppy quince rowan sage thyme ulmus violet willow "
    "xylem yarrow zinnia aspen basil clover dill"
).split()

_SIG_WORDS = [f"sig{i:03d}" for i in range(600)]

_LANGS = ["en"] * 19 + ["de"]  # ~5% non-en

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


# ---------------------------------------------------------------------------
# Alias dictionary (SURVEY D4-D6).
# ---------------------------------------------------------------------------
def alias_table(n_entities: int = N_ENTITIES) -> pd.DataFrame:
    """(alias, entity_id, entity, cnt, prior) with Zipf counts.

    * >=20%% of entities have 2 aliases (synonymy: canonical + typo/abbrev);
    * ~10%% of aliases are shared by two entities (ambiguity) — those
      entities get distinct context signatures so scoring can separate them.
    """
    rng = np.random.RandomState(SEED)
    rows = []
    w = len(_ALIAS_WORDS)
    for eid in range(n_entities):
        a1 = _ALIAS_WORDS[eid % w]
        a2 = _ALIAS_WORDS[(eid * 7 + eid // w) % w]
        canonical = f"{a1} {a2}{eid:03d}"
        entity = f"Concept{eid:04d}"
        cnt = max(1, int(200000 / (eid + 1) ** ZIPF_S))
        rows.append((canonical, eid, entity, cnt))
        r = rng.rand()
        if r < 0.25:  # typo variant: drop one inner char of the 2nd word
            typo = f"{a1} {a2[:1] + a2[2:]}{eid:03d}"
            rows.append((typo, eid, entity, max(1, cnt // 4)))
        elif r < 0.45:  # abbreviation variant
            abbrev = f"{a1} {a2[0]}{eid:03d}"
            rows.append((abbrev, eid, entity, max(1, cnt // 5)))
        if eid % 10 == 3 and eid + 1 < n_entities:
            # ambiguity: this entity's canonical alias also names eid+1
            rows.append((canonical, eid + 1, f"Concept{eid + 1:04d}", max(1, cnt // 6)))
    df = pd.DataFrame(rows, columns=["alias", "entity_id", "entity", "cnt"])
    df["cnt"] = df["cnt"].astype("int64")
    df["entity_id"] = df["entity_id"].astype("int64")
    total = df.groupby("alias")["cnt"].transform("sum")
    df["prior"] = df["cnt"] / total
    return df


def entity_signatures(n_entities: int = N_ENTITIES) -> dict[int, list[str]]:
    """3 signature context words per entity (distinct across entities)."""
    sigs = {}
    for eid in range(n_entities):
        base = (eid * 3) % len(_SIG_WORDS)
        sigs[eid] = [
            _SIG_WORDS[base],
            _SIG_WORDS[(base + 1) % len(_SIG_WORDS)],
            _SIG_WORDS[(eid * 7 + 11) % len(_SIG_WORDS)],
        ]
    return sigs


# ---------------------------------------------------------------------------
# Per-page deterministic generation.
# ---------------------------------------------------------------------------
def _zipf_entity(rng: np.random.RandomState, n_entities: int) -> int:
    """Zipf-distributed entity pick (head-heavy, exercises skew)."""
    u = rng.rand()
    # inverse-CDF over precomputed harmonic weights would be exact; a cheap
    # power transform keeps the head heavy enough for the skew tests
    return min(int(n_entities * (u ** 2.5)), n_entities - 1)


def page_record(
    page_id: int,
    aliases_by_entity: dict[int, list[str]],
    sigs: dict[int, list[str]],
    n_entities: int = N_ENTITIES,
    generation: int = 0,
    content_generation: int | None = None,
):
    """Build one url's snapshots + gold mentions. Pure and deterministic.

    ``generation`` models a RE-CRAWL of the same url: generation g > 0
    keeps the url but reseeds the content rng and advances ``warc_ts``
    by 3g days, so the page text (and its mentions) genuinely change —
    the input the incremental retract path (plans/incremental.py) and
    the batch as-of rule (J7) reconcile. generation=0 output is
    byte-identical to the historical generator (golden hashes, t3).

    ``content_generation`` (default: = generation) decouples the content
    seed from the timestamp: generation=2, content_generation=0 is a
    CONTENT REVERT — the gen-0 page re-crawled at a gen-2 timestamp, the
    input that resurrects previously-tombstoned mentions (same
    url/begin/surface => same mention_id at a newer warc_ts).

    Returns (pages_rows, mention_rows):
      pages_rows: list of (url, warc_ts, html, text, lang)
      mention_rows: (url, begin, end, surface, entity_gold) on latest text.
    """
    if content_generation is None:
        content_generation = generation
    rng = np.random.RandomState(SEED + page_id + 1_000_003 * content_generation)
    url = f"https://site{page_id % 97}.example/p/{page_id}"
    lang = _LANGS[page_id % len(_LANGS)]

    filler = rng.choice(_FILLER, size=FILLER_TOKENS_PER_PAGE)
    n_mentions = 1 + rng.randint(MENTIONS_PER_PAGE)
    slots = sorted(rng.choice(FILLER_TOKENS_PER_PAGE, size=n_mentions, replace=False))

    # token stream: (token, entity_or_None); mention surfaces become anchors
    toks: list[tuple[str, str | None]] = []
    mention_bounds: list[tuple[int, int, str, str]] = []  # tok-span, surface, entity
    si = 0
    for pos, tok in enumerate(filler):
        if si < n_mentions and pos == slots[si]:
            eid = _zipf_entity(rng, n_entities)
            variants = aliases_by_entity[eid]
            surface = variants[rng.randint(len(variants))]
            sig = sigs[eid]
            toks.append((sig[rng.randint(3)], None))
            start = len(toks)
            for st in surface.split(" "):
                toks.append((st, f"Concept{eid:04d}"))
            mention_bounds.append((start, len(toks), surface, f"Concept{eid:04d}"))
            toks.append((sig[rng.randint(3)], None))
            si += 1
        toks.append((tok, None))

    # assemble text + char offsets per token
    offsets = []
    pieces = []
    cur = 0
    for t, _ in toks:
        offsets.append(cur)
        pieces.append(t)
        cur += len(t) + 1
    text = " ".join(pieces)

    mentions = []
    for tok_start, tok_end, surface, entity in mention_bounds:
        begin = offsets[tok_start]
        end = offsets[tok_end - 1] + len(toks[tok_end - 1][0])
        assert text[begin:end] == surface
        mentions.append((url, begin, end, surface, entity))

    # html: escape, wrapping each mention surface in an <a>
    hparts = [
        f"<html><head><title>Page {page_id}</title>"
        "<style>body{margin:0}</style>"
        "<script>var x=1;</script></head><body>"
    ]
    covered = {(s, e) for s, e, *_ in [(a, b) for a, b, _, _ in mention_bounds]}
    ti = 0
    out = []
    while ti < len(toks):
        span = next((b for (a, b) in covered if a == ti), None)
        if span is not None:
            ent = toks[ti][1]
            seg = " ".join(t for t, _ in toks[ti:span])
            out.append(f'<a href="/wiki/{ent}">{_html.escape(seg)}</a>')
            ti = span
        else:
            out.append(_html.escape(toks[ti][0]))
            ti += 1
    hparts.append(" ".join(out))
    hparts.append("</body></html>")
    html_latest = "".join(hparts).encode("utf-8")

    base_ts = _EPOCH + timedelta(
        hours=int(page_id % 240),
        minutes=int(page_id % 53),
        days=3 * generation,
    )
    pages = []
    if generation == 0 and page_id % 20 == 7:  # ~5%: one stale earlier snapshot
        stale_text = "stale " + text
        stale_html = html_latest.replace(b"<body>", b"<body>stale ", 1)
        pages.append((url, base_ts - timedelta(days=2), stale_html, stale_text, lang))
    pages.append((url, base_ts, html_latest, text, lang))
    mention_rows = mentions if lang == "en" else []
    return pages, mention_rows


def _alias_lookup(adf: pd.DataFrame) -> dict[int, list[str]]:
    by_ent: dict[int, list[str]] = {}
    for alias, eid in zip(adf["alias"], adf["entity_id"]):
        by_ent.setdefault(int(eid), []).append(alias)
    return by_ent


# ---------------------------------------------------------------------------
# Spark-distributed generators (no driver-side loops).
# ---------------------------------------------------------------------------
_PAGES_SPARK_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
_GOLD_SPARK_SCHEMA = (
    "url string, begin int, end int, surface string, entity_gold string"
)


def gen_pages_df(
    spark,
    n_pages: int,
    parts: int | None = None,
    start: int = 0,
    generation: int = 0,
    content_generation: int | None = None,
):
    """Distributed pages generator: spark.range -> mapInPandas.

    ``start`` offsets the page-id range — page ids [start, start+n_pages)
    — so a test can generate a crawl DELTA disjoint from (and identically
    distributed to) a base corpus (plans/incremental.py).

    ``generation`` > 0 re-crawls the SAME urls with changed content and
    warc_ts advanced 3·g days (see page_record) — the retract-path
    input. ``content_generation`` decouples content from timestamp (a
    content REVERT at a newer warc_ts; see page_record)."""
    adf = alias_table()
    by_ent = _alias_lookup(adf)
    sigs = entity_signatures()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for pid in b["id"]:
                pages, _ = page_record(
                    int(pid), by_ent, sigs, generation=generation,
                    content_generation=content_generation,
                )
                rows.extend(pages)
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    rng_df = spark.range(
        start,
        start + n_pages,
        numPartitions=parts or min(max(64, n_pages // 2000), 512),
    )
    return rng_df.mapInPandas(gen, schema=_PAGES_SPARK_SCHEMA)


def gen_gold_df(
    spark,
    n_pages: int,
    parts: int | None = None,
    start: int = 0,
    generation: int = 0,
    content_generation: int | None = None,
):
    """Distributed gold-mention generator (latest en snapshot only).

    ``start``/``generation``/``content_generation`` mirror gen_pages_df,
    so a test can assemble gold for a corpus whose first K urls were
    re-crawled: gold(0..K, gen=1) ∪ gold(K..N, gen=0)."""
    adf = alias_table()
    by_ent = _alias_lookup(adf)
    sigs = entity_signatures()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for pid in b["id"]:
                _, ms = page_record(
                    int(pid), by_ent, sigs, generation=generation,
                    content_generation=content_generation,
                )
                rows.extend(ms)
            yield pd.DataFrame(
                rows, columns=["url", "begin", "end", "surface", "entity_gold"]
            )

    rng_df = spark.range(
        start,
        start + n_pages,
        numPartitions=parts or min(max(64, n_pages // 2000), 512),
    )
    return rng_df.mapInPandas(gen, schema=_GOLD_SPARK_SCHEMA)


def alias_df(spark):
    """Alias dictionary as a Spark DataFrame (broadcast-sized)."""
    from .schemas import ALIASES

    return spark.createDataFrame(alias_table(), schema=ALIASES)
