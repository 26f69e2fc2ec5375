"""E3 — frozen mention encoder behind a stable interface (SURVEY.md §2.8).

Reference analog: ``model.py::Net.forward`` — frozen BERT hidden state per
mention [P]. The production path is Arrow-vectorized ONNX inference inside
an iterator pandas UDF (one session load per executor); onnxruntime is
absent in this sandbox (SURVEY.md §7), so the default implementation is a
**deterministic IDF-weighted signed-feature-hash encoder**: same output
shape (``array<float>``, unit L2 norm), pure numpy, fully deterministic —
so the determinism (t6) and cluster-parity (t4) gates are meaningful.

The encoder embeds the mention *context* (surface masked out), mirroring
how the reference disambiguates an ambiguous surface by its sentence
context rather than by the surface string itself [P].
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DIM = 64
_ENCODER_VERSION = "hashed-idf-v0"  # frozen; bump deliberately


def _stable_hash64(token: str) -> int:
    """Process-independent 64-bit hash (no PYTHONHASHSEED dependence)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big"
    )


def _token_matrix(tokens: list[str]) -> np.ndarray:
    """Signed feature-hash vectors for a token list, shape (len, DIM)."""
    out = np.zeros((len(tokens), DIM), dtype="float64")
    for i, t in enumerate(tokens):
        h = _stable_hash64(t)
        out[i, h % DIM] = 1.0 if (h >> 8) & 1 else -1.0
    return out


# Tokens in more than this fraction of documents carry no entity signal
# (stopword floor — the SIF-style common-component removal, done cheaply).
STOPWORD_DF_FRACTION = 0.3

# Positional decay: a context token at distance d (in tokens) from the
# mention boundary is weighted DECAY**(d-1). Adjacent context dominates —
# the cheap analog of BERT's attention locality, and the defense against
# neighbor-mention context leakage on dense pages.
DECAY = 0.55


def encode_ctx(left: pd.Series, right: pd.Series, idf: dict[str, float]) -> pd.Series:
    """numpy kernel: (left ctx, right ctx) -> Series[list[float32]].

    idf weights of 0.0 mark stopwords (ubiquitous tokens) — dropped so the
    context vector carries only discriminative tokens; without this the
    shared common component dominates every cosine and ambiguous surfaces
    can't be separated.
    """
    vecs = []
    default_idf = 1.0
    for ls, rs in zip(left, right):
        v = np.zeros(DIM, dtype="float64")
        ltoks = [t for t in (ls or "").split(" ") if t]
        rtoks = [t for t in (rs or "").split(" ") if t]
        for toks in (reversed(ltoks), rtoks):
            w_pos = 1.0
            for t in toks:
                w = idf.get(t, default_idf)
                if w != 0.0:
                    h = _stable_hash64(t)
                    wd = w * w_pos
                    v[h % DIM] += wd if (h >> 8) & 1 else -wd
                w_pos *= DECAY
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        vecs.append(v.astype("float32").tolist())
    return pd.Series(vecs)


def make_encoder_udf(idf):
    """Iterator pandas UDF: loads the 'model' (here: the IDF table) once
    per Python worker, then streams Arrow batches — the same shape the
    ONNX path uses (one session per executor, SURVEY.md §4 X7).

    ``idf`` is either a plain dict (tests, tiny corpora) or a
    ``pyspark.Broadcast`` of one — the pipeline broadcasts so the table
    ships once per executor instead of being pickled into every task's
    UDF closure.
    """

    @pandas_udf(ArrayType(FloatType()))
    def embed(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        # per-worker init happens here (ONNX: ort.InferenceSession(...))
        table = idf.value if hasattr(idf, "value") else idf
        for left, right in it:
            yield encode_ctx(left, right, table)

    return embed


def compute_idf(
    spark,
    texts_df,
    text_col: str = "text",
    sample_mod: int = 10,
    min_df: int = 2,
    max_vocab: int = 65_536,
) -> dict[str, float]:
    """Relational document-frequency aggregation -> bounded IDF dict.

    Document frequencies are estimated on a DETERMINISTIC 1/sample_mod
    hash-sample of documents (pmod(xxhash64(text), m) == 0 — stable under
    any partitioning or cluster size, unlike rdd-sampling). IDF only
    separates stopwords from signal here, so a 10% sample is statistically
    identical and cuts the corpus-wide token aggregation 10x.

    The returned vocabulary is BOUNDED independent of corpus size — it is
    broadcast into the encoder UDF, so an unbounded collect here is a
    driver OOM on a web-scale corpus (the distinct-token table is billions
    of rows at 100 TB):

    - signal tokens need ``df >= min_df`` (hapaxes fall back to the
      encoder's default weight 1.0 — on the sampled path most of them
      never reached the dict anyway) and only the top ``max_vocab`` by
      document frequency are kept (TakeOrderedAndProject — the executors
      do the truncation, the driver only ever sees max_vocab rows);
    - stopwords (df above the STOPWORD_DF_FRACTION share) are always kept
      with weight 0.0; that set is structurally tiny (at most
      avg_distinct_tokens_per_doc / fraction entries).
    """
    from pyspark.sql import functions as F

    sampled = texts_df.filter(
        F.pmod(F.xxhash64(F.col(text_col)), F.lit(sample_mod)) == 0
    )
    n_docs = sampled.count()
    if n_docs < 100:  # tiny corpora: use everything, keep hapax IDF signal
        sampled = texts_df
        n_docs = texts_df.count()
        min_df = 1
    df_tok = (
        sampled.select(
            F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .persist()  # stopword + signal actions share ONE token aggregation
    )
    try:
        stop_floor = STOPWORD_DF_FRACTION * n_docs
        signal = (
            df_tok.filter((F.col("df") >= min_df) & (F.col("df") <= stop_floor))
            .orderBy(F.desc("df"), F.asc("tok"))  # deterministic truncation
            .limit(max_vocab)
        )
        stop = df_tok.filter(F.col("df") > stop_floor)
        out = {r["tok"]: 0.0 for r in stop.collect()}  # stopword: dropped
        for r in signal.collect():
            out[r["tok"]] = float(np.log((n_docs + 1) / (r["df"] + 1)) + 1.0)
    finally:
        df_tok.unpersist()
    return out
