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


# positional-decay table: _DECAY_POWS[d] == the sequential product
# 1.0 * DECAY * ... (d times), exactly as the historical per-token
# `w_pos *= DECAY` loop computed it (np.cumprod multiplies left-to-right,
# so every entry is bit-identical to the loop's float64 sequence).
_DECAY_POWS = np.concatenate(([1.0], np.cumprod(np.full(256, DECAY))))


def _decay_pows(n: int) -> np.ndarray:
    global _DECAY_POWS
    if len(_DECAY_POWS) < n:
        _DECAY_POWS = np.concatenate(([1.0], np.cumprod(np.full(n, DECAY))))
    return _DECAY_POWS


# memo-size bound: web vocabularies are open-ended; a miss past the cap
# just recomputes blake2b + the idf lookup.
_MEMO_MAX = 1_000_000


def _explode_side(series: pd.Series):
    """One context side -> flat (tokens, row, within-row ordinal,
    row token count), empties dropped — the pandas-native flattening of
    ``[t for t in (s or "").split(" ") if t]`` over the whole batch
    (VERDICT r4 #7: the last per-token Python loop in the hot kernel).
    ``rows`` is ascending (explode preserves row order)."""
    s = series.reset_index(drop=True).fillna("")
    ex = s.str.split(" ").explode()
    toks = ex.to_numpy()
    rows = ex.index.to_numpy().astype("int64")
    mask = toks != ""
    toks, rows = toks[mask], rows[mask]
    if len(rows) == 0:
        z = np.zeros(0, dtype="int64")
        return toks, z, z.copy(), z.copy()
    change = np.r_[True, rows[1:] != rows[:-1]]
    starts = np.flatnonzero(change)
    run_ids = np.cumsum(change) - 1
    ordinal = np.arange(len(rows), dtype="int64") - starts[run_ids]
    counts = np.diff(np.r_[starts, len(rows)])
    rowcount = counts[run_ids]
    return toks, rows, ordinal, rowcount


def _flat_ctx_tokens(left: pd.Series, right: pd.Series):
    """Both context sides flattened into the ENCODER'S iteration order —
    per row: left tokens nearest-first (reversed), then right tokens —
    as (tokens, row, within-side position). Pure numpy bookkeeping; the
    only remaining Python-level loop downstream is over DISTINCT tokens
    (memoized across Arrow batches)."""
    lt, lr, lo, lc = _explode_side(left)
    rt, rr, ro, _rc = _explode_side(right)
    toks = np.concatenate([lt, rt])
    rows = np.concatenate([lr, rr])
    # left position counts from the mention boundary: reversed order
    pos = np.concatenate([lc - 1 - lo, ro])
    sides = np.concatenate(
        [np.zeros(len(lt), dtype="int64"), np.ones(len(rt), dtype="int64")]
    )
    order = np.lexsort((pos, sides, rows))  # row, then left<right, then pos
    return toks[order], rows[order], pos[order]


def encode_ctx(
    left: pd.Series,
    right: pd.Series,
    idf: dict[str, float],
    memo: dict[str, tuple] | None = None,
) -> pd.Series:
    """Vectorized numpy kernel: (left ctx, right ctx) -> Series[list[float32]].

    idf weights of 0.0 mark stopwords (ubiquitous tokens) — dropped so the
    context vector carries only discriminative tokens; without this the
    shared common component dominates every cosine and ambiguous surfaces
    can't be separated.

    Fully vectorized (VERDICT r3 #2 + r4 #7): tokenization is
    ``str.split().explode()`` (pandas C path), token resolution runs once
    per DISTINCT batch token against ``memo`` (token -> (slot, idf*sign),
    persisted across Arrow batches by make_encoder_udf) with
    ``pd.factorize`` broadcasting codes back, and accumulation is one
    ``np.add.at`` over the flattened (row, slot) indices. Values are
    BIT-IDENTICAL to the original per-token loop (pinned by
    tests/test_encoder_kernel.py against a reference implementation):
    the lexsort reproduces the loop's reversed-left-then-right per-row
    addition order exactly (the key (row, side, pos) is unique), the
    decay table replays the loop's sequential ``w_pos *= DECAY``
    products, and ``idf*sign`` is an exact IEEE sign flip.
    """
    if memo is None:
        memo = {}
    n = len(left)
    toks, rows, pos = _flat_ctx_tokens(left, right)
    out = np.zeros((n, DIM), dtype="float64")
    if len(toks):
        codes, uniq = pd.factorize(toks)
        slot_u = np.empty(len(uniq), dtype="int64")
        base_u = np.zeros(len(uniq), dtype="float64")
        for i, t in enumerate(uniq):  # distinct tokens only, memoized
            v = memo.get(t)
            if v is None:
                w = idf.get(t, 1.0)
                if w == 0.0:
                    v = ()  # stopword: contributes nothing
                else:
                    h = _stable_hash64(t)
                    v = (h % DIM, w if (h >> 8) & 1 else -w)
                if len(memo) < _MEMO_MAX:
                    memo[t] = v
            if v:
                slot_u[i], base_u[i] = v
            else:
                slot_u[i] = -1
        slots = slot_u[codes]
        keep = slots >= 0
        if keep.any():
            contrib = base_u[codes][keep] * _decay_pows(int(pos.max()) + 1)[
                pos[keep]
            ]
            np.add.at(out, (rows[keep], slots[keep]), contrib)
    # batched BLAS norms: np.matmul over (n,1,D)x(n,D,1) is BIT-EQUAL to
    # the historical per-row np.linalg.norm (both reduce via BLAS dot in
    # the same order; pinned in test_encoder_kernel) and removes the last
    # per-row Python loop. Division/cast are elementwise — order-free.
    nrm = np.sqrt(np.matmul(out[:, None, :], out[:, :, None]))[:, 0, 0]
    normalized = (out / np.where(nrm == 0.0, 1.0, nrm)[:, None]).astype("float32")
    return pd.Series(list(normalized))


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
        # per-worker init happens here (ONNX: ort.InferenceSession(...));
        # the token memo persists across Arrow batches, so blake2b + idf
        # resolution runs once per distinct token per worker
        table = idf.value if hasattr(idf, "value") else idf
        memo: dict[str, tuple] = {}
        for left, right in it:
            yield encode_ctx(left, right, table, memo=memo)

    return embed


VOCAB_SIZE = 30522  # BERT-base WordPiece vocab size; frozen with the model
PAD_ID = 0


def hash_token_ids(
    left: pd.Series,
    right: pd.Series,
    max_tokens: int = 64,
    memo: dict[str, int] | None = None,
) -> np.ndarray:
    """Arrow batch -> (batch, max_tokens) int64 input_ids for the ONNX
    encoder: nearest-context-first (reversed left then right, exactly the
    locality order encode_ctx weights by), hashed into a fixed vocab,
    PAD-padded/truncated. A real deployment swaps this for the model's
    WordPiece tokenizer; the SHAPE (dense int64 batch, fixed seq len) is
    what the inference session consumes either way.

    Vectorized like encode_ctx (VERDICT r4 #6 — this is the production
    branch's advertised cost profile): pandas-native flattening, blake2b
    once per DISTINCT batch token (``memo``: token -> id, persisted
    across Arrow batches by make_onnx_encoder_udf), one fancy-indexed
    assignment per batch."""
    if memo is None:
        memo = {}
    n = len(left)
    out = np.full((n, max_tokens), PAD_ID, dtype="int64")
    toks, rows, _pos = _flat_ctx_tokens(left, right)
    if not len(toks):
        return out
    # within-row ordinal over the COMBINED (reversed-left + right) order
    change = np.r_[True, rows[1:] != rows[:-1]]
    starts = np.flatnonzero(change)
    j = np.arange(len(rows), dtype="int64") - starts[np.cumsum(change) - 1]
    keep = j < max_tokens
    codes, uniq = pd.factorize(toks[keep])
    id_u = np.empty(len(uniq), dtype="int64")
    for i, t in enumerate(uniq):  # distinct tokens only, memoized
        v = memo.get(t)
        if v is None:
            # 1 + to keep PAD_ID reserved
            v = 1 + _stable_hash64(t) % (VOCAB_SIZE - 1)
            if len(memo) < _MEMO_MAX:
                memo[t] = v
        id_u[i] = v
    out[rows[keep], j[keep]] = id_u[codes]
    return out


def make_onnx_encoder_udf(
    model_path: str,
    max_tokens: int = 64,
    providers: list[str] | None = None,
    ort_module=None,
):
    """Production encoder branch: Arrow-vectorized ONNX inference inside
    an iterator pandas UDF (SURVEY.md §4 X7) — ONE InferenceSession per
    Python worker task, created before the batch loop and reused across
    every Arrow batch of the partition; no per-row Python.

    onnxruntime is absent in this sandbox, so ``ort_module`` lets tests
    inject a fake module with the same interface
    (``InferenceSession(path, providers).run(None, {"input_ids": ids})``
    -> ``[array(batch, DIM)]``) — the session-lifecycle and batch-shape
    contract is test-gated (test_pipeline) even though the wheel isn't
    installed. Output rows are L2-normalized float32, the same contract
    as :func:`make_encoder_udf`.
    """

    @pandas_udf(ArrayType(FloatType()))
    def embed(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        mod = ort_module
        if mod is None:  # pragma: no cover — wheel absent in sandbox
            import onnxruntime as mod
        sess = mod.InferenceSession(
            model_path, providers=providers or ["CPUExecutionProvider"]
        )
        memo: dict[str, int] = {}  # token ids resolved once per worker
        for left, right in it:
            ids = hash_token_ids(left, right, max_tokens, memo=memo)
            (out,) = sess.run(None, {"input_ids": ids})
            out = np.asarray(out, dtype="float64")
            nrm = np.linalg.norm(out, axis=1, keepdims=True)
            out = out / np.where(nrm == 0.0, 1.0, nrm)
            yield pd.Series([r.astype("float32").tolist() for r in out])

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

    def _slices(base, n_docs_col, min_df_val):
        """stop ∪ signal rows over the cached token aggregation, with the
        doc count carried as a column so the floor is an expression, not
        a prior driver action."""
        stop_floor = STOPWORD_DF_FRACTION * n_docs_col
        signal = (
            base.filter((F.col("df") >= min_df_val) & (F.col("df") <= stop_floor))
            .orderBy(F.desc("df"), F.asc("tok"))  # deterministic truncation
            .limit(max_vocab)
            .withColumn("_stop", F.lit(False))
        )
        stop = base.filter(F.col("df") > stop_floor).withColumn(
            "_stop", F.lit(True)
        )
        return stop.unionByName(signal)

    def _collect(src, min_df_val):
        # ONE driver action total (r7, guide §1.2): the former
        # sampled.count() was a full second scan+hash of the text column
        # just to build the stop floor; instead the 1-row doc count is
        # broadcast-cross-joined onto the cached token aggregation so the
        # floor/limit are plan expressions and the count rides the same
        # job. stop/signal share the aggregation via persist exactly as
        # before; same dict (disjoint slices, same formulas).
        stats = src.agg(F.count("*").alias("_n"))
        df_tok = (
            src.select(
                F.explode(
                    F.array_distinct(F.split(F.col(text_col), " "))
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count("*").alias("df"))
            .persist()
        )
        try:
            both = df_tok.crossJoin(F.broadcast(stats))
            return _slices(both, F.col("_n"), min_df_val).collect()
        finally:
            df_tok.unpersist()

    rows = _collect(sampled, min_df)
    # every row carries the doc count via the cross join; an EMPTY result
    # (all-hapax corpus, or nothing sampled) hides it — only then pay the
    # explicit count the old two-action path always paid
    n_docs = int(rows[0]["_n"]) if rows else sampled.count()
    if n_docs < 100:  # tiny corpora: use everything, keep hapax IDF signal
        rows = _collect(texts_df, 1)
        n_docs = int(rows[0]["_n"]) if rows else texts_df.count()
    out: dict[str, float] = {}
    for r in rows:
        out[r["tok"]] = (
            0.0
            if r["_stop"]
            else float(np.log((n_docs + 1) / (r["df"] + 1)) + 1.0)
        )
    return out
