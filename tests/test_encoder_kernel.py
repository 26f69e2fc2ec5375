"""Encoder kernel bit-identity pins (VERDICT r4 #6/#7): the vectorized
encode_ctx / hash_token_ids must reproduce the original per-token loop
EXACTLY — same addition order, same floats, same truncation — on a
battery of adversarial batches (empty sides, stopwords, long contexts,
duplicate tokens, unicode)."""

import numpy as np
import pandas as pd

from entity_knowledge_in_bert_spark.operators.encoder import (
    DIM,
    PAD_ID,
    VOCAB_SIZE,
    _decay_pows,
    _stable_hash64,
    encode_ctx,
    hash_token_ids,
)


def _encode_ctx_reference(left, right, idf):
    """The original (pre-r5) per-token loop, kept verbatim as the
    bit-identity oracle."""
    memo = {}
    n = len(left)
    row_ids, slot_ids, bases, pos_flat = [], [], [], []
    max_side = 0
    for ridx, (ls, rs) in enumerate(zip(left, right)):
        ltoks = [t for t in (ls or "").split(" ") if t]
        rtoks = [t for t in (rs or "").split(" ") if t]
        for toks in (ltoks[::-1], rtoks):
            max_side = max(max_side, len(toks))
            for p, t in enumerate(toks):
                v = memo.get(t)
                if v is None:
                    w = idf.get(t, 1.0)
                    if w == 0.0:
                        v = ()
                    else:
                        h = _stable_hash64(t)
                        v = (h % DIM, w if (h >> 8) & 1 else -w)
                    memo[t] = v
                if v:
                    row_ids.append(ridx)
                    slot_ids.append(v[0])
                    bases.append(v[1])
                    pos_flat.append(p)
    out = np.zeros((n, DIM), dtype="float64")
    if row_ids:
        contrib = np.asarray(bases, dtype="float64") * _decay_pows(max_side)[
            np.asarray(pos_flat, dtype="int64")
        ]
        np.add.at(
            out,
            (np.asarray(row_ids, dtype="int64"), np.asarray(slot_ids, dtype="int64")),
            contrib,
        )
    vecs = []
    for i in range(n):
        v = out[i]
        nrm = np.linalg.norm(v)
        if nrm > 0:
            v = v / nrm
        vecs.append(v.astype("float32").tolist())
    return pd.Series(vecs)


def _hash_token_ids_reference(left, right, max_tokens):
    out = np.full((len(left), max_tokens), PAD_ID, dtype="int64")
    for i, (ls, rs) in enumerate(zip(left, right)):
        ltoks = [t for t in (ls or "").split(" ") if t]
        rtoks = [t for t in (rs or "").split(" ") if t]
        for j, t in enumerate((ltoks[::-1] + rtoks)[:max_tokens]):
            out[i, j] = 1 + _stable_hash64(t) % (VOCAB_SIZE - 1)
    return out


def _battery():
    """Adversarial (left, right) batches + an IDF with stopwords."""
    idf = {
        "the": 0.0,  # stopword
        "of": 0.0,
        "alpha": 2.5,
        "beta": 1.75,
        "gamma": 0.3,
        "überraschung": 3.125,
    }
    cases = [
        # empties / Nones / lone spaces
        (pd.Series(["", None, "  ", "alpha"]), pd.Series([None, "", "beta", "  "])),
        # stopwords-only contexts
        (pd.Series(["the of the"]), pd.Series(["of the of"])),
        # duplicates + both sides + unicode
        (
            pd.Series(["alpha beta alpha the gamma", "überraschung alpha"]),
            pd.Series(["beta beta of", "gamma überraschung the alpha"]),
        ),
        # long contexts (exceed hash_token_ids truncation)
        (
            pd.Series([" ".join(f"tok{i}" for i in range(40))] * 3),
            pd.Series([" ".join(f"tok{i}" for i in range(35, 80))] * 3),
        ),
    ]
    # a bulk pseudo-random batch (deterministic seed)
    rng = np.random.RandomState(7)
    vocab = ["alpha", "beta", "gamma", "the", "of", "delta", "x1", "x2", "y"]
    mk = lambda: " ".join(rng.choice(vocab, rng.randint(0, 12)))
    cases.append(
        (pd.Series([mk() for _ in range(200)]), pd.Series([mk() for _ in range(200)]))
    )
    return idf, cases


def test_encode_ctx_bit_identical_to_reference_loop():
    idf, cases = _battery()
    for left, right in cases:
        got = encode_ctx(left, right, idf)
        want = _encode_ctx_reference(left, right, idf)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            # float32 values compared exactly (got: ndarray, ref: list)
            assert np.array_equal(
                np.asarray(g, dtype="float32"), np.asarray(w, dtype="float32")
            )


def test_encode_ctx_memo_persistence_matches():
    """Reusing one memo across batches (the worker pattern) must not
    change values."""
    idf, cases = _battery()
    memo = {}
    for left, right in cases:
        got = encode_ctx(left, right, idf, memo=memo)
        want = _encode_ctx_reference(left, right, idf)
        for g, w in zip(got, want):
            assert np.array_equal(
                np.asarray(g, dtype="float32"), np.asarray(w, dtype="float32")
            )
    assert len(memo) > 0


def test_hash_token_ids_bit_identical_to_reference_loop():
    _idf, cases = _battery()
    memo = {}
    for left, right in cases:
        for mt in (4, 16, 64):
            got = hash_token_ids(left, right, mt, memo=memo)
            want = _hash_token_ids_reference(left, right, mt)
            assert got.dtype == np.int64 and got.shape == want.shape
            assert (got == want).all()
