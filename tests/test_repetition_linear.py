"""d11 repetition filter must stay linear in document length.

The round-3 shape (transform(array_distinct, t -> size(filter(...))))
was O(n_tokens^2) per row — a 50k-token web document (routine in web
corpora) would cost ~10^9 comparisons inside a single row's Catalyst
evaluation, a straggler no partitioning can fix. The round-4 shape
explodes tokens+bigrams into kind-tagged unit rows and counts them in
ONE hash aggregation (map-side combine): O(total tokens). This test
pins that on the REAL query path: a temp documents.parquet with a
50k-token doc plus edge cases must score in seconds and match a
brute-force Python mode count.
"""

import random
import time

from kblock_spark.queries import d11_repetition_filter


def _doc(n_tokens, vocab_size, seed):
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(vocab_size)]
    return " ".join(rng.choice(vocab) for _ in range(n_tokens))


def _brute(text):
    toks = text.split(" ")
    n = len(toks)
    tc = {}
    for t in toks:
        tc[t] = tc.get(t, 0) + 1
    bigs = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
    bc = {}
    for b in bigs:
        bc[b] = bc.get(b, 0) + 1
    top_tok = max(tc.values()) / n
    top_big = (max(bc.values()) / len(bigs)) if bigs else 0.0
    return n, top_tok, top_big


def test_d11_long_doc_linear(spark, tmp_path):
    docs = [
        (1, _doc(50_000, 40, seed=11)),   # the straggler case
        (2, "hello world hello"),
        (3, ""),                           # split("") -> [""], n=1
        (4, "solo"),
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{path}/documents.parquet"
    )

    t0 = time.time()
    got = {
        r["doc_id"]: (r["n_tokens"], r["top_token_frac"], r["top_bigram_frac"])
        for r in d11_repetition_filter(spark, path).collect()
    }
    elapsed = time.time() - t0

    for doc_id, text in docs:
        n, tt, tb = _brute(text)
        gn, gt, gb = got[doc_id]
        assert gn == n, doc_id
        assert abs(gt - tt) < 1e-12, doc_id
        assert abs(gb - tb) < 1e-12, doc_id
    # the quadratic shape visibly stalls here (10^9+ comparisons); the
    # linear shape finishes in single-digit seconds even with job
    # overhead
    assert elapsed < 30, f"50k-token doc took {elapsed:.1f}s — not linear"
