"""d11 repetition filter must stay linear in document length.

The round-3 shape (transform(array_distinct, t -> size(filter(...))))
was O(n_tokens^2) per row — a 50k-token web document (routine in web
corpora) would cost ~10^9 comparisons inside a single row's Catalyst
evaluation, a straggler no partitioning can fix. The round-4 shape is
array_sort + one run-length fold: O(n log n) row-local work. This test
pins that: a 50k-token document must score in seconds, and the fold's
answer must equal a brute-force Python mode count.
"""

import random
import time

from pyspark.sql import functions as F

from kblock_spark.queries import _max_run_count


def _doc(n_tokens, vocab_size, seed):
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(vocab_size)]
    return " ".join(rng.choice(vocab) for _ in range(n_tokens))


def test_d11_long_doc_linear(spark):
    text = _doc(50_000, 40, seed=11)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = F.split("text", " ")

    t0 = time.time()
    [row] = df.select(
        _max_run_count(toks).alias("max_tok"),
        F.size(toks).alias("n"),
    ).collect()
    elapsed = time.time() - t0

    # brute-force mode count for the same text
    counts = {}
    for t in text.split(" "):
        counts[t] = counts.get(t, 0) + 1
    assert row["max_tok"] == max(counts.values())
    assert row["n"] == 50_000
    # the quadratic shape visibly stalls here (10^9+ comparisons); the
    # linear fold finishes in single-digit seconds even with job overhead
    assert elapsed < 30, f"50k-token doc took {elapsed:.1f}s — not linear"


def test_max_run_count_edges(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "a", "a", "c"]),   # mode 3
            (2, ["x"]),                        # single token
            (3, []),                           # empty -> 0
            (4, ["", "", "y"]),                # empty-string tokens count
        ],
        "id long, arr array<string>",
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", _max_run_count(F.col("arr")).alias("m")).collect()
    }
    assert got == {1: 3, 2: 1, 3: 0, 4: 2}
