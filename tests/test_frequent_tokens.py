"""d23 exact distributed heavy hitters: the two-pass plan (bounded
per-partition candidates + exact recount) must return EXACTLY the
brute-force frequent set under any partitioning — the averaging
guarantee in the d23 docstring, exercised empirically."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kblock_spark.queries import _HH_K, d23_frequent_tokens


def _write_docs(spark, tmp_path, texts, parts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _brute(texts, k):
    from collections import Counter

    c = Counter(t for x in texts for t in x.split(" "))
    n = sum(c.values())
    return {tok: cnt for tok, cnt in c.items() if cnt * k > n}


@pytest.mark.parametrize("parts", [1, 7])
def test_matches_bruteforce_on_skewed_corpus(spark, tmp_path, parts):
    """Zipf-ish corpus: the heavy tail is spread thin across docs (and
    hence partitions), exactly the regime where a naive per-partition
    top-k would drop a global heavy hitter."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(300)]
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    texts = [
        " ".join(rng.choice(vocab, size=40, p=p)) for _ in range(120)
    ]
    sf = _write_docs(spark, tmp_path, texts, parts)
    got = {r["tok"]: r["n_occ"] for r in d23_frequent_tokens(spark, sf).collect()}
    assert got == _brute(texts, _HH_K)
    assert got, "fixture should produce at least one heavy hitter"


def test_no_false_positives_near_threshold(spark, tmp_path):
    """A token exactly AT n/K (not above) must be excluded — the
    HAVING is strict on both engines."""
    # n = 64 tokens total; 'edge' appears exactly once => 1 * 64 == n,
    # strictly-greater filter excludes it; 'hot' appears 32 times.
    filler = [f"u{i}" for i in range(31)]
    text = " ".join(["hot"] * 32 + ["edge"] + filler)
    sf = _write_docs(spark, tmp_path, [text], 3)
    got = {r["tok"] for r in d23_frequent_tokens(spark, sf).collect()}
    assert got == {"hot"}


def test_d24_canonical_collapses_messy_twins(spark):
    """Every page is seen once clean and once messy (HTTP://WWW. +
    utm noise): canonicalization must collapse exactly 2:1 per host,
    and hosts must be lowercase with www. stripped."""
    from kblock_spark.queries import d24_url_canonicalize

    rows = d24_url_canonicalize(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_urls"] == 2 * r["n_pages"], r
        assert r["host"].startswith("ex") and not r["host"].startswith("www."), r
        assert r["host"] == r["host"].lower()
