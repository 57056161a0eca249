"""Scale-evidence for d17's skew claim: a boilerplate segment
duplicated into EVERY document (the pathological hot key) must not
degrade the plan, because the first-occurrence decision is a
groupBy(fingerprint) aggregate with map-side partial combine — the
mega-duplicate collapses to one row per mapper before the shuffle,
and the keep-decision equi-join is AQE-skew-split eligible.

Run: python scripts/bench_d17_skew.py  (uses sf0.1 documents; prints
one JSON line with clean vs skewed timings and the dup count)."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from kblock_spark.queries import d17_segment_dedup  # noqa: E402
from kblock_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOILER = "xqzzy wvmmp kjjhg"  # 3-token segment absent from the corpus


def main():
    spark = get_spark("d17-skew")
    import tempfile

    base = tempfile.mkdtemp(prefix="kblock_d17skew_")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    # clean copy and a copy with the boilerplate segment PREPENDED to
    # every document (so it aligns to segment boundary 0)
    docs.select("doc_id", "text").write.mode("overwrite").parquet(
        f"{base}/clean/documents.parquet"
    )
    docs.select(
        "doc_id", F.concat(F.lit(BOILER + " "), F.col("text")).alias("text")
    ).write.mode("overwrite").parquet(f"{base}/skew/documents.parquet")

    def run(tag):
        t0 = time.time()
        out = d17_segment_dedup(spark, f"{base}/{tag}")
        agg = out.agg(
            F.sum("n_segments").alias("segs"), F.sum("n_kept").alias("kept")
        ).collect()[0]
        return time.time() - t0, int(agg["segs"]), int(agg["kept"])

    # warm-up then interleave
    run("clean")
    tc1, segs_c, kept_c = run("clean")
    ts1, segs_s, kept_s = run("skew")
    tc2, _, _ = run("clean")
    ts2, _, _ = run("skew")

    # the boilerplate adds exactly one segment per doc; exactly ONE
    # copy survives corpus-wide
    assert segs_s == segs_c + n_docs, (segs_s, segs_c, n_docs)
    assert kept_s == kept_c + 1, (kept_s, kept_c)

    print(
        json.dumps(
            {
                "what": "d17 boilerplate-skew A/B (one segment duplicated into every doc)",
                "sf_dir": SF,
                "n_docs": n_docs,
                "hot_segment_copies": n_docs,
                "clean_sec": [round(tc1, 3), round(tc2, 3)],
                "skew_sec": [round(ts1, 3), round(ts2, 3)],
                "clean_segments": segs_c,
                "skew_segments": segs_s,
                "kept_delta": kept_s - kept_c,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
