"""Regenerate PLANS.md: formatted physical plans of the flagship
operators, the direct evidence that the declarative plans get the
Catalyst treatment the architecture claims (pushdown, pruning,
broadcasts, no accidental cartesians).

Run: python scripts/dump_plans.py  (writes PLANS.md at the repo root)
"""

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kblock_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

SECTIONS = [
    (
        "q01 — filtered groupBy aggregation",
        "PushedFilters + ReadSchema show the shipdate predicate and "
        "column pruning reaching the parquet scan.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).q01_pricing_summary(s, SF),
    ),
    (
        "q04 — star join",
        "Three BroadcastHashJoins: every dimension broadcast, the fact "
        "table never shuffles for the joins.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).q04_revenue_by_nation(s, SF),
    ),
    (
        "PIP join (broadcast mode)",
        "Slim cell→polygon broadcast equi-join + mapInPandas refine; "
        "candidate rows carry no geometry (it ships once per worker "
        "via a python broadcast).",
        None,  # built below
    ),
    (
        "compute_k (pack + balanced placement + kernel)",
        "One packing shuffle keyed by block_id, the Murmur3-token "
        "repartition realizing cost-balanced placement, then the "
        "mapInPandas kernel.",
        None,
    ),
    (
        "e02 — exact blocked near-dup join",
        "Projection-bucket equi-join (no CartesianProduct / "
        "BroadcastNestedLoopJoin) + exact rerank.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).e02_embedding_dup_pairs(s, SF),
    ),
    (
        "q22 — two-pass weighted bucketing",
        "No SinglePartition exchange: the cumsum window is partitioned "
        "by deterministic range ids.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).q22_weighted_buckets(s, SF),
    ),
    (
        "d17 — corpus-level exact segment dedup",
        "First-occurrence keep is pure HashAggregate (the packed "
        "BIGINT min) with map-side partial combine, then a broadcast/"
        "shuffle equi-join on the 48-bit fingerprint — no Sort nodes, "
        "no window over raw text.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d17_segment_dedup(s, SF),
    ),
    (
        "d18 — corpus-statistics token rarity",
        "Two map-side-combining aggregates build the df table; the "
        "occurrence join broadcasts only because the vocab is actually "
        "small here (plain equi-join at scale).",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d18_token_rarity(s, SF),
    ),
    (
        "e08 — semantic benchmark decontamination",
        "NO Exchange anywhere: the benchmark matrix ships as a python "
        "broadcast and the corpus maps through one Arrow GEMM pass.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).e08_semantic_decontamination(s, SF),
    ),
    (
        "geo_tile_rollup — multi-resolution tile rollup",
        "Exactly two Exchanges: points are aggregated once at the "
        "finest level (map-side partial combine), then Generate "
        "(explode) fans the aggregated cells out to the coarser "
        "levels — a union of per-level re-selects would re-scan and "
        "re-shuffle the point set once per level.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).geo_tile_rollup(s, SF),
    ),
    (
        "q32 — Bloom runtime-prefilter semi-join",
        "The k xxhash64 probes against the literal word array sit in "
        "the lineitem scan stage's Filter (inside WholeStageCodegen, "
        "before the exchange) — probe rows that cannot match never "
        "shuffle; the exact BroadcastHashJoin LeftSemi then removes "
        "false positives.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).q32_bloom_prefilter_join(s, SF),
    ),
    (
        "geo_compact — hierarchical cell compaction",
        "Each of the four level steps is a small HashAggregate plus a "
        "BroadcastHashJoin LeftAnti — no wide shuffle ever touches "
        "more than the current cell set.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).geo_compact(s, SF),
    ),
    (
        "d21 — cross-corpus boilerplate removal",
        "Document frequency is a distinct-then-count pair of "
        "HashAggregates (map-side combine on both); the keep-decision "
        "is one equi-join on the 48-bit fingerprint and the "
        "reconstruction re-aggregates by doc_id — raw text never "
        "shuffles by content.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d21_boilerplate_removal(s, SF),
    ),
    (
        "d22 — composed corpus pipeline (one scan)",
        "Quality gate → exact dedup → split → rollup as ONE DAG: the "
        "n_chars predicate is a PushedFilter in the single corpus "
        "scan, the keeper decision is one equi-join on (fp, doc_id), "
        "and nothing re-materializes between stages.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d22_corpus_pipeline(s, SF),
    ),
    (
        "d24 — URL canonicalization",
        "Pure Catalyst string/regex expressions inside one "
        "WholeStageCodegen span; the only exchange is the final "
        "per-host aggregate (map-side partial combine first).",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d24_url_canonicalize(s, SF),
    ),
    (
        "d23 — exact heavy hitters (candidates + recount)",
        "Stage 1 is an Exchange-free mapInPandas emitting <K "
        "candidates per partition; the recount is a BroadcastHashJoin "
        "semi against that bounded set plus one hash aggregate — the "
        "full token histogram never materializes anywhere.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d23_frequent_tokens(s, SF),
    ),
    (
        "d26 — training-window sequence packing",
        "The global token offset is the two-pass prefix sum: one "
        "map-side-combining aggregate for per-range partials "
        "(collected, <= #partitions rows), then per-range local "
        "windows — NO single-partition Window/Exchange anywhere in "
        "the plan.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d26_sequence_packing(s, SF),
    ),
    (
        "d25 — fuzzy-dedup corpus pipeline",
        "d22's stages plus MinHash-LSH + connected components: the "
        "LSH candidate join is band-bucket-keyed (SortMergeJoin on "
        "(band, minhash)), the CC loser set is applied as one "
        "broadcast LeftAnti — no O(N^2) join anywhere; the exact-kept "
        "subtree sits behind a localCheckpoint boundary (Scan "
        "ExistingRDD) so its scan pushdown is shown in the d22 "
        "section (the stage is shared verbatim).",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d25_fuzzy_corpus_pipeline(s, SF),
    ),
    (
        "merge-on-read scan (position deletes)",
        "The Iceberg v2 read path: data rows never shuffle — the "
        "kilobyte-scale delete file is the BROADCAST side of a "
        "LeftAnti on (_metadata.file_path, _metadata.row_index).",
        None,
    ),
    (
        "e09 — product-quantization ANN (ADC scan)",
        "The compressed-code scan is one Exchange-free mapInPandas "
        "(codebook LUTs ride a python broadcast); the only shuffle in "
        "the whole plan is the tiny candidate window "
        "(#partitions × Q × 4k rows), then the rerank joins the "
        "shortlist back with the query side broadcast.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).e09_pq_ann_topk(s, SF),
    ),
    (
        "geo_combine_oracle — the 87-column combine surface",
        "Chained per-block-key joins (every dimension side broadcast "
        "or co-keyed), the 30 bin pivots as ONE conditional "
        "aggregation with map-side combine, na flags + guarded "
        "ratios/logs as pure Catalyst projections — no UDF, no "
        "cartesian, one shuffle key end to end.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).geo_combine_oracle(s, SF),
    ),
    (
        "d27 — domain-mixing resampler",
        "The per-domain factor table rides a BroadcastHashJoin onto "
        "the corpus scan; epoch replication is a generator explode "
        "(no shuffle); the only exchange is the final per-domain "
        "rollup — resampling itself is map-side at any corpus size.",
        lambda s: __import__("kblock_spark.queries", fromlist=["x"]).d27_domain_mixing(s, SF),
    ),
]


def _fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # keep the operator tree + the scan details; trim codegen noise
    return text.strip()


def main():
    spark = get_spark("plan-dump", master="local[4]", shuffle_partitions=8)
    from kblock_spark.io.synth import synth_admin, synth_pages_spark, synth_streets
    from kblock_spark.kernels.blocks import delineate_blocks
    from kblock_spark.kernels.extract import geocoded_points
    from kblock_spark.ops.spatial_join import assign_points_to_polygons
    from kblock_spark.pipeline import compute_k

    admin = spark.createDataFrame(synth_admin(2, 2))
    streets = spark.createDataFrame(synth_streets(2, 2, 2))
    blocks = delineate_blocks(admin, streets).cache()
    blocks.count()
    pts = geocoded_points(synth_pages_spark(spark, 500)).cache()
    pts.count()
    pip = assign_points_to_polygons(
        pts, blocks, ["url", "lon", "lat"], poly_key="block_id"
    )
    kdf = compute_k(blocks, pip, streets)

    out = [
        "# PLANS — physical-plan evidence (regenerate: `python "
        "scripts/dump_plans.py`)\n",
        "Formatted Catalyst plans of the flagship operators at "
        "sf0.001/smoke inputs.\n",
    ]
    # merge-on-read scan evidence table
    import tempfile

    from pyspark.sql import functions as F

    from kblock_spark.io.tableformat import (
        append_snapshot, delete_where_mor, read_snapshot,
    )

    mor_t = tempfile.mkdtemp(prefix="plans_mor_")
    append_snapshot(
        spark.range(0, 200).select(F.col("id").alias("doc_id")), mor_t
    )
    delete_where_mor(spark, mor_t, "doc_id % 7 = 0")
    mor_df = read_snapshot(spark, mor_t)

    for (title, note, builder) in SECTIONS:
        if builder is None:
            if title.startswith("PIP"):
                df = pip
            elif title.startswith("merge-on-read"):
                df = mor_df
            else:
                df = kdf
        else:
            df = builder(spark)
        out.append(f"\n## {title}\n\n{note}\n\n```\n{_fmt(df)}\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
