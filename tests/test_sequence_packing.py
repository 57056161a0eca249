"""d26 sequence packing + ops/partitioning.running_offset: the
exclusive global prefix sum is BIGINT-exact and partition-invariant
(no single-partition window at any size)."""

from pyspark.sql import functions as F

from kblock_spark.ops.partitioning import running_offset


def test_running_offset_matches_serial_and_partition_invariant(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    serial = {}
    acc = 0
    for i, w in rows:
        serial[i] = acc
        acc += w
    for nparts in (1, 7):
        df = spark.createDataFrame(rows, "k long, w long").repartition(nparts)
        got = {
            r["k"]: r["offset"]
            for r in running_offset(df, "w", "k").collect()
        }
        assert got == serial, nparts


def test_d26_windows_partition_invariant(spark, tmp_path):
    import pandas as pd

    from kblock_spark.queries import d26_sequence_packing

    rows = [
        {"doc_id": i, "text": " ".join(f"t{j}" for j in range((i * 13) % 40 + 1))}
        for i in range(300)
    ]
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).repartition(5).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    a = {tuple(r) for r in d26_sequence_packing(spark, str(tmp_path)).collect()}
    # serial reconstruction
    acc = 0
    wins = {}
    for r in rows:
        n = len(r["text"].split(" "))
        w = acc // 2048
        e = (acc + n - 1) // 2048
        d = wins.setdefault(w, [0, 0, 0])
        d[0] += 1
        d[1] += n
        d[2] += int(e != w)
        acc += n
    want = {(w, *v) for w, v in wins.items()}
    assert a == want
    # total token mass conserved across windows
    assert sum(v[1] for v in wins.values()) == acc
