"""Self-check gate: the driver-shaped oracle sweep, committed as
CORRECTNESS_self_r{N}.json at every gate close (VERDICT r5 task 2 —
the record must be self-contained, not live in commit messages).

Runs every oracle-backed registry query at sf0.01 against DuckDB with
the driver's dtype-sensitive value hash (DuckDB side materialized via
pandas .df(), where HUGEINT/DECIMAL widen to float64 exactly as the
driver sees them).

Usage: python scripts/self_check.py [--out CORRECTNESS_self_r6.json] [names...]
"""

import argparse
import hashlib
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def typed(v):
    import decimal

    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if hasattr(v, "isoformat"):
        return f"t:{v.isoformat()}"
    return f"s:{v}"


def vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(typed(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args(argv)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    edf = mod.entry(spark)
    print("entry() rows:", edf.count())

    qs = mod.queries()
    sqls = mod.oracle_sql()
    out = {}
    nfail = 0
    only = set(args.names)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in sqls:
            continue
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(sqls[name])
            dcols = [d[0] for d in res.description]
            pdf = res.df()
            drows = [
                tuple(v.item() if hasattr(v, "item") else v for v in row)
                for row in pdf.itertuples(index=False, name=None)
            ]
            ok_rows = len(srows) == len(drows)
            ok_schema = sorted(scols) == sorted(dcols)
            ok_hash = (
                ok_rows and ok_schema
                and vhash(scols, srows) == vhash(dcols, drows)
            )
            out[name] = dict(
                rows=ok_rows, schema=ok_schema, hash=ok_hash, n=len(srows)
            )
            if not ok_hash:
                nfail += 1
        except Exception as ex:  # noqa: BLE001
            out[name] = dict(err=str(ex)[:200])
            nfail += 1
    print(json.dumps(out, indent=1))
    print(f"FAILED: {nfail} / {len(out)}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")
    spark.stop()
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
