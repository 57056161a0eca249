"""Mergeable HyperLogLog-style distinct-count sketch, pure Catalyst.

At 10^12 documents an exact ``COUNT(DISTINCT token)`` per group is a
full shuffle of every token occurrence; the HLL sketch reduces each
partition to ``m`` small integer registers that combine with ``MAX``
— the classic mergeable-summary contract (Flajolet et al., HyperLogLog,
AofA 2007): sketch(A ∪ B) == merge(sketch(A), sketch(B)), so partial
aggregation happens map-side and the shuffle carries at most
``groups × m`` rows regardless of data volume. The same property makes
the registers a *persistable* incremental state: store them per
partition/day, merge at query time.

Everything is integer-exact and engine-portable by construction, so
the sketch is verifiable against a SQL oracle bit-for-bit:

- the hash is the repo-wide 48-bit md5-prefix BIGINT
  (``('0x'||substr(md5(x),1,12))::BIGINT`` in DuckDB,
  ``conv(substring(md5(x),1,12),16,10)`` in Spark);
- ``rho`` (leading-zero rank) uses ``length(bin(w))`` — both engines
  print minimal-width binary — never floating log2;
- the harmonic-mean denominator is kept SCALED BY ``2^(wbits+1)`` as a
  BIGINT (``z_scaled = Σ 2^(wbits+1-rho)``, empty registers contribute
  ``2^(wbits+1)``), bounded by ``m·2^(wbits+1) < 2^53`` — an
  order-independent integer sum, immune to float association;
- only the final estimate performs ONE double division + round.

Reference parity note: the reference (mansueto-institute/kblock) has
no sketching layer — this is a beyond-reference operator for the
training-data pipeline tier (cardinality of tokens/urls/fingerprints
per shard without a global distinct shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BITS = 48  # width of the md5-prefix hash


def _hash48(col) -> F.Column:
    """48-bit positive BIGINT hash, identical to DuckDB
    ``('0x'||substr(md5(x),1,12))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("bigint")


def _alpha(m: int) -> float:
    """Flajolet bias-correction constant."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, group_cols: list[str], value, p: int = 6
) -> DataFrame:
    """Build per-group HLL registers over a string ``value`` column →
    ``group_cols + (bucket, rho)`` with at most ``m = 2**p`` rows per
    group.

    ``bucket`` = low ``p`` hash bits; ``rho`` = position of the first
    set bit in the remaining ``wbits = 48 - p`` bits (1-based;
    all-zero word → ``wbits + 1``). The groupBy aggregates MAX(rho)
    map-side before the shuffle — at scale the exchange carries
    ``≤ groups × m`` rows, not token occurrences.

    The default ``p=6`` (m=64 registers, ~13% relative error) is
    chosen for the ORACLE design: the registers themselves are
    compared bit-exactly against SQL, so the estimate's variance is
    irrelevant to correctness. A production deployment sizing for
    estimate ACCURACY would raise ``p`` to 12-14 (m=4096-16384,
    1-2% error) — the algebra, shuffle shape and merge theorem are
    unchanged, only the per-group register count grows.
    """
    m = 1 << p
    wbits = HASH_BITS - p
    hdf = df.select(*group_cols, _hash48(value).alias("__h"))
    w = F.expr(f"__h DIV {m}")
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        hdf.select(
            *group_cols, (F.col("__h") % m).alias("bucket"), rho.alias("rho")
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union two register sets — MAX per (group, bucket). The
    algebraic merge: associative, commutative, idempotent."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Registers → per-group ``(n_buckets, z_scaled, est_e6)``.

    ``z_scaled = Σ_j 2^(wbits+1-rho_j)`` over all ``m`` registers
    (empty register: rho = 0 → ``2^(wbits+1)``) — an exact BIGINT.
    The raw HLL estimator ``alpha·m²/Z`` with ``Z = z_scaled /
    2^(wbits+1)`` collapses to ONE double division by ``z_scaled``:
    ``est = C / z_scaled`` with ``C = alpha·m²·2^(wbits+1)·1e6``
    precomputed as a single double — reproducible bit-for-bit in any
    IEEE engine. ``est_e6`` is the estimate scaled by 1e6 and rounded
    to BIGINT. (The small-range linear-counting correction needs
    ``ln`` whose last ulp differs across libm builds; callers wanting
    it can apply ``m·ln(m/V)`` with ``V = m - n_buckets`` on top.)
    """
    m = 1 << p
    wbits = HASH_BITS - p
    smax = wbits + 1
    est_c = _alpha(m) * m * m * float(1 << smax) * 1e6
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {smax} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum(term).cast("bigint").alias("__s"),
    )
    z = (
        F.col("__s")
        + (F.lit(m) - F.col("n_buckets")) * F.lit(1 << smax).cast("bigint")
    ).cast("bigint")
    return agg.select(
        *group_cols,
        "n_buckets",
        z.alias("z_scaled"),
        F.round(F.lit(est_c) / z.cast("double"))
        .cast("bigint")
        .alias("est_e6"),
    )


def hll_estimate_sql(
    value_expr: str, group_col: str, source_sql: str, p: int = 6
) -> str:
    """The DuckDB oracle for ``hll_registers → hll_estimate`` over
    ``SELECT {group_col}, {value_expr} FROM`` — same hash, same
    integer register math, same single-division estimator."""
    m = 1 << p
    wbits = HASH_BITS - p
    smax = wbits + 1
    est_c = _alpha(m) * m * m * float(1 << smax) * 1e6
    return f"""
WITH vals AS ({source_sql}),
h AS (
  SELECT {group_col},
         ('0x'||substr(md5({value_expr}),1,12))::BIGINT AS hv
  FROM vals
),
reg AS (
  SELECT {group_col}, hv % {m} AS bucket,
         MAX(CASE WHEN hv // {m} = 0 THEN {smax}
                  ELSE {smax} - length(bin(hv // {m})) END) AS rho
  FROM h GROUP BY 1, 2
)
SELECT {group_col},
       COUNT(*)::BIGINT AS n_buckets,
       (SUM(1::BIGINT << ({smax} - rho))::BIGINT
         + ({m} - COUNT(*)) * (1::BIGINT << {smax}))::BIGINT AS z_scaled,
       CAST(round({est_c!r} / (SUM(1::BIGINT << ({smax} - rho))::BIGINT
         + ({m} - COUNT(*)) * (1::BIGINT << {smax}))::DOUBLE) AS BIGINT)
         AS est_e6
FROM reg GROUP BY 1
"""
