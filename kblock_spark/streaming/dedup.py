"""Stream-side exact deduplication (beyond-reference §2.9 + the d04
exact-dedup semantics composed into Structured Streaming).

A growing crawl table needs its dedup IN the stream — re-running the
batch dedup over 10¹² accumulated rows per drop is the anti-pattern.
Two state disciplines, matching the two real deployment regimes:

- :func:`stream_dedup_within_watermark` — built-in
  ``dropDuplicatesWithinWatermark``: duplicates arrive close together
  (re-crawls inside a drop window); state per fingerprint is DROPPED
  once the watermark passes it, so the state store is bounded by the
  lateness budget. The 100 TB default.
- :func:`stream_dedup_stateful` — ``applyInPandasWithState``
  seen-fingerprint registry: exact dedup across ANY distance in the
  stream (state never expires; size = #distinct fingerprints, keyed
  and partitioned by fingerprint in the state store, never on the
  driver). The regime where a duplicate may arrive months later and
  the state budget allows a registry.

Both emit only FIRST-SEEN rows; the kept set is proven batch-parity
in tests (kept fingerprints == batch-distinct fingerprints; the
stateful flavor keeps the min doc_id per fingerprint inside a drop,
the same row the batch oracle ``GROUP BY fp → min(doc_id)`` keeps).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint (xxhash64 — the same family the
    batch d04 exact-dedup groups on)."""
    return df.withColumn("fp", F.xxhash64(F.col(text_col)))


def stream_dedup_within_watermark(
    docs: DataFrame,
    ts_col: str = "warc_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """First row per fingerprint within the watermark horizon; state
    bounded by the lateness budget (duplicates farther apart than the
    watermark are NOT collapsed — that regime is
    :func:`stream_dedup_stateful`)."""
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


_DEDUP_STATE = "seen boolean"
_DEDUP_OUTPUT = "fp long, doc_id long, n_dups long"


def _keep_first(key, pdfs, state: GroupState):
    seen = state.get[0] if state.exists else False
    best = None
    n = 0
    for pdf in pdfs:
        n += len(pdf)
        m = pdf["doc_id"].min()
        best = m if best is None else min(best, m)
    if not seen and n:
        # deterministic keeper inside the drop: min doc_id — the same
        # row the batch oracle (GROUP BY fp → min(doc_id)) keeps
        yield pd.DataFrame(
            {"fp": [key[0]], "doc_id": [int(best)], "n_dups": [n - 1]}
        )
    state.update((True,))


def _parse_payload_ddl(payload: str) -> StructType:
    """Parse a payload column DDL with the real DDL parser — a naive
    ``payload.split(',')`` mis-splits any comma-bearing type
    (``decimal(10,2)``, ``map<string,long>``, ``struct<...>``) and
    silently produces wrong column names."""
    return StructType.fromDDL(payload)


def stream_dedup_keep_row(docs: DataFrame, payload: str) -> DataFrame:
    """Seen-fingerprint registry dedup that keeps the WHOLE winning
    row, not just its id: emits (fp, doc_id, *payload columns) of the
    min-doc_id row per fingerprint, once per fingerprint ever. The
    building block for streamed pipeline composition (s09): the
    payload carries whatever downstream stages need (lang, token
    count, split label), so the keeper row flows on without a join
    back to the corpus. ``payload`` is the DDL of the carried columns,
    e.g. ``"lang string, n_toks long, split string"``; input must
    contain ``fp``, ``doc_id`` and every payload column. Same state
    discipline as :func:`stream_dedup_stateful` (one boolean per
    fingerprint, keyed in the state store)."""
    payload_schema = _parse_payload_ddl(payload)
    cols = [f.name for f in payload_schema.fields]
    out_schema = StructType(
        [
            StructField("fp", StringType()),
            StructField("doc_id", LongType()),
            *payload_schema.fields,
        ]
    )

    def keep_first_row(key, pdfs, state: GroupState):
        seen = state.get[0] if state.exists else False
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            row = pdf.loc[pdf["doc_id"].idxmin()]
            if best is None or row["doc_id"] < best["doc_id"]:
                best = row
        if not seen and best is not None:
            yield pd.DataFrame(
                {
                    "fp": [key[0]],
                    "doc_id": [int(best["doc_id"])],
                    **{c: [best[c]] for c in cols},
                }
            )
        state.update((True,))

    return (
        docs.select("fp", "doc_id", *cols)
        .groupBy("fp")
        .applyInPandasWithState(
            keep_first_row,
            outputStructType=out_schema,
            stateStructType=_DEDUP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_stateful(docs: DataFrame) -> DataFrame:
    """Seen-fingerprint registry dedup: emits (fp, kept doc_id, #dups
    suppressed in the emitting batch) once per fingerprint, ever.
    Input must carry ``fp`` and ``doc_id``; output mode 'update'.

    ``n_dups`` counts only duplicates that ARRIVED IN THE EMITTING
    micro-batch (the seen-flag state carries no counter, so later
    batches' duplicates are suppressed silently). A lifetime
    duplicate count needs a counting state — ``seen boolean`` →
    ``n long`` and an update-mode re-emit per batch — which trades
    one state row per fingerprint forever; this op deliberately
    keeps the cheaper flag."""
    return (
        docs.select("fp", "doc_id")
        .groupBy("fp")
        .applyInPandasWithState(
            _keep_first,
            outputStructType=_DEDUP_OUTPUT,
            stateStructType=_DEDUP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
