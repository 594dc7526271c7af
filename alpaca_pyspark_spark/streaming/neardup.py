"""Streaming near-duplicate candidate detection: MinHash + banded LSH
over an unbounded document stream.

The batch pipeline (``operators/dedup.py``) finds near-dup pairs by
banded-LSH bucket joins; a crawler-style ingest wants the same signal
ONLINE — "this document collides with something we already took" —
without re-running the batch join.  The streaming shape:

1. **Stateless signature stage** (per-row, no shuffle): shingle set →
   64 MinHash members → 16 band keys, all as array expressions.  The
   batch operator computes signatures via explode + 64-way ``min()``
   agg (cheaper per doc); a stream can't re-aggregate history, so the
   per-row ``array_min(transform(...))`` form — pure column
   expressions, no state — is the right trade here.
2. **Stateful bucket stage** (``applyInPandasWithState`` keyed by
   (band, bucket)): the first document to claim a bucket becomes its
   *holder*; every later arrival emits a candidate pair
   ``(id_new, id_first)``.  State per bucket is ONE row (holder id +
   timestamp), evicted by event-time timeout once the watermark
   passes ``holder_ts + ttl`` — bounded state on an unbounded
   stream, the same contract as ``dropDuplicatesWithinWatermark``.

Candidates are *candidates*: the exact-Jaccard verify (batch
``minhash_near_duplicates``'s last stage) runs downstream on the tiny
candidate stream, exactly like the batch split.

Scale: the exchange keys on (band, bucket) — 16× the doc rate but
uniformly hash-distributed; each group's state is one row, so the
state store holds |distinct buckets within watermark| rows regardless
of stream length.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions import tokens, word_shingles

CANDIDATE_SCHEMA = StructType(
    [
        StructField("band", LongType()),
        StructField("bucket", LongType()),
        StructField("id_new", LongType()),
        StructField("id_first", LongType()),
        StructField("ts", TimestampType()),
    ]
)

_STATE = StructType(
    [
        StructField("holder_id", LongType()),
        StructField("holder_ts_us", LongType()),
    ]
)


def row_band_keys(
    text_col: str,
    *,
    shingle_k: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
):
    """Per-row band-key array (stateless twin of the batch
    signature+banding stages; identical hash family, so a streamed
    doc lands in the same buckets its batch signature would)."""
    rows_per_band = num_hashes // num_bands
    sh = F.array_distinct(word_shingles(tokens(F.lower(F.col(text_col))), shingle_k))
    hashed = F.transform(sh, lambda s: F.xxhash64(s))

    def member(i: int):
        return F.array_min(F.transform(hashed, lambda x: F.xxhash64(x, F.lit(i))))

    sigs = [member(i) for i in range(num_hashes)]
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.xxhash64(
                    *sigs[b * rows_per_band : (b + 1) * rows_per_band]
                ).alias("bucket"),
            )
            for b in range(num_bands)
        ]
    )


def streaming_lsh_candidates(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    ts: str,
    watermark_delay: str = "1 hour",
    state_ttl_ms: int = 60 * 60 * 1000,
    shingle_k: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
) -> DataFrame:
    """Online LSH collision stream: one output row per (band, bucket)
    re-hit within the watermark.  Append semantics; redeliveries of
    the holder itself emit nothing."""
    keys = row_band_keys(
        text_col,
        shingle_k=shingle_k,
        num_hashes=num_hashes,
        num_bands=num_bands,
    )
    stream = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(ts).cast("timestamp").alias("ts"),
            F.explode(keys).alias("bb"),
        )
        .select("doc_id", "ts", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .withWatermark("ts", watermark_delay)
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        holder_id, holder_ts_us = state.get if state.exists else (None, None)
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values(["ts", "doc_id"])
        out_new, out_first, out_ts = [], [], []
        for doc_id, t in zip(pdf["doc_id"], pdf["ts"]):
            t_us = t.value // 1000
            if holder_id is None:
                holder_id, holder_ts_us = int(doc_id), t_us
            elif int(doc_id) != holder_id:
                out_new.append(int(doc_id))
                out_first.append(holder_id)
                out_ts.append(t)
        state.update((holder_id, holder_ts_us))
        state.setTimeoutTimestamp(holder_ts_us // 1000 + state_ttl_ms)
        if out_new:
            yield pd.DataFrame(
                {
                    "band": [key[0]] * len(out_new),
                    "bucket": [key[1]] * len(out_new),
                    "id_new": out_new,
                    "id_first": out_first,
                    "ts": out_ts,
                }
            )

    return stream.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        outputStructType=CANDIDATE_SCHEMA,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
