"""Measure mapInPandas vs mapInArrow for the Arrow fan-out family
(round-6 VERDICT item 4): frame_sample, audio_energy_windows,
resize_media, and the all_pairs_above_blocked kernel all treat their
input as bytes/numpy immediately, so the pandas conversion layer is
pure overhead *candidate* — this probe measures whether skipping it
(Spark 4 ``mapInArrow`` / ``applyInArrow``) is actually profitable.

The sf0.1 media inputs are small (~1.7k rows per media type), where
per-query wall is fixed-cost dominated; the probe therefore times the
operators on an AMPLIFIED input (x AMP distinct doc_ids over the same
payload bytes) so the per-row kernel dominates and a 10% kernel delta
is visible above single-JVM noise.  Decision rule (per VERDICT):
convert an operator only if arrow wins by >= 10% on its amplified
median; record the numbers either way.

Usage: python tools/arrow_probe.py [SF_DIR] [--json OUT.json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.operators import spread  # noqa: E402
from alpaca_pyspark_spark.operators.multimodal import (  # noqa: E402
    audio_energy_windows,
    frame_sample,
    resize_media,
    synthesize_media,
)
from alpaca_pyspark_spark.operators.similarity import (  # noqa: E402
    all_pairs_above_blocked,
)
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.tables import load  # noqa: E402

AMP = 20  # media amplification factor (distinct doc_ids, same payloads)


# ----------------------------------------------------------- arrow twins
def frame_sample_arrow(media: DataFrame, *, every_n_bytes: int = 64) -> DataFrame:
    schema = "doc_id bigint, frame_no bigint, frame binary"

    def sample(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids, nos, frames = [], [], []
            for doc_id, content in zip(
                rb.column(0).to_pylist(), rb.column(1).to_pylist()
            ):
                for j, off in enumerate(range(0, len(content), every_n_bytes)):
                    ids.append(doc_id)
                    nos.append(j)
                    frames.append(content[off : off + every_n_bytes])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(nos, pa.int64()),
                    pa.array(frames, pa.binary()),
                ],
                names=["doc_id", "frame_no", "frame"],
            )

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "content")
        .mapInArrow(sample, schema)
    )


def audio_energy_arrow(media: DataFrame, *, window_bytes: int = 32) -> DataFrame:
    schema = (
        "doc_id bigint, window_no bigint, n_samples bigint, "
        "ssq bigint, energy_milli bigint"
    )

    def featurize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids, wins, ns, ssqs = [], [], [], []
            for doc_id, content in zip(
                rb.column(0).to_pylist(), rb.column(1).to_pylist()
            ):
                arr = np.frombuffer(content, dtype=np.uint8).astype(np.int64)
                for w, off in enumerate(range(0, len(arr), window_bytes)):
                    seg = arr[off : off + window_bytes]
                    ids.append(doc_id)
                    wins.append(w)
                    ns.append(len(seg))
                    ssqs.append(int((seg * seg).sum()))
            n = np.asarray(ns, dtype=np.int64)
            ssq = np.asarray(ssqs, dtype=np.int64)
            em = np.where(n > 0, (1000 * ssq) // np.maximum(n, 1), 0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(wins, pa.int64()),
                    pa.array(n),
                    pa.array(ssq),
                    pa.array(em),
                ],
                names=["doc_id", "window_no", "n_samples", "ssq", "energy_milli"],
            )

    return (
        spread(media.filter(F.col("media_type") == "audio").select("doc_id", "content"))
        .mapInArrow(featurize, schema)
    )


def resize_media_arrow(media: DataFrame, *, target_len: int = 16) -> DataFrame:
    schema = (
        "doc_id bigint, n_bytes bigint, out_len bigint, "
        "resized string, resample_checksum bigint"
    )

    def resize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids, nbytes, outs, sums = [], [], [], []
            for doc_id, content in zip(
                rb.column(0).to_pylist(), rb.column(1).to_pylist()
            ):
                n = len(content)
                if n == 0:
                    continue
                out = bytes(
                    content[(j * n) // target_len] for j in range(target_len)
                )
                ids.append(doc_id)
                nbytes.append(n)
                outs.append(out.decode("ascii", errors="replace"))
                sums.append(sum(out))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(nbytes, pa.int64()),
                    pa.array([target_len] * len(ids), pa.int64()),
                    pa.array(outs, pa.string()),
                    pa.array(sums, pa.int64()),
                ],
                names=["doc_id", "n_bytes", "out_len", "resized", "resample_checksum"],
            )

    return (
        spread(
            media.filter(
                (F.col("media_type") == "image") & (F.length("content") > 0)
            ).select("doc_id", "content")
        ).mapInArrow(resize, schema)
    )


def all_pairs_blocked_arrow(
    vectors: DataFrame, *, threshold: float, num_blocks: int = 8
) -> DataFrame:
    """applyInArrow twin of all_pairs_above_blocked: identical triangle
    join + sequential-order kernel; the list column reaches numpy via
    a flat buffer reshape instead of per-row object lists."""
    from alpaca_pyspark_spark.operators.similarity import (
        _seq_dot_block,
        _seq_norms,
    )

    B = int(num_blocks)
    pair_rows = [(i * B + j, i, j) for i in range(B) for j in range(i, B)]
    ss = vectors.sparkSession
    pairs = ss.createDataFrame(pair_rows, "pid int, bi int, bj int")
    v = vectors.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    ).withColumn("__blk", F.pmod(F.xxhash64(F.col("__id")), F.lit(B)).cast("int"))
    rep = v.join(
        F.broadcast(pairs),
        (F.col("__blk") == F.col("bi")) | (F.col("__blk") == F.col("bj")),
    )

    def score(tbl: pa.Table) -> pa.Table:
        out_names = ["id_a", "id_b", "cos_sim"]
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "cos_sim": pa.array([], pa.float64())}
        )
        if tbl.num_rows == 0:
            return empty
        bi = tbl.column("bi")[0].as_py()
        bj = tbl.column("bj")[0].as_py()
        blk = tbl.column("__blk").to_numpy()
        ids = tbl.column("__id").to_numpy()
        vcol = tbl.column("__v").combine_chunks()
        flat = vcol.flatten().to_numpy(zero_copy_only=False)
        M = flat.reshape(len(vcol), -1)
        if bi == bj:
            cos = _seq_dot_block(M, M)
            n = _seq_norms(M)
            cos = cos / (n[:, None] * n[None, :])
            keep = (cos >= threshold) & (ids[:, None] < ids[None, :])
            r, c = np.nonzero(keep)
            if not len(r):
                return empty
            return pa.table(
                {"id_a": ids[r], "id_b": ids[c], "cos_sim": cos[r, c]},
            ).select(out_names)
        a, b = blk == bi, blk == bj
        Ma, Mb = M[a], M[b]
        ia, ib = ids[a], ids[b]
        cos = _seq_dot_block(Ma, Mb)
        na, nb = _seq_norms(Ma), _seq_norms(Mb)
        cos = cos / (na[:, None] * nb[None, :])
        keep = cos >= threshold
        r, c = np.nonzero(keep)
        if not len(r):
            return empty
        lo = np.minimum(ia[r], ib[c])
        hi = np.maximum(ia[r], ib[c])
        return pa.table(
            {"id_a": lo, "id_b": hi, "cos_sim": cos[r, c]}
        ).select(out_names)

    return rep.groupBy("pid").applyInArrow(
        score, "id_a bigint, id_b bigint, cos_sim double"
    )


# ------------------------------------------------------------- harness
def timed(df_fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df_fn().count()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3), [round(t, 3) for t in ts]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("arrow-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    # amplified media: AMP distinct doc_ids per source row, same bytes
    amp = media.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(AMP - 1))))
    amp = amp.select(
        (F.col("doc_id") * AMP + F.col("rep")).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            ((F.col("doc_id") * AMP + F.col("rep")) % 3 + 1).cast("int"),
        ).alias("media_type"),
        "content",
    ).localCheckpoint(eager=True)

    emb = load(spark, sf_dir, "embeddings").localCheckpoint(eager=True)

    results = {"sf_dir": sf_dir, "amp": AMP, "cases": {}}
    cases = {
        "frame_sample": (
            lambda: frame_sample(amp, every_n_bytes=64),
            lambda: frame_sample_arrow(amp, every_n_bytes=64),
        ),
        "audio_energy": (
            lambda: audio_energy_windows(amp, window_bytes=32),
            lambda: audio_energy_arrow(amp, window_bytes=32),
        ),
        "resize_media": (
            lambda: resize_media(amp, target_len=16),
            lambda: resize_media_arrow(amp, target_len=16),
        ),
        "all_pairs_blocked": (
            lambda: all_pairs_above_blocked(emb, threshold=0.95),
            lambda: all_pairs_blocked_arrow(emb, threshold=0.95),
        ),
    }
    for name, (pandas_fn, arrow_fn) in cases.items():
        n_p, n_a = pandas_fn().count(), arrow_fn().count()
        assert n_p == n_a, (name, n_p, n_a)
        # warm both paths once before timing
        med_p, ts_p = timed(pandas_fn)
        med_a, ts_a = timed(arrow_fn)
        results["cases"][name] = {
            "rows": n_p,
            "pandas_median_sec": med_p,
            "arrow_median_sec": med_a,
            "pandas_times": ts_p,
            "arrow_times": ts_a,
            "arrow_speedup": round(med_p / med_a, 3) if med_a else None,
        }
        print(name, results["cases"][name], file=sys.stderr)
    print(json.dumps(results))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
