"""Independent-direction synthetic embedding replicas (timing only).

The chained sf100 replica (tools/make_sf1.py) perturbs embeddings by
scaling component 0 by at most 1+r/1000 — fine for cosine-TOP-K
families, but DEGENERATE for near-duplicate semantics at a 0.5
threshold: at sf100 every original vector has ~100 near-identical
copies (cosine ~1), so the candidate graph's within-cluster pairs grow
QUADRATICALLY in replica count — q206's sf100 run filled 70 GB of
shuffle spill and died, measuring the replica's pathology, not the
dial.  A real corpus 10x bigger does not contain 100 copies of every
document.

This tool keeps each scale's vec_id set (so the documents join stays
intact via symlink) and REPLACES the embedding column with a
deterministic independent direction per vec_id (numpy PCG seeded by
vec_id, float32-widened like the driver data) — natural bucket
occupancy, the regime the lsh_planes_dial claim is about.  TIMING
DATASET ONLY: never oracle-gate it (ids no longer correlate with
document text).

Usage: python tools/make_embed_synth.py --src .scratch/sf10 --dest .scratch/sf10_synth
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

from alpaca_pyspark_spark.session import get_spark

DIM = 64


def _synth(batches):
    for pdf in batches:
        out = []
        for vid in pdf["vec_id"]:
            rng = np.random.default_rng(int(vid))
            v = rng.standard_normal(DIM).astype(np.float32)
            out.append(v)
        yield pd.DataFrame({"vec_id": pdf["vec_id"], "embedding": out})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dest", required=True)
    args = ap.parse_args()
    spark = get_spark("make-embed-synth")
    spark.sparkContext.setLogLevel("ERROR")
    src, dest = Path(args.src).resolve(), Path(args.dest).resolve()
    dest.mkdir(parents=True, exist_ok=True)
    emb = spark.read.parquet(str(src / "embeddings.parquet")).select("vec_id")
    out = emb.mapInPandas(_synth, "vec_id long, embedding array<float>")
    out.write.mode("overwrite").parquet(str(dest / "embeddings.parquet"))
    # q206 needs the documents join; other tables untouched -> symlink
    for t in ("documents", "nation", "region"):
        link = dest / f"{t}.parquet"
        target = src / f"{t}.parquet"
        if target.exists() and not link.exists():
            os.symlink(target, link)
    n = spark.read.parquet(str(dest / "embeddings.parquet")).count()
    print(f"{dest}: {n} synthetic embeddings")


if __name__ == "__main__":
    main()
