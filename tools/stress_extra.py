"""Stress-only harness entries shared by stress_sf1.py and
stress_sf10.py — ONE definition so the two decades always measure the
identical pipeline (review r9: the copies could silently diverge)."""

from __future__ import annotations


def _q163_setsim_bounded(spark, sf_dir):
    """setsim_partner_profile at q163's exact parameters (3-word
    shingles, J >= 1/2) — the density-bounded PPJoin profile."""
    from alpaca_pyspark_spark.operators.dedup import setsim_partner_profile
    from alpaca_pyspark_spark.queries.llm import tune
    from alpaca_pyspark_spark.tables import load

    tune(spark)
    return setsim_partner_profile(
        load(spark, sf_dir, "documents"),
        id_col="doc_id", text_col="text", shingle_k=3,
        threshold_num=1, threshold_den=2,
    )


def _q92_cluster_reps_lsh(spark, sf_dir):
    """q92's clustering + representative rule under the LSH scale dial
    (sign-bucket candidates, num_planes=8) instead of the registered
    exact-quadratic baseline."""
    from pyspark.sql import functions as F

    from alpaca_pyspark_spark.operators.components import connected_components
    from alpaca_pyspark_spark.operators.dedup import embedding_near_duplicates
    from alpaca_pyspark_spark.queries.llm import tune
    from alpaca_pyspark_spark.tables import load

    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = embedding_near_duplicates(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.5, num_planes=8,
        dim=64,
    )
    comp = connected_components(
        pairs, emb, src="id_a", dst="id_b", vertex_id="vec_id"
    )
    return (
        comp.join(docs, comp.id == docs.doc_id)
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("__m"),
            F.max("n_chars").alias("rep_chars"),
        )
        .select(
            "component",
            "n_members",
            (-F.col("__m.neg_id")).alias("rep_doc_id"),
            "rep_chars",
        )
    )


EXTRA = {
    "q163_setsim_bounded": _q163_setsim_bounded,
    "q92_cluster_reps_lsh": _q92_cluster_reps_lsh,
}
