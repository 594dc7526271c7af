"""Property-based tests (hypothesis).

Two tiers:
- Spark-free core (url/options/timeframe/partitioning): cheap, many
  examples.
- Operator semantics vs naive Python reference implementations on
  random inputs: few examples (Spark round-trip cost), but they probe
  the tie/empty/edge cases hand-written fixtures miss.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from alpaca_pyspark_spark.sources.http import build_url
from alpaca_pyspark_spark.sources.partitioning import (
    adaptive_slice_count,
    plan_partitions,
)

# --------------------------------------------------- spark-free core

simple_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), min_size=1, max_size=12
)


@given(st.dictionaries(simple_text, st.one_of(st.none(), st.integers(), simple_text), max_size=6))
def test_build_url_never_emits_none_params(params):
    url = build_url("https://x.test/v2", "p", params)
    assert "None" not in url.split("?")[-1] or any(
        v is not None and "None" in str(v) for v in params.values()
    )
    assert url.startswith("https://x.test/v2/p")


@given(
    st.integers(min_value=1, max_value=10_000_000),  # range minutes
    st.integers(min_value=1, max_value=10_000),      # timeframe minutes
    st.integers(min_value=100, max_value=50_000),    # limit
)
def test_adaptive_slice_count_invariants(range_min, tf_min, limit):
    n = adaptive_slice_count(
        timedelta(minutes=range_min), timedelta(minutes=tf_min), limit=limit
    )
    assert n >= 1
    # each slice's expected rows stay within one page-group
    expected_rows_per_slice = (range_min / tf_min) / n
    assert expected_rows_per_slice <= limit * 5 + 1e-9


@given(
    st.lists(simple_text, min_size=1, max_size=5, unique=True),
    st.integers(min_value=0, max_value=10_000),  # range minutes
)
def test_plan_partitions_cover_range_exactly(symbols, range_min):
    start = datetime(2024, 1, 1, tzinfo=timezone.utc)
    end = start + timedelta(minutes=range_min)
    parts = plan_partitions(symbols, start, end)
    per_symbol = {}
    for p in parts:
        per_symbol.setdefault(p.symbol, []).append(p)
    assert set(per_symbol) == set(symbols)
    for plist in per_symbol.values():
        plist.sort(key=lambda p: p.start)
        assert plist[0].start == start and plist[-1].end == end
        for a, b in zip(plist, plist[1:]):
            assert a.end == b.start  # contiguous, no gaps/overlap


# ------------------------------------------- operators vs naive python

asof_events = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(min_value=0, max_value=50),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_events, asof_events)
def test_asof_join_matches_naive_python(spark, probe_rows, state_rows):
    from alpaca_pyspark_spark.operators.asof import asof_join

    # unique (key, t) per side: duplicate probe instants are fine, but
    # duplicated state instants make "the" latest state ambiguous
    state_rows = list({(k, t): (k, t, v) for k, t, v in state_rows}.values())
    probe_rows = [(k, t, i) for i, (k, t, _) in enumerate(probe_rows)]

    probe = spark.createDataFrame(probe_rows, "key string, t long, pid long")
    state = spark.createDataFrame(state_rows, "key string, t long, v double")
    got = {
        r["pid"]: r["v"]
        for r in asof_join(
            probe, state, on=["key"], probe_ts="t", state_ts="t", value_cols=["v"]
        ).collect()
    }

    for k, t, pid in probe_rows:
        candidates = [(st_, v) for kk, st_, v in state_rows if kk == k and st_ <= t]
        want = max(candidates, key=lambda x: x[0])[1] if candidates else None
        assert got[pid] == want, (k, t, pid)


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=10**6)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_sessionize_matches_naive_python(spark, rows):
    from pyspark.sql import functions as F

    from alpaca_pyspark_spark.operators.sessionize import session_summary

    df = spark.createDataFrame(rows, "uid long, sec long").select(
        "uid", F.timestamp_seconds(F.col("sec")).cast("timestamp_ntz").alias("ts")
    )
    out = {
        (r["uid"], r["session_id"]): r["n_events"]
        for r in session_summary(df, key="uid", ts="ts", gap="30 minutes").collect()
    }

    want: dict[tuple[int, int], int] = {}
    by_uid: dict[int, list[int]] = {}
    for uid, sec in rows:
        by_uid.setdefault(uid, []).append(sec)
    for uid, secs in by_uid.items():
        secs.sort()
        sid = 0
        prev = None
        for s in secs:
            if prev is None or s - prev > 1800:
                sid += 1
            want[(uid, sid)] = want.get((uid, sid), 0) + 1
            prev = s
    assert out == want


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=19),
            st.integers(min_value=0, max_value=19),
        ),
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from alpaca_pyspark_spark.operators.components import connected_components

    vertices = list(range(20))
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    # canonical label = min member id of each set
    want = {}
    for v in vertices:
        root = find(v)
        want.setdefault(root, []).append(v)
    expect = {v: min(members) for members in want.values() for v in members}

    edf = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    vdf = spark.createDataFrame([(v,) for v in vertices], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, vdf, vertex_id="id").collect()
    }
    assert got == expect


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # shard
            st.integers(min_value=0, max_value=500),  # tokens
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=300),  # budget
)
def test_pack_sequences_matches_naive(spark, rows, budget):
    from alpaca_pyspark_spark.operators.sampling import pack_sequences

    rows = [(shard, i, toks) for i, (shard, toks) in enumerate(rows)]
    df = spark.createDataFrame(rows, "shard long, seq long, toks long")
    got = {
        (r["shard"], r["seq"]): r["bin"]
        for r in pack_sequences(
            df, shard_cols=["shard"], order_col="seq", tokens_col="toks", budget=budget
        ).collect()
    }
    by_shard = {}
    for shard, seq, toks in sorted(rows, key=lambda r: (r[0], r[1])):
        prefix = by_shard.get(shard, 0)
        assert got[(shard, seq)] == prefix // budget, (shard, seq, prefix, budget)
        by_shard[shard] = prefix + toks


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=20),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7200),
            st.integers(min_value=0, max_value=3600),
        ),
        min_size=1,
        max_size=10,
    ),
    st.sampled_from([60, 600, 3600]),
)
def test_bucketed_range_join_matches_naive_random(spark, point_secs, ivals, bucket):
    from pyspark.sql import functions as F

    from alpaca_pyspark_spark.operators.rangejoin import bucketed_range_join

    points = spark.createDataFrame(
        [(i, s) for i, s in enumerate(point_secs)], "pid long, sec long"
    ).select("pid", F.timestamp_seconds(F.col("sec")).alias("ts"))
    intervals = spark.createDataFrame(
        [(j, s, s + d) for j, (s, d) in enumerate(ivals)],
        "iid long, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds(F.col("s")).alias("w_start"),
        F.timestamp_seconds(F.col("e")).alias("w_end"),
    )
    got = {
        (r["pid"], r["iid"])
        for r in bucketed_range_join(
            points, intervals, ts="ts", start="w_start", end="w_end",
            bucket_seconds=bucket,
        ).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(point_secs)
        for j, (s, d) in enumerate(ivals)
        if s <= p < s + d
    }
    assert got == want


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),                      # key
            st.one_of(st.none(), st.integers(-1000, 1000)),             # salt col
            st.integers(min_value=-10**6, max_value=10**6),             # value
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([1, 4, 32]),
)
def test_salted_aggregate_matches_plain_random(spark, rows, parts):
    from pyspark.sql import functions as F

    from alpaca_pyspark_spark.operators.salted import salted_aggregate

    df = spark.createDataFrame(rows, "k long, s long, v long")
    got = {
        r["k"]: (r["sv"], r["n"], r["mn"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            salt_on=["s", "v"],  # includes nulls and negatives
            partial_aggs={
                "psv": F.sum("v"), "pn": F.count(F.lit(1)), "pmn": F.min("v")
            },
            final_aggs={
                "sv": F.sum("psv"), "n": F.sum("pn"), "mn": F.min("pmn")
            },
            salt_parts=parts,
        ).collect()
    }
    want = {
        r["k"]: (r["sv"], r["n"], r["mn"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"), F.min("v").alias("mn"))
        .collect()
    }
    assert got == want


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(  # probe rows: (key, ts seconds)
        st.tuples(st.integers(0, 2), st.integers(0, 3600)),
        min_size=1,
        max_size=25,
    ),
    st.lists(  # state rows: (key, ts seconds, value)
        st.tuples(st.integers(0, 2), st.integers(0, 3600), st.integers(-100, 100)),
        min_size=1,
        max_size=25,
    ),
    st.sampled_from([60, 600, 3600]),  # tolerance seconds
)
def test_asof_tolerance_matches_pandas_merge_asof(spark, probes, states, tol):
    """The union+window rewrite with a staleness bound must agree with
    pandas.merge_asof(tolerance=...) — including ties (latest state at
    equal ts wins), exact-boundary staleness, and no-prior-state rows."""
    import pandas as pd

    from alpaca_pyspark_spark.operators.asof import asof_join

    base = datetime(2024, 1, 1, tzinfo=None)
    probe_pd = pd.DataFrame(
        {
            "key": [k for k, _ in probes],
            "t": [base + timedelta(seconds=s) for _, s in probes],
            "pid": range(len(probes)),
        }
    )
    state_pd = pd.DataFrame(
        {
            "key": [k for k, _, _ in states],
            "t": [base + timedelta(seconds=s) for _, s, _ in states],
            "v": [float(v) for _, _, v in states],
        }
    )
    # pandas keeps the LAST state row at an equal (key, ts) — our
    # window's (ts, side) sort does too, but only when state rows at
    # the same instant are themselves deterministically ordered; drop
    # such duplicates to keep the reference well-defined.
    state_pd = state_pd.drop_duplicates(subset=["key", "t"], keep="last")

    probe = spark.createDataFrame(probe_pd, "key long, t timestamp_ntz, pid long")
    state = spark.createDataFrame(state_pd, "key long, t timestamp_ntz, v double")
    got = {
        r["pid"]: r["v"]
        for r in asof_join(
            probe,
            state,
            on=["key"],
            probe_ts="t",
            state_ts="t",
            value_cols=["v"],
            tolerance=f"{tol} SECONDS",
        ).collect()
    }

    want_df = pd.merge_asof(
        probe_pd.sort_values(["t", "pid"]),
        state_pd.sort_values("t"),
        on="t",
        by="key",
        tolerance=pd.Timedelta(seconds=tol),
    )
    want = {
        int(r.pid): (None if pd.isna(r.v) else float(r.v))
        for r in want_df.itertuples()
    }
    assert got == want


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=5),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_bpe_train_matches_python_reference(spark, words, rounds):
    """q123's island-parity merge must equal canonical greedy-leftmost
    BPE (Sennrich'16) — including the a==b overlap case ('aaa' merges
    positions 0 and skips 1) that the string-replace shortcut gets
    wrong.  Reference implementation is 20 lines of pure Python."""
    from collections import Counter

    from alpaca_pyspark_spark.queries.search import bpe_train

    # --- pure-python canonical BPE on the same corpus
    freq = Counter(w.lower() for w in words)
    vocab = {w: list(w) for w in freq}
    want = []
    for it in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, f in freq.items():
            seq = vocab[w]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((it, l, r, c))
        for w, seq in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            vocab[w] = out

    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [
        (r["iteration"], r["merge_left"], r["merge_right"], r["pair_freq"])
        for r in bpe_train(docs, rounds=rounds).collect()
    ]
    assert sorted(got) == sorted(want)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # group
            st.integers(min_value=0, max_value=20),  # x
            st.integers(min_value=0, max_value=20),  # y
        ),
        min_size=1,
        max_size=60,
    )
)
def test_pareto_min_min_matches_quadratic_domination(spark, rows):
    from pyspark.sql import functions as F  # noqa: F401

    from alpaca_pyspark_spark.queries.analytics import pareto_min_min

    df = spark.createDataFrame(
        [(i, g, x, y) for i, (g, x, y) in enumerate(rows)],
        "rid long, g long, x long, y long",
    )
    got = {r["rid"] for r in pareto_min_min(df, group="g", x="x", y="y").collect()}
    want = set()
    for i, (g, x, y) in enumerate(rows):
        dominated = any(
            g2 == g and x2 <= x and y2 <= y and (x2 < x or y2 < y)
            for j, (g2, x2, y2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            want.add(i)
    assert got == want


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=80)
)
def test_exact_quantile_selection_matches_numpy_lower(spark, vals):
    """The floor((n-1)p)+1 selection rule == numpy's 'lower'
    interpolation on the sorted values."""
    import numpy as np
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals], "c long")
    w = W.orderBy("c")
    r = df.select(
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    out = r.groupBy().agg(
        *[
            F.max(
                F.when(
                    F.col("rn") == F.floor((F.col("n") - 1) * F.lit(p)) + 1, F.col("c")
                )
            ).alias(f"p{int(p*100)}")
            for p in (0.25, 0.5, 0.75, 0.95)
        ]
    ).collect()[0]
    for p in (0.25, 0.5, 0.75, 0.95):
        expect = int(np.percentile(np.array(vals), p * 100, method="lower"))
        assert out[f"p{int(p*100)}"] == expect, (p, vals)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), st.integers(min_value=0, max_value=3)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=8),
)
def test_stratified_quota_exact_and_partition_independent(spark, rows, nparts):
    """ceil(20%) per stratum, identical members regardless of input
    partitioning (the reproducibility property q144 sells)."""
    import math

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from alpaca_pyspark_spark.operators.dedup import portable_hash60

    df = spark.createDataFrame(rows, "doc_id long, src long").repartition(nparts)
    h = portable_hash60(F.col("doc_id").cast("string"))
    w = W.partitionBy("src").orderBy(h, F.col("doc_id"))
    wn = W.partitionBy("src")
    picked = (
        df.select(
            "doc_id",
            "src",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") <= F.ceil(F.col("n") * 0.2))
    )
    got = {(r["src"], r["doc_id"]) for r in picked.collect()}
    sizes = {}
    for _, s in rows:
        sizes[s] = sizes.get(s, 0) + 1
    per_stratum = {}
    for s, d in got:
        per_stratum[s] = per_stratum.get(s, 0) + 1
    for s, n in sizes.items():
        assert per_stratum.get(s, 0) == math.ceil(n * 0.2), (s, n, per_stratum)
    # rerun on a different partitioning -> identical member set
    df2 = spark.createDataFrame(rows, "doc_id long, src long").repartition(1)
    picked2 = (
        df2.select(
            "doc_id",
            "src",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") <= F.ceil(F.col("n") * 0.2))
    )
    assert {(r["src"], r["doc_id"]) for r in picked2.collect()} == got


# --------------------------------------- prefix-filter set-similarity
_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_docs_strategy = st.lists(
    st.lists(_word, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=14,
)


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    _docs_strategy,
    st.sampled_from([(1, 2), (1, 3), (2, 3), (3, 4), (1, 1)]),
)
def test_setsim_prefix_join_matches_brute_force(spark, texts, thresh):
    """Prefix filtering is LOSSLESS at any rational threshold: the
    candidate-pruned join must equal the naive all-pairs exact-Jaccard
    join, including tiny/empty shingle sets and threshold 1/1."""
    from alpaca_pyspark_spark.operators.dedup import setsim_prefix_join

    num, den = thresh
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter_size"], r["size_a"], r["size_b"])
        for r in setsim_prefix_join(
            df, id_col="doc_id", text_col="text", shingle_k=3,
            threshold_num=num, threshold_den=den,
        ).collect()
    }

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in rows if shingles(t)}
    want = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if den * inter >= num * union:
                want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == want


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    _docs_strategy,
    st.sampled_from([(1, 2), (1, 3), (2, 3), (3, 4), (1, 1)]),
)
def test_setsim_partner_profile_matches_pair_aggregation(spark, texts, thresh):
    """The density-bounded profile (hash-array verify, per-doc output)
    must equal the EXACT aggregation of setsim_prefix_join's lossless
    pair list: same partner count per doc, same best partner by
    (jaccard desc, id asc), exact integer inter/union — i.e. bounding
    the output density changes the physical shape, never a decision."""
    from collections import defaultdict

    from alpaca_pyspark_spark.operators.dedup import (
        setsim_partner_profile,
        setsim_prefix_join,
    )

    num, den = thresh
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(
        id_col="doc_id", text_col="text", shingle_k=3,
        threshold_num=num, threshold_den=den,
    )
    pairs = setsim_prefix_join(df, **kw).collect()
    prof = {r["doc_id"]: r for r in setsim_partner_profile(df, **kw).collect()}
    exp = defaultdict(list)
    for r in pairs:
        uni = r["size_a"] + r["size_b"] - r["inter_size"]
        exp[r["id_a"]].append(
            (r["jaccard_sim"], -r["id_b"], r["inter_size"], uni, r["id_b"])
        )
        exp[r["id_b"]].append(
            (r["jaccard_sim"], -r["id_a"], r["inter_size"], uni, r["id_a"])
        )
    assert set(prof) == set(exp)
    for d, lst in exp.items():
        j, _negp, inter, uni, p = max(lst)
        r = prof[d]
        assert r["n_partners"] == len(lst), d
        assert (
            r["best_partner"], r["best_inter"], r["best_union"],
            r["best_jaccard"],
        ) == (p, inter, uni, j), d


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs_strategy)
def test_containment_pairs_matches_brute_force(spark, texts):
    """Rarest-token blocking is LOSSLESS for token-boundary-padded
    substring containment (every token of a contained doc is a token
    of its container, so the rarest one collides in the block join)."""
    from alpaca_pyspark_spark.operators.dedup import containment_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["contained_id"], r["container_id"])
        for r in containment_pairs(df, id_col="doc_id", text_col="text").collect()
    }

    norm = {i: " ".join(t.split()) for i, t in rows if t.split()}
    want = set()
    for a, sa in norm.items():
        for b, sb in norm.items():
            if a == b:
                continue
            if (len(sa) < len(sb) or (len(sa) == len(sb) and a < b)) and (
                f" {sa} " in f" {sb} "
            ):
                want.add((a, b))
    assert got == want


@pytest.mark.slow
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-8, max_value=8,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=24,
    ),
    st.integers(min_value=1, max_value=5),  # num_blocks
)
def test_blocked_all_pairs_matches_numpy_reference(spark, vecs, num_blocks):
    """The triangle block-pair join must equal a naive numpy
    sequential-order reference for ANY vectors and block count —
    including single-element blocks, empty cross sides, and
    duplicate/near-parallel vectors (tie cases hand fixtures miss)."""
    import math

    from alpaca_pyspark_spark.operators.similarity import (
        all_pairs_above_blocked,
    )

    # drop zero vectors (cosine undefined; operator contract expects
    # non-zero embeddings, as does every oracle)
    vecs = [v for v in vecs if any(x != 0.0 for x in v)]
    if len(vecs) < 2:
        return
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thresh = 0.1
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in all_pairs_above_blocked(
            df, id_col="vec_id", vec_col="embedding",
            threshold=thresh, num_blocks=num_blocks,
        ).collect()
    }

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    want = {}
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1:]:
            cos = seq_dot(va, vb) / (
                math.sqrt(seq_dot(va, va)) * math.sqrt(seq_dot(vb, vb))
            )
            if cos >= thresh:
                want[(ia, ib)] = cos
    assert got == want  # exact, including the doubles


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0, max_size=8,
        ),
        min_size=2, max_size=14,
    ),
    st.integers(min_value=0, max_value=2**31),
)
def test_q193_first_band_dedup_equals_distinct(spark, token_lists, salt):
    """PROPERTY: q193's row-local first-matching-band predicate keeps
    exactly the DISTINCT (new, old) pair set over the SAME candidate
    rows — for arbitrary corpora AND arbitrary index pruning (bucket
    rows dropped at index build, surviving-band masks recomputed).
    The tiny token alphabet forces heavy signature collisions, the
    short docs hit the <3-token empty-shingle edge, and the salted
    pruning exercises pairs whose earliest matching band was pruned —
    the cases the fixed corpus never produces."""
    from pyspark.sql import functions as F

    import alpaca_pyspark_spark.queries.llm as llm
    from alpaca_pyspark_spark.functions import jaccard
    from alpaca_pyspark_spark.queries.llm import (
        _q193_artifacts,
        _q193_candidates,
        _q193_transform,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id bigint, text string",
    )
    orig = llm.load
    try:
        llm.load = lambda sp, sf, name: docs
        index, docinfo = _q193_artifacts(spark, "unused")
    finally:
        llm.load = orig
    # salted pruning: drop ~1/3 of the surviving band rows, then
    # recompute each old doc's surviving-band mask from what remains
    keep = F.pmod(F.xxhash64("old_id", "band", F.lit(salt)), F.lit(3)) != 0
    pruned = index.filter(keep)
    mask2 = (
        pruned.groupBy("old_id")
        .agg(F.collect_set("band").alias("__bs"))
        .select(
            "old_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda b: F.exists("__bs", lambda x: x == b).cast("int"),
            ).alias("okb"),
        )
    )
    docinfo2 = docinfo.drop("okb").join(mask2, "old_id")
    delta = docs.filter(F.col("doc_id") % 5 == 0)

    got = {
        (r["new_id"], r["old_id"], r["jaccard_sim"])
        for r in _q193_transform(pruned, docinfo2)(delta).collect()
    }
    got_rows = _q193_transform(pruned, docinfo2)(delta).count()
    assert got_rows == len(got), "first-band predicate emitted a duplicate pair"

    cand = _q193_candidates(delta, pruned, docinfo2)
    want = {
        (r["new_id"], r["old_id"], r["jaccard_sim"])
        for r in cand.dropDuplicates(["new_id", "old_id"])
        .select(
            "new_id", "old_id",
            jaccard(F.col("sh_n"), F.col("sh_o")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= 0.2)
        .collect()
    }
    assert got == want
