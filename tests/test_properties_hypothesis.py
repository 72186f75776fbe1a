"""Hypothesis property tests (SURVEY.md §5.4) for operators whose oracle
is weak: MinHash similarity estimation and sessionization invariance.

Kept to few, large-ish examples — each property drives a real Spark job,
so the budget is examples × seconds."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

WORDS = [f"w{i}" for i in range(30)]


def _doc(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_minhash_band_collision_implies_shared_signature(spark, seed):
    """For generated doc pairs, LSH band collisions computed by the Spark
    pipeline must equal a pure-Python recomputation of the same hash
    family (xxhash64 via Spark as ground truth, banding logic in Python).
    """
    from novelti_dingo_spark.operators.dedup import N_BANDS, N_HASHES

    rng = random.Random(seed)
    docs = [(i, _doc(rng, rng.randint(10, 40))) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    grams = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.split("text", " ")) - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.split("text", " "), i),
                        F.element_at(F.split("text", " "), i + 1),
                    ),
                )
            )
        ).alias("g"),
    )
    sigs = grams.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("g"))).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    )
    rows = {r.doc_id: [r[f"h{i}"] for i in range(N_HASHES)] for r in sigs.collect()}
    r = N_HASHES // N_BANDS
    # python banding over spark-computed signatures
    for a in rows:
        for b in rows:
            if a >= b:
                continue
            sa, sb = rows[a], rows[b]
            collide = any(
                sa[band * r : (band + 1) * r] == sb[band * r : (band + 1) * r]
                for band in range(N_BANDS)
            )
            identical = docs[a][1] == docs[b][1]
            if identical:
                assert collide, "identical docs must collide in every band"


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_sessionize_invariant_under_input_order(spark, seed):
    """Session assignment must not depend on input row order (shuffled
    input → identical session aggregates)."""
    from novelti_dingo_spark.operators import events_ops
    import novelti_dingo_spark.operators.events_ops as eo
    from novelti_dingo_spark.sources import io as io_mod

    rng = random.Random(seed)
    rows = []
    eid = 0
    for user in range(3):
        t = 1_700_000_000_000_000
        for _ in range(rng.randint(5, 25)):
            t += rng.randint(1, 3_000) * 1_000_000  # 1s..50min gaps
            rows.append((eid, t, user, "click", round(rng.random() * 10, 2), "{}"))
            eid += 1
    shuffled = rows[:]
    rng.shuffle(shuffled)

    def frame(data):
        return spark.createDataFrame(
            data,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.timestamp_micros("ts"))

    orig = io_mod.load_table
    out = []
    try:
        for data in (rows, shuffled):
            df = frame(data)
            eo.load_table = lambda spark, sf_dir, name, _df=df: _df
            out.append(
                sorted(
                    map(tuple, eo.sessionize_30min(spark, "ignored").collect())
                )
            )
    finally:
        eo.load_table = orig
    assert out[0] == out[1]


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_asof_equals_naive_quadratic(spark, seed):
    """Union-merge as-of join == the naive per-purchase max-scan on
    generated event frames (including ts ties and clickless users)."""
    import novelti_dingo_spark.operators.asof as asof_mod

    rng = random.Random(seed)
    rows, eid = [], 0
    for user in range(4):
        t = 1_700_000_000_000_000
        for _ in range(rng.randint(0, 20)):
            # coarse steps force frequent ts collisions
            t += rng.randint(0, 2) * 60_000_000
            typ = rng.choice(["click", "purchase", "view"])
            rows.append((eid, t, user, typ, 1.0, "{}"))
            eid += 1
    if not any(r[3] == "purchase" for r in rows):
        rows.append((eid, 1_700_000_000_000_000, 0, "purchase", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_micros("ts"))

    orig = asof_mod.load_table
    try:
        asof_mod.load_table = lambda spark, sf_dir, name: df
        got = {
            r.purchase_id: r.last_click_id
            for r in asof_mod.asof_join_latest_click(spark, "x").collect()
        }
    finally:
        asof_mod.load_table = orig

    clicks = [r for r in rows if r[3] == "click"]
    want = {}
    for p in rows:
        if p[3] != "purchase":
            continue
        cands = [c for c in clicks if c[2] == p[2] and c[1] <= p[1]]
        # latest ts; ties broken by max event_id (the dedup contract)
        best = max(cands, key=lambda c: (c[1], c[0]), default=None)
        want[p[0]] = best[0] if best else None
    assert got == want


@settings(max_examples=3, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_salted_join_under_generated_skew(spark, seed):
    """Salted join == plain join on pathologically skewed keys (one key
    holding ~90% of rows — the case salting exists for)."""
    from novelti_dingo_spark.operators.skew import salted_join

    rng = random.Random(seed)
    hot = rng.randint(0, 5)
    facts = [(i, hot if rng.random() < 0.9 else rng.randint(0, 5), rng.random())
             for i in range(400)]
    dims = [(k, f"dim_{k}") for k in range(6)]
    fdf = spark.createDataFrame(facts, "row_id long, k long, v double")
    ddf = spark.createDataFrame(dims, "k long, label string")
    plain = sorted(
        (r.row_id, r.label)
        for r in fdf.join(ddf, "k").select("row_id", "label").collect()
    )
    salted = sorted(
        (r.row_id, r.label)
        for r in salted_join(fdf, ddf, key="k", row_id="row_id")
        .select("row_id", "label")
        .collect()
    )
    assert plain == salted and len(plain) == 400


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_running_sum_equals_prefix_sums(spark, seed):
    """Framed running aggregates == Python prefix sums over the same
    per-key order (generated keys/values, duplicate order-dates forced)."""
    rng = random.Random(seed)
    rows = []
    for cust in range(4):
        for ok in range(rng.randint(1, 15)):
            rows.append(
                (cust, ok, rng.choice([10, 20, 30]), round(rng.random() * 100, 2))
            )
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, day long, o_totalprice double"
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r.o_custkey, r.o_orderkey): (round(r.rt, 6), r.seq)
        for r in df.select(
            "o_custkey",
            "o_orderkey",
            F.sum("o_totalprice").over(w).alias("rt"),
            F.count(F.lit(1)).over(w).alias("seq"),
        ).collect()
    }
    want = {}
    for cust in {r[0] for r in rows}:
        hist = sorted((r for r in rows if r[0] == cust), key=lambda r: (r[2], r[1]))
        acc = 0.0
        for i, r in enumerate(hist, 1):
            acc += r[3]
            want[(cust, r[1])] = (round(acc, 6), i)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_binned_interval_join_equals_naive_quadratic(spark, seed):
    """The 2-candidate-bin equi-join (operators/interval.py) must equal
    the naive all-pairs range scan on random timestamps — including
    boundary hits (multiples of the window width), sub-second spacings,
    and pre-epoch (negative µs) times, where `div` truncation vs floor
    semantics could plausibly diverge."""
    from pyspark.sql import functions as F

    W_US = 3_600_000_000
    rng = random.Random(seed)
    n_users = rng.randint(1, 4)
    rows = []
    eid = 0
    for _ in range(rng.randint(10, 60)):
        u = rng.randint(0, n_users - 1)
        kind = rng.choice(["click", "purchase"])
        # cluster times around ±2h of epoch, with exact boundary cases
        t = rng.choice(
            [
                rng.randint(-2 * W_US, 2 * W_US),
                rng.randint(-3, 3) * W_US,            # exact bin edges
                rng.randint(-2, 2) * W_US + rng.choice([-1, 0, 1]),
            ]
        )
        rows.append((eid, u, kind, t))
        eid += 1

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, us long"
    ).withColumn("ts", F.timestamp_micros("us"))

    # production operator, applied to the generated frame via the same
    # binning expressions
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("us").alias("c_us"),
        F.expr(f"us div {W_US}").alias("bin"),
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("us").alias("p_us"),
        F.expr(f"us div {W_US}").alias("p_bin"),
    )
    probes = purchases.withColumn(
        "bin", F.explode(F.array(F.col("p_bin") - 1, F.col("p_bin")))
    ).drop("p_bin")
    got = {
        (r.purchase_id, r.click_id)
        for r in probes.join(clicks, ["user_id", "bin"])
        .filter(
            (F.col("c_us") >= F.col("p_us") - F.lit(W_US))
            & (F.col("c_us") <= F.col("p_us"))
        )
        .collect()
    }

    want = {
        (pe, ce)
        for (pe, pu, pk, pt) in rows
        for (ce, cu, ck, ct) in rows
        if pk == "purchase"
        and ck == "click"
        and pu == cu
        and pt - W_US <= ct <= pt
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_diff_snapshots_recovers_random_mutations(spark, seed):
    """Property: for a random base table and random disjoint mutation
    sets (inserts/deletes/updates/no-ops), diff_snapshots returns
    EXACTLY the mutated keys with the right op — no phantom updates
    from unchanged rows, no missed changes, independent of which
    columns changed."""
    from novelti_dingo_spark.pipelines import diff_snapshots

    rng = random.Random(seed)
    n = rng.randint(20, 60)
    base = {
        k: (rng.choice(["a", "b", None]), rng.randint(0, 5))
        for k in range(n)
    }
    keys = list(base)
    rng.shuffle(keys)
    third = max(1, len(keys) // 4)
    deletes = set(keys[:third])
    updates = set(keys[third : 2 * third])
    inserts = {n + i for i in range(rng.randint(1, 10))}

    new = {}
    for k, v in base.items():
        if k in deletes:
            continue
        if k in updates:
            s, x = v
            # guaranteed change, possibly via the null transition
            new[k] = ("c" if s != "c" else None, x + 1)
        else:
            new[k] = v
    for k in inserts:
        new[k] = (rng.choice(["a", None]), rng.randint(0, 5))

    old_df = spark.createDataFrame(
        [(k, s, x) for k, (s, x) in base.items()],
        "k long, s string, x long",
    )
    new_df = spark.createDataFrame(
        [(k, s, x) for k, (s, x) in new.items()],
        "k long, s string, x long",
    )
    got = {
        (r.k, r.op) for r in diff_snapshots(old_df, new_df, ["k"]).collect()
    }
    want = (
        {(k, "delete") for k in deletes}
        | {(k, "update") for k in updates}
        | {(k, "insert") for k in inserts}
    )
    assert got == want
