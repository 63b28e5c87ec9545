"""Operator semantics tests: as-of join vs brute force, dedup recall,
simhash locality, IVF recall, range-join equivalence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.operators import dedup as D
from tfl_realtime_lakehouse_spark.operators import similarity as S
from tfl_realtime_lakehouse_spark.operators.asof import asof_join
from tfl_realtime_lakehouse_spark.sources.tables import read_table


def test_asof_join_matches_bruteforce(spark, sf_smoke):
    ev = read_table(spark, sf_smoke, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    got = {
        r.event_id: r.last_error_ts
        for r in asof_join(
            clicks, errors, on="user_id", left_ts="ts", right_ts="ts",
            value_alias="last_error_ts",
        ).collect()
    }
    # brute force via correlated aggregation
    brute = {
        r.event_id: r.expect
        for r in clicks.alias("c")
        .join(errors.alias("e"), (F.col("e.user_id") == F.col("c.user_id")) & (F.col("e.ts") <= F.col("c.ts")), "left")
        .groupBy("c.event_id")
        .agg(F.max("e.ts").alias("expect"))
        .collect()
    }
    assert got == brute


def test_asof_join_carries_right_payload(spark):
    left = spark.createDataFrame(
        [("k", 10, "L1"), ("k", 20, "L2"), ("x", 5, "L3")], "k string, ts long, tag string"
    )
    right = spark.createDataFrame(
        [("k", 9, "A"), ("k", 20, "B"), ("k", 25, "C")], "k string, ts long, payload string"
    )
    out = {
        (r.tag): (r.asof_ts, r.payload)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_values=["payload"]
        ).collect()
    }
    assert out == {"L1": (9, "A"), "L2": (20, "B"), "L3": (None, None)}


def test_asof_exact_match_excluded_when_disallowed(spark):
    left = spark.createDataFrame([("k", 20)], "k string, ts long")
    right = spark.createDataFrame([("k", 20)], "k string, ts long")
    strict = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", allow_exact_match=False
    ).collect()
    assert strict[0].asof_ts is None


def test_minhash_lsh_recall_on_planted_neardups(spark, sf_correct):
    docs = read_table(spark, sf_correct, "documents")
    exact_high = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert exact_high, "corpus should contain planted near-duplicates"
    cands = {
        (r.doc_a, r.doc_b) for r in D.minhash_lsh_candidates(docs).collect()
    }
    recall = len(exact_high & cands) / len(exact_high)
    assert recall >= 0.9, f"LSH recall {recall} too low over {len(exact_high)} pairs"


def test_simhash_locality(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("quick", "rapid")
    far = "completely different content about spark engines " * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sigs = {r.doc_id: r.simhash for r in D.simhash(df).collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])
    # one substituted token (~11% of mass) should stay well under the
    # ~32-bit expectation for unrelated docs
    assert hamming(sigs[1], sigs[2]) <= 16
    assert hamming(sigs[1], sigs[3]) >= 20


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    rows = {r.first_doc: r.n_copies for r in D.exact_dedup_groups(df).collect()}
    assert rows == {1: 2, 3: 1}


def test_ivf_is_exact_within_probed_cells(spark, sf_smoke):
    """The guarantee cell-probing provides: results are exactly the
    brute-force top-k RESTRICTED to the probed cells (end-to-end recall
    then depends on cell assignment quality, which for the corpus's
    `label` column is a stand-in, not a geometric clustering)."""
    emb = read_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    got = S.ivf_topk(emb, queries, k=5, nprobe=10).collect()  # probe ALL 10 cells
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    assert {(r.query_id, r.vec_id) for r in got} == exact  # full probe ≡ exact


def test_hyperplane_lsh_recall_on_neardup_pairs(spark, sf_correct):
    emb = read_table(spark, sf_correct, "embeddings")
    true_pairs = {
        (r.vec_a, r.vec_b)
        for r in S.neardup_pairs_numpy(emb, threshold=0.4).collect()
    }
    assert true_pairs
    lsh_pairs = {
        (r.vec_a, r.vec_b)
        for r in S.hyperplane_lsh_pairs(
            emb, tables=16, bits=4, threshold=0.4
        ).collect()
    }
    assert lsh_pairs <= true_pairs  # verification step guarantees precision
    recall = len(true_pairs & lsh_pairs) / len(true_pairs)
    # expected ≥ 1-(1-p^4)^16 ≈ 0.92 at cos=0.4; allow sampling slack
    assert recall >= 0.7, f"LSH recall {recall} over {len(true_pairs)} pairs"


def test_neardup_pairs_numpy_matches_hof_cosine(spark, sf_smoke):
    emb = read_table(spark, sf_smoke, "embeddings")
    fast = {
        (r.vec_a, r.vec_b): r.score
        for r in S.neardup_pairs_numpy(emb, threshold=0.4).collect()
    }
    a, b = emb.alias("a"), emb.alias("b")
    slow = {
        (r.vec_a, r.vec_b): r.score
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(S.cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("score"),
        )
        .filter(F.col("score") >= 0.4)
        .collect()
    }
    assert set(fast) == set(slow)
    for k in fast:
        assert fast[k] == pytest.approx(slow[k], abs=2e-6)


def test_prefix_filtered_jaccard_equals_plain(spark, sf_correct):
    docs = read_table(spark, sf_correct, "documents")
    plain = {
        (r.doc_a, r.doc_b): (r.n_shared, r.jaccard)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    prefixed = {
        (r.doc_a, r.doc_b): (r.n_shared, r.jaccard)
        for r in D.ngram_jaccard_pairs_prefix(docs, threshold=0.2).collect()
    }
    assert prefixed == plain  # pruning is exact: identical result set


def test_hash_split_stable_and_complete(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.operators.sampling import hash_split

    docs = read_table(spark, sf_correct, "documents").select("doc_id")
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(docs.repartition(13), "doc_id").collect()}
    assert a == b  # partitioning-independent (content-addressed)
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.8 < frac_train < 0.97  # ~90% ± hash noise
    assert set(a.values()) <= {"train", "val", "test"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(docs, "doc_id", splits={"train": 50})


def test_stratified_sample_respects_fractions(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.operators.sampling import stratified_sample

    docs = read_table(spark, sf_correct, "documents")
    out = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}, seed=7)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= {"en", "de"}  # unlisted strata excluded
    if "en" in counts:
        assert 0.25 < counts["en"] / totals["en"] < 0.75


def test_approx_count_distinct_within_tolerance(spark, sf_correct):
    orders = read_table(spark, sf_correct, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, n, approx[k])

def test_neardup_oversize_guard_raises(spark, sf_smoke):
    emb = read_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="max_rows"):
        S.neardup_pairs_numpy(emb, threshold=0.4, max_rows=10, on_oversize="error")


def test_neardup_oversize_reroutes_to_lsh(spark, sf_correct):
    """Over the max_rows ceiling the exact tier must NOT gather the corpus;
    it reroutes through sign-LSH (same schema, verified-precision subset)."""
    emb = read_table(spark, sf_correct, "embeddings")
    exact = {
        (r.vec_a, r.vec_b)
        for r in S.neardup_pairs_numpy(emb, threshold=0.4).collect()
    }
    rerouted_df = S.neardup_pairs_numpy(emb, threshold=0.4, max_rows=10)
    assert [f.name for f in rerouted_df.schema.fields] == ["vec_a", "vec_b", "score"]
    rerouted = {(r.vec_a, r.vec_b) for r in rerouted_df.collect()}
    assert rerouted  # planted near-dups exist at sf0.01; LSH recovers some
    assert rerouted <= exact  # exact-cosine verification keeps precision 1.0


def test_lsh_verify_plan_has_no_corpus_broadcast_hint(spark, sf_smoke):
    """The verification rejoin must be a plain shuffle equi-join: a
    broadcast hint on the full corpus vector table caps the operator at
    the broadcast limit (the round-1 scale-killer). AQE may still choose
    broadcast at runtime — what must be absent is the unconditional hint
    in the logical plan."""
    emb = read_table(spark, sf_smoke, "embeddings")
    df = S.hyperplane_lsh_pairs(emb, tables=4, bits=4, threshold=0.4)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in optimized.lower()


def test_jaccard_sizes_plan_has_no_broadcast_hint(spark, sf_smoke):
    docs = read_table(spark, sf_smoke, "documents")
    df = D.ngram_jaccard_pairs(docs, threshold=0.2)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in optimized.lower()


def test_blocked_neardup_equals_numpy_tier(spark, sf_correct):
    """The fully-distributed block-pair plan must reproduce the exact
    tier bit-for-bit: same pairs, same 6-dp scores, no driver gather."""
    emb = read_table(spark, sf_correct, "embeddings")
    exact = {
        (r.vec_a, r.vec_b): r.score
        for r in S.neardup_pairs_numpy(emb, threshold=0.4).collect()
    }
    for n_blocks in (1, 3, 8):
        blocked = {
            (r.vec_a, r.vec_b): r.score
            for r in S.blocked_neardup_pairs(
                emb, threshold=0.4, n_blocks=n_blocks
            ).collect()
        }
        assert blocked == exact, f"n_blocks={n_blocks}"


def test_dedup_representatives_keeps_min_id_per_text(spark):
    from tfl_realtime_lakehouse_spark.operators.dedup import dedup_representatives

    df = spark.createDataFrame(
        [(1, "x"), (5, "x"), (3, "x"), (2, "y"), (7, "z"), (4, "z")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.text) for r in dedup_representatives(df).collect()}
    assert got == {(1, "x"), (2, "y"), (4, "z")}


def test_kmeans_train_is_deterministic_and_balanced(spark, sf_smoke):
    emb = read_table(spark, sf_smoke, "embeddings")
    c1 = {r.cell: tuple(r.centroid) for r in S.kmeans_train(emb, k=5, iters=2).collect()}
    c2 = {r.cell: tuple(r.centroid) for r in S.kmeans_train(emb, k=5, iters=2).collect()}
    assert c1 == c2  # hash-seeded init: reproducible across runs
    assigned = S.kmeans_assign(emb, S.kmeans_train(emb, k=5, iters=2))
    sizes = {r.cell: r["count"] for r in assigned.groupBy("cell").count().collect()}
    assert sum(sizes.values()) == emb.count()  # every vector assigned once
    assert len(sizes) >= 2  # non-degenerate clustering


def test_kmeans_iterations_reduce_within_cell_variance(spark, sf_smoke):
    emb = read_table(spark, sf_smoke, "embeddings")

    def inertia(iters):
        cents = S.kmeans_train(emb, k=5, iters=iters)
        assigned = S.kmeans_assign(emb, cents)
        scored = assigned.join(
            F.broadcast(cents.select(F.col("cell"), "centroid")), "cell"
        ).withColumn(
            "d",
            F.aggregate(
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.col("centroid"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return scored.agg(F.sum("d")).collect()[0][0]

    assert inertia(3) <= inertia(1) + 1e-9  # Lloyd is monotone


def test_ivf_trained_full_probe_equals_exact(spark, sf_smoke):
    """Same invariant as label-IVF: probing ALL trained cells must equal
    brute-force top-k exactly."""
    emb = read_table(spark, sf_smoke, "embeddings")
    cents = S.kmeans_train(emb, k=5, iters=2)
    queries = emb.filter(F.col("vec_id") < 3)
    got = S.ivf_topk(emb, queries, k=5, nprobe=5, centroids=cents).collect()
    exact = {
        (r.query_id, r.vec_id) for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    assert {(r.query_id, r.vec_id) for r in got} == exact


def test_hll_sketch_union_is_merge_invariant(spark, sf_correct):
    """The property that makes sketches the 100 TB distinct path: the
    union of per-group sketches estimates (almost) the same value as one
    global sketch, and both land within the published error bound of the
    true distinct count."""
    orders = read_table(spark, sf_correct, "orders")
    unioned = (
        orders.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]
        .n
    )
    direct = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("n")
    ).collect()[0].n
    true = orders.select("o_custkey").distinct().count()
    # Not bit-identical: Datasketches may promote sparse→dense during
    # union, shifting the estimator slightly. Both must sit within the
    # published error bound of truth and within 1% of each other.
    assert abs(unioned - direct) / true < 0.01
    assert abs(unioned - true) / true < 0.05
    assert abs(direct - true) / true < 0.05


def test_session_window_builtin_matches_custom_sessionization(spark):
    """Spark's session_window must reproduce the custom lag/cumsum
    sessionization on non-boundary data, including the exact-boundary
    case: an event at precisely last+gap extends the session in BOTH
    (session_window merges on `<=` window end, matching the custom
    operator's strict `> gap` new-session test)."""
    gap = "30 minutes"
    base = 1_700_000_000

    def sessions_builtin(rows):
        df = spark.createDataFrame(rows, "user_id long, epoch long").select(
            "user_id", F.timestamp_seconds("epoch").alias("ts")
        )
        return sorted(
            (r.user_id, r.n, r.s.isoformat())
            for r in df.groupBy("user_id", F.session_window("ts", gap))
            .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"))
            .collect()
        )

    def sessions_custom(rows):
        df = spark.createDataFrame(rows, "user_id long, epoch long").select(
            "user_id", F.timestamp_seconds("epoch").alias("ts")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts")
        wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sess = (
            df.withColumn("prev", F.lag("ts").over(w))
            .withColumn(
                "new",
                F.when(
                    F.col("prev").isNull()
                    | (F.unix_micros("ts") - F.unix_micros("prev") > 1800 * 1_000_000),
                    1,
                ).otherwise(0),
            )
            .withColumn("sid", F.sum("new").over(wsum))
        )
        return sorted(
            (r.user_id, r.n, r.s.isoformat())
            for r in sess.groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"))
            .collect()
        )

    # non-boundary gaps: 10 min (same session), 31 min (new session)
    rows = [
        (1, base), (1, base + 600), (1, base + 600 + 1860),
        (2, base), (2, base + 100),
    ]
    assert sessions_builtin(rows) == sessions_custom(rows)

    # boundary: exactly 30 min apart — both keep the session open
    edge = [(1, base), (1, base + 1800)]
    assert sessions_builtin(edge) == sessions_custom(edge)
    assert len(sessions_custom(edge)) == 1


def test_chunk_documents_windows_and_overlap(spark):
    from tfl_realtime_lakehouse_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text.split(" "))
        for r in chunk_documents(df, chunk_tokens=64, stride=48).collect()
    }
    # 100 tokens, stride 48: starts 0/48/96 with 64/52/4 tokens
    assert got[(1, 0)][0] == 64 and got[(1, 0)][1][0] == "t0"
    assert got[(1, 1)][0] == 52 and got[(1, 1)][1][0] == "t48"
    assert got[(1, 2)] == (4, ["t96", "t97", "t98", "t99"])
    # overlap: chunk 1 repeats tokens 48..63 of chunk 0
    assert got[(1, 0)][1][48:] == got[(1, 1)][1][:16]
    # short docs yield exactly one chunk
    assert got[(2, 0)] == (3, ["a", "b", "c"])
    assert got[(3, 0)] == (1, ["solo"])
    assert len(got) == 5


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_matches_union_find(spark):
    import random

    rng = random.Random(13)
    cases = [
        [(1, 2), (2, 3), (3, 4), (4, 5)],          # chain (worst case for
        [(5, 1), (9, 5), (3, 9), (7, 3)],          #  plain label propagation)
        [(1, 2), (1, 3), (2, 3), (10, 11)],        # clique + island pair
    ]
    for _ in range(3):
        n = rng.randint(2, 40)
        cases.append(
            [(rng.randint(0, n), rng.randint(0, n)) for _ in range(rng.randint(1, 60))]
        )
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        nodes = sorted({x for e in edges for x in e})
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r["node"]: r["component"] for r in D.connected_components(df).collect()}
        assert got == _uf_components(edges, nodes)


def test_cluster_assignments_singletons_and_reps(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 5), (5, 7), (2, 3)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in D.cluster_assignments(docs, pairs).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[5]["cluster_id"] == 1 and rows[7]["cluster_id"] == 1
    assert rows[2]["cluster_id"] == 2 and rows[3]["cluster_id"] == 2
    for i in (0, 4, 6):  # singletons keep their own id, size 1, kept
        assert rows[i]["cluster_id"] == i and rows[i]["cluster_size"] == 1 and rows[i]["is_rep"] == 1
    assert rows[1]["cluster_size"] == 3 and rows[1]["is_rep"] == 1 and rows[5]["is_rep"] == 0
    assert sum(r["is_rep"] for r in rows.values()) == 5  # one rep per cluster


def test_repetition_metrics_flags_looped_text(spark):
    from tfl_realtime_lakehouse_spark.operators.text import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "spam ham " * 50),                 # one bigram dominates
            (2, " ".join(f"w{i}" for i in range(100))),  # all-distinct
            (3, "solo"),                            # < 2 tokens
        ],
        "doc_id long, text string",
    )
    docs = docs.selectExpr("doc_id", "trim(text) AS text")
    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert rows[1]["dup_token_fraction"] == 0.98
    assert rows[1]["top_bigram_fraction"] > 0.4
    assert rows[2]["dup_token_fraction"] == 0.0
    assert rows[2]["top_bigram_count"] == 1
    assert rows[3]["n_tokens"] == 1 and rows[3]["top_bigram_count"] == 0
    assert rows[3]["top_bigram_fraction"] == 0.0


def test_redact_pii_categories_and_order(spark):
    from tfl_realtime_lakehouse_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "x bob.smith+t@foo-bar.co.uk y"),
            (2, "ip 10.0.255.3 run 12345678"),
            (3, "no pii here"),
            (4, "short digits 123456 stay"),  # 6 digits: below the run floor
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["clean_text"] == "x <EMAIL> y"
    assert rows[2]["n_ip"] == 1 and rows[2]["n_digit_run"] == 1
    assert rows[2]["clean_text"] == "ip <IP> run <DIGIT_RUN>"
    assert rows[3]["clean_text"] == "no pii here"
    assert rows[4]["n_digit_run"] == 0 and "123456" in rows[4]["clean_text"]


def test_contamination_check_flags_overlap(spark):
    from tfl_realtime_lakehouse_spark.operators.text import contamination_check

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta"),  # benchmark member: excluded
            (1, "x alpha beta gamma delta y"),             # shares one 4-gram
            (2, "totally different words here now"),       # clean
            (3, "one two"),                                # shorter than n -> 0 grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in contamination_check(docs, bench, n=4, frac_threshold=0.3).collect()}
    assert 100 not in rows
    assert rows[1]["n_overlap"] == 1 and rows[1]["is_contaminated"] == 1
    assert rows[2]["n_overlap"] == 0 and rows[2]["is_contaminated"] == 0
    assert rows[3]["n_grams"] == 0 and rows[3]["overlap_frac"] == 0.0


def test_pack_sequences_shard_local_invariants(spark):
    from tfl_realtime_lakehouse_spark.operators.text import chunk_documents, pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(10 + (i * 37) % 150))) for i in range(40)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=16, stride=16)
    packed = pack_sequences(chunks, context_tokens=64, num_shards=4)
    rows = packed.collect()
    # every chunk assigned exactly once; shard = doc_id % 4
    assert len(rows) == chunks.count()
    assert all(r["shard"] == r["doc_id"] % 4 for r in rows)
    # windows fill: chunk starts at the window its cumulative offset falls in,
    # so a window never holds more than context + (chunk - 1) extra tokens
    from collections import defaultdict

    per_window = defaultdict(int)
    for r in rows:
        per_window[(r["shard"], r["window_id"])] += r["n_tokens"]
    for (shard, wid), tot in per_window.items():
        assert tot <= 64 + 15
    # window ids are dense from 0 within each shard
    by_shard = defaultdict(set)
    for (shard, wid), _ in per_window.items():
        by_shard[shard].add(wid)
    for shard, wids in by_shard.items():
        assert wids == set(range(len(wids)))


def test_mixture_sample_deterministic_and_monotone(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.operators.sampling import mixture_sample
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    docs = read_table(spark, sf_correct, "documents")
    rates = {"en": 1.0, "de": 0.5, "es": 0.1}
    a = {r["doc_id"] for r in mixture_sample(docs, "lang", rates, "doc_id").select("doc_id").collect()}
    b = {r["doc_id"] for r in mixture_sample(docs.repartition(13), "lang", rates, "doc_id").select("doc_id").collect()}
    assert a == b  # repartition-invariant
    # rate=1.0 keeps every row of the stratum; unlisted strata drop out
    en_total = docs.where(F.col("lang") == "en").count()
    kept = docs.join(spark.createDataFrame([(i,) for i in a], "doc_id long"), "doc_id", "left_semi")
    assert kept.where(F.col("lang") == "en").count() == en_total
    assert kept.where(F.col("lang") == "fr").count() == 0
    # halving a rate only removes rows (nested-subset property)
    half = {r["doc_id"] for r in mixture_sample(docs, "lang", {"en": 0.5}, "doc_id").select("doc_id").collect()}
    full_en = {r["doc_id"] for r in docs.where(F.col("lang") == "en").select("doc_id").collect()}
    assert half <= full_en


def test_quantize_embeddings_roundtrip_error_bound(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.operators.similarity import quantize_embeddings
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    vecs = read_table(spark, sf_correct, "embeddings").limit(100)
    out = quantize_embeddings(vecs).collect()
    assert len(out) == 100
    for r in out:
        assert all(-127 <= x <= 127 for x in r["q"])
        # symmetric int8: per-element error is at most half a quant step
        assert r["max_abs_err"] <= 0.5 / r["scale"] + 1e-12


def test_leakage_safe_split_keeps_clusters_together(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.operators.sampling import hash_split
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    docs = read_table(spark, sf_correct, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    clusters = D.cluster_assignments(docs, pairs).select("doc_id", "cluster_id")
    split = hash_split(clusters, "cluster_id")
    # every cluster maps to exactly one split -> no near-dup pair straddles
    violations = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert violations == 0
    # and the planted near-dups do form multi-doc clusters (non-vacuous)
    assert split.groupBy("cluster_id").count().where("count > 1").count() > 0


def test_dedup_clusters_contraction_equals_raw_pairs(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    docs = read_table(spark, sf_correct, "documents")
    # replicate a slice to plant exact duplicates (ids offset past corpus)
    dups = docs.where(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.unionByName(dups)
    raw_pairs = D.ngram_jaccard_pairs(corpus, n=3, threshold=0.2)
    raw = {
        r["doc_id"]: r["cluster_id"]
        for r in D.cluster_assignments(corpus, raw_pairs).collect()
    }
    contracted = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(corpus, n=3, threshold=0.2).collect()
    }
    assert raw == contracted


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_quantize_plan_is_map_only(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.operators.similarity import quantize_embeddings
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    plan = _physical_plan(quantize_embeddings(read_table(spark, sf_correct, "embeddings")))
    assert "Exchange" not in plan  # pure per-row HOF work: zero shuffle


def test_contamination_plan_broadcasts_only_benchmark(spark, sf_correct):
    from tfl_realtime_lakehouse_spark.operators.text import contamination_check
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    docs = read_table(spark, sf_correct, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    plan = _physical_plan(contamination_check(docs, bench, n=4))
    # the corpus-side gram stream joins the (bounded, broadcast) benchmark
    # gram set map-side: the hit-marking join must be a BroadcastHashJoin,
    # never a SortMergeJoin that would shuffle the exploded corpus on gram
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only gram-keyed exchange allowed is the benchmark set's distinct
    # (small side, pre-broadcast); the corpus side shuffles only on doc_id
    # for the single per-doc (total, hits) aggregate
    assert plan.count("hashpartitioning(gram") <= 1
    # single-pass contract: the shingle+hash expression is evaluated once
    # per corpus row — one corpus-side generate stage, not a size-only
    # branch plus an explode branch
    assert plan.count("xxhash64") <= 2  # corpus explode + bench distinct


def test_bm25_matches_python_reference(spark):
    import math

    from tfl_realtime_lakehouse_spark.operators.text import bm25_scores

    corpus = {
        1: "spark join window spark",
        2: "spark table scan",
        3: "nothing relevant here at all",
        4: "join join join join window",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    terms = ["spark", "join", "window"]
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, terms).collect()}

    n = len(corpus)
    avgdl = sum(len(t.split()) for t in corpus.values()) / n
    dfreq = {t: sum(1 for d in corpus.values() if t in d.split()) for t in terms}
    k1, b = 1.2, 0.75
    want = {}
    for doc_id, text in corpus.items():
        toks = text.split()
        score = 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            score += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if score:
            want[doc_id] = round(score, 6)
    assert set(got) == set(want)          # doc 3 matches nothing -> absent
    for doc_id in want:
        assert abs(got[doc_id] - want[doc_id]) < 1e-6
    assert got[4] > got[2]                # heavier term mass outranks


def test_bm25_idempotent_to_duplicate_terms_and_rejects_empty(spark):
    """ADVICE r5: the map-side plan builds one tf column per list
    position, so duplicated query terms must be deduped at entry (the
    old posting-join plan was naturally idempotent) and an empty query
    must fail loudly instead of degenerating."""
    import pytest as _pytest

    from tfl_realtime_lakehouse_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [(1, "spark join window spark"), (2, "spark table scan")],
        "doc_id long, text string",
    )
    clean = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["spark", "join"]).collect()}
    duped = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["spark", "join", "spark", "spark"]).collect()
    }
    assert clean == duped
    with _pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, [])


def test_pq_adc_matches_numpy_and_recalls_exact_l2(spark):
    """ADC distances must be EXACT codebook lookups (the approximation is
    in the codes, never the arithmetic), and recall@10 must clear a floor
    on a corpus with planted cluster structure (near-random vectors have
    no neighbor structure for ANY quantizer to find — recall there is
    meaningless as a quality bar)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(20, 64))
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(25):
            v = centers[c] + rng.normal(scale=0.15, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    m = 8
    books_df = S.pq_train(emb, m=m, codes=16, iters=2)
    codes_df = S.pq_encode(emb, books_df, m=m)
    queries = emb.where(F.col("vec_id").isin(0, 25, 50, 401, 402)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = S.pq_topk(codes_df, books_df, queries, k=10, m=m).collect()

    books = {(r["sub"], r["code"]): np.array(r["centroid"]) for r in books_df.collect()}
    codes = {r["vec_id"]: r["codes"] for r in codes_df.collect()}
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()}
    d_sub = 64 // m

    for r in got:
        q = vecs[r["query_id"]]
        c = codes[r["vec_id"]]
        want = sum(
            float(np.sum((q[j * d_sub:(j + 1) * d_sub] - books[(j, c[j])]) ** 2))
            for j in range(m)
        )
        assert abs(r["adc_dist"] - round(want, 6)) < 1e-5

    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qid, approx in by_q.items():
        q = vecs[qid]
        exact = sorted(
            (v for v in vecs if v != qid),
            key=lambda v: (float(np.sum((q - vecs[v]) ** 2)), v),
        )[:10]
        hits += len(approx & set(exact))
        total += 10
    recall = hits / total
    # within a cluster every member shares codes, so ADC ties make the
    # exact-top-10 CHOICE arbitrary — element recall has a ceiling well
    # below 1. The meaningful quality bar is cluster-level: neighbors
    # must come from the query's true cluster.
    assert recall >= 0.35, f"PQ recall@10 {recall} on clustered corpus"
    for qid, approx in by_q.items():
        same_cluster = sum(1 for v in approx if v // 25 == qid // 25)
        assert same_cluster >= 9, f"query {qid}: only {same_cluster}/10 in-cluster"


def test_chunk_udtf_matches_jvm_operator(spark, sf_correct):
    """The Python UDTF chunker is row-for-row identical to the JVM HOF
    operator — the UDTF is the API on-ramp, the HOF path is production."""
    from tfl_realtime_lakehouse_spark.operators.text import chunk_documents
    from tfl_realtime_lakehouse_spark.operators.udtf import ChunkDocumentsUDTF
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    docs = read_table(spark, sf_correct, "documents").limit(100)
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("chunk_documents_udtf", ChunkDocumentsUDTF)
    via_udtf = spark.sql(
        "SELECT c.* FROM _udtf_docs, LATERAL chunk_documents_udtf(doc_id, text, 64, 48) c"
    )
    via_hof = chunk_documents(docs, chunk_tokens=64, stride=48)
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in via_hof.collect()}
    assert a == b and len(a) > 100


def test_importance_weights_rank_target_like_docs(spark):
    """DSIR weights must rank documents by target-likeness: docs made of
    target-only vocabulary outscore mixed docs outscore background-only
    docs; and the weight is repartition-invariant (decimal per-doc sum,
    content-addressed hashing — no RNG, no partition-order float sums)."""
    from tfl_realtime_lakehouse_spark.operators.sampling import (
        gumbel_topk_sample,
        importance_weights,
    )

    tgt_vocab = "alpha beta gamma delta"
    bg_vocab = "zork quux blarg fnord"
    rows = []
    # target corpus: pure target vocabulary
    for i in range(20):
        rows.append((i, tgt_vocab + " " + tgt_vocab, "en"))
    # background corpus: pure background vocabulary
    for i in range(20, 40):
        rows.append((i, bg_vocab + " " + bg_vocab, "xx"))
    # scored docs (not in target): one target-like, one mixed, one bg-like
    rows.append((100, tgt_vocab, "xx"))
    rows.append((101, "alpha beta zork quux", "xx"))
    rows.append((102, bg_vocab, "xx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    w = importance_weights(docs, is_target=F.col("lang") == "en", buckets=64)
    got = {r.doc_id: r.weight for r in w.collect()}
    assert got[100] > got[101] > got[102]
    assert got[100] > 0 > got[102]

    w2 = importance_weights(
        docs.repartition(13), is_target=F.col("lang") == "en", buckets=64
    )
    got2 = {r.doc_id: r.weight for r in w2.collect()}
    assert got == got2  # bit-identical, not approximately equal

    # Gumbel top-k: deterministic, k rows, and monotone enough that the
    # pure-target scored doc beats the pure-background one when both
    # share the same hash-derived noise scale.
    top = gumbel_topk_sample(w, k=5).collect()
    assert len(top) == 5
    again = [r.doc_id for r in gumbel_topk_sample(w.repartition(7), k=5).collect()]
    assert [r.doc_id for r in top] == again


def test_bpe_train_matches_python_model_and_both_apply_paths_agree(spark):
    """BPE training must learn the same rules as a pure-Python reference
    implementation (count-desc, pair-asc tiebreak), and the two apply
    paths — JVM HOF folds vs the Arrow-batched Python kernel — must
    produce identical token counts."""
    from collections import Counter

    from tfl_realtime_lakehouse_spark.operators import bpe as B

    texts = [
        "low low low lower lower newest newest newest newest widest",
        "low newest widest widest newest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    # --- pure-python reference trainer (same algorithm, no Spark) ---
    freqs = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) + [B.END] for w in freqs}

    def ref_train(k):
        rules = []
        for _ in range(k):
            counts = Counter()
            for w, syms in vocab.items():
                for pair in zip(syms, syms[1:]):
                    counts[pair] += freqs[w]
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            rules.append(best)
            for w in vocab:
                out = []
                for s in vocab[w]:
                    if out and out[-1] == best[0] and s == best[1]:
                        out[-1] = best[0] + best[1]
                    else:
                        out.append(s)
                vocab[w] = out
        return rules

    want_rules = ref_train(8)
    got_rules = B.bpe_train(docs, num_merges=8)
    assert got_rules == want_rules
    assert B.bpe_train_counts(docs, num_merges=8) == want_rules

    jvm = {r.doc_id: (r.n_bpe_tokens, r.n_words)
           for r in B.bpe_tokenize_jvm(docs, got_rules).collect()}
    py = {r.doc_id: (r.n_bpe_tokens, r.n_words)
          for r in B.bpe_tokenize_counts(docs, got_rules).collect()}
    assert jvm == py

    # sanity: merging strictly reduces token counts vs raw chars+marker
    raw = {i: sum(len(w) + 1 for w in t.split(" ") if w) for i, t in enumerate(texts)}
    for i in jvm:
        assert jvm[i][0] < raw[i]

    # greedy-left overlap semantics: aaa under (a,a) -> [aa, a]
    assert B.apply_merges_py("aaa", [("a", "a")]) == ["aa", "a", B.END]


def test_scd2_build_episodes_and_single_shuffle(spark):
    """SCD2 semantics: repeated writes of the same value extend the
    episode; null<->value transitions are changes; exactly one open
    episode per key; intervals chain without gaps. Plan: one exchange
    on the key serves change detection AND interval construction."""
    from tfl_realtime_lakehouse_spark.operators.scd import scd2_build

    rows = [
        (1, "a", 100, 1),
        (1, "a", 200, 2),   # repeat -> extends episode, no new row
        (1, "b", 300, 3),
        (1, None, 400, 4),  # value -> null IS a change
        (1, "b", 500, 5),   # null -> value IS a change
        (2, "x", 100, 6),   # single-episode key
    ]
    df = spark.createDataFrame(rows, "k long, v string, ts long, seq long")
    out = scd2_build(df, "k", "v", "ts", "seq")
    got = sorted(
        ((r.k, r.state, r.valid_from, r.valid_to, r.is_current) for r in out.collect()),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        (1, "a", 100, 300, 0),
        (1, "b", 300, 400, 0),
        (1, None, 400, 500, 0),
        (1, "b", 500, None, 1),
        (2, "x", 100, None, 1),
    ]
    # intervals chain: each non-current valid_to equals the next valid_from
    by_key = {}
    for k, _, vf, vt, cur in got:
        by_key.setdefault(k, []).append((vf, vt, cur))
    for eps in by_key.values():
        for (vf, vt, cur), (nvf, _, _) in zip(eps, eps[1:]):
            assert vt == nvf and cur == 0
        assert eps[-1][1] is None and eps[-1][2] == 1

    # AQE's toString repeats the tree under "Initial Plan" — count the
    # final section only
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1


def test_nb_classifier_separates_planted_vocabularies(spark):
    """NB over hashed features must perfectly separate disjoint
    vocabularies, score held-out docs with smoothed unseen-bucket
    defaults (not zero), and be repartition-deterministic."""
    from tfl_realtime_lakehouse_spark.operators.classifier import (
        nb_confusion,
        nb_score,
        nb_train,
    )

    pos = "alpha beta gamma delta epsilon"
    neg = "zork quux blarg fnord grue"
    rows = [(i, pos, True) for i in range(20)] + [
        (i, neg, False) for i in range(20, 40)
    ]
    # held-out docs, one per class, plus one with an unseen token
    rows += [(100, "alpha beta", True), (101, "zork fnord", False),
             (102, "alpha UNSEENTOKEN", True)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    train = docs.where(F.col("doc_id") < 40)
    test = docs.where(F.col("doc_id") >= 100)

    w, s = nb_train(train, label=F.col("y"), buckets=64)
    scores = {r.doc_id: r.score for r in nb_score(test, w, s, buckets=64).collect()}
    assert scores[100] > 0 and scores[101] < 0 and scores[102] > 0

    conf = {(r.actual, r.predicted): r.n
            for r in nb_confusion(nb_score(test, w, s, buckets=64),
                                  test.select("doc_id", "y")).collect()}
    assert conf == {(1, 1): 2, (0, 0): 1}

    scores2 = {
        r.doc_id: r.score
        for r in nb_score(test.repartition(7), w, s, buckets=64).collect()
    }
    assert scores == scores2  # bit-identical decimal-exact scoring


def test_nb_weighted_training_equals_replicated(spark):
    """nb_train with integer row multiplicities must produce the exact
    model (weights AND stats) of training on the physically replicated
    rows — the contract the r5 weighted contraction relies on."""
    from tfl_realtime_lakehouse_spark.operators.classifier import nb_train

    base = [("alpha beta alpha", True, 3), ("zork quux", False, 5),
            ("beta zork", True, 2), ("quux quux grue", False, 1)]
    replicated = spark.createDataFrame(
        [(i * 100 + k, t, y) for i, (t, y, m) in enumerate(base)
         for k in range(m)],
        "doc_id long, text string, y boolean",
    )
    contracted = spark.createDataFrame(
        [(i, t, y, m) for i, (t, y, m) in enumerate(base)],
        "doc_id long, text string, y boolean, m long",
    )
    w_r, s_r = nb_train(replicated, label=F.col("y"), buckets=32)
    w_c, s_c = nb_train(contracted, label=F.col("y"), buckets=32, weight="m")
    assert sorted(map(tuple, w_r.collect())) == sorted(map(tuple, w_c.collect()))
    assert s_r.collect() == s_c.collect()


def test_longest_common_span_finds_planted_paste(spark):
    """A verbatim 10-token paragraph pasted into an otherwise-different
    document must surface with exactly span=10 (run of 3 matched 8-token
    windows); two docs sharing only scattered tokens must not pair; and
    a doc shorter than the window size produces no postings."""
    from tfl_realtime_lakehouse_spark.operators.dedup import longest_common_span

    para = "one two three four five six seven eight nine ten"  # 10 tokens
    filler_a = "aa bb cc dd ee ff gg hh ii jj kk ll"
    filler_b = "mm nn oo pp qq rr ss tt uu vv ww xx"
    rows = [
        (1, filler_a + " " + para + " " + filler_b),
        (2, filler_b + " " + para + " " + filler_a),   # shares para + fillers, far apart
        (3, "one zz two yy three xx four ww five vv"), # scattered overlap only
        (4, "short doc"),                              # < w tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_windows, r.max_span_tokens)
        for r in longest_common_span(docs, w=8, min_span_tokens=10).collect()
    }
    assert (1, 2) in got
    n_windows, span = got[(1, 2)]
    assert span >= 10                       # the pasted paragraph
    assert all(3 not in pair and 4 not in pair for pair in got)
    # the 10-token paragraph alone yields a run of 3 windows; fillers on
    # opposite sides cannot extend the same diagonal
    assert n_windows >= 3


def test_bloom_semi_join_equals_plain_and_prunes(spark):
    """bloom_semi_join must return exactly the plain left_semi result
    (no false negatives; false positives removed by the exact stage),
    and the bloom pre-filter must actually prune: with a 1%-selective
    dim, survivors entering the exact join stay well under the fact
    count."""
    from tfl_realtime_lakehouse_spark.operators.bloom import (
        bloom_bitmap,
        bloom_prune,
        bloom_semi_join,
    )

    fact = spark.range(0, 20000).select(F.col("id").alias("k"))
    dim = spark.range(0, 20000, 100).select(F.col("id").alias("k"))  # 200 keys

    got = sorted(r.k for r in bloom_semi_join(fact, dim, "k").collect())
    want = sorted(r.k for r in fact.join(dim, "k", "left_semi").collect())
    assert got == want
    assert len(got) == 200

    bitmap = bloom_bitmap(dim, "k")
    assert bitmap.count() <= (1 << 17) // 64  # fixed-size sketch, not O(dim)
    survivors = bloom_prune(fact, bitmap, "k").count()
    # all 200 true matches survive; false positives stay ~1% of 19800
    assert 200 <= survivors < 200 + 0.05 * 19800


def test_mg_heavy_hitters_guarantees(spark):
    """Misra-Gries contract on a Zipf-ish corpus: every token with true
    frequency > n/capacity appears in the candidate set, and every
    emitted count is a lower bound within n/capacity of truth."""
    from collections import Counter

    from tfl_realtime_lakehouse_spark.operators.text import mg_heavy_hitters

    # 3 heavy tokens dominate; 500 rare tokens form the tail
    rows = []
    for i in range(3000):
        heavy = ["alpha", "beta", "gamma"][i % 3]
        rows.append((i, f"{heavy} t{i % 500} {heavy}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    truth = Counter()
    for _, t in rows:
        truth.update(t.split(" "))
    n_total = sum(truth.values())

    cap = 64
    got = {r.token: r.mg_count for r in mg_heavy_hitters(docs, capacity=cap).collect()}
    err = n_total / cap
    for tok, cnt in truth.items():
        if cnt > err:
            assert tok in got, f"frequent token {tok} missing"
    for tok, mg in got.items():
        assert mg <= truth[tok]
        assert mg >= truth[tok] - err


def test_jaccard_exact_contraction_is_identity_preserving(spark):
    """contract_exact must reproduce the raw posting-join output
    bit-for-bit on a corpus WITH exact duplicates: cross-group pairs
    inherit the representative pair's (n_shared, jaccard), within-group
    pairs emit (full set size, 1.0), and zero-shingle duplicate groups
    (docs shorter than n) emit nothing — exactly like raw postings."""
    from tfl_realtime_lakehouse_spark.operators.dedup import ngram_jaccard_pairs

    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "the quick brown fox jumps over the lazy cat again and again"
    rows = [
        (1, base_a), (2, base_a), (3, base_a),       # 3 exact copies
        (10, base_b), (11, base_b),                  # 2 copies of a near-dup
        (20, "completely different words everywhere nothing shared here at all"),
        (30, "ab"), (31, "ab"),                      # dup group below n tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw = {tuple(r) for r in
           ngram_jaccard_pairs(docs, threshold=0.2, contract_exact=False).collect()}
    con = {tuple(r) for r in
           ngram_jaccard_pairs(docs, threshold=0.2, contract_exact=True).collect()}
    assert raw == con
    pairs = {(r[0], r[1]) for r in con}
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs  # within-group
    assert (1, 10) in pairs                                         # cross-group
    assert not any(30 in p or 31 in p for p in pairs)               # zero-shingle


def test_minhash_verify_contraction_is_identity_preserving(spark):
    """contracted_pairs over (LSH candidates -> exact verify) must equal
    the raw composition on a corpus with exact duplicates: identical
    docs collide on every band, so within-group pairs are verified at
    (set size, 1.0); copies of near-dups expand through their reps."""
    from tfl_realtime_lakehouse_spark.operators.dedup import (
        contracted_pairs,
        minhash_lsh_candidates,
        verify_pairs_jaccard,
    )

    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base_b = "alpha beta gamma delta epsilon zeta eta theta iota mu"
    rows = [
        (1, base_a), (2, base_a),
        (10, base_b), (11, base_b), (12, base_b),
        (20, "totally different content with no overlap whatsoever here"),
        (30, "xy"), (31, "xy"),  # below shingle width
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def _pairs(reps):
        cands = minhash_lsh_candidates(reps, n=3, num_hashes=16, bands=4)
        return verify_pairs_jaccard(reps, cands, n=3, threshold=0.2)

    raw = {tuple(r) for r in _pairs(docs).collect()}
    con = {tuple(r) for r in contracted_pairs(docs, _pairs, n=3).collect()}
    assert raw == con
    assert {(r[0], r[1]) for r in con} >= {(1, 2), (10, 11), (10, 12), (11, 12)}


def test_vector_contraction_is_identity_preserving(spark):
    """contracted_vector_pairs must equal the raw matmul tier on a
    corpus with exactly-equal vectors, including the zero-vector group
    (raw: NaN score fails the threshold; contracted: skipped)."""
    from tfl_realtime_lakehouse_spark.operators.similarity import (
        contracted_vector_pairs,
        neardup_pairs_numpy,
    )

    v1 = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.9, 0.1, 0.0, 0.0]
    v3 = [0.0, 0.0, 1.0, 0.0]
    z = [0.0, 0.0, 0.0, 0.0]
    rows = [(1, v1), (2, v1), (3, v1), (10, v2), (11, v2), (20, v3), (30, z), (31, z)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    fn = lambda reps: neardup_pairs_numpy(reps, threshold=0.4)
    raw = {tuple(r) for r in fn(emb).collect()}
    con = {tuple(r) for r in contracted_vector_pairs(emb, fn).collect()}
    assert raw == con
    pairs = {(r[0], r[1]) for r in con}
    assert {(1, 2), (1, 3), (2, 3), (10, 11), (1, 10)} <= pairs
    assert not any(30 in p or 31 in p for p in pairs)


def test_bucket_gapfill_locf_and_interp_edges(spark):
    """Gap buckets get n_events=0; LOCF carries the last observed value
    but leaves leading-edge gaps null; interpolation is linear between
    neighbouring observed buckets and null at both edges."""
    import datetime as dt

    from tfl_realtime_lakehouse_spark.operators.timeseries import bucket_gapfill

    t = lambda h: dt.datetime(2024, 1, 1, h, 15)
    rows = [
        # key "a": observed at hours 1, 4 (gap 2-3), value 10 -> 40
        ("a", t(1), 10.0),
        ("a", t(4), 40.0),
        # key "b": observed only at hour 3 (leading gap 0-2 relative to
        # the global span starting at hour 0... span is global [1, 4])
        ("b", t(3), 7.0),
        ("b", t(3), 9.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = bucket_gapfill(df).orderBy("key", "bucket").collect()

    by = {(r["key"], r["bucket"].hour): r for r in out}
    # dense grid: global span hours 1..4 for both keys
    assert len(out) == 8

    a2, a3 = by[("a", 2)], by[("a", 3)]
    assert a2["n_events"] == 0 and a2["was_gap"] and a2["avg_value"] is None
    assert a2["avg_value_locf"] == 10.0 and a3["avg_value_locf"] == 10.0
    assert abs(a2["avg_value_interp"] - 20.0) < 1e-9
    assert abs(a3["avg_value_interp"] - 30.0) < 1e-9

    # leading-edge gaps: LOCF and interp both null before first observation
    b1 = by[("b", 1)]
    assert b1["avg_value_locf"] is None and b1["avg_value_interp"] is None
    assert by[("b", 3)]["avg_value"] == 8.0
    # trailing-edge gap: LOCF carries, interp null (no next observation)
    b4 = by[("b", 4)]
    assert b4["avg_value_locf"] == 8.0 and b4["avg_value_interp"] is None


def test_counter_rate_reset_semantics(spark):
    """A negative delta is a counter restart: the post-reset value is
    the increase. Series heads contribute nothing."""
    import datetime as dt

    from tfl_realtime_lakehouse_spark.operators.timeseries import counter_rate

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # counter: 10 -> 25 (+15) -> 3 (reset, +3) -> 10 (+7); head drops
        ("a", 1, t(0), 10.0),
        ("a", 2, t(10), 25.0),
        ("a", 3, t(20), 3.0),
        ("a", 4, t(30), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    out = counter_rate(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 3
    assert r["increase"] == 25.0  # 15 + 3 + 7
    assert abs(r["rate_per_sec"] - 25.0 / 3600) < 1e-6


def test_rolling_anomaly_flags_spike_only(spark):
    """A 10x spike after a stable history is flagged; stable buckets and
    under-history buckets are not."""
    import datetime as dt

    from tfl_realtime_lakehouse_spark.operators.timeseries import rolling_anomaly

    rows = []
    for h in range(15):
        # one event per hour, value 100 ± tiny wiggle; hour 14 spikes
        v = 1000.0 if h == 14 else 100.0 + (h % 3)
        rows.append(("k", h, dt.datetime(2024, 1, 1, h), v))
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    out = {r["bucket"].hour: r for r in rolling_anomaly(df, min_history=12).collect()}
    assert out[5]["is_anomaly"] is None  # only 5 history rows
    assert out[13]["is_anomaly"] == 0
    assert out[14]["is_anomaly"] == 1
    assert out[14]["n_hist"] == 14


def test_reservoir_per_key_deterministic_and_sized(spark):
    from tfl_realtime_lakehouse_spark.operators.sampling import reservoir_per_key

    rows = [(f"k{i % 3}", i) for i in range(100)] + [("rare", 1000)]
    df = spark.createDataFrame(rows, "key string, doc_id long")
    a = {(r["key"], r["doc_id"]) for r in reservoir_per_key(df, "key", 5).collect()}
    b = {
        (r["key"], r["doc_id"])
        for r in reservoir_per_key(df.repartition(7), "key", 5).collect()
    }
    assert a == b  # repartition-invariant
    from collections import Counter

    c = Counter(k for k, _ in a)
    assert c["rare"] == 1 and all(v == 5 for k, v in c.items() if k != "rare")


def test_semantic_dedup_matches_numpy_greedy(spark):
    """The distributed per-cluster greedy prune equals a sequential
    numpy recompute of the same rule, and planted duplicate vectors
    collapse to the lowest-id keeper."""
    import numpy as np

    from tfl_realtime_lakehouse_spark.operators.similarity import (
        kmeans_assign,
        kmeans_train,
        semantic_dedup,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal((30, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant near-identical copies of vectors 0 and 5 (tiny perturbation)
    rows.append((100, [float(x) for x in base[0] * 1.0001]))
    rows.append((101, [float(x) for x in base[5] * 0.9999]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = semantic_dedup(emb, k=3, iters=2, threshold=0.95).collect()
    got = {r["vec_id"]: (r["cell"], r["keep"], r["pruned_by"]) for r in out}
    assert len(got) == len(rows)

    # recompute expected with the SAME trained cells (determinism of the
    # training is what makes this comparable)
    cents = kmeans_train(emb, k=3, iters=2)
    assigned = kmeans_assign(emb, cents).collect()
    by_cell: dict = {}
    for r in sorted(assigned, key=lambda r: r["vec_id"]):
        by_cell.setdefault(r["cell"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    expected = {}
    for cell, members in by_cell.items():
        kept: list = []
        for vid, vec in members:
            vecn = vec / (np.linalg.norm(vec) or 1.0)
            pruner = next(
                (kv for kv, kn in kept if float(kn @ vecn) >= 0.95), None
            )
            if pruner is None:
                kept.append((vid, vecn))
                expected[vid] = (cell, 1, None)
            else:
                expected[vid] = (cell, 0, pruner)
    assert got == expected

    # the planted copies were pruned by their originals (same cluster)
    assert got[100][1] == 0 and got[100][2] == 0
    assert got[101][1] == 0 and got[101][2] == 5


def test_simhash_contraction_is_identity_preserving(spark):
    """Contracted simhash pairs equal the raw chunk-join on a corpus
    with planted exact copies (within-group pairs at Hamming 0,
    cross-group pairs inherited from representatives)."""
    from tfl_realtime_lakehouse_spark.operators import dedup as D

    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # near base 0
        "totally different words entirely other content here now",
    ]
    rows = []
    i = 0
    for copy in range(4):  # 4 exact copies of each text
        for t in base:
            rows.append((i, t))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw = {
        tuple(r)
        for r in D.simhash_near_pairs(docs, max_hamming=8, contract_exact=False).collect()
    }
    con = {
        tuple(r)
        for r in D.simhash_near_pairs(docs, max_hamming=8, contract_exact=True).collect()
    }
    assert raw == con
    assert (0, 3, 0) in con  # copies of text 0 at Hamming 0


def test_common_span_contraction_is_identity_preserving(spark):
    """Contracted longest-common-span equals the raw positional plan —
    including a document with an INTERNALLY REPEATED window, whose
    self-pair count is sum(c_i^2), not just n_windows."""
    from tfl_realtime_lakehouse_spark.operators.dedup import longest_common_span

    rep8 = " ".join(["w" + str(j) for j in range(8)])
    texts = [
        # internally repeated 8-token window: the same 8 tokens twice + tail
        rep8 + " " + rep8 + " tail1 tail2 tail3 tail4",
        # plain long doc sharing a paragraph with the next one
        "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12 x1 x2 x3 x4",
        "z1 z2 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12 z3 z4",
        "short doc under window",
    ]
    rows = []
    i = 0
    for copy in range(3):  # 3 exact copies of each
        for t in texts:
            rows.append((i, t))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(w=8, min_span_tokens=10)
    raw = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_windows"], r["max_span_tokens"])
        for r in longest_common_span(docs, contract_exact=False, **kw).collect()
    }
    con = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_windows"], r["max_span_tokens"])
        for r in longest_common_span(docs, contract_exact=True, **kw).collect()
    }
    assert raw == con
    # the repeated-window doc's self-pair: windows at positions where
    # the duplicated block realigns inflate the count past n_windows
    assert con[(0, 4)][1] == 20  # full length (8+8+4 tokens) as max span
    n_windows = 20 - 8 + 1
    assert con[(0, 4)][0] > n_windows


def test_ivfpq_recall_on_clustered_corpus(spark):
    """IVF-PQ end-to-end on a planted-cluster corpus (near-random
    vectors have no neighbor structure for any quantizer — same bar as
    the plain-PQ test): neighbors must come from the query's true
    cluster, and element recall vs exact L2 must clear a floor."""
    import numpy as np

    from tfl_realtime_lakehouse_spark.operators.similarity import ivfpq_topk

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(12, 64))
    rows = []
    vid = 0
    for c in range(12):
        for _ in range(40):
            v = centers[c] + rng.normal(scale=0.12, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id").isin(0, 40, 200, 441)).select(
        "vec_id", "embedding"
    )
    got = ivfpq_topk(
        emb, queries, k=10, n_cells=6, m=8, codes=16, nprobe=2
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert set(by_q) == {0, 40, 200, 441} and all(len(v) == 10 for v in by_q.values())

    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    hits = total = 0
    for qid, approx in by_q.items():
        # cluster-level: every neighbor from the query's true cluster
        same = sum(1 for v in approx if v // 40 == qid // 40)
        assert same >= 9, f"query {qid}: only {same}/10 in-cluster"
        q = vecs[qid]
        exact = sorted(
            (v for v in vecs if v != qid),
            key=lambda v: (float(np.sum((q - vecs[v]) ** 2)), v),
        )[:10]
        hits += len(set(approx) & set(exact))
        total += 10
    assert hits / total >= 0.35, f"IVF-PQ recall@10 {hits/total}"


def test_zero_norm_vectors_score_zero_not_nan(spark):
    """Zero-norm embeddings must stay all-zero after normalization (score
    0 against everything, below any positive threshold) in every exact
    tier — no NaN rows, no RuntimeWarning from the driver-side gather."""
    import warnings

    rows = [
        (1, [0.0] * 8),
        (2, [1.0] + [0.0] * 7),
        (3, [1.0] + [0.0] * 7),
        (4, [0.0] * 8),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with warnings.catch_warnings():
        # driver-side matrix normalization must be warning-free; the
        # worker-side batches use the same guarded helper
        warnings.simplefilter("error", RuntimeWarning)
        got_numpy = S.neardup_pairs_numpy(df, threshold=0.5).collect()
    got_blocked = S.blocked_neardup_pairs(df, threshold=0.5, n_blocks=2).collect()
    for got in (got_numpy, got_blocked):
        pairs = {(r["vec_a"], r["vec_b"]): r["score"] for r in got}
        assert pairs == {(2, 3): 1.0}, pairs  # zero vectors pair with nothing


def test_kmeans_assign_preserves_input_id_and_cell_types(spark):
    """String ids and long cells must round-trip through the BLAS assign
    (output schema derives from the inputs, not hardcoded Long/Int)."""
    from pyspark.sql import types as T

    corpus = spark.createDataFrame(
        [("a", [0.0, 0.1]), ("b", [10.0, 9.9]), ("c", [0.2, 0.0])],
        "vec_id string, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "cell long, centroid array<double>"
    )
    out = S.kmeans_assign(corpus, cents)
    assert isinstance(out.schema["vec_id"].dataType, T.StringType)
    assert isinstance(out.schema["cell"].dataType, T.LongType)
    got = {r["vec_id"]: r["cell"] for r in out.collect()}
    assert got == {"a": 0, "b": 1, "c": 0}


def test_fan_out_noop_on_wide_lineage_and_fans_scan(spark, sf_correct):
    """fan_out must not probe .rdd on shuffle-bearing lineage (AQE would
    finalize the plan and materialize the exchanges eagerly): a wide df
    comes back as the SAME object. A narrow single-file scan still fans
    out to cluster parallelism."""
    from tfl_realtime_lakehouse_spark.sources.tables import fan_out

    ev = read_table(spark, sf_correct, "events")
    agg = ev.groupBy("event_type").count()
    assert fan_out(agg) is agg
    joined = ev.alias("a").join(ev.alias("b"), "event_id")
    assert fan_out(joined) is joined

    scan = ev.select("event_id", "event_type")
    fanned = fan_out(scan)
    assert fanned is not scan
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_lsh_builds_without_driver_probe_jobs(spark, sf_correct):
    """With bits given, constructing the LSH pair plan must launch ZERO
    Spark jobs (the dims .first() probe is gone — hyperplanes generate
    lazily inside the Arrow batch from the seed)."""
    emb = read_table(spark, sf_correct, "embeddings")
    sc = spark.sparkContext
    sc.setJobGroup("lsh_probe_check", "assert no jobs during plan build")
    try:
        pairs = S.hyperplane_lsh_pairs(emb, tables=4, bits=6, threshold=0.4)
        jobs = sc.statusTracker().getJobIdsForGroup("lsh_probe_check")
        assert jobs == [], f"plan construction launched jobs: {jobs}"
    finally:
        sc.setJobGroup(None, None)
    # and the lazily-generated planes still produce verified pairs
    rows = pairs.limit(5).collect()
    for r in rows:
        assert r["score"] >= 0.4


def test_ivfpq_persisted_probe_equals_build_path(spark, tmp_path, sf_correct):
    """ivfpq_persist + read_ivfpq_index + ivfpq_probe must reproduce the
    one-shot ivfpq_topk exactly (same trained model, same ADC scores),
    and the probe's candidate scan must be partition-prunable (dynamic
    partition pruning on the cell-partitioned index)."""
    idx = str(tmp_path / "ivfpq_idx")
    emb = read_table(spark, sf_correct, "embeddings")
    S.ivfpq_persist(emb, idx, n_cells=6, m=8, codes=16)
    cells, books, coded, m = S.read_ivfpq_index(spark, idx)
    assert m == 8
    qs = emb.where(F.col("vec_id") < 5).select("vec_id", "embedding")
    probed = S.ivfpq_probe(cells, books, coded, qs, k=10, nprobe=2, m=m)
    direct = S.ivfpq_topk(emb, qs, k=10, n_cells=6, m=8, codes=16, nprobe=2)
    assert sorted(map(tuple, probed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "cell scan not partition-pruned"


def test_countmin_never_undercounts_and_merges(spark, sf_correct):
    """CMS guarantees: est >= exact for every key (one-sided error), and
    sketches of disjoint shards merged by counter addition equal the
    sketch of the union (the mergeability contract)."""
    from tfl_realtime_lakehouse_spark.operators import sketches as SK

    ev = read_table(spark, sf_correct, "events")
    sketch = SK.countmin_build(ev, "user_id", depth=4, width=64)
    assert sketch.count() <= 4 * 64  # bounded regardless of corpus size
    probes = ev.select("user_id").distinct().limit(50)
    est = {
        r["user_id"]: r["cm_est"]
        for r in SK.countmin_estimate(
            sketch, probes, "user_id", depth=4, width=64
        ).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.join(probes, "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, f"CMS undercounted key {k}: {est[k]} < {n}"

    # merge invariance: shard by parity, merge, compare counter-by-counter
    a = SK.countmin_build(ev.where(F.col("event_id") % 2 == 0), "user_id", 4, 64)
    b = SK.countmin_build(ev.where(F.col("event_id") % 2 == 1), "user_id", 4, 64)
    merged = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in SK.countmin_merge(a, b).collect()
    }
    whole = {(r["d"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    assert merged == whole


def test_pagerank_properties_and_determinism(spark):
    """Fixed-iteration PageRank on a hand graph: ranks sum to ~1 minus
    leaked dangling mass, a node with more in-links outranks one with
    fewer, and two runs are bit-identical (decimal-exact sums)."""
    from tfl_realtime_lakehouse_spark.operators.graph import pagerank

    # star into 1 (from 2,3,4) + chain 1->5; 5 dangling
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (1, 5)], "src long, dst long"
    )
    pr1 = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=3).collect()}
    pr2 = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=3).collect()}
    assert pr1 == pr2  # bit-identical across runs
    assert set(pr1) == {1, 2, 3, 4, 5}
    # receivers outrank pure sources (2,3,4 have no in-links and sit at
    # the (1-d)/N floor); the 1→5 chain forwards node 1's early mass,
    # so both receivers clear the floor
    assert pr1[1] > pr1[2] and pr1[5] > pr1[2]
    assert pr1[2] == pr1[3] == pr1[4]  # symmetric sources tie exactly
    # simple-variant mass: every rank sits at or above the (1-d)/N
    # teleport floor, and the total never exceeds 1 (dangling node 5
    # leaks its mass instead of redistributing — documented variant)
    floor = (1 - 0.85) / 5
    assert all(v >= floor - 1e-9 for v in pr1.values())
    assert sum(pr1.values()) <= 1.000001
    # hand-computed it3 values for the chain: sources at the floor
    assert pr1[2] == 0.03 and pr1[1] == 0.1065 and pr1[5] == 0.120525


def test_triangle_count_known_graphs(spark):
    """Degree-ordered triangle counting on hand graphs: K4 (every node
    in 3 of the 4 triangles), a hub-and-spoke with one closing edge
    (exactly one triangle, credited to its 3 corners), triangle-free
    star (empty result), and invariance to edge direction/duplicates/
    self-loops in the input."""
    from tfl_realtime_lakehouse_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    # hub 0 -> 1..5 (power-law-ish) + one closing edge (1,2); messy
    # input: reversed direction, duplicate, self-loop
    hub = [(0, i) for i in range(1, 6)] + [(2, 1), (1, 2), (1, 2), (3, 3)]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(
            spark.createDataFrame(hub, "src long, dst long")
        ).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}

    star = [(0, i) for i in range(1, 6)]
    assert (
        triangle_count(spark.createDataFrame(star, "src long, dst long")).count() == 0
    )


def test_grid_eps_join_matches_brute_force(spark):
    """The 3x3 cell-neighborhood join must find every pair within eps
    exactly once — verified against an O(n^2) brute force on random
    points (negative coords included) plus exact-boundary points that
    sit on cell edges and at distance exactly eps."""
    import itertools
    import math
    import random

    from tfl_realtime_lakehouse_spark.operators.spatial import grid_eps_join

    rng = random.Random(7)
    pts = [(i, rng.uniform(-1, 1), rng.uniform(-1, 1)) for i in range(200)]
    # cell-edge and exact-eps adversarial cases
    pts += [(200, 0.0, 0.0), (201, 0.1, 0.0), (202, -0.1, 0.0), (203, 0.05, 0.05)]
    eps = 0.1
    expect = {
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= eps * eps
    }
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    rows = grid_eps_join(df, "pid", "x", "y", eps).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert len(rows) == len(got)  # exactly-once discovery
    assert got == expect
    for r in rows:
        a = next(p for p in pts if p[0] == r["id_a"])
        b = next(p for p in pts if p[0] == r["id_b"])
        assert abs(r["dist"] - round(math.dist(a[1:], b[1:]), 6)) < 1e-9


def test_cdc_apply_merge_semantics(spark):
    """Hand-built MERGE cases: trailing tombstone deletes (even over a
    base row), a later upsert resurrects a tombstoned key, within-batch
    supersession keeps only the winner, brand-new keys insert, untouched
    keys keep the base payload, and timestamp ties break by the
    tiebreak column."""
    from tfl_realtime_lakehouse_spark.operators.scd import cdc_apply

    base = spark.createDataFrame(
        [(1, 10.0, 100), (2, 20.0, 100), (3, 30.0, 100)],
        "k long, v double, ts long",
    )
    # k=1: U(t=200,v=11) then D(t=300)      -> deleted
    # k=2: D(t=200) then U(t=300,v=22)      -> resurrected with 22
    # k=3: untouched                        -> base 30
    # k=4: insert U(t=200,v=44), superseded by U(t=250,v=45)
    # k=5: two changes at SAME ts, ids 7<8  -> id 8 wins (v=52)
    feed = spark.createDataFrame(
        [
            (1, 11.0, 200, 1, "U"),
            (1, None, 300, 2, "D"),
            (2, None, 200, 3, "D"),
            (2, 22.0, 300, 4, "U"),
            (4, 44.0, 200, 5, "U"),
            (4, 45.0, 250, 6, "U"),
            (5, 51.0, 200, 7, "U"),
            (5, 52.0, 200, 8, "U"),
        ],
        "k long, v double, ts long, eid long, op string",
    )
    out = cdc_apply(base, feed, "k", "ts", "eid", "op", ["v"])
    got = {r["k"]: (r["v"], r["ts"], r["src"]) for r in out.collect()}
    assert got == {
        2: (22.0, 300, "cdc"),
        3: (30.0, 100, "base"),
        4: (45.0, 250, "cdc"),
        5: (52.0, 200, "cdc"),
    }


def test_random_projection_jl_property_and_determinism(spark):
    """The seeded ±1 projection must be (a) bit-identical across runs,
    (b) exactly sign-symmetric (proj(-x) = -proj(x) — the decimal cast
    is odd), and (c) distance-preserving in the JL sense: squared
    distances in the 8-dim image correlate strongly with the 64-dim
    originals on fixed-seed gaussian data."""
    import random

    import numpy as np

    from tfl_realtime_lakehouse_spark.operators.similarity import random_projection

    rng = random.Random(11)
    # 3 well-separated clusters: inter-cluster distances dwarf
    # intra-cluster ones, so JL preservation is measurable (iid
    # gaussian points all sit at ~the same pairwise distance and the
    # correlation would be noise-dominated)
    centers = [[0.0] * 64, [6.0] * 64, [-6.0] * 64]
    vecs = [
        (i, [c + rng.gauss(0, 1) for c in centers[i % 3]]) for i in range(30)
    ]
    df = spark.createDataFrame(vecs, "vid long, v array<double>")
    p1 = {r["vid"]: [r[f"y{j}"] for j in range(8)] for r in
          random_projection(df, "vid", "v", 64, 8).collect()}
    p2 = {r["vid"]: [r[f"y{j}"] for j in range(8)] for r in
          random_projection(df, "vid", "v", 64, 8).collect()}
    assert p1 == p2

    neg = spark.createDataFrame(
        [(i, [-x for x in v]) for i, v in vecs], "vid long, v array<double>"
    )
    pn = {r["vid"]: [r[f"y{j}"] for j in range(8)] for r in
          random_projection(neg, "vid", "v", 64, 8).collect()}
    for i in p1:
        assert pn[i] == [-y if y != 0 else y for y in p1[i]]

    orig = {i: np.array(v) for i, v in vecs}
    d_hi, d_lo = [], []
    for a in range(30):
        for b in range(a + 1, 30):
            d_hi.append(float(np.sum((orig[a] - orig[b]) ** 2)))
            d_lo.append(
                float(np.sum((np.array(p1[a]) - np.array(p1[b])) ** 2))
            )
    r = np.corrcoef(d_hi, d_lo)[0, 1]
    assert r > 0.5, f"JL distance correlation too weak: {r}"


def test_histogram_sketch_merge_and_error_bound(spark):
    """Histogram quantile sketch: sharded build + merge must equal the
    direct build counter-for-counter; quantile estimates must sit
    within half a bin width of the exact quantiles; out-of-range
    values clip into the edge buckets instead of being dropped."""
    import random

    from tfl_realtime_lakehouse_spark.operators import sketches as SK

    rng = random.Random(3)
    rows = [(i, rng.uniform(0, 100)) for i in range(2000)]
    rows += [(2000, -5.0), (2001, 999.0)]  # out-of-range clips
    df = spark.createDataFrame(rows, "i long, v double")

    direct = SK.histogram_sketch(df, "v", 0.0, 100.0, 50)
    merged = SK.histogram_merge(
        SK.histogram_sketch(df.where("i % 2 = 0"), "v", 0.0, 100.0, 50),
        SK.histogram_sketch(df.where("i % 2 = 1"), "v", 0.0, 100.0, 50),
    )
    assert {(r["bucket"], r["cnt"]) for r in direct.collect()} == {
        (r["bucket"], r["cnt"]) for r in merged.collect()
    }
    assert sum(r["cnt"] for r in direct.collect()) == 2002  # nothing dropped

    est = SK.histogram_quantiles(direct, [0.5, 0.95], 0.0, 100.0, 50).collect()[0]
    vals = sorted(v for _, v in rows)
    for q, col in [(0.5, "p5"), (0.95, "p95")]:
        exact = vals[int(q * len(vals)) - 1]
        if 0 <= exact <= 100:
            assert abs(est[col] - exact) <= 2.0 + 1e-9, (q, est[col], exact)


def test_label_propagation_matches_sequential_reference(spark):
    """Synchronous LPA on two triangles joined by a bridge: the Spark
    rounds must equal a sequential Jacobi reference (same tie policy),
    and every node in a triangle must share its triangle's converged
    label. Isolated-in-practice determinism: two runs identical."""
    from tfl_realtime_lakehouse_spark.operators.graph import label_propagation

    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]

    def reference(iters):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        labels = {n: n for n in adj}
        for _ in range(iters):
            nxt = {}
            for n in adj:
                counts = {}
                for m in adj[n]:
                    counts[labels[m]] = counts.get(labels[m], 0) + 1
                best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                nxt[n] = best
            labels = nxt
        return labels

    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iters=iters).collect()
        }
        assert got == reference(iters), f"iter {iters}"
    got3 = {r["node"]: r["label"] for r in label_propagation(df, iters=3).collect()}
    assert got3 == {
        r["node"]: r["label"] for r in label_propagation(df, iters=3).collect()
    }
    assert got3[1] == got3[2] == got3[3]
    assert got3[11] == got3[12]


def test_dq_dataset_level_checks(spark):
    """unique_violations finds exactly the duplicated keys with their
    multiplicity; referential_violations finds exactly the orphan FKs
    (nulls excluded); accepted_values flags only out-of-set non-nulls."""
    from tfl_realtime_lakehouse_spark.dq.checks import (
        accepted_values,
        referential_violations,
        unique_violations,
    )

    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "c"), (None, "d")],
        "k int, v string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk int")

    dups = {(r["k"], r["v"]): r["n_rows"]
            for r in unique_violations(child, ["k", "v"]).collect()}
    assert dups == {}  # (k, v) pairs are unique
    dups_k = {r["k"]: r["n_rows"] for r in unique_violations(child, ["k"]).collect()}
    assert dups_k == {1: 2}

    orphans = {r["k"] for r in
               referential_violations(child, "k", parent, "pk").collect()}
    assert orphans == {3}  # null FK is not an orphan

    chk = accepted_values("v", ["a", "b", "c"])
    bad = child.where(chk.predicate).collect()
    assert {r["v"] for r in bad} == {"d"}


def test_contamination_fan_out_fires_before_antijoin(spark):
    """Regression (SCALE.md round-3 session 2b): fan_out no-ops on
    join-bearing lineage, so contamination_check must spread the bare
    corpus scan BEFORE its benchmark anti-join — otherwise a
    1-partition scan serializes the whole gram pipeline on one core
    (4 s -> 31 s at sf1). Assert the repartition is present in the
    plan when the input under-parallelizes, and absent when the input
    is already spread."""
    from tfl_realtime_lakehouse_spark.operators import text as X

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(200)],
        "doc_id long, text string",
    )
    bench = docs.where("doc_id % 10 = 0")

    narrow = X.contamination_check(docs.coalesce(1), bench, n=2)
    plan = narrow._jdf.queryExecution().analyzed().toString()
    assert "Repartition" in plan  # fan_out fired on the scored side

    spread = X.contamination_check(
        docs.repartition(spark.sparkContext.defaultParallelism), bench, n=2
    )
    rows = {r["doc_id"] for r in spread.collect()}
    assert rows == {i for i in range(200) if i % 10 != 0}  # anti-join intact


def test_bfs_khop_distances(spark):
    """K-hop BFS on a path-plus-branch graph: exact min distances from
    the seed set, nodes beyond the hop budget absent, isolated seeds
    present at distance 0, two seeds relax to the nearer one."""
    from tfl_realtime_lakehouse_spark.operators.graph import bfs_khop

    # path 0-1-2-3-4-5, branch 2-10, isolated seed 99
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (99,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds, hops=3).collect()}
    assert got == {0: 0, 99: 0, 1: 1, 2: 2, 3: 3, 10: 3}

    # two seeds: node 3 is 3 hops from 0 but 1 hop from 4
    seeds2 = spark.createDataFrame([(0,), (4,)], "node long")
    got2 = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds2, hops=2).collect()}
    assert got2[3] == 1 and got2[2] == 2 and got2[5] == 1 and got2[0] == 0


def test_mmr_select_matches_python_greedy(spark):
    """mmr_select replays the reference greedy move-for-move: argmax rel
    first, then argmax lam*rel-(1-lam)*max-sim-to-selected with id
    tiebreaks, across multiple query groups including a short pool."""
    import itertools

    rng_rel = {
        # query 1: 5 candidates; query 2: 3 candidates (shorter than k)
        (1, 10): 0.9, (1, 11): 0.88, (1, 12): 0.7, (1, 13): 0.88, (1, 14): 0.5,
        (2, 20): 0.6, (2, 21): 0.6, (2, 22): 0.1,
    }
    sim = {
        (1, 10, 11): 0.95, (1, 10, 12): 0.2, (1, 10, 13): 0.1, (1, 10, 14): 0.0,
        (1, 11, 12): 0.3, (1, 11, 13): 0.2, (1, 11, 14): 0.1,
        (1, 12, 13): 0.9, (1, 12, 14): 0.4, (1, 13, 14): 0.2,
        (2, 20, 21): 0.99, (2, 21, 22): 0.0, (2, 20, 22): 0.5,
    }
    lam, k = 0.7, 4
    cand = spark.createDataFrame(
        [(q, v, r) for (q, v), r in rng_rel.items()], "query_id long, vec_id long, rel double"
    )
    ps = spark.createDataFrame(
        [(q, a, b, s) for (q, a, b), s in sim.items()]
        + [(q, b, a, s) for (q, a, b), s in sim.items()],
        "query_id long, a long, b long, sim double",
    )
    got = {
        (r.query_id, r.step): r.vec_id
        for r in S.mmr_select(cand, ps, k=k, lam=lam).collect()
    }

    # reference greedy
    want = {}
    for q in {1, 2}:
        rel = {v: r for (qq, v), r in rng_rel.items() if qq == q}
        sims = {}
        for (qq, a, b), s in sim.items():
            if qq == q:
                sims.setdefault(a, {})[b] = s
                sims.setdefault(b, {})[a] = s
        sel = [min(rel, key=lambda c: (-rel[c], c))]
        want[(q, 1)] = sel[0]
        for step in range(2, k + 1):
            pool = [c for c in rel if c not in sel and any(s in sims.get(c, {}) for s in sel)]
            if not pool:
                break
            def score(c):
                mx = max(sims[c][s] for s in sel if s in sims[c])
                return (-(lam * rel[c] - (1 - lam) * mx), c)
            pick = min(pool, key=score)
            sel.append(pick)
            want[(q, step)] = pick
    assert got == want
    # diversity sanity: near-duplicate 11 of the query-1 winner 10 is
    # NOT picked second despite having the 2nd-highest rel
    assert got[(1, 2)] != 11


def test_containment_raw_equals_contracted_and_catches_subsets(spark):
    """Pair-operator checklist: the contraction wrapper is bit-identical
    to the raw posting join, and containment flags a subset duplicate
    that jaccard misses."""
    from tfl_realtime_lakehouse_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long_doc = short + " " + " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, short),
        (2, long_doc),       # contains doc 1 verbatim
        (3, short),          # exact copy of doc 1 (exercises contraction)
        (4, "totally different words here none shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = {
        (r.doc_a, r.doc_b): (r.n_shared, r.containment)
        for r in ngram_containment_pairs(df, contract_exact=False).collect()
    }
    contracted = {
        (r.doc_a, r.doc_b): (r.n_shared, r.containment)
        for r in ngram_containment_pairs(df, contract_exact=True).collect()
    }
    assert raw == contracted
    # subset dup found at containment 1.0
    assert contracted[(1, 2)][1] == 1.0
    assert contracted[(1, 3)][1] == 1.0  # exact copies via the diagonal
    # jaccard misses the subset pair at the same 0.5 threshold
    jac = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert (1, 2) not in jac and (1, 3) in jac


def test_pca_matches_numpy_reference(spark, sf_smoke):
    """Distributed covariance + driver eigh equals a single-machine
    numpy PCA: same eigenvalues, orthonormal basis, same projection
    (up to the shared sign convention)."""
    import numpy as np

    emb = read_table(spark, sf_smoke, "embeddings")
    mean, comps, vals = S.pca_train(emb, k=4)
    rows = emb.select("vec_id", "embedding").collect()
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])

    # reference PCA
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / x.shape[0]
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2)
    order = np.argsort(evals)[::-1][:4]
    ref = []
    for idx in order:
        v = evecs[:, idx].copy()
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        ref.append(v)
    ref = np.stack(ref)

    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(sorted(vals, reverse=True), evals[order], atol=1e-9)
    assert np.allclose(np.abs(np.asarray(comps)), np.abs(ref), atol=1e-6)
    # orthonormal, decreasing variance
    w = np.asarray(comps)
    assert np.allclose(w @ w.T, np.eye(4), atol=1e-8)
    assert vals == sorted(vals, reverse=True)

    got = {
        r.vec_id: [r.pc0, r.pc1, r.pc2, r.pc3]
        for r in S.pca_project(emb, mean, comps)
        .select("vec_id", *[F.round(F.col("pc")[i], 6).alias(f"pc{i}") for i in range(4)])
        .collect()
    }
    want = (x - mu) @ ref.T
    ids = [r.vec_id for r in rows]
    for vid, wrow in zip(ids, want):
        assert np.allclose(got[vid], np.round(wrow, 6), atol=1e-5)


def test_pca_iter_converges_on_anisotropic_fixture(spark):
    """The verifiable PCA tier (fixed-round orthogonal iteration on the
    decimal-exact covariance) IS PCA: on a fixture with real spectral
    decay (ratios ≤ 0.35, where 12 rounds give (λ₅/λ₄)¹² < 1e-5
    subspace error) the learned basis matches numpy eigh to 1e-4 and
    per-component variances match the eigenvalues. (The registered
    query's CORRECTNESS comes from the exact cross-engine replay; this
    test pins the algorithm's identity as PCA, which the near-flat
    sf-corpus spectrum cannot exhibit.)"""
    import numpy as np

    rng = np.random.default_rng(7)
    d, n = 16, 400
    scales = np.array([3.0, 1.0, 0.35, 0.12, 0.04] + [0.01] * (d - 5))
    basis, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = (rng.standard_normal((n, d)) * scales) @ basis.T + rng.standard_normal(d)
    x = np.round(x, 4)  # keep decimal casts honest
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id: long, embedding: array<double>",
    )
    mean, comps = S.pca_train_iter(df, k=4, rounds=12, dims=d)

    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / n
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2)
    order = np.argsort(evals)[::-1][:4]
    assert np.allclose(mean, mu, atol=1e-9)
    w = np.asarray(comps)
    # orthonormal
    assert np.allclose(w @ w.T, np.eye(4), atol=1e-10)
    # each learned axis aligns with the corresponding eigh axis
    for c, idx in enumerate(order):
        assert abs(float(np.dot(w[c], evecs[:, idx]))) > 1.0 - 1e-4
    # per-component variance ≈ eigenvalue, in decreasing order
    proj = (x - mu) @ w.T
    var = proj.var(axis=0)
    assert np.allclose(var, evals[order], rtol=1e-3)
    assert list(var) == sorted(var, reverse=True)

    # fold-exact JVM projection equals the driver-side fold
    got = {
        r.vec_id: [r.pc0, r.pc1, r.pc2, r.pc3]
        for r in S.pca_project_fold(df, mean, comps).collect()
    }
    for i, row in enumerate(x):
        want = [
            round(S._fold0([(row[j] - mean[j]) * comps[c][j] for j in range(d)]), 6)
            for c in range(4)
        ]
        assert got[i] == want


def test_fuzzy_levenshtein_contraction_equals_raw(spark):
    """Raw blocked levenshtein over the full corpus ≡ the contracted
    operator (compute once per unique text, fan back out) — the
    standing contraction rule applied to the r4 record-linkage op.
    Fixture has exact copies (must NOT pair at dist 0), typo pairs
    within the block, same-block far pairs (dist > max), and
    cross-block typos (blocked away by design)."""
    from tfl_realtime_lakehouse_spark.operators.dedup import (
        fuzzy_levenshtein_pairs,
        fuzzy_levenshtein_pairs_reps,
    )

    rows = [
        (1, "blue anvil"),
        (2, "blue anvil"),      # exact copy of 1
        (3, "blue anvyl"),      # typo of 1/2 (dist 1)
        (4, "blue angel"),      # same block, dist 2 from anvil
        (5, "blue extraordinary contraption"),  # same block, len-banded away
        (6, "teal anvil"),      # cross-block typo: never a candidate
        (7, "blue anvyl"),      # exact copy of 3
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    raw = {
        (r.doc_a, r.doc_b, r.dist)
        for r in fuzzy_levenshtein_pairs_reps(df, max_dist=4).collect()
    }
    contracted = {
        (r.doc_a, r.doc_b, r.dist)
        for r in fuzzy_levenshtein_pairs(df, max_dist=4).collect()
    }
    assert raw == contracted
    # typo cluster x copy cluster: all 3x2 member pairs at dist 1
    assert {(1, 3, 1), (1, 7, 1), (2, 3, 1), (2, 7, 1)} <= contracted
    # near-threshold pair survives; exact copies never self-pair
    assert (1, 4, 2) in contracted and not any(d == 0 for _, _, d in contracted)
    # length band and blocking both prune
    assert not any(5 in (a, b) for a, b, _ in contracted)
    assert not any(6 in (a, b) for a, b, _ in contracted)


def test_tfidf_cosine_contraction_expands_copies(spark):
    """tfidf_cosine_pairs on a corpus WITH exact copies: the diagonal
    pairs copies at the sqrt-rounded self-cosine, cross pairs expand to
    all member combinations with the rep pair's score, and idf counts
    unique content (copies must not inflate df — dedup-before-
    statistics)."""
    from tfl_realtime_lakehouse_spark.operators.text import (
        tfidf_cosine_pairs,
        tfidf_cosine_pairs_reps,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),     # exact copy of 1
        (3, "alpha beta gamma epsilon"),   # near 1 (3/4 shared)
        (4, "zeta eta theta iota"),        # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    full = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(df, threshold=0.1, max_doc_freq=10).collect()
    }
    # diagonal: the copy pair, at the self-cosine (≈1.0 after rounding)
    assert (1, 2) in full and abs(full[(1, 2)] - 1.0) < 1e-6
    # cross expansion: BOTH copies pair with doc 3 at the same score
    assert (1, 3) in full and (2, 3) in full
    assert full[(1, 3)] == full[(2, 3)]
    # unrelated doc shares no kept term with the others
    assert not any(4 in k for k in full)
    # rep-level op on unique contents gives the same rep-pair score
    reps = df.where(F.col("doc_id") != 2)
    rep_pairs = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs_reps(
            reps, threshold=0.1, max_doc_freq=10
        ).collect()
    }
    assert rep_pairs[(1, 3)] == full[(1, 3)]


def test_minhash_probe_raw_equals_contracted_cross_side(spark, sf_correct):
    """The cross-side MinHash index probe's contraction must be
    bit-identical to the raw cross-side computation (band rows of raw
    history × raw batch, verified on the union), on a corpus with
    planted exact duplicates STRADDLING the sides — the diagonal case
    (same text in both history and batch) and the k² dup case at once."""
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    docs = read_table(spark, sf_correct, "documents").limit(300)
    # plant: copies of history texts into the batch side id-space
    straddle = docs.where(F.col("doc_id") % 30 == 1).withColumn(
        "doc_id", (F.col("doc_id") + 1000000) * 10  # % 10 == 0 -> batch
    )
    corpus = docs.unionByName(straddle)
    history = corpus.where(F.col("doc_id") % 10 != 0)
    batch = corpus.where(F.col("doc_id") % 10 == 0)

    kw = dict(n=3, num_hashes=16, bands=4, hash_family="md5")
    # RAW: band history and batch directly, cross join on band collision,
    # verify exact jaccard on the union corpus
    bh = D.minhash_banded(history, **kw).selectExpr(
        "doc_id AS hist_id", "band_id", "band_hash"
    )
    bb = D.minhash_banded(batch, **kw).selectExpr(
        "doc_id AS batch_id", "band_id", "band_hash"
    )
    cands = (
        bh.join(bb, ["band_id", "band_hash"])
        .select(
            F.col("hist_id").alias("doc_a"), F.col("batch_id").alias("doc_b")
        )
        .distinct()
    )
    raw_pairs = D.verify_pairs_jaccard(corpus, cands, n=3, threshold=0.2)
    raw = {
        (r.doc_a, r.doc_b): (r.n_shared, r.jaccard) for r in raw_pairs.collect()
    }
    got = {
        (r.hist_id, r.batch_id): (r.n_shared, r.jaccard)
        for r in D.minhash_index_probe(
            history, batch, threshold=0.2, **kw
        ).collect()
    }
    assert got == raw
    # non-vacuous: the planted straddling copies produce jaccard-1 pairs
    assert any(j == 1.0 for _, j in got.values())


def test_fuzzy_name_pairs_bounded_modes(spark, tmp_path):
    """r5 verdict #5: the pair OUTPUT is fuzzy_name_pairs' only
    super-linear term on duplicated corpora, so the plan function
    grows bounded modes. count_only must reproduce the default mode's
    per-name pair counts with no member expansion; max_pairs_per_name
    must cap per-name output at k with the deterministic
    (edit_dist, part_a, part_b) preference; the default path must be
    untouched (it is also re-driven hash-green this round)."""
    import pandas as pd
    import pytest as _pytest

    from tfl_realtime_lakehouse_spark.queries.relational import (
        fuzzy_name_pairs_plan,
    )

    # one block, three near-miss names, heavy exact duplication
    rows, pk = [], 0
    for name, copies in [
        ("ivory linen", 4),      # 4 exact copies
        ("ivory line", 3),       # dist 1 from above
        ("ivory lines", 2),      # dist 1 / 2
        ("completely other", 1),
    ]:
        for _ in range(copies):
            rows.append((pk, "B1", 5, name))
            pk += 1
    pd.DataFrame(
        rows, columns=["p_partkey", "p_brand", "p_size", "p_name"]
    ).to_parquet(f"{tmp_path}/part.parquet")

    full = fuzzy_name_pairs_plan(spark, str(tmp_path)).collect()
    # raw model: every same-block pair with dist <= 5
    names = {r[0]: r[3] for r in rows}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want_pairs = {
        (a, b): lev(names[a], names[b])
        for a in names
        for b in names
        if a < b and lev(names[a], names[b]) <= 5
    }
    got_pairs = {(r.part_a, r.part_b): r.edit_dist for r in full}
    assert got_pairs == want_pairs

    # count_only: per-name counts match the expansion, output O(names)
    counts = {
        r.p_name: (r.n_fuzzy_names, r.n_part_pairs)
        for r in fuzzy_name_pairs_plan(
            spark, str(tmp_path), count_only=True
        ).collect()
    }
    for name in {n for n in names.values()}:
        owned = [
            p for p in want_pairs
            if names[p[0]] == name or names[p[1]] == name
        ]
        neigh = {
            names[p[0]] if names[p[1]] == name else names[p[1]]
            for p in owned
            if names[p[0]] != names[p[1]]
        }
        assert counts[name] == (len(neigh), len(owned)), name

    # max_pairs_per_name=k: EXACTLY the brute-force top-k per owning
    # group under (edit_dist, part_a, part_b) — d=0 pairs are owned by
    # their name, cross pairs by the lexicographically smaller name.
    # k=1 is the r6-ADVICE regression: a name with >1 exact copies must
    # emit its smallest d=0 pair (the pre-fix k-cap left C(1,2)=0
    # diagonal candidates and promoted a worse d>=1 pair instead).
    def brute_topk(k):
        owned = {}
        for (pa, pb), d in want_pairs.items():
            gname = names[pa] if names[pa] <= names[pb] else names[pb]
            owned.setdefault(gname, []).append((d, pa, pb))
        out = set()
        for grp in owned.values():
            for d, pa, pb in sorted(grp)[:k]:
                out.add((pa, pb, d))
        return out

    for k in (1, 2, 3):
        capped = {
            (r.part_a, r.part_b, r.edit_dist)
            for r in fuzzy_name_pairs_plan(
                spark, str(tmp_path), max_pairs_per_name=k
            ).collect()
        }
        assert capped == brute_topk(k), k
    assert 0 < len(brute_topk(2)) < len(full)

    with _pytest.raises(ValueError, match="positive"):
        fuzzy_name_pairs_plan(spark, str(tmp_path), max_pairs_per_name=0)


def test_embedding_set_diversity_matches_numpy_brute_force(spark, tmp_path):
    """The sum-vector identity must reproduce the literal mean pairwise
    cosine: Spark/DuckDB share one expression tree, so a same-tree bug
    would pass the oracle — this pins the MATH against an independent
    O(n²) numpy recompute (tolerance covers the 12-dp decimal pinning
    of normalized components)."""
    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave7 import (
        embedding_set_diversity,
    )

    rng = np.random.RandomState(7)
    rows = []
    for label, n in [(0, 17), (1, 5), (2, 2)]:
        base = rng.randn(8).astype(np.float32)
        for i in range(n):
            v = (base * (label + 1) + rng.randn(8) * 0.7).astype(np.float32)
            rows.append((len(rows), v.tolist(), label))
    rows.append((len(rows), [0.0] * 8, 0))   # zero-norm: excluded
    rows.append((len(rows), rng.randn(8).astype(np.float32).tolist(), 3))
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {
        r.label: (r.n, r.mean_pairwise_cosine)
        for r in embedding_set_diversity(spark, str(tmp_path)).collect()
    }
    assert 3 not in got  # n=1 → no pairs
    for label, n in [(0, 17), (1, 5), (2, 2)]:
        vs = np.array(
            [r[1] for r in rows[:-2] if r[2] == label], dtype=np.float64
        )
        u = vs / np.linalg.norm(vs, axis=1, keepdims=True)
        g = u @ u.T
        want = (g.sum() - np.trace(g)) / (n * (n - 1))
        assert got[label][0] == n
        assert abs(got[label][1] - want) < 5e-7, (label, got[label][1], want)


def test_graph_modularity_lpa_terms_match_brute_force(spark, tmp_path):
    """Modularity terms against a literal python recompute of Q over
    the same sampled graph + LPA labels the query derives."""
    import hashlib
    from collections import Counter

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave7 import (
        graph_modularity_lpa,
    )

    # small orders/lineitem fixture: 12 customers x 6 suppliers
    orders = [(ok, ok % 12) for ok in range(60)]
    lines = [(ok, ln, (ok * 7 + ln) % 6) for ok in range(60) for ln in range(3)]
    pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"]).to_parquet(
        f"{tmp_path}/orders.parquet"
    )
    pd.DataFrame(
        lines, columns=["l_orderkey", "l_linenumber", "l_suppkey"]
    ).to_parquet(f"{tmp_path}/lineitem.parquet")

    # model: sampled edges
    eraw = {(c, 1000000000000 + s) for ok, c in orders for lo, ln, s in lines if lo == ok}
    def keep(a, b):
        h = hashlib.md5(f"mod:{a}:{b}".encode()).hexdigest()
        return int(h[:15], 16) % 8 == 0
    e0 = sorted((a, b) for a, b in eraw if keep(a, b))
    adj = {}
    for a, b in e0:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n in adj:
            cnt = Counter(labels[m] for m in adj[n])
            best = min(cnt, key=lambda l: (-cnt[l], l))
            new[n] = best
        labels = new
    m = len(e0)
    deg = Counter()
    for a, b in e0:
        deg[a] += 1
        deg[b] += 1
    want = {}
    for c in set(labels.values()):
        members = {n for n, l in labels.items() if l == c}
        e_in = sum(1 for a, b in e0 if a in members and b in members)
        d_sum = sum(deg[n] for n in members)
        term = e_in / m - (d_sum / (2.0 * m)) ** 2
        want[c] = (len(members), e_in, d_sum, round(term, 6) + 0.0)

    got = {
        r.label: (r.n_nodes, r.e_in, r.d_sum, r.term)
        for r in graph_modularity_lpa(spark, str(tmp_path)).collect()
    }
    assert m >= 3 and len(want) >= 2  # non-vacuous fixture
    assert got == want


def test_bradley_terry_matches_brute_force_mm(spark, tmp_path):
    """BT ratings against a literal python recompute of the smoothed MM
    recurrence from the same duel fixture (winner = higher score, the
    repo's rational sigmoid; here texts are built so longer = higher
    score deterministically)."""
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave8 import (
        eval_pairwise_bradley_terry,
    )

    def mk(i, source, words):
        return (i, " ".join(f"w{j}" for j in range(words)), "en", source, 0)

    # 4 sources, deterministic strengths via word counts 5..44; pair
    # (2k, 2k+1) duels; one null-text doc kills its pair
    rows = []
    for k in range(40):
        rows.append(mk(2 * k, f"s{k % 4}", 5 + k))
        rows.append(mk(2 * k + 1, f"s{(k + 1) % 4}", 6 + ((k * 13) % 37)))
    rows.append((900, None, "en", "s0", 0))
    rows.append((901, "a b c", "en", "s1", 0))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{tmp_path}/documents.parquet")

    # model: score is monotone in token count for these all-novel-word
    # texts (z = (n-45)/10 + 0), so winner = more tokens, ties impossible
    def score(words):
        z = (words - 45.0) / 10.0
        return 0.5 + 0.5 * z / (1.0 + abs(z))

    duels = []
    for k in range(40):
        sa, xa = f"s{k % 4}", score(5 + k)
        sb, xb = f"s{(k + 1) % 4}", score(6 + ((k * 13) % 37))
        if sa == sb:
            continue
        w = sa if xa > xb else sb if xb > xa else min(sa, sb)
        duels.append((w, sb if w == sa else sa))
    und = {}
    for w, l in duels:
        i, j = min(w, l), max(w, l)
        n, wi = und.get((i, j), (0, 0))
        und[(i, j)] = (n + 1, wi + (1 if w == i else 0))
    dirp, wtot = [], {}
    for (i, j), (n, wi) in und.items():
        dirp.append((i, j, n + 1))
        dirp.append((j, i, n + 1))
        for s, ww, nd in ((i, wi + 0.5, n), (j, (n - wi) + 0.5, n)):
            t, d, wn = wtot.get(s, (0.0, 0, 0.0))
            wtot[s] = (t + ww, d + nd, wn + (ww - 0.5))
    g = {s: 1.0 for s in wtot}
    from decimal import Decimal

    def pin(x):
        return Decimal(repr(x)).quantize(Decimal("1e-12"))

    for _ in range(8):
        den = {}
        for s, o, nn in dirp:
            den[s] = den.get(s, Decimal(0)) + pin(nn / (g[s] + g[o]))
        g = {s: wtot[s][0] / float(den[s]) for s in g}
        sg = float(sum((pin(v) for v in g.values()), Decimal(0)))
        g = {s: v / sg for s, v in g.items()}
    want = {
        s: (wtot[s][1], int(wtot[s][2]), round(g[s], 6)) for s in wtot
    }

    got = {
        r.source: (r.n_duels, r.wins, r.rating)
        for r in eval_pairwise_bradley_terry(spark, str(tmp_path)).collect()
    }
    assert len(want) == 4 and sum(v[0] for v in want.values()) > 0
    assert got == want
    # ratings sum to ~1 and are all positive (smoothing keeps gamma > 0)
    assert abs(sum(r for _, _, r in got.values()) - 1.0) < 1e-5
    assert all(r > 0 for _, _, r in got.values())


def test_minhash_estimate_error_weighted_contraction_matches_raw(
    spark, tmp_path
):
    """The weighted-contracted histogram must equal a literal raw-corpus
    enumeration (signatures per doc, candidates, est-jac bins) on a
    fixture with planted exact duplicates, a null text, and a
    sub-3-token doc."""
    import hashlib

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave8 import (
        dedup_minhash_estimate_error,
    )

    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a sleepy dog",
        "pack my box with five dozen liquor jugs today",
        "pack my box with five dozen liquor jugs",
        "completely different text about spark physical plans here",
    ]
    rows = []
    did = 0
    for t in base:
        for _ in range(3):  # 3 exact copies of each distinct text
            rows.append((did, t, "en", "s0", len(t)))
            did += 1
    rows.append((did, None, "en", "s1", 0)); did += 1
    rows.append((did, "too short", "en", "s1", 9)); did += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{tmp_path}/documents.parquet")

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def sh3(t):
        w = t.split(" ")
        return sorted({" ".join(w[i:i + 3]) for i in range(len(w) - 2)})

    sigs, sets_ = {}, {}
    for i, t, *_ in rows:
        if t is None:
            continue
        s = sh3(t)
        if not s:
            continue
        sets_[i] = set(s)
        sigs[i] = [min(h60(f"{k}:{g}") for g in s) for k in range(16)]
    bands = {}
    for i, sig in sigs.items():
        for b in range(4):
            key = (b, h60(",".join(str(v) for v in sig[b * 4:b * 4 + 4])))
            bands.setdefault(key, []).append(i)
    cands = set()
    for members in bands.values():
        for a in members:
            for b in members:
                if a < b:
                    cands.add((a, b))
    want = {}
    for a, b in cands:
        agree = sum(1 for k in range(16) if sigs[a][k] == sigs[b][k])
        inter = len(sets_[a] & sets_[b])
        jac = round(inter / (len(sets_[a]) + len(sets_[b]) - inter), 6)
        bin_ = int((agree / 16.0 - jac) * 16 // 1)
        want[bin_] = want.get(bin_, 0) + 1

    got = {
        r.err_bin: r.n_pairs
        for r in dedup_minhash_estimate_error(spark, str(tmp_path)).collect()
    }
    # non-vacuous: the diagonal (3 copies x 5 texts -> 15 zero-error
    # pairs) plus cross-text candidate pairs beyond the diagonal (their
    # sub-1/16 errors may legitimately share bin 0; the multi-bin
    # behavior is exercised by the sf0.01 oracle parity, 4 bins)
    assert got.get(0, 0) >= 15
    assert sum(got.values()) > 15
    assert got == want


def test_ann_recall_eval_invariants_and_exact_leg(spark):
    """recall@k bookkeeping on the real sf0.001 corpus: the exact leg
    is always k deep, the approx leg never exceeds k, the overlap is
    bounded by both, and recall is their ratio."""
    from tfl_realtime_lakehouse_spark.queries.wave8 import (
        embedding_ann_recall_eval,
    )

    rows = embedding_ann_recall_eval(spark, "/root/testdata/sf0.001").collect()
    assert {r.query_id for r in rows} == {0, 4, 8, 12, 16}
    for r in rows:
        assert r.n_exact == 10
        assert 0 <= r.n_approx <= 10
        assert 0 <= r.n_common <= min(r.n_exact, r.n_approx)
        assert r.recall_at_k == round(r.n_common / r.n_exact, 6)


def test_column_stats_profile_matches_pandas(spark, tmp_path):
    """Per-column stats against a pandas recompute on a fixture with
    planted nulls in every column kind."""
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave8 import (
        table_column_stats_profile,
    )

    n = 50
    pdf = pd.DataFrame(
        {
            "l_orderkey": [i if i % 7 else None for i in range(n)],
            "l_partkey": list(range(n)),
            "l_suppkey": [i % 5 for i in range(n)],
            "l_linenumber": [i % 3 for i in range(n)],
            "l_quantity": [float(i % 11) + 0.25 for i in range(n)],
            "l_extendedprice": [100.5 + i for i in range(n)],
            "l_discount": [0.01 * (i % 9) for i in range(n)],
            "l_tax": [0.02] * n,
            "l_returnflag": [None if i % 13 == 0 else "AR"[i % 2] for i in range(n)],
            "l_linestatus": ["OF"[i % 2] for i in range(n)],
            "l_shipdate": pd.to_datetime(
                [f"2024-01-{(i % 28) + 1:02d}T03:04:05" for i in range(n)]
            ),
        }
    )
    pdf["l_orderkey"] = pdf["l_orderkey"].astype("Int64")
    # µs precision: pandas defaults to TIMESTAMP(NANOS), which a bare
    # spark.read.parquet rejects (the events.parquet gotcha)
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        r.col_name: r.asDict()
        for r in table_column_stats_profile(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(pdf.columns)
    for c in pdf.columns:
        s = pdf[c]
        assert got[c]["n_rows"] == n
        assert got[c]["n_nulls"] == int(s.isna().sum())
        assert got[c]["ndv"] == s.nunique(dropna=True)
    assert got["l_quantity"]["min_num"] == 0.25
    assert got["l_quantity"]["max_num"] == 10.25
    assert got["l_returnflag"]["min_str"] == "A"
    assert got["l_returnflag"]["max_str"] == "R"
    assert got["l_returnflag"]["min_num"] is None
    assert got["l_shipdate"]["min_num"] == pd.Timestamp(
        "2024-01-01T03:04:05"
    ).timestamp()


def test_abtest_cuped_matches_numpy_ols(spark, tmp_path):
    """CUPED readout against a numpy recompute (theta as the OLS slope,
    rho2 as squared Pearson correlation, per-arm adjusted means) on a
    fixture with correlated pre/post values, a user with only views,
    one with only purchases, and null values."""
    import hashlib

    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave8 import events_abtest_cuped

    rows = []
    eid = 0
    for u in range(30):
        base = (u * 7) % 11 + 1.0
        for k in range(3):
            rows.append((eid, "2024-01-01T00:00:00", u, "view", base + k, None))
            eid += 1
        rows.append(
            (eid, "2024-01-01T01:00:00", u, "purchase", 2.0 * base + (u % 5), None)
        )
        eid += 1
    rows.append((eid, "2024-01-01T02:00:00", 40, "view", 3.0, None)); eid += 1
    rows.append((eid, "2024-01-01T02:00:00", 41, "purchase", 4.0, None)); eid += 1
    rows.append((eid, "2024-01-01T02:00:00", 42, "click", None, None)); eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")

    xs, ys, variants = {}, {}, {}
    for _, r in pdf.iterrows():
        u = r.user_id
        variants[u] = (
            int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15], 16) % 2
        )
        if pd.notna(r.value):
            if r.event_type in ("view", "click"):
                xs[u] = xs.get(u, 0.0) + r.value
            elif r.event_type == "purchase":
                ys[u] = ys.get(u, 0.0) + r.value
    users = sorted(variants)
    x = np.array([xs.get(u, 0.0) for u in users])
    y = np.array([ys.get(u, 0.0) for u in users])
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    got = {
        r.variant: r.asDict()
        for r in events_abtest_cuped(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1}
    assert sum(g["n_users"] for g in got.values()) == 33
    for v, g in got.items():
        vu = [u for u in users if variants[u] == v]
        mean_y = float(np.mean([ys.get(u, 0.0) for u in vu]))
        adj = mean_y - theta * (
            float(np.mean([xs.get(u, 0.0) for u in vu])) - float(np.mean(x))
        )
        assert abs(g["mean_metric"] - round(mean_y, 6)) < 2e-6
        assert abs(g["mean_cuped"] - adj) < 2e-6
        assert abs(g["theta"] - theta) < 2e-6
        assert abs(g["rho2"] - rho2) < 2e-6
    # the covariate genuinely reduces variance on this fixture
    assert got[0]["rho2"] > 0.3


# ---------------------------------------------------------------------------
# r8 second wave (wave9): brute-force recomputes
# ---------------------------------------------------------------------------


def _h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_poisson_bootstrap_ci_matches_python_recompute(spark, tmp_path):
    """X209 against a pure-python replay of the hash-seeded Poisson
    bootstrap: same md5→threshold weights, same replicate means, same
    order-statistic CI selection and decimal-free SE recompute (the
    python floats agree to well below the 6-dp rounding step)."""
    import statistics

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave9 import (
        _BOOT_B,
        _POIS_T,
        events_poisson_bootstrap_ci,
    )

    rows = []
    for e in range(120):
        u = e % 17
        et = "purchase" if e % 3 == 0 else "view"
        rows.append((e, "2024-01-01T00:00:00", u, et, 10.0 + (e % 23) * 1.5, None))
    rows.append((500, "2024-01-01T00:00:00", 1, "purchase", None, None))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")

    def weight(b, eid):
        h = _h60(f"boot:{b}:{eid}")
        for k, t in enumerate(_POIS_T):
            if h < t:
                return k
        return 6

    pur = [
        (int(r.event_id), _h60(f"ab:{int(r.user_id)}") % 2, float(r.value))
        for r in pdf.itertuples()
        if r.event_type == "purchase" and pd.notna(r.value)
    ]
    want = {}
    for v in (0, 1):
        vals = [(e, x) for e, vv, x in pur if vv == v]
        means = []
        for b in range(_BOOT_B):
            sw = sum(weight(b, e) for e, _ in vals)
            if sw > 0:
                means.append(
                    (sum(weight(b, e) * x for e, x in vals) / sw, b)
                )
        means.sort()
        ms = [m for m, _ in means]
        want[v] = (
            len(vals),
            round(sum(x for _, x in vals) / len(vals), 6),
            round(statistics.stdev(ms), 6),
            round(means[1][0], 6),
            round(means[len(means) - 2][0], 6),
        )
    got = {
        r["variant"]: (
            r["n_rows"], r["mean_value"], r["boot_se"], r["ci_lo"], r["ci_hi"]
        )
        for r in events_poisson_bootstrap_ci(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0]
        for gx, wx in zip(got[v][1:], want[v][1:]):
            assert abs(gx - wx) < 2e-6
        # non-vacuous: the interval brackets the point estimate
        assert got[v][3] < got[v][1] < got[v][4]


def test_lsh_threshold_sweep_matches_raw_enumeration(spark, tmp_path):
    """X210 against a pure-python replay of the ENTIRE md5 MinHash
    pipeline on the raw (uncontracted) corpus — shingles, signatures,
    band hashes, candidates, agreement estimate, exact Jaccard, and the
    per-threshold TP/FP/FN counts. Duplicated texts planted so the
    weighted contraction (incl. the DIV-2 diagonal) is exercised."""
    import itertools

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave9 import dedup_lsh_threshold_sweep

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "a completely different document about spark physical plans",
        "a completely different document about spark logical plans",
        "short text",
    ]
    texts = base + [base[0]] * 3 + [base[2]] * 2  # multiplicities 4 and 3
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(f"{tmp_path}/documents.parquet")

    def sh3(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()

    def sig(t):
        ss = sh3(t)
        return [min(_h60(f"{i}:{s}") for s in ss) for i in range(16)] if ss else None

    def bands(sg):
        return [
            _h60(",".join(str(x) for x in sg[b * 4 : b * 4 + 4]))
            for b in range(4)
        ]

    docs = [(i, t, sig(t)) for i, t in enumerate(texts)]
    want = {k: [0, 0, 0] for k in range(4, 15)}
    for (ia, ta, sa), (ib, tb, sb) in itertools.combinations(docs, 2):
        if sa is None or sb is None:
            continue
        if not any(x == y for x, y in zip(bands(sa), bands(sb))):
            continue
        est = sum(x == y for x, y in zip(sa, sb)) / 16.0
        A, B = sh3(ta), sh3(tb)
        jac = round(len(A & B) / len(A | B), 6)
        for k in range(4, 15):
            pred, lab = est >= k / 16.0, jac >= 0.5
            if pred and lab:
                want[k][0] += 1
            elif pred:
                want[k][1] += 1
            elif lab:
                want[k][2] += 1
    got = {
        r["k"]: [r["tp"], r["fp"], r["fn"]]
        for r in dedup_lsh_threshold_sweep(spark, str(tmp_path)).collect()
    }
    assert got == want
    # non-vacuous: the near-identical pair flips from TP to FN as the
    # threshold passes its estimate, and the dup diagonals stay TP
    assert want[4][0] > want[14][0]
    assert want[14][0] >= 3 + 6  # C(3,2) + C(4,2) identical-text pairs


def test_lsh_bucket_balance_matches_numpy(spark, tmp_path):
    """X211 against a numpy recompute of the Rademacher codes and the
    per-table bucket statistics."""
    import random
    from collections import Counter

    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.operators.similarity import rademacher_signs
    from tfl_realtime_lakehouse_spark.queries.wave9 import (
        embedding_lsh_bucket_balance,
    )

    rng = random.Random(9)
    n, d = 80, 64
    vecs = [[rng.uniform(-1, 1) for _ in range(d)] for _ in range(n)]
    pd.DataFrame(
        {"vec_id": range(n), "embedding": [np.asarray(v, dtype=np.float32) for v in vecs], "label": 0}
    ).to_parquet(f"{tmp_path}/embeddings.parquet")

    w = np.asarray(
        [rademacher_signs("rlsh", t, b, d) for t in range(16) for b in range(8)]
    )
    x = np.asarray([np.asarray(v, dtype=np.float32) for v in vecs], dtype=np.float64)
    dots = x @ w.T
    codes = ((dots >= 0).astype(int).reshape(n, 16, 8) * (1 << np.arange(8))).sum(
        axis=2
    )
    got = {
        r["tbl"]: (
            r["n_vecs"], r["n_buckets"], r["max_bucket"],
            r["top1_share"], r["collision_rate"],
        )
        for r in embedding_lsh_bucket_balance(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(16))
    for t in range(16):
        c = Counter(codes[:, t])
        mx = max(c.values())
        coll = sum(v * (v - 1) for v in c.values()) / (n * (n - 1))
        assert got[t][0] == n
        assert got[t][1] == len(c)
        assert got[t][2] == mx
        assert abs(got[t][3] - mx / n) < 2e-6
        assert abs(got[t][4] - coll) < 2e-6


def test_uplift_by_decile_matches_python(spark, tmp_path):
    """X212 against a pure-python recompute with the ANSI ntile rule
    (first n mod 10 buckets get the extra row) over the (x, user_id)
    total order."""
    import hashlib

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave9 import events_uplift_by_decile

    rows, eid = [], 0
    for u in range(53):
        rows.append((eid, "2024-01-01T00:00:00", u, "view", float((u * 13) % 29), None)); eid += 1
        if u % 2 == 0:
            rows.append((eid, "2024-01-01T01:00:00", u, "purchase", float(u % 7) * 3.0, None)); eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")

    per_user = {}
    for r in pdf.itertuples():
        v = int(hashlib.md5(f"ab:{int(r.user_id)}".encode()).hexdigest()[:15], 16) % 2
        px, py, _ = per_user.get(r.user_id, (0.0, 0.0, v))
        if pd.notna(r.value):
            if r.event_type in ("view", "click"):
                px += r.value
            elif r.event_type == "purchase":
                py += r.value
        per_user[r.user_id] = (px, py, v)
    users = sorted(per_user.items(), key=lambda kv: (kv[1][0], kv[0]))
    n = len(users)
    base, extra = divmod(n, 10)
    want = {}
    idx = 0
    for dec in range(1, 11):
        size = base + (1 if dec <= extra else 0)
        grp = users[idx : idx + size]
        idx += size
        for v in (0, 1):
            ys = [y for _, (x, y, vv) in grp if vv == v]
            want.setdefault(dec, {})[v] = (
                len(ys), round(sum(ys) / len(ys), 6) if ys else None
            )
    got = {
        r["decile"]: r.asDict()
        for r in events_uplift_by_decile(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want)
    for dec, g in got.items():
        assert g["n0"] == want[dec][0][0]
        assert g["n1"] == want[dec][1][0]
        for arm, mk in ((0, "mean_y0"), (1, "mean_y1")):
            wm = want[dec][arm][1]
            if wm is None:
                assert g[mk] is None
            else:
                assert abs(g[mk] - wm) < 2e-6
        if g["n0"] > 0 and g["n1"] > 0:
            assert abs(
                g["uplift"] - round(
                    (want[dec][1][1] or 0) - (want[dec][0][1] or 0), 6
                )
            ) < 4e-6


def test_winnowing_matches_python_and_guarantee(spark, tmp_path):
    """X213 against a pure-python winnow (k=4-gram hashes, window w=4,
    values-only selection) — plus the winnowing GUARANTEE: two docs
    sharing a passage of ≥ k+w−1 = 7 words share a fingerprint."""
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave9 import (
        doc_winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words
    texts = [
        f"intro words here {shared} closing remarks",
        f"{shared} and then a totally different continuation follows",
        "tiny doc",                      # < 4 words -> (0, 0, None)
        "exactly four words here",       # one k-gram, one window
        None,                            # filtered on both engines
        f"intro words here {shared} closing remarks",  # exact dup
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    )
    pdf.to_parquet(f"{tmp_path}/documents.parquet")

    def winnow(t):
        w = t.split(" ")
        if len(w) < 4:
            return 0, []
        hs = [
            _h60_8(" ".join(w[i : i + 4])) for i in range(len(w) - 3)
        ]
        wins = max(1, len(hs) - 3)
        sel = sorted({min(hs[j : j + 4]) for j in range(wins)})
        return len(hs), sel

    def _h60_8(s):
        import hashlib

        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    got = {
        r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"], r["fp_digest"])
        for r in doc_winnowing_fingerprints(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2, 3, 5}  # null text dropped
    import hashlib as _hl

    sels = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        nk, sel = winnow(t)
        sels[i] = set(sel)
        assert got[i][0] == nk
        assert got[i][1] == len(sel)
        if sel:
            digest = _hl.md5(",".join(str(v) for v in sel).encode()).hexdigest()
            assert got[i][2] == digest
        else:
            assert got[i][2] is None
    # guarantee: docs 0 and 1 share the 7-word passage -> a common print
    assert sels[0] & sels[1]
    # exact dup docs fingerprint identically
    assert got[0] == got[5]


def test_ivf_recall_eval_matches_python(spark, tmp_path):
    """X215 end-to-end against a pure-Python replay of the ENTIRE
    exact-replayable pipeline: md5-seeded init, two Lloyd rounds with
    decimal(38,12) centroid sums, 6-dp squared-L2 assignment with id
    ties, nprobe cell probing, and both top-k legs. Vector elements are
    planted on the /1024 dyadic grid so the decimal quantization step
    is exact (no engine-vs-Python double-rounding ambiguity); the
    POST-update centroids are arbitrary doubles, exercising the messy
    path through identical IEEE operation sequences. One seed vector is
    duplicated so a cell goes empty in round 1, pinning the
    carry-forward branch on both sides."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave10 import (
        embedding_ann_ivf_recall_eval,
    )

    n, d = 60, 64
    K, ITERS, NPROBE, TOPK, NQ = 8, 2, 2, 10, 20
    rng = np.random.default_rng(15)
    vecs = (rng.integers(-1024, 1025, size=(n, d)) / 1024.0).astype(np.float32)
    order = sorted(
        range(n),
        key=lambda i: (hashlib.md5(f"ivfx:{i}".encode()).hexdigest(), i),
    )
    # duplicate the second seed onto the first -> assignment ties go to
    # the lower cell, cell 1 empties, carry-forward must fire
    vecs[order[1]] = vecs[order[0]]
    pd.DataFrame(
        {"vec_id": range(n), "embedding": list(vecs), "label": 0}
    ).to_parquet(f"{tmp_path}/embeddings.parquet")

    x = vecs.astype(np.float64)

    def sqdist(a, b):
        acc = 0.0
        for i in range(d):
            t = a[i] - b[i]
            acc += t * t
        return acc

    def q6(v):
        return float(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    cents = {c: [float(v) for v in x[order[c]]] for c in range(K)}

    def assign_all():
        out = {}
        for i in range(n):
            out[i] = min(
                range(K), key=lambda c: (q6(sqdist(x[i], cents[c])), c)
            )
        return out

    for _ in range(ITERS):
        a = assign_all()
        for c in range(K):
            members = [i for i in range(n) if a[i] == c]
            if not members:
                continue  # carry forward
            newc = []
            for dim in range(d):
                s = sum(
                    (
                        Decimal(float(x[i][dim])).quantize(
                            Decimal("1e-12"), ROUND_HALF_UP
                        )
                        for i in members
                    ),
                    Decimal(0),
                )
                newc.append(float(s) / len(members))
            cents[c] = newc
    mem = assign_all()

    want = {}
    for qid in range(NQ):
        probed = sorted(
            range(K), key=lambda c: (q6(sqdist(x[qid], cents[c])), c)
        )[:NPROBE]
        by_dist = lambda i: (q6(sqdist(x[qid], x[i])), i)  # noqa: E731
        approx = sorted(
            (i for i in range(n) if mem[i] in probed and i != qid), key=by_dist
        )[:TOPK]
        exact = sorted((i for i in range(n) if i != qid), key=by_dist)[:TOPK]
        common = len(set(approx) & set(exact))
        want[qid] = (len(exact), len(approx), common, common / len(exact))

    got = {
        r["query_id"]: (r["n_exact"], r["n_approx"], r["n_common"], r["recall_at_k"])
        for r in embedding_ann_ivf_recall_eval(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(NQ))
    for qid in range(NQ):
        assert got[qid][:3] == want[qid][:3], (qid, got[qid], want[qid])
        assert abs(got[qid][3] - round(want[qid][3], 6)) < 1e-9
    # the planted duplicate makes at least one cell empty after round 1;
    # the measurement itself must stay non-degenerate
    assert any(v[3] < 1.0 for v in want.values())


def test_pq_recall_eval_matches_python(spark, tmp_path):
    """X216 end-to-end against a pure-Python replay: per-subspace
    md5-seeded codebooks (one Lloyd round, decimal(38,12) sums), exact
    code assignment, decimal-pinned ADC totals, both top-k legs. Same
    dyadic-grid fixture discipline as the X215 test."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries import wave10
    from tfl_realtime_lakehouse_spark.queries.wave10 import (
        embedding_ann_pq_recall_eval,
    )

    n, d = 50, 64
    m, sd, codes, iters = (
        wave10._PQ_M,
        wave10._PQ_SUB_D,
        wave10._PQ_CODES,
        wave10._PQ_ITERS,
    )
    TOPK, NQ = 10, 20
    rng = np.random.default_rng(16)
    vecs = (rng.integers(-1024, 1025, size=(n, d)) / 1024.0).astype(np.float32)
    pd.DataFrame(
        {"vec_id": range(n), "embedding": list(vecs), "label": 0}
    ).to_parquet(f"{tmp_path}/embeddings.parquet")

    x = vecs.astype(np.float64)

    def sqdist(a, b):
        acc = 0.0
        for i in range(len(a)):
            t = a[i] - b[i]
            acc += t * t
        return acc

    def q6(v):
        return float(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def d6dec(v):
        # ROUND(x, 6) then CAST AS DECIMAL(18,6): quantize twice like
        # the engines do (round-the-double, then re-pin to decimal)
        return Decimal(q6(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    def train(sub_x, tag):
        kk = min(codes, n)
        order = sorted(
            range(n),
            key=lambda i: (hashlib.md5(f"{tag}{i}".encode()).hexdigest(), i),
        )
        cents = {c: [float(v) for v in sub_x[order[c]]] for c in range(kk)}
        for _ in range(iters):
            a = {
                i: min(
                    range(kk), key=lambda c: (q6(sqdist(sub_x[i], cents[c])), c)
                )
                for i in range(n)
            }
            for c in range(kk):
                mem = [i for i in range(n) if a[i] == c]
                if not mem:
                    continue
                cents[c] = [
                    float(
                        sum(
                            (
                                Decimal(float(sub_x[i][dim])).quantize(
                                    Decimal("1e-12"), ROUND_HALF_UP
                                )
                                for i in mem
                            ),
                            Decimal(0),
                        )
                    )
                    / len(mem)
                    for dim in range(sd)
                ]
        assign = {
            i: min(range(kk), key=lambda c: (q6(sqdist(sub_x[i], cents[c])), c))
            for i in range(n)
        }
        return cents, assign

    adc = {i: {j: Decimal(0) for j in range(n)} for i in range(NQ)}
    for s in range(m):
        sub_x = x[:, s * sd : (s + 1) * sd]
        cents, assign = train(sub_x, f"pq{s}:")
        for qid in range(NQ):
            lut = {c: d6dec(sqdist(sub_x[qid], cents[c])) for c in cents}
            for j in range(n):
                adc[qid][j] += lut[assign[j]]

    want = {}
    for qid in range(NQ):
        approx = sorted(
            (j for j in range(n) if j != qid), key=lambda j: (adc[qid][j], j)
        )[:TOPK]
        exact = sorted(
            (j for j in range(n) if j != qid),
            key=lambda j: (q6(sqdist(x[qid], x[j])), j),
        )[:TOPK]
        common = len(set(approx) & set(exact))
        want[qid] = (len(exact), len(approx), common, common / len(exact))

    got = {
        r["query_id"]: (r["n_exact"], r["n_approx"], r["n_common"], r["recall_at_k"])
        for r in embedding_ann_pq_recall_eval(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(NQ))
    for qid in range(NQ):
        assert got[qid][:3] == want[qid][:3], (qid, got[qid], want[qid])
        assert abs(got[qid][3] - round(want[qid][3], 6)) < 1e-9


def test_srm_check_matches_python(spark, tmp_path):
    """X218 against a hashlib replay on a DELIBERATELY imbalanced
    user set (40 arm-0 vs 5 arm-1 ids picked by their md5 arm): the
    chi-square must reduce to (n1-n0)^2/(n0+n1) exactly and the flag
    must trip; a user appearing in many events still counts once."""
    import hashlib

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave10 import events_srm_check

    def arm(u):
        return int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15], 16) % 2

    a0 = [u for u in range(500) if arm(u) == 0][:40]
    a1 = [u for u in range(500) if arm(u) == 1][:5]
    rows, eid = [], 0
    for u in a0 + a1:
        for k in range(1 + u % 3):  # repeat events: distinct must dedupe
            rows.append((eid, "2024-01-05T00:00:00", u, "view", 1.0, None))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")

    [r] = events_srm_check(spark, str(tmp_path)).collect()
    n0, n1 = len(a0), len(a1)
    assert (r["n_ctl"], r["n_trt"]) == (n0, n1)
    assert abs(r["trt_share"] - round(n1 / (n0 + n1), 6)) < 1e-12
    chi2 = (n1 - n0) ** 2 / (n0 + n1)
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-12
    assert r["srm_flag"] is True and chi2 > 3.8414588206941236


def test_did_estimator_matches_python(spark, tmp_path):
    """X219 against a pure-Python replay: planted pre/post purchase
    values per arm (incl. a null value and non-purchase noise), exact
    decimal cell sums over FIXED per-arm user counts, one empty cell
    (no arm-1 pre purchases) exercising the COALESCE."""
    import hashlib

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave10 import events_did_estimator

    def arm(u):
        return int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15], 16) % 2

    a0 = [u for u in range(200) if arm(u) == 0][:6]
    a1 = [u for u in range(200) if arm(u) == 1][:4]
    PRE, POST = "2024-01-10T00:00:00", "2024-01-20T00:00:00"
    rows, eid = [], 0

    def ev(u, ts, etype, value):
        nonlocal eid
        rows.append((eid, ts, u, etype, value, None))
        eid += 1

    sums = {("c", "pre"): 0.0, ("c", "post"): 0.0, ("t", "pre"): 0.0, ("t", "post"): 0.0}
    for i, u in enumerate(a0):
        ev(u, PRE, "purchase", 10.0 + i)
        sums[("c", "pre")] += 10.0 + i
        if i % 2 == 0:
            ev(u, POST, "purchase", 30.0 + i)
            sums[("c", "post")] += 30.0 + i
        ev(u, PRE, "view", 999.0)  # non-purchase noise
    for i, u in enumerate(a1):
        # NO arm-1 pre purchases: the (trt, pre) cell is empty -> 0
        ev(u, POST, "purchase", 50.0 + 2 * i)
        sums[("t", "post")] += 50.0 + 2 * i
        ev(u, PRE, "click", 7.0)
    ev(a1[0], POST, "purchase", None)  # null value: adds nothing
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")

    [r] = events_did_estimator(spark, str(tmp_path)).collect()
    n0, n1 = len(a0), len(a1)
    assert (r["n_ctl"], r["n_trt"]) == (n0, n1)
    want = {
        "pre_ctl": sums[("c", "pre")] / n0,
        "post_ctl": sums[("c", "post")] / n0,
        "pre_trt": sums[("t", "pre")] / n1,
        "post_trt": sums[("t", "post")] / n1,
    }
    for k, v in want.items():
        assert abs(r[k] - round(v, 6)) < 1e-9, (k, r[k], v)
    did = (want["post_trt"] - want["pre_trt"]) - (want["post_ctl"] - want["pre_ctl"])
    assert abs(r["did"] - round(did, 6)) < 1e-9
    assert r["pre_trt"] == 0.0  # the planted empty cell


def test_tar_shard_manifest_matches_stdlib_tarfile(spark, tmp_path):
    """X220: the ustar writer+parser round trip, independently
    adjudicated by the STDLIB tarfile reader — our manifest (names,
    sizes, header offsets) must equal tarfile's member list for every
    shard, the checksums must verify, a planted null text must
    survive as an empty member, and the payload bytes at offset+512
    must be the document text (the random-access contract)."""
    import io
    import tarfile

    import pandas as pd

    from tfl_realtime_lakehouse_spark.operators.multimodal import (
        parse_tar_manifest,
        synth_tar_shards,
    )
    from tfl_realtime_lakehouse_spark.queries.wave10 import (
        docs_tar_shard_manifest,
    )

    texts = {
        i: (None if i == 5 else "x" * (i * 37 % 700) + f" doc {i} αβ") for i in range(40)
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "s0",
            "n_chars": [len(t) if t else 0 for t in texts.values()],
        }
    ).to_parquet(f"{tmp_path}/documents.parquet")

    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    shards = {r["shard_id"]: bytes(r["payload"]) for r in synth_tar_shards(docs).collect()}
    got = [
        (r["shard_id"], r["member"], r["n_bytes"], r["offset"], r["cksum_ok"])
        for r in docs_tar_shard_manifest(spark, str(tmp_path)).collect()
    ]
    assert all(ok for *_, ok in got)

    want = []
    for sid, blob in shards.items():
        tf = tarfile.open(fileobj=io.BytesIO(blob))
        for m in tf.getmembers():
            want.append((sid, m.name, m.size, m.offset, True))
            # random-access contract: data lives at header offset + 512
            doc_id = int(m.name[3:11])
            payload = blob[m.offset + 512 : m.offset + 512 + m.size]
            assert payload == (texts[doc_id] or "").encode()
    assert sorted(got) == sorted(want)
    # the null-text doc is present with size 0
    assert (5 // 16, "doc00000005.txt", 0) in {(s, n, b) for s, n, b, *_ in got}
    # parser agrees with parse_tar_manifest on the collected shards too
    n_members = sum(
        1 for r in parse_tar_manifest(synth_tar_shards(docs)).collect()
    )
    assert n_members == 40


def test_ann_ndcg_eval_matches_python(spark, tmp_path):
    """X221 against a pure-Python replay: Rademacher codes → candidate
    pairs → approx ranking by (6-dp cosine, id) → graded relevance from
    the exact ranking → decimal DCG/IDCG with the baked 9-dp discount
    literals. All ids ≡ 0 (mod 4) so the query's sample filter keeps
    the whole fixture."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.operators.similarity import rademacher_signs
    from tfl_realtime_lakehouse_spark.queries import wave10
    from tfl_realtime_lakehouse_spark.queries.wave10 import embedding_ann_ndcg_eval

    k, nq, d = wave10._NDCG_K, 20, 64
    ids = [4 * i for i in range(30)]
    rng = np.random.default_rng(17)
    vecs = rng.uniform(-1, 1, size=(len(ids), d)).astype(np.float32)
    pd.DataFrame(
        {"vec_id": ids, "embedding": list(vecs), "label": 0}
    ).to_parquet(f"{tmp_path}/embeddings.parquet")

    x = vecs.astype(np.float64)
    idx = {v: i for i, v in enumerate(ids)}

    def fold(vals):
        acc = 0.0
        for v in vals:
            acc += v
        return acc

    def cos6(a, b):
        xa, xb = x[idx[a]], x[idx[b]]
        dot = fold([p * q for p, q in zip(xa, xb)])
        na = fold([p * p for p in xa]) ** 0.5
        nb = fold([p * p for p in xb]) ** 0.5
        c = dot / (na * nb)
        return float(Decimal(c).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    planes = np.asarray(
        [rademacher_signs("rlsh", t, b, d) for t in range(16) for b in range(8)]
    )
    dots = x @ planes.T
    codes = ((dots >= 0).astype(int).reshape(len(ids), 16, 8) * (1 << np.arange(8))).sum(axis=2)
    cand = set()
    for t in range(16):
        by = {}
        for i, v in enumerate(ids):
            by.setdefault(codes[i, t], []).append(v)
        for vs in by.values():
            for i2 in range(len(vs)):
                for j2 in range(i2 + 1, len(vs)):
                    cand.add((vs[i2], vs[j2]))
    queries = [v for v in ids if v < nq]
    W = [Decimal(f"{w:.9f}") for w in wave10._NDCG_W]
    want = {}
    for q in queries:
        mates = [b for a, b in cand if a == q] + [a for a, b in cand if b == q]
        approx = sorted(set(mates), key=lambda v: (-cos6(q, v), v))[:k]
        exact = sorted((v for v in ids if v != q), key=lambda v: (-cos6(q, v), v))[:k]
        rel = {v: k + 1 - (r + 1) for r, v in enumerate(exact)}
        dcg = sum(
            (Decimal(rel.get(v, 0)) * W[p] for p, v in enumerate(approx)),
            Decimal(0),
        )
        idcg = sum(
            (Decimal(rel[v]) * W[r] for r, v in enumerate(exact)), Decimal(0)
        )
        want[q] = (
            round(float(dcg), 6),
            round(float(idcg), 6),
            round(float(dcg) / float(idcg), 6),
        )

    got = {
        r["query_id"]: (r["dcg"], r["idcg"], r["ndcg_at_k"])
        for r in embedding_ann_ndcg_eval(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(queries)
    for q in queries:
        for a, b in zip(got[q], want[q]):
            assert abs(a - b) < 1e-9, (q, got[q], want[q])
    # order quality must be a real measurement: not all 1.0
    assert any(v[2] < 1.0 for v in want.values())


# ---------------------------------------------------------------------------
# Round-10 ADVICE hardening: loud failures instead of silent corruption
# ---------------------------------------------------------------------------


def test_tar_member_bytes_rejects_oversized_name_and_payload():
    """r9 ADVICE: a >100-byte member name used to spill into the
    mode/uid header fields (corrupt shard, no error); an ≥8 GiB payload
    would overflow the 11-digit octal size field. Both must raise."""
    import pytest as _pytest

    from tfl_realtime_lakehouse_spark.operators.multimodal import (
        tar_member_bytes,
    )

    # boundary: exactly 100 bytes is legal
    blob = tar_member_bytes("n" * 100, b"ok")
    assert blob[:100] == b"n" * 100
    with _pytest.raises(ValueError, match="100-byte"):
        tar_member_bytes("n" * 101, b"x")
    # multi-byte utf-8 counts in BYTES, not characters
    with _pytest.raises(ValueError, match="100-byte"):
        tar_member_bytes("α" * 51, b"x")
    with _pytest.raises(ValueError, match="octal size"):
        # fake the length check without allocating 8 GiB
        class _Huge(bytes):
            def __len__(self):
                return 8**11

        tar_member_bytes("big.bin", _Huge())


def test_did_state_fn_skips_null_post_rows():
    """r9 ADVICE: a purchase with NULL ts (is_post=None) used to fall
    through `if is_post:` into the PRE period; the batch query drops
    the post=NULL group entirely, so the twin must skip the row."""
    from decimal import Decimal

    import pandas as pd

    from tfl_realtime_lakehouse_spark.streaming.did import _did_state_fn

    class _FakeState:
        exists = False

        def __init__(self):
            self.updated = None

        def update(self, v):
            self.updated = v

    st = _FakeState()
    pdf = pd.DataFrame(
        {
            "yr": [Decimal("5"), Decimal("7"), None, Decimal("11")],
            "_post": [False, None, True, True],
        }
    )
    (out,) = _did_state_fn((42, 1), iter([pdf]), st)
    # 7 (null post) skipped; None yr skipped; 5 pre; 11 post
    assert out["y_pre"].iloc[0] == "5"
    assert out["y_post"].iloc[0] == "11"
    assert st.updated == ("5", "11")


def test_kmeans_train_exact_overflow_fails_loudly(spark):
    """r9 ADVICE: the decimal(38,12)→(25,12) downcast in the weighted
    centroid update silently NULLed past 1e13 with ANSI off; the
    _dec25_guard must turn an out-of-domain corpus into an error."""
    import pytest as _pytest

    from tfl_realtime_lakehouse_spark.operators.similarity import (
        kmeans_train_exact,
    )

    big = spark.createDataFrame(
        [(i, [1.0e14, 1.0e14]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="overflow"):
        kmeans_train_exact(big, k=1, iters=1).collect()


def test_kmeans_train_exact_null_element_fails_with_null_message(spark):
    """r10 ADVICE: assert_true also throws on a NULL condition, so a
    vector with NULL elements used to die with the misleading
    'overflow' message. The guard now leads with an isNotNull assert
    carrying its own message — NULL partial sums are intentionally
    fatal (a propagated NULL would zero a centroid dimension), and the
    error says so. The trigger is a (cell, dim) group whose values are
    ALL NULL (decimal SUM skips individual NULLs), so every vector here
    carries NULL at dim 1."""
    import pytest as _pytest

    from tfl_realtime_lakehouse_spark.operators.similarity import (
        kmeans_train_exact,
    )

    holey = spark.createDataFrame(
        [(0, [1.0, None]), (1, [3.0, None]), (2, [5.0, None]), (3, [7.0, None])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="NULL partial sum"):
        kmeans_train_exact(holey, k=1, iters=1).collect()


def test_pca_cov_exact_excludes_null_vectors(spark):
    """r9 ADVICE: rows with a NULL embedding used to vanish from n
    implicitly (the exploded count marker drops the null group); the
    contract is now an explicit input filter — n, mean, cov over the
    non-null rows only."""
    from tfl_realtime_lakehouse_spark.operators.similarity import (
        pca_cov_exact,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (1, None), (2, [5.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    n, mean, cov = pca_cov_exact(df, dims=2)
    assert n == 2
    assert mean == [3.0, 5.0]
    assert abs(cov[0][0] - 4.0) < 1e-12 and abs(cov[1][1] - 4.0) < 1e-12


def test_ivfpq_recall_eval_matches_python(spark, tmp_path):
    """X224 end-to-end against a pure-Python replay of the COMPOSED
    pipeline: coarse md5-seeded Lloyd cells, IEEE residuals against the
    trained centroids, four per-subspace residual codebooks, per-
    (query, probed-cell) decimal-pinned residual ADC, both top-k legs.
    Same dyadic-grid fixture discipline as the X215/X216 tests."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries import wave11
    from tfl_realtime_lakehouse_spark.queries.wave11 import (
        embedding_ann_ivfpq_recall_eval,
    )

    n, d = 50, 64
    K, citers = wave11._IP_CELLS, wave11._IP_CITERS
    m, sd, codes, piters = (
        wave11._IP_M,
        wave11._IP_SUB_D,
        wave11._IP_CODES,
        wave11._IP_PITERS,
    )
    NPROBE, TOPK, NQ = wave11._IP_NPROBE, wave11._IP_TOPK, wave11._IP_NQ
    rng = np.random.default_rng(24)
    vecs = (rng.integers(-1024, 1025, size=(n, d)) / 1024.0).astype(np.float32)
    pd.DataFrame(
        {"vec_id": range(n), "embedding": list(vecs), "label": 0}
    ).to_parquet(f"{tmp_path}/embeddings.parquet")

    x = vecs.astype(np.float64)

    def sqdist(a, b):
        acc = 0.0
        for i in range(len(a)):
            t = a[i] - b[i]
            acc += t * t
        return acc

    def q6(v):
        return float(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def d6dec(v):
        return Decimal(q6(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    def train(rows, k, iters, tag, dd):
        order = sorted(
            range(n),
            key=lambda i: (hashlib.md5(f"{tag}{i}".encode()).hexdigest(), i),
        )
        kk = min(k, n)
        cents = {c: [float(v) for v in rows[order[c]]] for c in range(kk)}
        for _ in range(iters):
            a = {
                i: min(range(kk), key=lambda c: (q6(sqdist(rows[i], cents[c])), c))
                for i in range(n)
            }
            for c in range(kk):
                mem = [i for i in range(n) if a[i] == c]
                if not mem:
                    continue
                cents[c] = [
                    float(
                        sum(
                            (
                                Decimal(float(rows[i][dim])).quantize(
                                    Decimal("1e-12"), ROUND_HALF_UP
                                )
                                for i in mem
                            ),
                            Decimal(0),
                        )
                    )
                    / len(mem)
                    for dim in range(dd)
                ]
        assign = {
            i: min(range(kk), key=lambda c: (q6(sqdist(rows[i], cents[c])), c))
            for i in range(n)
        }
        return cents, assign

    ccents, cmem = train(x, K, citers, "ivfpqc:", d)
    resid = np.array(
        [[x[i][dim] - ccents[cmem[i]][dim] for dim in range(d)] for i in range(n)]
    )
    books, rcodes = {}, {}
    for s in range(m):
        books[s], rcodes[s] = train(
            resid[:, s * sd : (s + 1) * sd], codes, piters, f"rpq{s}:", sd
        )

    want = {}
    for qid in range(NQ):
        probed = sorted(range(K), key=lambda c: (q6(sqdist(x[qid], ccents[c])), c))[
            :NPROBE
        ]
        luts = {}
        for c in probed:
            qr = [x[qid][dim] - ccents[c][dim] for dim in range(d)]
            luts[c] = {
                s: {
                    code: d6dec(sqdist(qr[s * sd : (s + 1) * sd], books[s][code]))
                    for code in books[s]
                }
                for s in range(m)
            }
        adc = {}
        for j in range(n):
            if cmem[j] not in probed or j == qid:
                continue
            adc[j] = sum(
                (luts[cmem[j]][s][rcodes[s][j]] for s in range(m)), Decimal(0)
            )
        approx = sorted(adc, key=lambda j: (adc[j], j))[:TOPK]
        exact = sorted(
            (j for j in range(n) if j != qid),
            key=lambda j: (q6(sqdist(x[qid], x[j])), j),
        )[:TOPK]
        common = len(set(approx) & set(exact))
        want[qid] = (len(exact), len(approx), common, common / len(exact))

    got = {
        r["query_id"]: (r["n_exact"], r["n_approx"], r["n_common"], r["recall_at_k"])
        for r in embedding_ann_ivfpq_recall_eval(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(NQ))
    for qid in range(NQ):
        assert got[qid][:3] == want[qid][:3], (qid, got[qid], want[qid])
        assert abs(got[qid][3] - round(want[qid][3], 6)) < 1e-9
    assert any(v[3] < 1.0 for v in want.values())


def test_semantic_dedup_exact_matches_python(spark, tmp_path):
    """X225 against a PER-ID pure-Python replay of the sequential
    greedy (the contraction in semantic_dedup_exact runs over distinct
    vectors and expands copies — the replay here never contracts, so
    the test proves the contraction exact). Fixture plants byte-
    identical copies (rep expansion), a correlated family (a real
    greedy chain through threshold-graph edges), and random dyadic
    vectors (natural sparse edges at the 0.25 threshold)."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries import wave11
    from tfl_realtime_lakehouse_spark.queries.wave11 import (
        semantic_dedup_recall_eval,
    )

    n, d = 36, 64
    K, iters, thr = wave11._SDD_K, wave11._SDD_ITERS, wave11._SDD_THR
    rng = np.random.default_rng(25)
    vecs = (rng.integers(-1024, 1025, size=(n, d)) / 1024.0).astype(np.float32)
    # byte-identical copies: two of vec 0, one of vec 9
    vecs[5] = vecs[0]
    vecs[17] = vecs[0]
    vecs[20] = vecs[9]
    # correlated family around vec 28: strong edges -> a greedy chain
    for j in (29, 30, 31, 32):
        noise = (rng.integers(-64, 65, size=d) / 1024.0).astype(np.float32)
        vecs[j] = (vecs[28] + noise).astype(np.float32)
    pd.DataFrame(
        {"vec_id": range(n), "embedding": list(vecs), "label": 0}
    ).to_parquet(f"{tmp_path}/embeddings.parquet")

    x = vecs.astype(np.float64)

    def q6(v):
        return float(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def sqdist(a, b):
        acc = 0.0
        for i in range(len(a)):
            t = a[i] - b[i]
            acc += t * t
        return acc

    def cos6(a, b):
        dot = 0.0
        for i in range(len(a)):
            dot = dot + a[i] * b[i]
        sa = 0.0
        for v in a:
            sa = sa + v * v
        sb = 0.0
        for v in b:
            sb = sb + v * v
        import math

        return q6(dot / (math.sqrt(sa) * math.sqrt(sb)))

    # exact k-means replay (tag sdd:, 1 round) — same as the X215 replay
    order = sorted(
        range(n), key=lambda i: (hashlib.md5(f"sdd:{i}".encode()).hexdigest(), i)
    )
    cents = {c: [float(v) for v in x[order[c]]] for c in range(K)}
    for _ in range(iters):
        a = {
            i: min(range(K), key=lambda c: (q6(sqdist(x[i], cents[c])), c))
            for i in range(n)
        }
        for c in range(K):
            mem = [i for i in range(n) if a[i] == c]
            if not mem:
                continue
            cents[c] = [
                float(
                    sum(
                        (
                            Decimal(float(x[i][dim])).quantize(
                                Decimal("1e-12"), ROUND_HALF_UP
                            )
                            for i in mem
                        ),
                        Decimal(0),
                    )
                )
                / len(mem)
                for dim in range(d)
            ]
    mem = {
        i: min(range(K), key=lambda c: (q6(sqdist(x[i], cents[c])), c))
        for i in range(n)
    }

    # sequential greedy per cell, PER ID (uncontracted)
    want = {}
    for c in range(K):
        ids = sorted(i for i in range(n) if mem[i] == c)
        kept = []
        for i in ids:
            shadow = [j for j in kept if cos6(x[j], x[i]) >= thr]
            if shadow:
                want[i] = (c, 0, min(shadow))
            else:
                kept.append(i)
                want[i] = (c, 1, None)

    got = {
        r["vec_id"]: (r["cell"], r["keep"], r["pruned_by"])
        for r in semantic_dedup_recall_eval(spark, str(tmp_path)).collect()
    }
    assert got == want
    # the fixture must exercise every branch: copies pruned by their
    # rep, a cross-content prune, and keepers in >= 2 cells
    assert want[5] == (want[0][0], 0, 0) and want[17] == (want[0][0], 0, 0)
    assert any(
        pb is not None and not np.array_equal(vecs[i], vecs[pb])
        for i, (_, k, pb) in want.items()
        if k == 0
    )
    assert len({c for c, k, _ in want.values() if k == 1}) >= 2


def test_ordered_prefix_sum_matches_unpartitioned_window(spark):
    """The range-partitioned two-pass prefix sum (X227's engine) must be
    value-identical to the single-task un-partitioned window it
    replaces, including with duplicate order values broken by id and a
    partition count far above, equal to, and below the row count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tfl_realtime_lakehouse_spark.operators.sampling import (
        ordered_prefix_sum,
    )

    rows = [(i, (i * 37) % 11, 1 + (i * 13) % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k long, v long").withColumn(
        "one", F.lit(1)
    )
    w = Window.orderBy(F.col("k").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: (r["cv"], r["rk"])
        for r in df.select(
            "id",
            F.sum("v").over(w).alias("cv"),
            F.sum("one").over(w).alias("rk"),
        ).collect()
    }
    for parts in (7, 200, 1):
        got = {
            r["id"]: (r["cum_v"], r["rank"])
            for r in ordered_prefix_sum(
                df,
                order_by=[F.col("k").desc(), F.col("id").asc()],
                values={"v": "cum_v", "one": "rank"},
                partitions=parts,
            ).collect()
        }
        assert got == want, f"partitions={parts}"


def test_corpus_budget_select_matches_python_replay(spark, tmp_path):
    """X227 replay: greedy quality-per-token prefix selection under a
    40%-of-corpus token budget, replayed in pure python with the same
    split semantics (single-space split KEEPS empty strings — double
    spaces are planted to pin that) and float division order."""
    import math

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave12 import (
        corpus_budget_select,
    )

    texts = []
    for i in range(40):
        words = [f"w{(i * j) % 17}" for j in range(3 + i % 9)]
        if i % 5 == 0:
            words.insert(1, "")  # double space survives the join
        if i % 4 == 0:
            words += ["Dup", "dup"]  # case-folded duplicate
        texts.append(" ".join(words))
    pd.DataFrame(
        {
            "doc_id": range(40),
            "text": texts,
            "lang": "en",
            "source": [f"s{i % 4}" for i in range(40)],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{tmp_path}/documents.parquet")

    docs = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_tok = len(toks)
        uniq = len(set(t.lower().split(" ")))
        docs.append((i, n_tok, uniq, uniq / max(n_tok, 1)))
    budget = math.floor(0.4 * sum(d[1] for d in docs))
    order = sorted(docs, key=lambda d: (-d[3], d[0]))
    want, cum = {}, 0
    for rank, (i, n_tok, uniq, ratio) in enumerate(order, start=1):
        cum += n_tok
        if cum > budget:
            break
        want[i] = (n_tok, uniq, round(ratio, 6), rank, cum)

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["uniq_words"],
            r["quality_per_token"],
            r["sel_rank"],
            r["cum_tokens"],
        )
        for r in corpus_budget_select(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert 0 < len(want) < 40  # budget actually binds


def test_eval_neyman_allocation_matches_python_replay(spark, tmp_path):
    """X228 replay: per-source Neyman shares from exact integer partials
    with the DECIMAL-pinned weight total, including a zero-variance
    source (sigma 0 -> zero allocation, no division blowup)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from tfl_realtime_lakehouse_spark.queries.wave12 import (
        eval_neyman_allocation,
    )

    lengths = {
        "s0": [100, 200, 300, 400],          # wide spread
        "s1": [250, 250, 250],               # zero variance
        "s2": [10, 20, 30, 40, 50, 60, 990],  # outlier-heavy
        "s3": [5, 500],
    }
    rows = []
    for src, ls in lengths.items():
        for j, n in enumerate(ls):
            rows.append((len(rows), "x" * n, "en", src, n))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{tmp_path}/documents.parquet")

    stats = {}
    for src, ls in lengths.items():
        n, sx, sx2 = len(ls), sum(ls), sum(v * v for v in ls)
        sigma = ((float(sx2) - float(sx) * float(sx) / float(n)) / float(n)) ** 0.5
        sigma6 = Decimal(sigma).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        stats[src] = (n, sigma6, Decimal(n) * sigma6)
    wtot = sum(w for _, _, w in stats.values())
    import math

    want = {}
    for src, (n, sigma6, wk) in stats.items():
        share = float(wk) / float(wtot)
        want[src] = (
            n,
            float(sigma6),
            round(share, 6),
            math.floor(1000.0 * share),
        )

    got = {
        r["source"]: (
            r["n_docs"],
            r["sigma_chars"],
            r["alloc_share"],
            r["alloc_n"],
        )
        for r in eval_neyman_allocation(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert got["s1"][1] == 0.0 and got["s1"][3] == 0  # zero-variance source
    assert sum(v[3] for v in got.values()) <= 1000  # floor never overshoots
