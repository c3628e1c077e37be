"""Similarity-search quality: both ANN paths (LSH, IVF) must recover most
of the exact brute-force top-k, and their scores must be bit-identical to
the exact scorer for every (query, neighbor) they return."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_spark.operators.similarity import (
    TOP_K,
    ann_ivf_topk,
    ann_lsh_topk,
    brute_force_topk,
)

from .conftest import SF_SMALL

MIN_RECALL = 0.6


@pytest.fixture(scope="module")
def exact(spark):
    rows = brute_force_topk(spark, SF_SMALL).collect()
    truth: dict[int, set[int]] = {}
    scores: dict[tuple[int, int], float] = {}
    for r in rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        scores[(r.query_id, r.neighbor_id)] = r.cosine
    return truth, scores


@pytest.mark.parametrize("ann_fn", [ann_lsh_topk, ann_ivf_topk], ids=["lsh", "ivf"])
def test_ann_recall_and_exact_scores(spark, exact, ann_fn):
    truth, scores = exact
    got = ann_fn(spark, SF_SMALL).collect()
    by_query: dict[int, set[int]] = {}
    for r in got:
        by_query.setdefault(r.query_id, set()).add(r.neighbor_id)
        # any returned pair that brute force also scored must agree exactly
        key = (r.query_id, r.neighbor_id)
        if key in scores:
            assert r.cosine == scores[key], f"score drift at {key}"
    hits = sum(len(by_query.get(q, set()) & t) for q, t in truth.items())
    recall = hits / (len(truth) * TOP_K)
    assert recall >= MIN_RECALL, f"recall@{TOP_K} = {recall:.2f}"


def test_quantize_int8_invariants(spark):
    """Int8 quantization: every component in [-127, 127], the max-abs
    component hits exactly ±127 (scale saturation), and the integer
    norms agree with the emitted vector."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.similarity import (
        quantize_int8_vectors,
    )

    df = quantize_int8_vectors(spark, "/root/testdata/sf0.001")
    bad = df.filter(
        (F.array_max(F.transform("q8", F.abs)) > 127)
        | ((F.col("scale") > 0) & (F.array_max(F.transform("q8", F.abs)) != 127))
        | (
            F.aggregate("q8", F.lit(0).cast("long"), lambda a, v: a + F.abs(v))
            != F.col("q_l1")
        )
    ).count()
    assert bad == 0
    assert df.count() > 0


def test_ivf_incremental_stale_centroid_recall(spark):
    """Track the raw stale-centroid recall the driver entry gates on
    (the entry only exposes the boolean; this pins the number), and the
    maintenance invariant: the batch pass touches only batch vectors."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import similarity as S

    emb = S._emb(spark, SF_SMALL)
    old = emb.filter(F.col("vec_id") < S.IVF_INCR_SPLIT)
    batch = emb.filter(F.col("vec_id") >= S.IVF_INCR_SPLIT)
    cmat = S._train_centroids_on_sample(old)
    ab = S._assign_lists(spark, batch, cmat)
    assert ab.count() == batch.count()
    assert ab.filter(F.col("neighbor_id") < S.IVF_INCR_SPLIT).count() == 0

    grown = S._assign_lists(spark, old, cmat).unionByName(ab)
    ann = (
        S._probe_topk(spark, emb, cmat, grown)
        .filter(F.col("neighbor_id") < S.CORPUS_CAP)
        .select("query_id", "neighbor_id")
    )
    truth = S.brute_force_topk(spark, SF_SMALL).select(
        "query_id", F.col("neighbor_id").alias("true_neighbor")
    )
    n_truth = truth.count()
    n_hits = truth.join(
        ann,
        (truth["query_id"] == ann["query_id"])
        & (truth["true_neighbor"] == ann["neighbor_id"]),
        "left_semi",
    ).count()
    recall = n_hits / n_truth
    assert recall >= S.IVF_INCR_RECALL_FLOOR, recall


def test_pq_rerank_recall_tracked(spark):
    """The PQ driver entry only exposes the recall-floor boolean; this
    pins the raw number and the code-domain invariant (all codes in
    [0, PQ_KS))."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import similarity as S

    emb = S._emb(spark, SF_SMALL)
    books = S._train_pq_codebooks(emb)
    assert books.shape == (S.PQ_M, S.PQ_KS, 64 // S.PQ_M)
    coded = S._pq_encode(spark, emb, books)
    bad = coded.filter(
        (F.array_min("codes") < 0) | (F.array_max("codes") >= S.PQ_KS)
        | (F.size("codes") != S.PQ_M)
    ).count()
    assert bad == 0
    row = S.ann_pq_recall(spark, SF_SMALL).collect()[0]
    assert row.recall_floor_met, "PQ rerank recall fell below the gate floor"


def test_quantize_int8_roundtrip_error_bound(spark):
    """Dequantization error is bounded by half a quantization step:
    |x − q·scale/127| ≤ scale/254 (+ float32 epsilon) for every
    component of every vector."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.similarity import (
        quantize_int8_vectors,
    )

    df = quantize_int8_vectors(spark, SF_SMALL)
    orig = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    joined = df.join(orig, "vec_id").select(
        "vec_id",
        F.array_max(
            F.zip_with(
                F.transform("embedding", lambda v: v.cast("double")),
                "q8",
                lambda x, q: F.abs(x - q.cast("double") * F.col("scale") / 127.0),
            )
        ).alias("max_err"),
        "scale",
    )
    bad = joined.filter(
        F.col("max_err") > F.col("scale") / 254.0 + 1e-9
    ).count()
    assert bad == 0


def test_quantize_int8_csv_roundtrip(spark):
    """The driver entry's q8_csv serialization is lossless: split+cast
    reproduces the production array column exactly."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.similarity import (
        quantize_int8,
        quantize_int8_vectors,
    )

    csv = quantize_int8(spark, SF_SMALL).select("vec_id", "q8_csv")
    arr = quantize_int8_vectors(spark, SF_SMALL).select("vec_id", "q8")
    joined = csv.join(arr, "vec_id")
    bad = joined.filter(
        F.transform(F.split("q8_csv", ","), lambda v: v.cast("int")) != F.col("q8")
    ).count()
    assert bad == 0


def test_multiprobe_recall_is_monotone(spark, exact):
    """Multi-probe candidates are a superset of single-probe's, and both
    paths rank by the same exact cosine with identical tie-breaks — so
    multi-probe recall vs the brute truth can only improve."""
    from near_real_time_data_warehouse_spark.operators.similarity import (
        ann_lsh_multiprobe,
    )

    truth, scores = exact

    def recall(df):
        by_query = {}
        for r in df.collect():
            by_query.setdefault(r.query_id, set()).add(r.neighbor_id)
            key = (r.query_id, r.neighbor_id)
            if key in scores:
                assert r.cosine == scores[key], f"score drift at {key}"
        hits = sum(len(by_query.get(q, set()) & t) for q, t in truth.items())
        return hits / (len(truth) * TOP_K)

    single = recall(ann_lsh_topk(spark, SF_SMALL))
    multi = recall(ann_lsh_multiprobe(spark, SF_SMALL))
    assert multi >= single
    assert multi >= MIN_RECALL


def test_sem_planes_depth_formula():
    """Depth stays at the static (oracle-replayed) SEM_PLANES below the
    occupancy knee and adds one plane per corpus doubling past it, so
    expected bucket occupancy — and with it self-join candidate volume
    per vector — stays constant (the 50x probe's quadratic-candidates
    fix)."""
    from near_real_time_data_warehouse_spark.operators.similarity import (
        SEM_PLANES,
        SEM_TARGET_N,
        _sem_planes,
    )

    assert _sem_planes(1) == SEM_PLANES
    assert _sem_planes(SEM_TARGET_N) == SEM_PLANES
    assert _sem_planes(SEM_TARGET_N + 1) == SEM_PLANES + 1
    assert _sem_planes(2 * SEM_TARGET_N) == SEM_PLANES + 1
    assert _sem_planes(4 * SEM_TARGET_N) == SEM_PLANES + 2
    assert _sem_planes(50 * SEM_TARGET_N) == SEM_PLANES + 6


def test_deeper_planes_candidates_are_a_subset(spark):
    """Plane p's weights don't depend on the total plane count, so a
    bucket collision on P+2 bits implies one on the first P bits: the
    deeper self-join candidate set must be an exact subset of the
    shallower one (adaptive deepening only ever drops candidates)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.similarity import (
        SEM_TABLES,
        _bucketed,
        _emb,
    )

    from .conftest import SF_SMALL

    e = _emb(spark, SF_SMALL)

    def pairs(n_planes: int) -> set:
        b = _bucketed(e, n_tables=SEM_TABLES, n_planes=n_planes)
        c = (
            b.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("a.vec_id").alias("x"), F.col("b.vec_id").alias("y"))
            .distinct()
        )
        return {(r.x, r.y) for r in c.collect()}

    shallow, deep = pairs(6), pairs(8)
    assert deep <= shallow
    assert len(deep) < len(shallow)  # deepening genuinely prunes here


def test_ann_planes_formula_and_probe_containment(spark):
    """The query-path depth knee mirrors the semantic one, and deeper
    probing only ever narrows candidates: a deeper-bucket collision
    implies a shallower one (bit prefix), and every Hamming-1 probe at
    depth P+d projects onto the exact-or-Hamming-1 probe set at depth P
    — so the multiprobe candidate set at deeper planes is a subset of
    the default-depth set."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import similarity as S

    assert S._ann_planes(1) == S.N_PLANES
    assert S._ann_planes(S.ANN_TARGET_N) == S.N_PLANES
    assert S._ann_planes(2 * S.ANN_TARGET_N) == S.N_PLANES + 1
    assert S._ann_planes(300 * S.ANN_TARGET_N) == S.N_PLANES + 9

    from .conftest import SF_SMALL

    emb = S._emb(spark, SF_SMALL)

    def cand(n_planes: int) -> set:
        queries = S._bucketed(
            emb.filter(F.col("vec_id") < S.QUERY_CAP), n_planes=n_planes
        ).select(
            F.col("vec_id").alias("query_id"), "tbl", F.col("bucket").alias("qbucket")
        )
        probes = queries.select(
            "query_id",
            "tbl",
            F.explode(
                F.array(
                    F.col("qbucket"),
                    *[
                        F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(n_planes)
                    ],
                )
            ).alias("qbucket"),
        )
        corpus = S._bucketed(emb, n_planes=n_planes).select(
            F.col("vec_id").alias("neighbor_id"), "tbl", "bucket"
        )
        got = (
            corpus.alias("cs")
            .join(
                probes.alias("qs"),
                (F.col("cs.tbl") == F.col("qs.tbl"))
                & (F.col("cs.bucket") == F.col("qs.qbucket"))
                & (F.col("qs.query_id") != F.col("cs.neighbor_id")),
            )
            .select("query_id", "neighbor_id")
            .distinct()
        )
        return {(r.query_id, r.neighbor_id) for r in got.collect()}

    shallow, deep = cand(4), cand(6)
    assert deep <= shallow
    assert len(deep) < len(shallow)


def test_ivf_centroid_scaling_formula():
    """√N list-count discipline past the knee: static below it (every
    oracle-verified SF), doubling per 4× the corpus above it, sample
    budget ≥ 128 vectors per centroid."""
    from near_real_time_data_warehouse_spark.operators.similarity import (
        IVF_TARGET_N,
        N_CENTROIDS,
        TRAIN_SAMPLE_TARGET,
        _ivf_centroids,
        _train_sample_target,
    )

    assert _ivf_centroids(100) == N_CENTROIDS
    assert _ivf_centroids(IVF_TARGET_N) == N_CENTROIDS
    assert _ivf_centroids(4 * IVF_TARGET_N) == 2 * N_CENTROIDS
    assert _ivf_centroids(16 * IVF_TARGET_N) == 4 * N_CENTROIDS
    # 50x-probe scale: 250k vectors -> 6x doubling-rounded list count
    assert _ivf_centroids(250_000) == N_CENTROIDS * 8
    assert _train_sample_target(N_CENTROIDS) == TRAIN_SAMPLE_TARGET
    assert _train_sample_target(128) == 128 * 128


def test_ivf_uncapped_recall_gate(spark):
    """The uncapped gate's truth covers the whole corpus, its boolean
    holds at the test SF, and at the capped-corpus SFs it agrees with
    the capped entry's verdict (cap fully covering there)."""
    from near_real_time_data_warehouse_spark.operators.similarity import (
        QUERY_CAP,
        TOP_K,
        ann_ivf_recall_uncapped,
    )

    from .conftest import SF_SMALL

    row = ann_ivf_recall_uncapped(spark, SF_SMALL).collect()[0]
    assert row.recall_floor_met
    assert row.n_queries <= QUERY_CAP and row.k == TOP_K


def test_ivf_topk_oracle_matches_above_knee(spark, tmp_path):
    """The sim_ann_ivf_topk oracle replays the WHOLE lifecycle — knee
    arithmetic, sampled training, Lloyd floor-division updates, corpus
    assignment, probe order, ranking.  Every driver SF sits below the
    8192-vector knee, so this pins the other side: a 9000-vector corpus
    engages the knee (32 lists, modulus-sampled training set) and the
    Spark result must still match the DuckDB replay bit-for-bit."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from near_real_time_data_warehouse_spark.operators.similarity import (
        _ivf_centroids,
        _ivf_topk_sql,
        ann_ivf_topk,
    )
    from near_real_time_data_warehouse_spark.oracle_harness import compare

    n, dim = 9000, 64
    assert _ivf_centroids(n) == 32  # genuinely past the knee
    rng = np.random.default_rng(42)
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 7).astype(np.int32)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    r = compare(
        "ivf_above_knee", ann_ivf_topk(spark, str(tmp_path)), con, _ivf_topk_sql()
    )
    assert r.ok, str(r)


def test_covariance_stats_match_numpy_and_partition_invariant(spark):
    """emb_covariance_stats must equal a from-scratch numpy computation
    on the same quantized matrix, and be bit-identical under a different
    partitioning (integer partials commute)."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    rows = {(r["i"], r["j"]): r for r in sim.covariance_stats(spark, sf).collect()}
    pdf = sim._emb(spark, sf).toPandas()
    q = sim._quant_np(pdf["embedding"])
    g = q.T @ q
    s = q.sum(axis=0)
    n = len(q)
    assert len(rows) == 64 * 65 // 2
    for (i, j), r in rows.items():
        assert r["sum_prod"] == g[i - 1, j - 1]
        assert r["cov_num"] == n * g[i - 1, j - 1] - s[i - 1] * s[j - 1]
        assert r["covariance"] == r["cov_num"] / (n * n)
    # rebuild through the same kernel on a reshuffled input
    df2 = sim._emb(spark, sf).repartition(7)
    e_orig = sim._emb
    try:
        sim._emb = lambda _s, _d: df2
        rows2 = {(r["i"], r["j"]): r for r in sim.covariance_stats(spark, sf).collect()}
    finally:
        sim._emb = e_orig
    for k in rows:
        a, b = rows[k], rows2[k]
        assert (a["cov_num"], a["covariance"]) == (b["cov_num"], b["covariance"])


def test_ivf_filtered_prefilter_semantics(spark):
    """sim_ann_ivf_filtered: every neighbor carries the target label,
    every query still gets a full top-k (the pre-filter guarantee), and
    post-filtering the UNFILTERED top-k would have starved some query —
    the failure mode the pre-filter exists to avoid."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import similarity as S

    sf = "/root/testdata/sf0.001"
    emb = S._emb(spark, sf)
    tgt = (
        emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "label").limit(1).collect()[0]["label"]
    )
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    filt = S.ann_ivf_filtered(spark, sf).collect()
    assert all(labels[r.neighbor_id] == tgt for r in filt)
    per_q = {}
    for r in filt:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, S.TOP_K + 1)) for v in per_q.values())
    # post-filter starvation: the unfiltered top-k, filtered to the
    # label afterwards, leaves at least one query with < TOP_K hits
    unf = S.ann_ivf_topk(spark, sf).collect()
    kept = {}
    for r in unf:
        if labels[r.neighbor_id] == tgt:
            kept[r.query_id] = kept.get(r.query_id, 0) + 1
    assert any(kept.get(q, 0) < S.TOP_K for q in per_q)


def test_pca_planted_component_matches_numpy(spark):
    """On data with a PLANTED dominant direction (a real eigengap —
    λ2/λ1 ≈ 0.1, unlike the near-isotropic synthetic corpus) the
    exact-integer power iteration must recover numpy's top eigenvector
    to |cosine| > 1 − 1e-6 in the fixed PCA_ROUNDS budget."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    u = rng.normal(size=sim.EMB_DIM)
    u /= np.linalg.norm(u)
    t = rng.normal(size=400)
    x = np.outer(t, u) * 0.3 + rng.normal(size=(400, sim.EMB_DIM)) * 0.01
    pdf_rows = [
        (int(i), [float(v) for v in x[i]], int(i % 3)) for i in range(len(x))
    ]
    df = spark.createDataFrame(pdf_rows, "vec_id long, embedding array<float>, label int")

    e_orig = sim._emb
    try:
        sim._emb = lambda _s, _d: df
        rows = sim.covariance_stats(spark, "ignored").collect()
        v, sums, n = sim._pca_eigvec_ints(rows)
    finally:
        sim._emb = e_orig

    # numpy truth on the same QUANTIZED matrix the engine sees
    q = sim._round_half_away(np.vstack(df.toPandas()["embedding"].values).astype(np.float64) * sim.QUANT).astype(np.float64)
    c = np.cov(q, rowvar=False, bias=True)
    eigvals, eigvecs = np.linalg.eigh(c)
    assert eigvals[-2] / eigvals[-1] < 0.2  # planted gap is real
    top = eigvecs[:, -1]
    va = np.array(v, dtype=np.float64)
    cos = abs(va @ top) / (np.linalg.norm(va) * np.linalg.norm(top))
    assert cos > 1 - 1e-6, f"integer iteration diverged from numpy: cos={cos}"


def test_pca_rerank_recall_on_planted_structure(spark):
    """On data whose variance genuinely lives in a low-dimensional
    subspace (the case PCA pre-filtering exists for) the PCA-rerank path
    must recover the exact brute-force top-k with high recall; on any
    data the output must be deterministic under a different input
    partitioning and rank-contiguous per query."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    rng = np.random.default_rng(23)
    basis = np.linalg.qr(rng.normal(size=(sim.EMB_DIM, 3)))[0].T
    t = rng.normal(size=(600, 3)) * np.array([0.6, 0.3, 0.15])
    x = t @ basis + rng.normal(size=(600, sim.EMB_DIM)) * 0.01
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]], int(i % 3)) for i in range(len(x))],
        "vec_id long, embedding array<float>, label int",
    )
    e_orig = sim._emb
    try:
        sim._emb = lambda _s, _d: df
        got = sim.ann_pca_rerank(spark, "planted").collect()
        sim._memoized.__globals__  # no-op; keep linter quiet
        brute = sim._brute_force_topk(spark, "planted").collect()
        df2 = df.repartition(7)
        sim._emb = lambda _s, _d: df2
        got2 = sim.ann_pca_rerank(spark, "planted").collect()
    finally:
        sim._emb = e_orig
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, got2))  # partition-invariant
    want = {(r["query_id"], r["neighbor_id"]) for r in brute}
    have = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(want & have) / len(want)
    assert recall >= 0.9, recall
    per_q: dict[int, list[int]] = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_multi_benchmark_contamination_consistent_with_single(spark):
    """The one-pass multi-benchmark screen must agree with the single
    screen it generalizes: per-benchmark leak counts and pair totals
    roll up from emb_split_contamination's per-vector rows partitioned
    by the same bench_id rule, and max cosines match bit-for-bit."""
    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    single = sim.split_contamination(spark, sf).collect()
    multi = {r["bench_id"]: r for r in
             sim.multi_benchmark_contamination(spark, sf).collect()}
    by_bench: dict[int, list] = {}
    for r in single:
        by_bench.setdefault(r["vec_id"] % sim.N_BENCHMARKS, []).append(r)
    assert set(multi) == set(by_bench)
    for b, rows in by_bench.items():
        m = multi[b]
        assert m["n_eval"] == len(rows)
        assert m["n_leaked_eval"] == sum(1 for r in rows if r["leaked"])
        assert m["total_leaky_pairs"] == sum(r["n_leaky_train"] for r in rows)
        assert m["max_cosine"] == max(r["max_cosine"] for r in rows)


def test_pca_topk_deflation_matches_numpy(spark):
    """On data with THREE planted directions (decreasing variance, real
    eigengaps) the exact-integer deflation must recover numpy's top-3
    eigenvectors each to |cosine| > 1 − 1e-4, the integer components
    must be mutually near-orthogonal, and component 1 must equal the
    single-component entry's vector exactly (emb_pca_project parity)."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    basis = np.linalg.qr(rng.normal(size=(sim.EMB_DIM, 3)))[0].T  # 3 orthonormal
    t = rng.normal(size=(500, 3)) * np.array([0.5, 0.25, 0.12])
    x = t @ basis + rng.normal(size=(500, sim.EMB_DIM)) * 0.005
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]], int(i % 3)) for i in range(len(x))],
        "vec_id long, embedding array<float>, label int",
    )

    e_orig = sim._emb
    try:
        sim._emb = lambda _s, _d: df
        rows = sim.covariance_stats(spark, "ignored").collect()
    finally:
        sim._emb = e_orig
    vecs, sums, n = sim._pca_topk_ints(rows, 3)
    v1, _, _ = sim._pca_eigvec_ints(rows)
    assert vecs[0] == v1  # PC1 parity with emb_pca_project

    q = sim._round_half_away(
        np.vstack(df.toPandas()["embedding"].values).astype(np.float64) * sim.QUANT
    ).astype(np.float64)
    c = np.cov(q, rowvar=False, bias=True)
    eigvals, eigvecs = np.linalg.eigh(c)
    assert eigvals[-2] / eigvals[-1] < 0.5 and eigvals[-3] / eigvals[-2] < 0.5
    for k in range(3):
        va = np.array(vecs[k], dtype=np.float64)
        truth = eigvecs[:, -(k + 1)]
        cos = abs(va @ truth) / (np.linalg.norm(va) * np.linalg.norm(truth))
        assert cos > 1 - 1e-4, f"component {k + 1}: cos={cos}"
    for a in range(3):
        for b in range(a + 1, 3):
            ua = np.array(vecs[a], dtype=np.float64)
            ub = np.array(vecs[b], dtype=np.float64)
            ortho = abs(ua @ ub) / (np.linalg.norm(ua) * np.linalg.norm(ub))
            assert ortho < 1e-3, (a, b, ortho)


def test_pca_projection_formula_and_partition_invariance(spark):
    """On the real corpus: the per-vector projections must match a numpy
    replay of the same integer formula, the iterate's Rayleigh quotient
    must sit at the top of the spectrum (the meaningful convergence
    criterion when the eigengap is tiny), and the whole entry must be
    bit-identical under a different input partitioning."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    rows = sim.covariance_stats(spark, sf).collect()
    v, sums, n = sim._pca_eigvec_ints(rows)

    pdf = sim._emb(spark, sf).toPandas()
    q = sim._quant_np(pdf["embedding"]).astype(np.float64)
    c = np.cov(q, rowvar=False, bias=True)
    eigvals = np.linalg.eigvalsh(c)
    va = np.array(v, dtype=np.float64)
    rayleigh = va @ c @ va / (va @ va)
    # (λ2/λ1)^(2K) bulk contamination at K=48 leaves ≲1% quotient deficit
    assert rayleigh >= 0.985 * eigvals[-1], (rayleigh, eigvals[-1])

    got = {r["vec_id"]: r for r in sim.pca_project(spark, sf).collect()}
    qi = sim._quant_np(pdf["embedding"])  # int64
    ids = pdf["vec_id"].to_numpy()
    const = sum(v[j] * sums[j] for j in range(sim.EMB_DIM))
    for k in range(len(ids)):
        expect = n * int(np.array(v, dtype=object) @ qi[k].astype(object)) - const
        assert got[int(ids[k])]["proj_num"] == expect
        assert got[int(ids[k])]["proj"] == expect / float(
            n * sim.QUANT * sim.PCA_SCALE
        )

    df2 = sim._emb(spark, sf).repartition(7)
    e_orig = sim._emb
    try:
        sim._emb = lambda _s, _d: df2
        got2 = {r["vec_id"]: r for r in sim.pca_project(spark, sf).collect()}
    finally:
        sim._emb = e_orig
    for k, r in got.items():
        assert (r["proj_num"], r["proj"]) == (got2[k]["proj_num"], got2[k]["proj"])


def test_pca_sign_canonicalization_is_deterministic():
    """Flipping the sign of the covariance input's seed direction must not
    change the reported eigenvector: the largest-|component| rule pins
    the sign regardless of the iteration's incidental orientation."""
    from near_real_time_data_warehouse_spark.operators import similarity as sim

    dims = sim.EMB_DIM

    class Row(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    def rows_for(diag):
        out = []
        for i in range(dims):
            for j in range(i, dims):
                out.append(
                    Row(
                        i=i + 1,
                        j=j + 1,
                        cov_num=diag[i] if i == j else 0,
                        sum_i=0,
                        sum_j=0,
                        n=10,
                    )
                )
        return out

    diag = [100 + i for i in range(dims)]
    v, _, _ = sim._pca_eigvec_ints(rows_for(diag))
    # diagonal matrix: top component is the last axis, sign positive
    lead = max(range(dims), key=lambda i: (abs(v[i]), -i))
    assert lead == dims - 1
    assert v[lead] == sim.PCA_SCALE


def test_split_contamination_matches_numpy_bruteforce(spark):
    """The broadcast-matmul screen must agree with a from-scratch numpy
    brute force on the same md5 split: identical leak counts and
    bit-identical max cosines per eval vector, and every eval vector
    must appear exactly once regardless of input partitioning."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r for r in sim.split_contamination(spark, sf).collect()}

    pdf = sim._emb(spark, sf).toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    q = sim._quant_np(pdf["embedding"])
    import hashlib

    def bucket(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % 10

    b = np.array([bucket(v) for v in ids])
    ev, tr = q[b == 0], q[b != 0]
    eids = ids[b == 0]
    assert len(eids) > 0 and len(eids) == len(got)
    s = tr.astype(np.int64) @ ev.astype(np.int64).T
    nt = np.sqrt((tr * tr).sum(axis=1).astype(np.float64))
    ne = np.sqrt((ev * ev).sum(axis=1).astype(np.float64))
    cos = s / (nt[:, None] * ne[None, :])
    for k, vid in enumerate(eids):
        r = got[int(vid)]
        assert r["n_leaky_train"] == int((cos[:, k] >= sim.CONTAM_COSINE).sum())
        assert r["max_cosine"] == cos[:, k].max()
        assert r["leaked"] == bool(r["n_leaky_train"] > 0)

    df2 = sim._emb(spark, sf).repartition(7)
    e_orig = sim._emb
    try:
        sim._emb = lambda _s, _d: df2
        got2 = {r["vec_id"]: r for r in sim.split_contamination(spark, sf).collect()}
    finally:
        sim._emb = e_orig
    assert got.keys() == got2.keys()
    for k in got:
        assert (got[k]["n_leaky_train"], got[k]["max_cosine"]) == (
            got2[k]["n_leaky_train"],
            got2[k]["max_cosine"],
        )


def test_pca_incremental_equals_full_rebuild_on_batch_rows(spark):
    """Gram additivity makes the incremental path EXACT: merged
    standing+batch statistics equal the full-corpus statistics, so every
    batch row's projection must be bit-identical to the full entry's,
    and the entry must emit exactly the batch rows."""
    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    full = {r["vec_id"]: r for r in sim.pca_project(spark, sf).collect()}
    incr = {r["vec_id"]: r for r in sim.pca_incremental(spark, sf).collect()}
    expected_ids = {k for k in full if k >= sim.PCA_INCR_SPLIT}
    assert set(incr) == expected_ids and len(incr) > 0
    for k, r in incr.items():
        assert (r["proj_num"], r["proj"]) == (full[k]["proj_num"], full[k]["proj"])


def test_contamination_incremental_consistent_with_full_screen(spark):
    """The ingestion screen must emit exactly the batch rows (non-eval,
    vec_id ≥ split), and its verdicts must be consistent with the full
    split screen: a batch vector's max cosine vs eval must equal the
    transpose cell a numpy replay computes, and quarantine ⇔ hits > 0."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r for r in sim.contamination_incremental(spark, sf).collect()}

    pdf = sim._emb(spark, sf).toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    q = sim._quant_np(pdf["embedding"])
    import hashlib

    b = np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % 10 for v in ids]
    )
    is_batch = (b != 0) & (ids >= sim.IVF_INCR_SPLIT)
    assert set(got) == set(int(v) for v in ids[is_batch]) and got
    ev = q[b == 0]
    ba = q[is_batch]
    bids = ids[is_batch]
    s = ba.astype(np.int64) @ ev.astype(np.int64).T
    nb = np.sqrt((ba * ba).sum(axis=1).astype(np.float64))
    ne = np.sqrt((ev * ev).sum(axis=1).astype(np.float64))
    cos = s / (nb[:, None] * ne[None, :])
    for k, vid in enumerate(bids):
        r = got[int(vid)]
        assert r["n_eval_hits"] == int((cos[k] >= sim.CONTAM_COSINE).sum())
        assert r["max_cosine"] == cos[k].max()
        assert r["quarantine"] == (r["n_eval_hits"] > 0)


def test_mmr_rerank_matches_reference_greedy(spark):
    """The distributed MMR must equal an independent numpy replay: pool =
    top-MMR_POOL by exact cosine per query, then the greedy
    0.7·rel − 0.3·maxsim selection with (score DESC, id ASC) ties —
    recomputed here from the raw quantized vectors, not the operator's
    own intermediates. (The exact step-by-step replay IS the semantics
    check — a set-level "more diverse than plain top-k" invariant is not
    a theorem of MMR, which greedily penalizes max-redundancy per step,
    and near-isotropic data falsifies it.)"""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    e = sim._quantized(sim._emb(spark, sf)).select("vec_id", "q").toPandas()
    ids = e["vec_id"].to_numpy(np.int64)
    mat = np.vstack(e["q"].values).astype(np.int64)
    norm = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
    pos = {int(v): i for i, v in enumerate(ids)}

    def cos(a: int, b: int) -> float:
        return float(mat[pos[a]] @ mat[pos[b]]) / (norm[pos[a]] * norm[pos[b]])

    got = sim.mmr_rerank(spark, sf).collect()
    assert got
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    qids = [int(v) for v in ids if v < sim.QUERY_CAP]
    cids = [int(v) for v in ids if v < sim.CORPUS_CAP]
    assert set(by_q) == set(qids)
    for q in qids:
        rel = {d: cos(q, d) for d in cids if d != q}
        pool = sorted(rel, key=lambda d: (-rel[d], d))[: sim.MMR_POOL]
        selected: list[int] = []
        for rank in range(1, sim.TOP_K + 1):
            best, best_score = None, None
            for d in sorted(pool):
                if d in selected:
                    continue
                if not selected:
                    score = rel[d]
                else:
                    score = 0.7 * rel[d] - 0.3 * max(cos(d, s) for s in selected)
                if best is None or score > best_score:
                    best, best_score = d, score
            if best is None:
                break
            selected.append(best)
            r = by_q[q][rank - 1]
            assert (r["rank"], r["neighbor_id"]) == (rank, best), (q, rank)
            assert r["relevance"] == rel[best]
            assert r["mmr_score"] == best_score


def test_pca_adaptive_k_tracks_planted_spectrum(spark):
    """The variance-explained knee must pick K = the number of PLANTED
    strong directions (1, 2, 3) and cap at PCA_ADAPTIVE_KMAX on
    near-isotropic data; the emitted long-format projections must match
    the fixed-K kernel's vectors for the chosen components exactly."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    rng = np.random.default_rng(7)

    def rows_for(strengths, n=500, noise=0.002):
        kk = len(strengths)
        basis = np.linalg.qr(rng.normal(size=(sim.EMB_DIM, kk)))[0].T
        t = rng.normal(size=(n, kk)) * np.array(strengths)
        x = t @ basis + rng.normal(size=(n, sim.EMB_DIM)) * noise
        df = spark.createDataFrame(
            [(int(i), [float(v) for v in x[i]], int(i % 3)) for i in range(n)],
            "vec_id long, embedding array<float>, label int",
        )
        e = sim._emb
        try:
            sim._emb = lambda _s, _d: df
            return df, sim.covariance_stats(spark, "ignored").collect()
        finally:
            sim._emb = e

    # Variance ratios ≥ 0.36 sit well above the knee's 0.125 threshold;
    # the deflation's 2^-8 vr truncation floors the statistic at ~0.05,
    # so adjacent-eigenvalue ratios below ~0.1 variance are inherently
    # unresolvable — the planted gaps here are the supported regime.
    for strengths, want_k in (
        ([0.5], 1),
        ([0.5, 0.3], 2),
        ([0.5, 0.4, 0.3], 3),
    ):
        _df, rows = rows_for(strengths)
        stats: list = []
        sim._pca_topk_ints(rows, sim.PCA_ADAPTIVE_KMAX, stats_out=stats)
        assert sim._adaptive_k(stats) == want_k, (strengths, stats)

    # near-isotropic: every ratio ~1 → the cap
    iso = rng.normal(size=(400, sim.EMB_DIM)) * 0.1
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in iso[i]], 0) for i in range(len(iso))],
        "vec_id long, embedding array<float>, label int",
    )
    e = sim._emb
    try:
        sim._emb = lambda _s, _d: df
        rows = sim.covariance_stats(spark, "ignored").collect()
        stats = []
        vecs, sums, n = sim._pca_topk_ints(
            rows, sim.PCA_ADAPTIVE_KMAX, stats_out=stats
        )
        assert sim._adaptive_k(stats) == sim.PCA_ADAPTIVE_KMAX
        got = sim.pca_adaptive_topk(spark, "ignored").collect()
        stored = np.vstack(df.toPandas()["embedding"].values)  # float32 round-trip
    finally:
        sim._emb = e
    # long format: KMAX rows per vector, projections replay the integer
    # formula n·(v·q) − Σ v_j·sum_j for the SAME deflation vectors
    assert len(got) == len(iso) * sim.PCA_ADAPTIVE_KMAX
    q = sim._round_half_away(stored.astype(np.float64) * sim.QUANT)
    by_vec = {}
    for r in got:
        by_vec.setdefault(r["vec_id"], {})[r["component"]] = r
    for vid, comps in list(by_vec.items())[:50]:
        assert sorted(comps) == list(range(1, sim.PCA_ADAPTIVE_KMAX + 1))
        for c, r in comps.items():
            v = np.array(vecs[c - 1], dtype=object)
            expect = int(n) * int((q[vid].astype(object) * v).sum()) - sum(
                int(v[j]) * int(sums[j]) for j in range(sim.EMB_DIM)
            )
            assert r["proj_num"] == expect


def test_hard_negatives_are_label_mismatched_top_neighbors(spark):
    """sim_hard_negatives replayed from raw parquet: every emitted
    neighbor has a different label from its query, and per query the
    list is exactly the cosine-ordered head of the label-mismatched
    capped corpus (desc cosine, neighbor_id tiebreak)."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    pdf = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    labels = {int(r.vec_id): r.label for r in pdf.itertuples()}
    q = sim._quant_np(pdf["embedding"])
    nrm = np.sqrt((q * q).sum(axis=1).astype(np.float64))
    by_id = {int(i): n for n, i in enumerate(ids)}
    got = sim.hard_negatives(spark, sf).collect()
    assert got
    per_q: dict[int, list] = {}
    for r in got:
        assert r["query_label"] == labels[r["query_id"]]
        assert r["neighbor_label"] == labels[r["neighbor_id"]]
        assert r["query_label"] != r["neighbor_label"]
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        rows.sort(key=lambda r: r["rank"])
        qi = by_id[qid]
        cand = []
        for vid, n in by_id.items():
            if vid == qid or vid >= sim.CORPUS_CAP or labels[vid] == labels[qid]:
                continue
            cos = float(q[qi] @ q[n]) / (nrm[qi] * nrm[n])
            cand.append((-cos, vid))
        cand.sort()
        want = [vid for _c, vid in cand[: sim.TOP_K]]
        assert [r["neighbor_id"] for r in rows] == want, qid


def test_hard_negatives_ann_recall_tracked(spark):
    """The ANN hard-negative driver entry only exposes the recall-floor
    boolean; this pins the raw number against the exact miner and the
    pre-filter invariant (no same-label neighbor ever survives)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import similarity as S

    emb = S._emb(spark, SF_SMALL)
    capped = emb.filter(F.col("vec_id") < S.CORPUS_CAP)
    cmat = S._train_centroids_on_sample(capped)
    assigned = S._assign_lists(spark, capped, cmat)
    ann = S._probe_topk(spark, emb, cmat, assigned, exclude_same_label=True)
    labels = {
        int(r["vec_id"]): r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    rows = ann.collect()
    assert rows
    for r in rows:
        assert labels[r["query_id"]] != labels[r["neighbor_id"]], r
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in S.hard_negatives(spark, SF_SMALL).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(truth & got) / len(truth)
    assert recall >= S.HARD_NEG_RECALL_FLOOR, recall


def test_ivf_probe_sweep_numpy_replay_and_displacement(spark):
    """Independent numpy replay of the probe sweep: recompute per-nprobe
    hits from raw parquet (assignment, probe ranks, truth membership)
    and demand (a) every published floor genuinely holds, (b) hits are
    monotone in nprobe, and (c) the displacement theorem the entry's
    docstring relies on — every true neighbor among the candidates
    survives to the scored ANN top-k — holds instance-by-instance."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    rows = {r["nprobe"]: r for r in sim.ann_ivf_probe_sweep(spark, SF_SMALL).collect()}
    assert set(rows) == set(sim.PROBE_SWEEP)
    assert all(r["recall_floor_met"] for r in rows.values())
    assert all(r["hits_monotone"] for r in rows.values())
    assert [rows[p]["recall_floor"] for p in sim.PROBE_SWEEP] == [
        sim.PROBE_SWEEP_FLOORS[p] for p in sim.PROBE_SWEEP
    ]

    emb = sim._emb(spark, SF_SMALL)
    capped = emb.filter(F.col("vec_id") < sim.CORPUS_CAP)
    cids, cmatv = sim._collect_quantized(capped)
    cmat = sim._memoized_centroids("ivf_recall_cmat", spark, SF_SMALL, capped)

    def cos(a, b):
        an = np.sqrt((a * a).sum(axis=1).astype(np.float64))
        bn = np.sqrt((b * b).sum(axis=1).astype(np.float64))
        return (a @ b.T) / (an[:, None] * bn[None, :])

    assign = {int(v): int(c) for v, c in zip(cids, cos(cmatv, cmat).argmax(axis=1))}
    qids, qmat = sim._collect_quantized(emb.filter(F.col("vec_id") < sim.QUERY_CAP))
    ranks = np.argsort(-cos(qmat, cmat), axis=1, kind="stable")
    # rank of each centroid in each query's probe order (1-based)
    list_rank = {
        int(q): {int(c): r + 1 for r, c in enumerate(ranks[i])}
        for i, q in enumerate(qids)
    }
    truth = brute_force_topk(spark, SF_SMALL).collect()
    n_truth = len(truth)
    vec = {int(v): row for v, row in zip(cids, cmatv)}
    for p in sim.PROBE_SWEEP:
        hits = sum(
            1
            for r in truth
            if list_rank[r.query_id][assign[r.neighbor_id]] <= p
        )
        assert hits / n_truth >= sim.PROBE_SWEEP_FLOORS[p], (p, hits / n_truth)
    # (c) displacement: at each nprobe, every true neighbor among the
    # candidates is inside the exact-cosine top-k of that candidate set
    qvec = {int(q): qmat[i] for i, q in enumerate(qids)}
    by_q: dict[int, set[int]] = {}
    for r in truth:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    for p in sim.PROBE_SWEEP:
        for q, tset in by_q.items():
            cand = [
                v
                for v in vec
                if v != q and list_rank[q][assign[v]] <= p
            ]
            if not cand:
                continue
            cm = np.stack([vec[v] for v in cand])
            cs = cos(qvec[q][None, :], cm)[0]
            order = sorted(zip(-cs, cand))[: sim.TOP_K]
            topk = {v for _, v in order}
            assert (tset & set(cand)) <= topk, (p, q)


def test_query_block_cap_asserts_loudly(spark, tmp_path):
    """VERDICT r13 #5: the driver-side ANN math assumes the collected
    query block is bounded by QUERY_CAP; a corpus with duplicated
    vec_ids would silently collect more — the guard must raise."""
    import pytest
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import similarity as S

    base = S._emb(spark, "/root/testdata/sf0.001").filter(
        F.col("vec_id") < S.QUERY_CAP
    )
    dup = base.unionByName(base)  # every query id twice
    dup.write.parquet(f"{tmp_path}/embeddings.parquet")
    with pytest.raises(RuntimeError, match="QUERY_CAP"):
        S._query_block(spark, str(tmp_path))
    # and the clean fixture path stays under the cap and memoizes
    got = S._query_block(spark, "/root/testdata/sf0.001")
    assert len(got[0]) <= S.QUERY_CAP


def test_lsh_emit_once_candidates_match_distinct(spark):
    """r14 second pass: the emit-once candidate discipline (keep a pair
    at its FIRST agreeing table, no DISTINCT) must produce exactly the
    distinct candidate set of the replaced join+DISTINCT — for both the
    single-probe and the Hamming-1 multiprobe probe fan-outs."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import similarity as sm

    sf = SF_SMALL
    emb = sm._emb(spark, sf)
    n_planes = sm._ann_planes(sm._emb_count(spark, sf))
    corpus = sm._bucketed(emb, n_planes=n_planes, carry_all=True).localCheckpoint()
    qb = sm._bucketed(
        emb.filter(F.col("vec_id") < sm.QUERY_CAP), n_planes=n_planes, carry_all=True
    ).localCheckpoint()

    for max_h in (0, 1):
        if max_h == 0:
            probes = qb.select(
                F.col("vec_id").alias("query_id"),
                "tbl",
                F.col("bucket").alias("qbucket"),
                F.col("all_buckets").alias("q_all_buckets"),
            )
        else:
            probes = qb.select(
                F.col("vec_id").alias("query_id"),
                "tbl",
                F.explode(
                    F.array(
                        F.col("bucket"),
                        *[
                            F.col("bucket").bitwiseXOR(F.lit(1 << p))
                            for p in range(n_planes)
                        ],
                    )
                ).alias("qbucket"),
                F.col("all_buckets").alias("q_all_buckets"),
            )
        cs = corpus.select(
            F.col("vec_id").alias("neighbor_id"), "tbl", "bucket", "all_buckets"
        ).alias("cs")
        qs = probes.alias("qs")
        join_cond = (
            (F.col("cs.tbl") == F.col("qs.tbl"))
            & (F.col("cs.bucket") == F.col("qs.qbucket"))
            & (F.col("qs.query_id") != F.col("cs.neighbor_id"))
        )
        # the replaced shape: emit per agreeing (tbl, probe), DISTINCT after
        want = {
            (r.query_id, r.neighbor_id)
            for r in cs.join(qs, join_cond)
            .select("query_id", "neighbor_id")
            .distinct()
            .collect()
        }
        # the emit-once shape (the production path's filter, verbatim)
        if max_h == 0:
            agree = lambda a, b: a == b  # noqa: E731
        else:
            agree = lambda a, b: F.bit_count(a.bitwiseXOR(b)) <= max_h  # noqa: E731
        earlier = F.exists(
            F.zip_with(
                F.slice(F.col("cs.all_buckets"), 1, F.col("cs.tbl")),
                F.slice(F.col("qs.q_all_buckets"), 1, F.col("cs.tbl")),
                agree,
            ),
            lambda x: x,
        )
        rows = (
            cs.join(qs, join_cond)
            .filter(~earlier)
            .select("query_id", "neighbor_id")
            .collect()
        )
        got = {(r.query_id, r.neighbor_id) for r in rows}
        assert len(rows) == len(got), "emit-once must yield each pair exactly once"
        assert got == want and want
