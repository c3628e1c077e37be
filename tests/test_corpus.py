"""Invariants for the corpus-preparation operators (decontamination,
stratified sampling, token packing) beyond their bit-exact oracles."""

from __future__ import annotations

from near_real_time_data_warehouse_spark.operators import corpus

from .conftest import SF_SMALL
from .fixtures import shard_split_frame


def test_contamination_bounds_and_split(spark):
    df = corpus.benchmark_contamination(spark, SF_SMALL).toPandas()
    assert len(df) > 0
    assert ((df.contamination >= 0) & (df.contamination <= 1)).all()
    assert (df.n_contaminated <= df.n_shingles).all()
    # only TRAIN docs appear (test-split docs are the reference side)
    splits = shard_split_frame(spark, SF_SMALL)
    train_ids = set(splits[splits.split == "train"].doc_id)
    assert set(df.doc_id) <= train_ids


def test_stratified_sample_weights_and_determinism(spark):
    a = corpus.stratified_sample(spark, SF_SMALL).toPandas().sort_values("doc_id")
    b = corpus.stratified_sample(spark, SF_SMALL).toPandas().sort_values("doc_id")
    assert a.doc_id.tolist() == b.doc_id.tolist()  # content-keyed, not random()
    assert len(a) > 0
    assert (a.weight == 1000.0 / a.rate_k).all()
    # every configured language retains at least one doc at this SF
    assert set(a.lang) == set(corpus.SAMPLE_RATES)


def test_token_packing_is_sequential_per_shard(spark):
    df = (
        corpus.token_packing(spark, SF_SMALL)
        .toPandas()
        .sort_values(["shard", "doc_id"])
    )
    assert df.pack_id.max() > 0  # budget actually spills over at test SF
    for _, g in df.groupby("shard"):
        cum_before = g.n_tokens.cumsum().shift(fill_value=0)
        assert (g.pack_id == cum_before // corpus.PACK_BUDGET).all()
        assert g.pack_id.is_monotonic_increasing  # packs are consecutive docs


def test_balanced_shards_bound_token_spread(spark):
    """Striping by size rank keeps per-shard token totals within one
    largest-document of each other; hash sharding does not have that
    bound (and at this SF visibly misses it)."""
    from near_real_time_data_warehouse_spark.operators.corpus import balanced_shards

    m = balanced_shards(spark, SF_SMALL)
    rows = m.collect()
    totals = [r.total_tokens for r in rows]
    largest = max(r.largest_doc_tokens for r in rows)
    assert len(rows) == 16
    assert max(totals) - min(totals) <= largest


def test_cdc_chunks_resynchronize_after_prefix_edit(spark):
    """The defining content-defined-chunking property: a prefix insertion
    shifts every token position, yet chunk fingerprints realign after the
    next boundary — fixed-stride windows never realign. Most of the
    original doc's chunks must reappear verbatim in the edited twin."""
    import hashlib

    from near_real_time_data_warehouse_spark.operators.corpus import cdc_chunks_df

    words = [hashlib.md5(str(i).encode()).hexdigest()[:6] for i in range(240)]
    original = " ".join(words)
    edited = "zzz qqq vvv " + original
    df = spark.createDataFrame(
        [(0, original), (1, edited)], "doc_id long, text string"
    )
    chunks = cdc_chunks_df(df).collect()
    fp = {0: set(), 1: set()}
    for r in chunks:
        fp[r.doc_id].add(r.chunk_fingerprint)
    shared = fp[0] & fp[1]
    # everything after the first post-edit boundary realigns: expect the
    # overwhelming majority of the ~240/8 chunks shared
    assert len(fp[0]) >= 15, len(fp[0])
    assert len(shared) >= len(fp[0]) - 3, (len(shared), len(fp[0]))


def test_semantic_curation_merges_monotonically(spark):
    """The semantic stage only ever MERGES clusters: every pair of docs
    sharing a lexical component still shares a component in the
    semantic-union graph, and the component count never increases."""
    from near_real_time_data_warehouse_spark.operators.curation import (
        curation_pipeline,
        curation_semantic,
    )

    sf = "/root/testdata/sf0.001"
    lex = {r.doc_id: r.component for r in curation_pipeline(spark, sf).collect()}
    sem = {r.doc_id: r.component for r in curation_semantic(spark, sf).collect()}
    assert set(lex) == set(sem)
    # monotone: lexical same-component implies semantic same-component
    from collections import defaultdict

    lex_groups = defaultdict(list)
    for d, c in lex.items():
        lex_groups[c].append(d)
    for docs in lex_groups.values():
        assert len({sem[d] for d in docs}) == 1
    assert len(set(sem.values())) <= len(set(lex.values()))


def test_token_packing_bpe_sequential_and_consistent_with_tokenizer(spark):
    """BPE-piece packing: the same sequential-per-shard pack property as
    whitespace packing, measured in trained-tokenizer pieces, and the
    per-doc piece counts agree with text_bpe_encode exactly."""
    df = (
        corpus.token_packing_bpe(spark, SF_SMALL)
        .toPandas()
        .sort_values(["shard", "doc_id"])
    )
    assert df.pack_id.max() > 0  # budget actually spills over at test SF
    for _, g in df.groupby("shard"):
        cum_before = g.n_bpe_pieces.cumsum().shift(fill_value=0)
        assert (g.pack_id == cum_before // corpus.BPE_PACK_BUDGET).all()
        assert g.pack_id.is_monotonic_increasing
    from near_real_time_data_warehouse_spark.operators.text import bpe_encode

    enc = bpe_encode(spark, SF_SMALL).toPandas().set_index("doc_id").sort_index()
    got = df.set_index("doc_id").sort_index()
    assert (got.n_bpe_pieces == enc.n_bpe_pieces).all()


def test_chunk_bpe_budget_partitions_docs_within_budget(spark):
    """Every chunk holds ≤ CHUNK_BPE_BUDGET + (longest word's pieces − 1)
    trained-BPE pieces (the straddling word stays in the chunk it started
    in), every non-final chunk reaches the budget, chunk ids are
    consecutive from 0, token ranges tile the document without gaps or
    overlap, and per-doc piece totals equal the tokenizer's."""
    from near_real_time_data_warehouse_spark.operators.text import _bpe_train

    sym, _ = _bpe_train(spark, SF_SMALL)
    max_word_pieces = (
        sym.groupBy("tok").count().agg({"count": "max"}).first()[0]
    )
    df = (
        corpus.chunk_bpe_budget(spark, SF_SMALL)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    assert (df.n_pieces <= corpus.CHUNK_BPE_BUDGET + max_word_pieces - 1).all()
    # every non-final chunk crossed the budget boundary (chunks fill up)
    nonfinal = df[df.chunk_id < df.groupby("doc_id").chunk_id.transform("max")]
    assert (nonfinal.n_pieces >= corpus.CHUNK_BPE_BUDGET - max_word_pieces + 1).all()
    assert df.chunk_id.max() > 0  # multi-chunk docs occur at test SF
    for _, g in df.groupby("doc_id"):
        assert g.chunk_id.tolist() == list(range(len(g)))
        # consecutive word ranges: next chunk starts where previous ended
        assert (g.tok_start.iloc[1:].values == g.tok_end.iloc[:-1].values + 1).all()
        assert (g.n_words == g.tok_end - g.tok_start + 1).all()
    from near_real_time_data_warehouse_spark.operators.text import bpe_encode

    enc = bpe_encode(spark, SF_SMALL).toPandas().set_index("doc_id").sort_index()
    per_doc = df.groupby("doc_id").n_pieces.sum()
    assert (per_doc == enc.n_bpe_pieces[per_doc.index]).all()


def _greedy_waterfill(counts: dict[str, int], num: int, den: int) -> dict[str, int]:
    """Sequential reference for mixture_waterfill: ascending-count greedy,
    integer floor division at every step."""
    total = sum(counts.values())
    budget = (total * num) // den
    alloc: dict[str, int] = {}
    remaining = budget
    langs = sorted(counts, key=lambda l: (counts[l], l))
    left = len(langs)
    capped_share = None
    for lang in langs:
        fair = remaining // left
        if capped_share is None and counts[lang] <= fair:
            alloc[lang] = counts[lang]
        else:
            # once one language exceeds its fair share, every remaining
            # language is capped at the waterline fixed at that moment
            if capped_share is None:
                capped_share = fair
            alloc[lang] = min(counts[lang], capped_share)
        remaining -= alloc[lang]
        left -= 1
    return alloc


def test_mixture_waterfill_matches_greedy_reference(spark):
    """The closed-form window waterfill equals the sequential greedy on a
    histogram exercising both branches (small langs fit, large capped)."""
    counts = {"aa": 5, "bb": 10, "cc": 100, "dd": 1000, "ee": 1000}
    hist = spark.createDataFrame(
        [(l, c) for l, c in counts.items()], "lang string, c long"
    )
    got = {
        r["lang"]: r["alloc"]
        for r in corpus.mixture_waterfill(hist).collect()
    }
    want = _greedy_waterfill(counts, corpus.MIX_BUDGET_NUM, corpus.MIX_BUDGET_DEN)
    assert got == want
    # budget respected, small languages taken whole
    total = sum(counts.values())
    assert sum(got.values()) <= (total * corpus.MIX_BUDGET_NUM) // corpus.MIX_BUDGET_DEN
    assert got["aa"] == 5 and got["bb"] == 10 and got["cc"] == 100
    assert got["dd"] == got["ee"]  # capped languages share the waterline


def test_mixture_waterfill_all_fit(spark):
    """Budget ≥ corpus: every language is fully allocated (k = n path —
    the capped-branch divisor guard must not fire or divide by zero)."""
    counts = {"aa": 3, "bb": 4}
    hist = spark.createDataFrame(
        [(l, c) for l, c in counts.items()], "lang string, c long"
    )
    import near_real_time_data_warehouse_spark.operators.corpus as c_mod
    orig = (c_mod.MIX_BUDGET_NUM, c_mod.MIX_BUDGET_DEN)
    # budget NUM/DEN applies inside the plan via literals captured at
    # call time, so patch then rebuild
    try:
        c_mod.MIX_BUDGET_NUM, c_mod.MIX_BUDGET_DEN = 2, 1
        got = {
            r["lang"]: r["alloc"]
            for r in c_mod.mixture_waterfill(hist).collect()
        }
    finally:
        c_mod.MIX_BUDGET_NUM, c_mod.MIX_BUDGET_DEN = orig
    assert got == counts


def test_mixture_unimax_rates_and_weights(spark):
    df = corpus.mixture_unimax(spark, SF_SMALL).toPandas()
    assert len(df) > 0
    assert (df.rate_k >= 1).all() and (df.rate_k <= 1000).all()
    assert (df.weight == 1000.0 / df.rate_k).all()
    # determinism: content-keyed, not random()
    again = corpus.mixture_unimax(spark, SF_SMALL).toPandas()
    assert sorted(df.doc_id) == sorted(again.doc_id)
    # rates derive from the histogram: smaller languages sample at a
    # rate ≥ the largest language's (UniMax pushes toward uniform)
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").toPandas()
    by_count = docs.lang.value_counts()
    rate_by_lang = df.groupby("lang").rate_k.first()
    biggest = by_count.index[0]
    assert (rate_by_lang.drop(biggest) >= rate_by_lang[biggest]).all()


def test_perplexity_buckets_exact_terciles(spark):
    """Recompute the tie-respecting tercile rule in pandas from the
    emitted scores and demand identical bucket assignment per language.
    (With heavy ties t1 can equal t2 and 'middle' legitimately empties
    for a language — the reference reproduces that too.)"""
    df = corpus.perplexity_buckets(spark, SF_SMALL).toPandas()
    assert {"head", "tail"} <= set(df.ppl_bucket)
    for lang, g in df.groupby("lang"):
        n = len(g)
        counts = g.score_milli.value_counts().sort_index()
        cum = counts.cumsum()
        t1 = cum[3 * cum >= n].index[0]
        t2 = cum[3 * cum >= 2 * n].index[0]
        want = g.score_milli.map(
            lambda s: "head" if s <= t1 else ("middle" if s <= t2 else "tail")
        )
        assert (g.ppl_bucket == want).all(), lang
        # equi-depth up to ties: head reaches ceil(n/3), and removing
        # the tied boundary score drops it back under n/3 (t1 minimal)
        assert 3 * (g.score_milli <= t1).sum() >= n
        assert 3 * (g.score_milli < t1).sum() < n


def test_duplicated_ngram_fraction_bounds_and_exact_dups(spark):
    """Bounds hold; every member of an exact-duplicate pair (same
    normalized text, different doc_id) must score dup_fraction 1.0 —
    all of its shingles occur in its twin."""
    df = corpus.duplicated_ngram_fraction(spark, SF_SMALL).toPandas()
    assert len(df) > 0
    assert (df.n_duplicated <= df.n_shingles).all()
    assert ((df.dup_fraction >= 0) & (df.dup_fraction <= 1)).all()
    assert (df.is_dup_heavy == (df.dup_fraction >= corpus.DUP_NGRAM_FLAG_FRACTION)).all()
    # cross-operator invariant: for a verified near-dup pair with
    # Jaccard J, each member's duplicated fraction is >= J (the shared
    # shingles |A∩B| are duplicated for both, and |A∩B|/|A| >= J)
    from near_real_time_data_warehouse_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(spark, SF_SMALL).toPandas()
    assert len(pairs) > 0
    scored = df.set_index("doc_id")
    for r in pairs.itertuples():
        for d in (r.doc_a, r.doc_b):
            if d in scored.index:  # pairs entry may be capped to an id range
                assert scored.loc[d].dup_fraction >= JACCARD_THRESHOLD


def test_mixture_temperature_upweights_tails(spark):
    """T=2 mixing: the kept sample's per-language rates must be
    monotonically NON-INCREASING in language size (sqrt scaling flattens
    the head), every rate obeys share*budget/count, and weights invert
    the rates exactly."""
    from near_real_time_data_warehouse_spark.operators.corpus import (
        MIX_BUDGET_DEN,
        MIX_BUDGET_NUM,
        mixture_temperature,
    )
    import math

    rows = mixture_temperature(spark, "/root/testdata/sf0.001").collect()
    assert rows
    rates = {}
    for r in rows:
        rates[r["lang"]] = r["rate_k"]
        assert r["weight"] == 1000.0 / r["rate_k"]
    # recompute expected rates from the documents table
    import duckdb

    con = duckdb.connect()
    hist = dict(
        con.execute(
            "SELECT lang, COUNT(*) FROM read_parquet('/root/testdata/sf0.001/documents.parquet') GROUP BY lang"
        ).fetchall()
    )
    ssum = sum(math.isqrt(c) for c in hist.values())
    total = sum(hist.values())
    b = total * MIX_BUDGET_NUM // MIX_BUDGET_DEN
    for lang, c in hist.items():
        expect = min(1000, (1000 * math.isqrt(c) // ssum) * b // c)
        if expect >= 1:
            assert rates[lang] == expect
        else:
            assert lang not in rates
    # tail up-weighting: rates follow ~1/sqrt(c), so clearly-separated
    # sizes (4x apart -> true rates 2x apart, far beyond the two integer
    # floors' error) must order correctly. Adjacent sizes may flip by
    # the isqrt floor (isqrt(99)/99 < isqrt(100)/100) - by design.
    by_size = sorted(hist.items(), key=lambda kv: kv[1])
    kept = [(c, rates[lang]) for lang, c in by_size if lang in rates]
    for c1, r1 in kept:
        for c2, r2 in kept:
            if c2 >= 4 * c1 and r1 < 1000:
                assert r1 > r2


def test_weighted_sample_selection_law_and_ht_estimator(spark):
    """The sample must be EXACTLY the docs whose 28-bit md5 uniform
    clears the length-proportional threshold (replayed in Python), the
    HT weight must be the exact reciprocal inclusion probability, and
    the HT estimator of total chars (Σ w·n_chars over the sample) must
    land near the true total — the unbiasedness this sampling exists
    for (tolerance covers one corpus draw's variance)."""
    import hashlib

    from near_real_time_data_warehouse_spark.operators import corpus as C
    from near_real_time_data_warehouse_spark.operators.text import _docs

    sf = "/root/testdata/sf0.01"
    rows = {r["doc_id"]: r for r in C.weighted_sample(spark, sf).collect()}
    docs = _docs(spark, sf).select("doc_id", "n_chars").collect()
    tot = sum(r["n_chars"] for r in docs)
    expected = {}
    for r in docs:
        u = int(hashlib.md5(f"wsamp:{r['doc_id']}".encode()).hexdigest()[:7], 16)
        if u * tot < C.WSAMP_K * r["n_chars"] * (1 << C.WSAMP_BITS):
            expected[r["doc_id"]] = r["n_chars"]
    assert set(rows) == set(expected)
    est = 0.0
    for did, r in rows.items():
        w = r["ht_weight"]
        if C.WSAMP_K * r["n_chars"] >= tot:
            assert w == 1.0
        else:
            assert w == tot / (C.WSAMP_K * r["n_chars"])
        est += w * r["n_chars"]
    assert abs(est - tot) / tot < 0.35, (est, tot)


def _fuzzy_norm(text):
    import re

    return re.sub(r"\s+", " ", text.lower()).strip()


def _fuzzy_bucket(text):
    import hashlib

    return int(hashlib.md5(_fuzzy_norm(text).encode()).hexdigest()[:15], 16) % 10


def _fuzzy_shingles(text):
    t = _fuzzy_norm(text).split(" ")
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)} if len(t) >= 3 else set()


def _fuzzy_bands(text):
    """Python replay of the dedup minhash/band kernel (same constants)."""
    import hashlib

    from near_real_time_data_warehouse_spark.operators.dedup import (
        MERSENNE_P,
        N_BANDS,
        ROWS_PER_BAND,
        _perm_constants,
    )

    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MERSENNE_P
        for s in _fuzzy_shingles(text)
    ]
    sig = [min((h * a + b) % MERSENNE_P for h in hs) for a, b in _perm_constants()]
    return {
        (
            t,
            hashlib.md5(
                ",".join(str(sig[t * ROWS_PER_BAND + j]) for j in range(ROWS_PER_BAND)).encode()
            ).hexdigest(),
        )
        for t in range(N_BANDS)
    }


def _mine_text(base_words, want_bucket, collide_with=None, salt=""):
    """Deterministically mine a suffix word landing the text in the wanted
    split bucket (and, if given, band-colliding with another text)."""
    for i in range(10_000):
        text = " ".join(base_words + [f"{salt}suffix{i}"])
        if _fuzzy_bucket(text) not in want_bucket:
            continue
        if collide_with is not None and not (_fuzzy_bands(text) & _fuzzy_bands(collide_with)):
            continue
        return text
    raise AssertionError("mining failed")


def test_fuzzy_contamination_planted_cross_split_neardup(spark, tmp_path_factory):
    """Planted corpus: a train doc mined to be a near-duplicate (and an
    actual LSH band collision) of a test-split doc must be flagged with
    the exactly-computable Jaccard; a same-split (train/train) near-dup
    pair and an unrelated doc must not appear. The entry's DuckDB oracle
    must agree on the same planted corpus."""
    import duckdb

    from near_real_time_data_warehouse_spark.operators import corpus as C

    base = [f"w{i}" for i in range(40)]
    other = [f"z{i}" for i in range(40)]
    eval_doc = _mine_text(base, {9})
    train_hit = _mine_text(base, set(range(8)), collide_with=eval_doc)
    train_a = _mine_text(other, set(range(8)), salt="a")
    train_b = _mine_text(other, set(range(8)), collide_with=train_a, salt="b")
    lonely = _mine_text([f"q{i}" for i in range(40)], set(range(8)), salt="c")
    rows = [(1, train_hit), (2, train_a), (3, train_b), (4, lonely), (9, eval_doc)]

    sf_dir = str(tmp_path_factory.mktemp("fuzzy_contam"))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        f"{sf_dir}/documents.parquet"
    )

    got = {r["doc_id"]: r for r in C.fuzzy_contamination(spark, sf_dir).collect()}
    sa, sb = _fuzzy_shingles(train_hit), _fuzzy_shingles(eval_doc)
    want_j = len(sa & sb) / len(sa | sb)
    assert want_j >= 0.2
    assert set(got) == {1}
    assert got[1]["n_eval_neardups"] == 1
    assert got[1]["worst_eval_doc"] == 9
    assert got[1]["max_jaccard"] == want_j

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(C._fuzzy_contamination_sql()).fetchall()
    assert [(r[0], r[1], r[2], r[3]) for r in oracle] == [(1, 1, want_j, 9)]
