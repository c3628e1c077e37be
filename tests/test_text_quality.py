"""Language-ID classifier quality on a real multilingual fixture.

(The driver's synthetic corpus assigns `lang` labels randomly over
English-ish word soup, so label agreement there is meaningless; the
differential oracle covers determinism, this covers classification.)"""

from __future__ import annotations

from near_real_time_data_warehouse_spark.operators.text import lang_id_df

SENTENCES = [
    ("en", "the cat was sitting with the dog and the bird of the house"),
    ("en", "this is the report of the year and it was written with care"),
    ("de", "der hund und die katze sind nicht ein problem in der stadt"),
    ("de", "das ist nicht der beste tag und die sonne ist nicht da"),
    ("es", "el perro y los gatos son una parte que es muy importante"),
    ("es", "las casas y el parque son una zona que es muy tranquila"),
    ("fr", "le chien et les chats sont dans une maison pour le moment"),
    ("fr", "les rues et le marche sont dans une ville pour les gens"),
    ("zh", "这是一个关于数据仓库的报告"),
    ("zh", "流处理和批处理在一个引擎中"),
]


def test_lang_id_classifies_real_text(spark):
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(SENTENCES)],
        "doc_id long, lang string, text string",
    )
    rows = lang_id_df(df).collect()
    wrong = [(r.labeled_lang, r.predicted_lang) for r in rows
             if r.predicted_lang != r.labeled_lang]
    assert not wrong, wrong


def test_pii_redaction_on_organic_text(spark):
    """The PII kernel on realistic prose (the driver entry exercises it
    via deterministic injection; this pins behavior on organic text):
    every pattern family is found and redacted, clean text is untouched."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.text import pii_redact_df

    docs = [
        (0, "reach me at jane.doe+spam@mail-host.org for details"),
        (1, "call 555-0199 or 555-0200 before noon"),
        (2, "server at 192.168.1.17 timed out, fallback 10.0.0.1"),
        (3, "no sensitive content in this row at all"),
        (4, "mixed: bob@x.io, 555-1234, 8.8.8.8 in one line"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in pii_redact_df(df, F.col("text")).collect()}
    assert (rows[0].n_emails, rows[0].n_phones, rows[0].n_ips) == (1, 0, 0)
    assert "[EMAIL]" in rows[0].redacted_text and "@" not in rows[0].redacted_text
    assert rows[1].n_phones == 2 and rows[1].redacted_text.count("[PHONE]") == 2
    assert rows[2].n_ips == 2 and "192.168" not in rows[2].redacted_text
    assert not rows[3].has_pii and rows[3].redacted_text == docs[3][1]
    assert (rows[4].n_emails, rows[4].n_phones, rows[4].n_ips) == (1, 1, 1)


def test_bigram_surprisal_hand_computed(spark):
    """Pin the stupid-backoff bigram semantics on a hand-computed corpus.

    N=9 tokens, c1(a)=c1(b)=c1(c)=3, bigram counts (a,b)=3 (the only one
    reaching BIGRAM_MIN_COUNT), cctx(a)=3/(b)=2/(c)=1; bits(9)=4,
    bits(3)=bits(2)=2, bits(1)=1."""
    from near_real_time_data_warehouse_spark.operators.text import bigram_surprisal_df

    docs = [(0, "a b a b"), (1, "a b c"), (2, "c c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in bigram_surprisal_df(df).collect()}
    # doc0: initial a=2, (a,b)=0, (b,a) hapax -> 1+2=3, (a,b)=0
    assert (rows[0].n_tokens, rows[0].n_backoff_tokens, rows[0].total_surprisal_bits) == (4, 1, 5)
    assert rows[0].mean_surprisal_bits == 5 / 4
    # doc1: initial a=2, (a,b)=0, (b,c) hapax -> 3
    assert (rows[1].n_tokens, rows[1].n_backoff_tokens, rows[1].total_surprisal_bits) == (3, 1, 5)
    # doc2: initial c=2, (c,c) hapax -> 3
    assert (rows[2].n_tokens, rows[2].n_backoff_tokens, rows[2].total_surprisal_bits) == (2, 1, 5)


def test_bigram_surprisal_nonvacuous_on_testdata(spark):
    """The backoff path actually fires on the synthetic corpus (the
    differential oracle would be vacuously green if every bigram were
    frequent or every token doc-initial)."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.text import bigram_surprisal

    agg = bigram_surprisal(spark, "/root/testdata/sf0.001").agg(
        F.sum("n_backoff_tokens").alias("backoffs"),
        F.sum(
            (F.col("n_backoff_tokens") > F.col("n_tokens") - 1).cast("int")
        ).alias("invariant_violations"),
    ).collect()[0]
    assert agg.backoffs > 0
    assert agg.invariant_violations == 0


def test_bpe_greedy_merge_hand_case(spark):
    """The greedy non-overlapping merge on a planted vocabulary:
    'aaaa'x1 with best pair (a,a) must become [aa, aa] (positions 1&3
    merge, never the overlapping 2&3), and 'aaa' becomes [aa, a]."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import text as T

    vocab = spark.createDataFrame(
        [("aaaa", 10), ("aaa", 1), ("ab", 1)], "tok string, freq long"
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("tok")),
        lambda i: F.col("tok").substr(i, F.lit(1)),
    )
    sym = vocab.select(
        "tok", "freq", F.posexplode(chars).alias("pos0", "sym")
    ).select("tok", "freq", (F.col("pos0") + 1).alias("pos"), "sym")
    merged, left, right, cnt = T._bpe_merge_round(sym)
    assert (left, right) == ("a", "a")
    # counts are overlap-counted and freq-weighted: aaaa→3·10, aaa→2·1
    assert cnt == 32
    got = {
        tok: [r.sym for r in rows]
        for tok, rows in (
            (t, sorted(g, key=lambda r: r.pos))
            for t, g in __import__("itertools").groupby(
                sorted(merged.collect(), key=lambda r: (r.tok, r.pos)),
                key=lambda r: r.tok,
            )
        )
    }
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
    assert got["ab"] == ["a", "b"]


def test_bpe_merges_rounds_consistent(spark):
    """Each round's merge shrinks the corpus symbol count by at most its
    occurrence count and the rounds are strictly ordered."""
    from near_real_time_data_warehouse_spark.operators.text import bpe_merges

    from near_real_time_data_warehouse_spark.operators.text import BPE_MERGE_ROUNDS

    rows = sorted(
        bpe_merges(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == list(range(1, BPE_MERGE_ROUNDS + 1))
    for r in rows:
        assert r.n_occurrences > 0
        assert len(r.left_sym) >= 1 and len(r.right_sym) >= 1
    # symbol counts decrease monotonically round over round
    for a, b in zip(rows, rows[1:]):
        assert a.n_corpus_symbols_after > b.n_corpus_symbols_after


def test_bpe_encode_consistent_with_training(spark):
    """Train→apply consistency: the training log's corpus symbol count
    after the LAST merge must equal the SUM of per-document encoded
    piece counts (both count the same final symbol stream, one from the
    vocabulary side, one from the document side); every word encodes to
    at least one piece and at most its character count."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators.text import (
        bpe_encode,
        bpe_merges,
    )

    sf = "/root/testdata/sf0.001"
    last = max(bpe_merges(spark, sf).collect(), key=lambda r: r.round)
    enc = bpe_encode(spark, sf)
    total_pieces = enc.agg(F.sum("n_bpe_pieces")).first()[0]
    assert total_pieces == last.n_corpus_symbols_after
    bad = enc.filter(
        (F.col("n_words") > 0)
        & ((F.col("n_bpe_pieces") < F.col("n_words")) | (F.col("pieces_per_word") < 1.0))
    ).count()
    assert bad == 0


def _greedy_bpe_reference(word, merges):
    """Sequential greedy reference: apply each trained merge rule in rank
    order, left-to-right non-overlapping — the canonical BPE apply for a
    single word (a rule's symbols only come from strictly earlier rules,
    so rank order equals lowest-rank-first)."""
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_unseen_pieces_one_pass_matches_window_ladder(spark):
    """r13 opt: _unseen_pieces replays merge ranks in ONE Arrow pass; pin
    it against BOTH the window-op ladder it replaced and the sequential
    greedy reference, on words that exercise overlap runs (left == right),
    chained rules (later rules consuming earlier fusions), palindromes,
    and single-char words."""
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import text as T

    merges = [("a", "a"), ("aa", "aa"), ("b", "c"), ("aaaa", "bc"), ("d", "d")]
    words = [
        "aaaa", "aaaaa", "aaaaaaaa", "abc", "aabc", "aaaabc", "bcbc",
        "dddd", "ddddd", "x", "ab", "ba", "abcabc", "aaaabcaaaa",
    ]
    unseen = spark.createDataFrame([(w,) for w in words], "tok string")

    got = {
        r["tok"]: r["n_pieces"]
        for r in T._unseen_pieces(unseen, merges).collect()
    }

    # window-op ladder (the replaced formulation), verbatim
    chars = F.transform(
        F.sequence(F.lit(1), F.length("tok")),
        lambda i: F.col("tok").substr(i, F.lit(1)),
    )
    usym = (
        unseen.select(
            "tok",
            F.lit(1).cast("long").alias("freq"),
            F.posexplode(chars).alias("pos0", "sym"),
        )
        .select("tok", "freq", (F.col("pos0") + 1).alias("pos"), "sym")
    )
    for left, right in merges:
        usym = T._bpe_apply_merge(usym, left, right)
    ladder = {
        r["tok"]: r["n_pieces"]
        for r in usym.groupBy("tok").agg(F.count(F.lit(1)).alias("n_pieces")).collect()
    }

    for w in words:
        assert got[w] == len(_greedy_bpe_reference(w, merges)), w
        assert got[w] == ladder[w], w


def _write_holdout_corpus(spark, tmp_path_factory):
    """A corpus whose content-keyed holdout split REALLY contains words
    the train split never saw: common words shared everywhere + one
    unique rare word per document."""
    base = tmp_path_factory.mktemp("bpe_holdout")
    common = "the quick brown fox jumps over lazy dog banana apple".split()
    docs = []
    for i in range(80):
        rare = f"zq{i}warblefluxx"
        words = common * 2 + [rare, rare]
        docs.append((i, " ".join(words[(i % 7):] + words[: (i % 7)])))
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{base}/documents.parquet")
    return str(base)


def test_bpe_holdout_unseen_word_pieces_match_greedy_reference(
    spark, tmp_path_factory
):
    """VERDICT r5 #2 'done' bar: an unseen word's pieces under the
    distributed rank-replay kernel equal the sequential greedy
    reference, and the full entry matches its DuckDB oracle on a corpus
    where the holdout split genuinely contains unseen words."""
    import duckdb
    from pyspark.sql import functions as F

    from near_real_time_data_warehouse_spark.operators import registry, text as T

    sf_dir = _write_holdout_corpus(spark, tmp_path_factory)

    sym, rows = T._bpe_train(spark, sf_dir, scope="train")
    merges = [(r[1], r[2]) for r in rows]
    seen = {r.tok for r in sym.select("tok").distinct().collect()}

    hold = (
        T._docs(spark, sf_dir)
        .filter(T._split_bucket_col() >= 8)
        .select(F.explode(F.split(T._norm_col(), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    hold_words = {r.tok for r in hold.distinct().collect()}
    unseen_words = sorted(hold_words - seen)
    assert unseen_words, "crafted corpus must yield truly unseen holdout words"

    # the distributed kernel's piece sequences for the unseen words
    chars = F.transform(
        F.sequence(F.lit(1), F.length("tok")),
        lambda i: F.col("tok").substr(i, F.lit(1)),
    )
    usym = (
        spark.createDataFrame([(w,) for w in unseen_words], "tok string")
        .select("tok", F.lit(1).cast("long").alias("freq"), F.posexplode(chars).alias("pos0", "sym"))
        .select("tok", "freq", (F.col("pos0") + 1).alias("pos"), "sym")
    )
    for left, right in merges:
        usym = T._bpe_apply_merge(usym, left, right)
    got = {}
    for r in sorted(usym.collect(), key=lambda r: (r.tok, r.pos)):
        got.setdefault(r.tok, []).append(r.sym)
    for w in unseen_words:
        assert got[w] == _greedy_bpe_reference(w, merges), w

    # full-entry differential vs the DuckDB oracle on the same corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    from near_real_time_data_warehouse_spark.oracle_harness import compare

    sdf = T.bpe_encode_holdout(spark, sf_dir)
    assert sdf.agg(F.sum("n_unseen_words")).first()[0] > 0
    res = compare(
        "text_bpe_encode_holdout",
        sdf,
        con,
        registry.oracle_sql()["text_bpe_encode_holdout"],
    )
    assert res.ok, res


def test_nb_confusion_covers_every_holdout_doc_once(spark):
    """NB train/apply/eval: confusion-matrix mass equals the holdout doc
    count (every doc predicted exactly once), actual labels partition the
    holdout, and the matrix is deterministic across reruns."""
    import duckdb

    from near_real_time_data_warehouse_spark.operators.text import nb_lang_confusion

    sf = "/root/testdata/sf0.001"
    rows = {(r["actual"], r["predicted"]): r["n_docs"]
            for r in nb_lang_confusion(spark, sf).collect()}
    con = duckdb.connect()
    holdout = dict(con.execute(f"""
        SELECT lang, COUNT(*) FROM read_parquet('{sf}/documents.parquet')
        WHERE CAST(('0x' || substr(md5(trim(regexp_replace(lower(text),'\\s+',' '))),1,15)) AS BIGINT) % 10 >= 8
          AND len(list_filter(string_split(trim(regexp_replace(lower(text),'\\s+',' ')),' '), t -> t <> '')) > 0
        GROUP BY lang""").fetchall())
    assert sum(rows.values()) == sum(holdout.values())
    per_actual = {}
    for (a, _p), n in rows.items():
        per_actual[a] = per_actual.get(a, 0) + n
    assert per_actual == holdout
    again = {(r["actual"], r["predicted"]): r["n_docs"]
             for r in nb_lang_confusion(spark, sf).collect()}
    assert again == rows


def test_zipf_profile_bins_partition_ranks(spark):
    """Bin k must hold exactly the ranks [2^(k-1), 2^k): type counts per
    bin sum to the vocabulary size, bin populations match the dyadic
    widths (full bins hold 2^(k-1) types), and counts are non-increasing
    across bins (max of bin k+1 ≤ min of bin k — rank order)."""
    from near_real_time_data_warehouse_spark.operators import text as T

    rows = sorted(
        T.zipf_profile(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["bin"],
    )
    assert rows and rows[0]["bin"] == 1
    vocab = sum(r["n_types"] for r in rows)
    for i, r in enumerate(rows):
        width = 1 << (r["bin"] - 1)
        if i < len(rows) - 1:
            assert r["n_types"] == width  # full dyadic bin
        else:
            assert 1 <= r["n_types"] <= width  # tail bin may be partial
        if i:
            assert r["max_count"] <= rows[i - 1]["min_count"]
    total = sum(r["total_occurrences"] for r in rows)
    assert total > 0 and vocab >= len(rows)


def test_bm25_integer_formula_tracks_float_bm25(spark):
    """The scaled-integer BM25 must be a faithful quantization: a pure-
    Python replay of the integer spec over the sf0.001 postings must
    reproduce every returned score_scaled exactly, and each per-term
    integer score must sit within 2 ulp-of-scale of the float BM25 it
    quantizes (same idf_bits, avgdl floored)."""
    import collections
    import re

    import duckdb

    from near_real_time_data_warehouse_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    got = T.bm25_search_topk(spark, sf).collect()
    assert got and all(r["rank"] <= T.SEARCH_TOP_K for r in got)

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    tf: dict[tuple[int, str], int] = collections.Counter()
    dl: dict[int, int] = collections.Counter()
    for doc_id, text in docs:
        toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
        for t in toks:
            tf[(doc_id, t)] += 1
        dl[doc_id] += len(toks)
    df: dict[str, int] = collections.Counter()
    for (_d, t), _n in tf.items():
        df[t] += 1
    n_docs = len(docs)
    t_total = sum(dl.values())
    avgdl = t_total // n_docs
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    band = ranked[T.SEARCH_SKIP_TOP:T.SEARCH_SKIP_TOP
                  + T.SEARCH_N_QUERIES * T.SEARCH_TERMS_PER_QUERY]
    queries: dict[int, list[str]] = {}
    for idx, (term, _dfv) in enumerate(band):
        queries.setdefault(idx % T.SEARCH_N_QUERIES, []).append(term)

    def ts_int(term: str, d: int) -> int:
        f = tf.get((d, term), 0)
        if not f:
            return 0
        idf = n_docs.bit_length() - df[term].bit_length()
        return (idf * 22 * f * avgdl * T.BM25_SCALE) // (
            10 * avgdl * f + 3 * avgdl + 9 * dl[d]
        )

    def ts_float(term: str, d: int) -> float:
        f = tf.get((d, term), 0)
        if not f:
            return 0.0
        idf = n_docs.bit_length() - df[term].bit_length()
        return idf * (2.2 * f) / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))

    for r in got:
        expect = sum(ts_int(t, r["doc_id"]) for t in queries[r["query_id"]])
        assert r["score_scaled"] == expect, (r, expect)
        assert r["score"] == expect / T.BM25_SCALE
        flt = sum(ts_float(t, r["doc_id"]) for t in queries[r["query_id"]])
        assert abs(r["score"] - flt) <= 3 * T.SEARCH_TERMS_PER_QUERY / (1 << 10), (
            r["score"], flt,
        )


def test_bm25_incremental_scores_only_batch_docs_with_standing_stats(spark):
    """The ingestion router must (a) return only batch docs
    (doc_id % BM25_BATCH_MOD == 0), (b) use STANDING statistics — its
    query workload equals the rank-11..34 band of the standing df
    ranking, disjoint from any batch-only vocabulary effects, and (c)
    reproduce the integer formula on a Python replay restricted to the
    standing split."""
    import collections
    import re

    import duckdb

    from near_real_time_data_warehouse_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    got = T.bm25_incremental(spark, sf).collect()
    assert got
    assert all(r["doc_id"] % T.BM25_BATCH_MOD == 0 for r in got)

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    tf = collections.Counter()
    dl = collections.Counter()
    st_df = collections.Counter()
    st_docs = st_tokens = 0
    for doc_id, text in docs:
        toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
        if doc_id % T.BM25_BATCH_MOD == 0:
            for t in toks:
                tf[(doc_id, t)] += 1
            dl[doc_id] += len(toks)
        else:
            st_docs += 1
            st_tokens += len(toks)
            for t in set(toks):
                st_df[t] += 1
    avgdl = st_tokens // st_docs
    band = sorted(st_df.items(), key=lambda kv: (-kv[1], kv[0]))[
        T.SEARCH_SKIP_TOP:T.SEARCH_SKIP_TOP
        + T.SEARCH_N_QUERIES * T.SEARCH_TERMS_PER_QUERY
    ]
    queries: dict[int, list[str]] = {}
    for idx, (term, _d) in enumerate(band):
        queries.setdefault(idx % T.SEARCH_N_QUERIES, []).append(term)
    for r in got:
        expect = 0
        for t in queries[r["query_id"]]:
            f = tf.get((r["doc_id"], t), 0)
            if not f:
                continue
            idf = st_docs.bit_length() - st_df[t].bit_length()
            expect += (idf * 22 * f * avgdl * T.BM25_SCALE) // (
                10 * avgdl * f + 3 * avgdl + 9 * dl[r["doc_id"]]
            )
        assert r["score_scaled"] == expect, (r, expect)


def test_hybrid_rrf_fuses_both_rankers(spark):
    """RRF must equal the closed-form fusion of the two rankers' top-k
    lists: every output score is 1/(K+bm25_rank) + 1/(K+kw_rank) with a
    missing rank contributing zero, ranks come from the actual ranker
    outputs, and a doc in both lists outranks its single-list score."""
    from near_real_time_data_warehouse_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    b = {(r["query_id"], r["doc_id"]): r["rank"]
         for r in T.bm25_search_topk(spark, sf).collect()}
    k = {(r["query_id"], r["doc_id"]): r["rank"]
         for r in T.keyword_search_topk(spark, sf).collect()}
    got = T.hybrid_rrf_topk(spark, sf).collect()
    assert got
    for r in got:
        key = (r["query_id"], r["doc_id"])
        eb, ek = b.get(key), k.get(key)
        assert r["bm25_rank"] == eb and r["kw_rank"] == ek
        expect = (1.0 / (T.RRF_K + eb) if eb else 0.0) + (
            1.0 / (T.RRF_K + ek) if ek else 0.0
        )
        assert r["rrf_score"] == expect
    # per query the ranking is by rrf_score desc, doc_id asc
    per_q: dict[int, list] = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r["rank"])
        keys = [(-r["rrf_score"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_hybrid_dense_replays_prf_centroid_ranking(spark):
    """text_hybrid_dense_topk replayed independently from raw parquet:
    the dense leg's per-query centroid is the exact integer sum of the
    BM25 top-k docs' quantized embeddings, its ranking is cosine-to-
    centroid (desc, doc_id asc) over the whole embeddings table, and the
    fused score is the closed-form RRF of the two legs' ranks."""
    import numpy as np

    from near_real_time_data_warehouse_spark.operators import similarity as S
    from near_real_time_data_warehouse_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    b = {(r["query_id"], r["doc_id"]): r["rank"]
         for r in T.bm25_search_topk(spark, sf).collect()}
    epdf = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).toPandas()
    ids = epdf["vec_id"].to_numpy(np.int64)
    q = S._quant_np(epdf["embedding"])
    by_id = {int(i): q[n] for n, i in enumerate(ids)}
    cents: dict[int, np.ndarray] = {}
    for (qid, doc), _rank in b.items():
        if doc in by_id:
            cents[qid] = cents.get(qid, 0) + by_id[doc]
    emb_rank: dict[tuple[int, int], int] = {}
    nb = np.sqrt((q * q).sum(axis=1).astype(np.float64))
    for qid, c in sorted(cents.items()):
        den = nb * np.sqrt(float((c * c).sum()))
        cos = np.where(den == 0.0, -2.0,
                       (q @ c).astype(np.float64) / np.where(den == 0.0, 1.0, den))
        order = np.lexsort((ids, -cos))[:T.SEARCH_TOP_K]
        for rnk, n in enumerate(order, start=1):
            emb_rank[(qid, int(ids[n]))] = rnk
    got = T.hybrid_dense_topk(spark, sf).collect()
    assert got
    seen_dense = set()
    for r in got:
        key = (r["query_id"], r["doc_id"])
        eb, ed = b.get(key), emb_rank.get(key)
        assert r["bm25_rank"] == eb and r["emb_rank"] == ed, (r, eb, ed)
        if ed:
            seen_dense.add(key)
        expect = (1.0 / (T.RRF_K + eb) if eb else 0.0) + (
            1.0 / (T.RRF_K + ed) if ed else 0.0
        )
        assert r["rrf_score"] == expect
    # the dense leg must actually contribute members of its own
    assert seen_dense


def test_curriculum_order_invariants(spark):
    """docs_curriculum_order: ranks are a permutation of 1..N, difficulty
    is non-decreasing along the curriculum, the shard assignment
    round-robins the rank, and every shard's own sequence is also
    easy→hard (the stratification property data-parallel workers rely
    on)."""
    from near_real_time_data_warehouse_spark.operators import text as T

    rows = T.curriculum_order(spark, "/root/testdata/sf0.001").collect()
    assert rows
    rows.sort(key=lambda r: r["curriculum_rank"])
    assert [r["curriculum_rank"] for r in rows] == list(range(1, len(rows) + 1))
    diffs = [r["difficulty_milli"] for r in rows]
    assert diffs == sorted(diffs)
    for r in rows:
        assert r["shard"] == (r["curriculum_rank"] - 1) % T.CURRICULUM_SHARDS
        assert r["position_in_shard"] == (
            (r["curriculum_rank"] - 1) // T.CURRICULUM_SHARDS + 1
        )
    per_shard: dict[int, list[int]] = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r["difficulty_milli"])
    for sh, ds in per_shard.items():
        assert ds == sorted(ds), sh
