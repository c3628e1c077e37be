"""Corpus-preparation operators a training-data pipeline runs between
dedup and export: benchmark decontamination, stratified (domain-mix)
sampling, and token-budget packing.

All three are pure DataFrame plans over the ``documents`` table — no
Python in the hot path — and each has a bit-exact DuckDB oracle twin.
Reference parity note: the reference engine has no corpus operators;
these extend the engine for the LLM-pipeline brief (SURVEY.md §2 "+"
rows), reusing the shingle and content-hash kernels that are already
driver-verified (operators/dedup.py shingles, operators/text.py split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import registry
from .dedup import (
    _SHINGLES_SQL,
    _arrays_materialized,
    _bands_materialized,
    _shingles_materialized,
    _verify_jaccard_from_arrays,
)
from .text import _NORM_SQL, _docs, _norm_col

# Contamination flag threshold: fraction of a train doc's 3-gram
# shingles that also occur anywhere in the held-out (test) split.
CONTAM_THRESHOLD = 0.2

# Per-language sampling rates (domain-mixing weights), in exact
# thousandths so the hash threshold comparison is integer-exact.
SAMPLE_RATES = {"en": 500, "de": 750, "es": 250, "fr": 250, "zh": 250}
DEFAULT_RATE = 100

# Token budget per pack and shard fan-out for the packer. Shards bound
# the per-reducer sequential scan — at cluster scale you raise the shard
# count with the executor count (packing is per-output-shard sequential
# by construction). Sized so packs actually spill over at the test SFs
# (~60 docs/shard × ~50 tokens ≈ 6 packs per shard); production values
# would be ~8k-token budgets and O(cluster) shards.
PACK_BUDGET = 512
PACK_SHARDS = 8


def _shingle_hash(col: str = "shingle") -> F.Column:
    # Same md5→bigint idiom as text.shard_split: joins shuffle an 8-byte
    # key instead of the full shingle string.
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_SHINGLE_HASH_SQL = "CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)"

_SPLIT_BUCKET_SQL = f"CAST(('0x' || substr(md5({_NORM_SQL}), 1, 15)) AS BIGINT) % 10"


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per TRAIN document: how many of its 3-gram shingles occur anywhere
    in the TEST split — the decontamination check run before a benchmark
    split ships. Inverted-index equi-join on the hashed shingle (never a
    cross join); the eval shingle set scales with the corpus, so it is
    NOT broadcast — AQE may still choose broadcast while it fits.

    Exact duplicates can never straddle splits (the split is
    content-keyed, text.shard_split), so every hit found here is a
    *partial* overlap — exactly the leakage a dedup pass misses."""
    from .text import shard_split

    sh = _shingles_materialized(spark, sf_dir)
    split = shard_split(spark, sf_dir).select("doc_id", "split")
    hashed = sh.join(split, "doc_id").select(
        "doc_id", "split", _shingle_hash().alias("h")
    )
    eval_set = hashed.filter(F.col("split") == "test").select("h").distinct()
    train = hashed.filter(F.col("split") == "train").withColumnRenamed("h", "th")
    joined = train.join(eval_set, train["th"] == eval_set["h"], "left")
    contamination = F.count("h").cast("double") / F.count(F.lit(1)).cast("double")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("h").alias("n_contaminated"),  # count(col) skips nulls
            contamination.alias("contamination"),
            (contamination >= CONTAM_THRESHOLD).alias("is_contaminated"),
        )
    )


CONTAMINATION_SQL = f"""
WITH sh AS ({_SHINGLES_SQL.format(where="")}),
b AS (SELECT doc_id, {_SPLIT_BUCKET_SQL} AS bucket FROM documents),
hashed AS (
  SELECT sh.doc_id, b.bucket, {_SHINGLE_HASH_SQL} AS h
  FROM sh JOIN b ON sh.doc_id = b.doc_id
),
ev AS (SELECT DISTINCT h FROM hashed WHERE bucket = 9),
tr AS (SELECT doc_id, h AS th FROM hashed WHERE bucket <= 7)
SELECT tr.doc_id,
       COUNT(*) AS n_shingles,
       COUNT(ev.h) AS n_contaminated,
       CAST(COUNT(ev.h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contamination,
       CAST(COUNT(ev.h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) >= {CONTAM_THRESHOLD}
         AS is_contaminated
FROM tr LEFT JOIN ev ON tr.th = ev.h
GROUP BY tr.doc_id
"""


def fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (MinHash-LSH) cross-split decontamination: which TRAIN
    documents are NEAR-DUPLICATES of a held-out (test) document?

    docs_benchmark_contamination measures partial EXACT 3-gram overlap;
    this entry catches the leakage that screen understates — a train doc
    that is a paraphrase-level near-copy of an eval doc (the fuzzy
    decontamination step production pipelines run against benchmark
    suites, cf. the MinHash decontamination in public Dolma/RedPajama
    pipelines). Exact duplicates can never straddle splits (the split is
    content-keyed, text.shard_split), so every hit here is a genuine
    near-dup, invisible to exact dedup by construction.

    Plan shape: the shared checkpointed band table (8 band signatures
    per doc, built once per session by the dedup family) is split-joined
    and the train side equi-joins the eval side on (band, band_sig) —
    never an all-pairs stage, exactly the banded-LSH discipline of
    dedup_minhash_lsh, then candidates are verified with true shingle
    Jaccard and rolled up per train doc. At 100 TB the eval side is a
    bounded benchmark suite (≪ train), so AQE picks a broadcast for the
    band join when it fits — not hinted, for the same reason
    benchmark_contamination doesn't hint: at the test SFs the held-out
    split is a fixed 1/10 of the corpus, which scales with it."""
    from .text import shard_split

    arrs = _arrays_materialized(spark, sf_dir)
    split = shard_split(spark, sf_dir).select("doc_id", "split")
    bands = _bands_materialized(spark, sf_dir).join(split, "doc_id")
    ev = bands.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("doc_b"), "band", "band_sig"
    )
    tr = bands.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("doc_a"), "band", "band_sig"
    )
    cand = tr.join(ev, ["band", "band_sig"]).select("doc_a", "doc_b").distinct()
    # r14: array verification kernel — same jaccard values, same pair
    # set (bit-equality pinned in test_dedup_guards), ~4 fewer exchanges
    pairs = _verify_jaccard_from_arrays(arrs, cand)
    # argmax via struct-max: ties on jaccard break toward the larger
    # eval doc_id — mirrored in the oracle's MAX(doc_b | jaccard = max).
    mx = F.max(F.struct(F.col("jaccard"), F.col("doc_b")))
    return (
        pairs.groupBy("doc_a")
        .agg(F.count(F.lit(1)).alias("n_eval_neardups"), mx.alias("mx"))
        .select(
            F.col("doc_a").alias("doc_id"),
            "n_eval_neardups",
            F.col("mx.jaccard").alias("max_jaccard"),
            F.col("mx.doc_b").alias("worst_eval_doc"),
        )
    )


def _fuzzy_contamination_sql() -> str:
    """DuckDB replay of the full chain: shingles → minhash signatures →
    band table (the shared dedup constants) → split-restricted candidate
    join → exact-Jaccard verify → per-train-doc rollup."""
    from .dedup import JACCARD_THRESHOLD, MERSENNE_P, _minhash_bands_sql

    return f"""
WITH sh AS ({_SHINGLES_SQL.format(where="")}),
base AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % {MERSENNE_P} AS h31
  FROM sh
),
hs AS (SELECT doc_id, list(h31) AS hs FROM base GROUP BY doc_id),
bands AS ({_minhash_bands_sql()}),
b AS (SELECT doc_id, {_SPLIT_BUCKET_SQL} AS bucket FROM documents),
cand AS (
  SELECT DISTINCT t.doc_id AS doc_a, e.doc_id AS doc_b
  FROM bands t
  JOIN bands e ON t.band = e.band AND t.band_sig = e.band_sig
  JOIN b bt ON bt.doc_id = t.doc_id AND bt.bucket <= 7
  JOIN b be ON be.doc_id = e.doc_id AND be.bucket = 9
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b, n_common / (sa.n + sb.n - n_common) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
),
roll AS (
  SELECT doc_a, COUNT(*) AS n_eval_neardups, MAX(jaccard) AS max_jaccard
  FROM pairs GROUP BY doc_a
)
SELECT r.doc_a AS doc_id, r.n_eval_neardups, r.max_jaccard,
       MAX(p.doc_b) AS worst_eval_doc
FROM roll r JOIN pairs p ON p.doc_a = r.doc_a AND p.jaccard = r.max_jaccard
GROUP BY 1, 2, 3
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample (domain mixing): keep
    a document iff its salted content hash mod 1000 falls under the
    language's rate (thousandths — integer-exact, no float RNG). Kept
    rows carry the inverse-rate importance weight, so downstream
    aggregates stay unbiased. Content-keyed like shard_split (survives
    re-ingestion and re-partitioning; random() cannot), salted with a
    distinct prefix so the sample is independent of the split hash.
    Embarrassingly parallel: scan-local projection + filter, no shuffle."""
    rate = F.lit(DEFAULT_RATE)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    strat = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("sample|"), _norm_col())), 1, 15), 16, 10)
        .cast("long"),
        F.lit(1000),
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", strat.alias("strat"), rate.alias("rate_k"))
        .filter(F.col("strat") < F.col("rate_k"))
        .select(
            "doc_id",
            "lang",
            "rate_k",
            (F.lit(1000).cast("double") / F.col("rate_k").cast("double")).alias("weight"),
        )
    )


_RATE_CASE_SQL = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
) + f" ELSE {DEFAULT_RATE} END"

STRATIFIED_SAMPLE_SQL = f"""
WITH s AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5('sample|' || {_NORM_SQL}), 1, 15)) AS BIGINT) % 1000
           AS strat,
         {_RATE_CASE_SQL} AS rate_k
  FROM documents
)
SELECT doc_id, lang, rate_k,
       CAST(1000 AS DOUBLE) / CAST(rate_k AS DOUBLE) AS weight
FROM s WHERE strat < rate_k
"""


def _pack_shard_col() -> F.Column:
    """Content-hashed pack shard (same md5→bigint idiom as shard_split,
    salted with 'pack|' so packing and splitting stay independent)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("pack|"), _norm_col())), 1, 15), 16, 10)
        .cast("long"),
        F.lit(PACK_SHARDS),
    )


def token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: assign documents to fixed-budget packs
    (sequence-length bins) within content-hashed shards. pack_id =
    floor(exclusive running token count / budget) — the streaming-writer
    contract: a pack holds consecutive docs until the budget spills over.

    Per-shard sequential by construction (that is what packing means),
    so parallelism = shard count; PACK_SHARDS scales with the cluster.
    The running sum is a partitioned window — never a global sort."""
    norm = _norm_col()
    toks = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
    )
    d = _docs(spark, sf_dir).select(
        "doc_id", _pack_shard_col().alias("shard"), toks.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(cum_before.cast("double") / F.lit(PACK_BUDGET)).cast("long").alias("pack_id"),
    )


TOKEN_PACKING_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('pack|' || {_NORM_SQL}), 1, 15)) AS BIGINT)
           % {PACK_SHARDS} AS shard,
         CASE WHEN length({_NORM_SQL}) = 0 THEN 0
              ELSE len(string_split({_NORM_SQL}, ' ')) END AS n_tokens
  FROM documents
)
SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
            / {PACK_BUDGET}) AS BIGINT) AS pack_id
FROM d
"""


# Packing budget in TRAINED-BPE pieces: ~4× the whitespace budget since
# 10 merge rounds leave ~3-4 pieces per word at test vocab sizes —
# chosen so packs still spill over at sf0.001.
BPE_PACK_BUDGET = 2048


def token_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing measured in TRAINED-BPE PIECES (VERDICT r5
    #4): ``docs_token_packing`` bins on whitespace token counts, but the
    packing a real pipeline ships uses the tokenizer it trained — a
    pack's budget is model context length in model tokens. Same
    sequential-per-shard kernel; the per-doc piece counts come from the
    trained tokenizer via the broadcast-vocab hash join of
    ``text.bpe_encode`` (never a token-stream rewrite), so the extra
    cost over whitespace packing is one broadcast join at any scale."""
    from .text import bpe_encode

    enc = bpe_encode(spark, sf_dir).select("doc_id", "n_bpe_pieces")
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", _pack_shard_col().alias("shard"))
        .join(enc, "doc_id")  # bpe_encode covers every doc (0 for empty)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_bpe_pieces").over(w), F.lit(0).cast("long"))
    return d.select(
        "doc_id",
        "shard",
        "n_bpe_pieces",
        F.floor(cum_before.cast("double") / F.lit(BPE_PACK_BUDGET))
        .cast("long")
        .alias("pack_id"),
    )


def _token_packing_bpe_sql() -> str:
    """Oracle twin embedding the full trained-BPE chain: per-word piece
    counts from the chain's final symbol table, per-doc totals via the
    vocab join, then the identical pack window."""
    from .text import BPE_MERGE_ROUNDS, _bpe_chain_sql

    n = BPE_MERGE_ROUNDS
    chain = ",\n".join(_bpe_chain_sql())
    return f"""WITH {chain},
pieces AS (SELECT tok, COUNT(*) AS n_pieces FROM sym{n} GROUP BY tok),
doc_toks AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY doc_id, tok
),
enc AS (
  SELECT d.doc_id, CAST(SUM(c * n_pieces) AS BIGINT) AS n_bpe_pieces
  FROM doc_toks d JOIN pieces USING (tok)
  GROUP BY d.doc_id
),
d AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('pack|' || {_NORM_SQL}), 1, 15)) AS BIGINT)
           % {PACK_SHARDS} AS shard,
         COALESCE(n_bpe_pieces, 0) AS n_bpe_pieces
  FROM documents LEFT JOIN enc USING (doc_id)
)
SELECT doc_id, shard, CAST(n_bpe_pieces AS BIGINT) AS n_bpe_pieces,
       CAST(FLOOR(CAST(COALESCE(SUM(n_bpe_pieces) OVER (
              PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
            / {BPE_PACK_BUDGET}) AS BIGINT) AS pack_id
FROM d
"""


# BPE-budget chunking: a training sequence's budget is measured in MODEL
# tokens, not whitespace words. ~128 pieces ≈ 2 chunks per synthetic doc
# at test SFs; production would be the context length (e.g. 8192).
CHUNK_BPE_BUDGET = 128


def chunk_bpe_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length-aware chunking under the TRAINED tokenizer: split
    each document into consecutive word-aligned chunks by the running
    BPE-piece count — chunk k holds the words whose exclusive running
    count falls in [k·B, (k+1)·B), the same boundary rule as
    ``docs_token_packing``. A boundary-straddling word stays in the
    chunk it started counting in, so a chunk holds at most
    B + (longest word's pieces − 1); a STRICT ≤B packer is a sequential
    fold (each boundary depends on the previous one) and cannot be a
    window expression — the bounded overshoot is the price of running
    as one partitioned window at any scale. This is what turns
    documents into fixed-token-budget training sequences once the
    tokenizer exists; ``docs_chunk_windows`` counts whitespace words
    and would over- or under-fill the model context wherever
    pieces-per-word varies.

    Scale shape: explode to (doc, pos, word), broadcast-join the
    vocabulary piece table (word → n_pieces), one running sum per doc
    (partitioned window), floor-divide into chunk ids, re-aggregate.
    Cost: token-stream-linear with a single doc-partitioned window —
    the same shape every per-doc positional op here uses."""
    from .text import _bpe_train

    sym, _ = _bpe_train(spark, sf_dir)
    pieces = sym.groupBy("tok").agg(F.count(F.lit(1)).alias("n_pieces"))
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(F.split(_norm_col(), " ")).alias("pos", "tok"))
        .filter(F.col("tok") != "")
        .join(F.broadcast(pieces), "tok")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_pieces").over(w), F.lit(0).cast("long"))
    assigned = toks.select(
        "doc_id",
        "pos",
        "n_pieces",
        F.floor(cum_before.cast("double") / F.lit(CHUNK_BPE_BUDGET))
        .cast("long")
        .alias("chunk_id"),
    )
    return (
        assigned.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.min("pos").cast("long").alias("tok_start"),
            F.max("pos").cast("long").alias("tok_end"),
        )
    )


def _chunk_bpe_budget_sql() -> str:
    from .text import BPE_MERGE_ROUNDS, _bpe_chain_sql

    n = BPE_MERGE_ROUNDS
    chain = ",\n".join(_bpe_chain_sql())
    return f"""WITH {chain},
pieces AS (SELECT tok, COUNT(*) AS n_pieces FROM sym{n} GROUP BY tok),
doc_toks AS (
  SELECT doc_id, pos - 1 AS pos, tok
  FROM (SELECT doc_id,
               unnest(string_split({_NORM_SQL}, ' ')) AS tok,
               generate_subscripts(string_split({_NORM_SQL}, ' '), 1) AS pos
        FROM documents)
  WHERE tok <> ''
),
assigned AS (
  SELECT d.doc_id, d.pos, p.n_pieces,
         CAST(FLOOR(CAST(COALESCE(SUM(p.n_pieces) OVER (
                PARTITION BY d.doc_id ORDER BY d.pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
              / {CHUNK_BPE_BUDGET}) AS BIGINT) AS chunk_id
  FROM doc_toks d JOIN pieces p USING (tok)
)
SELECT doc_id, chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       CAST(MIN(pos) AS BIGINT) AS tok_start,
       CAST(MAX(pos) AS BIGINT) AS tok_end
FROM assigned
GROUP BY doc_id, chunk_id
"""


# Token-window chunking: window length and stride (overlap = 64-48 = 16
# tokens). Sized to the synthetic docs (~50 tokens) so multi-chunk docs
# actually occur at test SFs; production values would be context-length
# windows (e.g. 2048/1920).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the step between
    packing and export that turns documents into training sequences
    (and retrieval corpora into embedding inputs). Each document yields
    windows of CHUNK_TOKENS tokens starting every CHUNK_STRIDE tokens;
    the final window is allowed to be short.

    Shape at scale: tokenize → ``sequence`` of window starts → explode →
    ``slice`` — all narrow array expressions inside whole-stage codegen.
    Zero shuffles, zero Python: output partitioning inherits input
    partitioning, so the op is embarrassingly parallel at any scale."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split(_norm_col(), " ").alias("toks")
    )
    starts = F.sequence(
        F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE)
    )
    chunked = d.select(
        "doc_id", "toks", F.explode(starts).alias("start_tok")
    ).select(
        "doc_id",
        "start_tok",
        F.slice(F.col("toks"), F.col("start_tok") + 1, CHUNK_TOKENS).alias("chunk_toks"),
    )
    return chunked.select(
        "doc_id",
        (F.col("start_tok") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size("chunk_toks").cast("long").alias("n_chunk_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    )


CHUNK_WINDOWS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST(start_tok // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(list_slice(toks, start_tok + 1, start_tok + {CHUNK_TOKENS})) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(list_slice(toks, start_tok + 1, start_tok + {CHUNK_TOKENS}), ' ')
         AS chunk_text
FROM s
"""



# Adaptive quality gate percentiles (discrete, 1-indexed rank CEIL(p*n)).
MIN_TOKENS_PCT = 0.10   # drop the shortest decile per language
MAX_STOP_PCT = 0.90     # drop the most stopword-heavy decile per language


def adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality gate: thresholds are the language's
    OWN distribution percentiles (p10 token count, p90 stopword ratio),
    not corpus-wide constants — Chinese and German length distributions
    differ too much for one cutoff. The discrete percentile is computed
    with the portable rank construction (value at 1-indexed position
    CEIL(p*n) in value order), NOT an engine quantile function, so both
    engines agree bit-exactly including on ties. Two windows over the
    same (lang, value-sorted) shuffle + one broadcast join-back of the
    per-language threshold row; doubles come from long/long division so
    their ordering is IEEE-identical in both engines."""
    from pyspark.sql import Window

    from .text import quality_score

    q = quality_score(spark, sf_dir).select("doc_id", "n_tokens", "stopword_ratio")
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    scored = d.join(q, "doc_id")

    def disc_threshold(value_col: str, pct: float, out: str) -> DataFrame:
        w = Window.partitionBy("lang").orderBy(value_col)
        ranked = scored.select(
            "lang",
            F.col(value_col).alias("v"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
        )
        return (
            ranked.filter(F.col("rn") == F.ceil(F.lit(pct) * F.col("n")).cast("int"))
            .groupBy("lang")
            .agg(F.min("v").alias(out))
        )

    thr = disc_threshold("n_tokens", MIN_TOKENS_PCT, "min_tokens_thr").join(
        disc_threshold("stopword_ratio", MAX_STOP_PCT, "max_stop_thr"), "lang"
    )
    return scored.join(F.broadcast(thr), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        "stopword_ratio",
        "min_tokens_thr",
        "max_stop_thr",
        (
            (F.col("n_tokens") >= F.col("min_tokens_thr"))
            & (F.col("stopword_ratio") <= F.col("max_stop_thr"))
        ).alias("keep"),
    )


ADAPTIVE_FILTER_SQL = f"""
WITH q AS (
  SELECT doc_id,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                   ELSE len(string_split({_NORM_SQL}, ' ')) END AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all({_NORM_SQL}, '\\b({{stopwords}})\\b')) AS BIGINT) AS n_stopwords
  FROM documents
),
scored AS (
  SELECT d.doc_id, d.lang, q.n_tokens,
         CAST(q.n_stopwords AS DOUBLE)
           / CASE WHEN q.n_tokens = 0 THEN 1 ELSE q.n_tokens END AS stopword_ratio
  FROM documents d JOIN q ON d.doc_id = q.doc_id
),
rt AS (
  SELECT lang, n_tokens AS v,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM scored
),
thr_tokens AS (
  SELECT lang, MIN(v) AS min_tokens_thr FROM rt
  WHERE rn = CAST(CEIL({MIN_TOKENS_PCT} * n) AS INT) GROUP BY lang
),
rs AS (
  SELECT lang, stopword_ratio AS v,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY stopword_ratio) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM scored
),
thr_stop AS (
  SELECT lang, MIN(v) AS max_stop_thr FROM rs
  WHERE rn = CAST(CEIL({MAX_STOP_PCT} * n) AS INT) GROUP BY lang
)
SELECT s.doc_id, s.lang, s.n_tokens, s.stopword_ratio,
       t.min_tokens_thr, p.max_stop_thr,
       s.n_tokens >= t.min_tokens_thr AND s.stopword_ratio <= p.max_stop_thr AS keep
FROM scored s
JOIN thr_tokens t ON t.lang = s.lang
JOIN thr_stop p ON p.lang = s.lang
"""


def _adaptive_filter_sql() -> str:
    from .text import _STOPWORDS

    return ADAPTIVE_FILTER_SQL.format(stopwords=_STOPWORDS)



# Order-independent modular checksum: SUM(h mod P) mod P with h the
# content-fingerprint bigint. P keeps the partial sums inside int64 at
# any corpus size Spark can hold (n * P < 2^63 for n < 9.2e9 docs) and
# the aggregate commutative/associative — safe under any partitioning.
CHECKSUM_P = 1_000_000_007


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export manifest per split shard: doc count, token total, and an
    order-independent content checksum. The manifest is what a consumer
    verifies after copying an exported corpus — counts catch truncation,
    the modular fingerprint sum catches content drift, and being
    order-independent it is stable under shuffle/repartition (a plain
    md5-of-concatenation would not be)."""
    from .text import shard_split, token_stats

    split = shard_split(spark, sf_dir).select("doc_id", "split")
    toks = token_stats(spark, sf_dir).select("doc_id", "n_tokens")
    fp = _docs(spark, sf_dir).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(_norm_col()), 1, 15), 16, 10).cast("long")
            % CHECKSUM_P
        ).alias("h"),
    )
    return (
        split.join(toks, "doc_id")
        .join(fp, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("h") % CHECKSUM_P).alias("content_checksum"),
        )
    )


SHARD_MANIFEST_SQL = f"""
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5({_NORM_SQL}), 1, 15)) AS BIGINT) % 10 AS bucket,
         CAST(('0x' || substr(md5({_NORM_SQL}), 1, 15)) AS BIGINT) % {CHECKSUM_P} AS h,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                   ELSE len(string_split({_NORM_SQL}, ' ')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CASE WHEN bucket <= 7 THEN 'train' WHEN bucket = 8 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(h) % {CHECKSUM_P} AS BIGINT) AS content_checksum
FROM b
GROUP BY split
"""



# Balanced-shard export: size-desc striping across N output shards.
N_EXPORT_SHARDS = 16


def balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced export shards: rank documents by token count
    descending (distributed global ranking — no single-partition window)
    and stripe rank % N across shards, so every shard gets one document
    from each size stratum. Hash sharding balances COUNTS but not token
    totals (one shard can draw the long-document tail and straggle the
    training job); striping bounds the per-shard token spread by the
    largest single document. Output is the per-shard manifest; the
    balance property itself is asserted in tests/test_corpus.py."""
    from .ranking import global_row_number
    from .text import token_stats

    toks = token_stats(spark, sf_dir).select("doc_id", "n_tokens")
    ranked = global_row_number(
        toks, [F.desc("n_tokens"), F.col("doc_id")], rank_col="rn"
    )
    return (
        ranked.withColumn("shard", (F.col("rn") - 1) % N_EXPORT_SHARDS)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("largest_doc_tokens"),
        )
    )


BALANCED_SHARDS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                   ELSE len(string_split({_NORM_SQL}, ' ')) END AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
  FROM toks
)
SELECT (rn - 1) % {N_EXPORT_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MAX(n_tokens) AS largest_doc_tokens
FROM ranked
GROUP BY shard
"""


# Content-defined chunking: boundary after token i when the hash of the
# k-gram ending at i is ≡ 0 mod CDC_MOD → mean chunk ≈ CDC_MOD tokens.
CDC_K = 3
CDC_MOD = 8


def cdc_chunks_df(d: DataFrame) -> DataFrame:
    """Kernel of docs_cdc_chunks over any (doc_id, text) DataFrame.

    Fully scan-local (r13 opt): boundary positions, chunk spans, and
    chunk fingerprints are all array expressions over the per-doc token
    array, and ONE posexplode emits chunk rows directly — replacing the
    token-level explode → doc repartition → running-sum window →
    groupBy(collect_list) chain (two exchanges + a corpus-token sort)
    with zero shuffles (opt guide §2.4). Chunk identity is unchanged:
    with 1-based cut positions C = {i : i ≥ CDC_K, i < n,
    hash(tok[i−2..i]) % CDC_MOD = 0} (a cut after the last token starts
    no chunk), chunk k spans (C_k, C_{k+1}] — the closed form of the
    window's cumulative-boundary-count assignment, pinned equal by
    tests/test_corpus.py and the unchanged DuckDB oracle.

    Each stage keeps its expensive array (toks, cuts) as a column
    referenced ≥2 times downstream so CollapseProject cannot inline the
    md5 chain into every reference (the _shingles docstring pathology);
    the posexplode Generate is a further barrier before the fingerprint
    projection."""
    toks_arr = F.filter(F.split(_norm_col(), " "), lambda t: t != "")
    base = d.select("doc_id", toks_arr.alias("toks")).filter(F.size("toks") > 0)
    toks = F.col("toks")
    n = F.size(toks)

    def gram_hash(i):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.element_at(toks, i - 2),
                            F.element_at(toks, i - 1),
                            F.element_at(toks, i),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(CDC_MOD),
        )

    cuts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            (i >= CDC_K) & (i < n), gram_hash(i) == 0
        ).otherwise(F.lit(False)),
    )
    with_cuts = base.select("doc_id", "toks", cuts.alias("cuts"))
    kmax = F.size("cuts") + 1
    spans = F.transform(
        F.sequence(F.lit(1), kmax),
        lambda k: F.struct(
            F.when(k == 1, F.lit(1))
            .otherwise(F.element_at("cuts", k - 1) + 1)
            .alias("s"),
            F.when(k == kmax, n).otherwise(F.element_at("cuts", k)).alias("e"),
        ),
    )
    exploded = with_cuts.select(
        "doc_id", "toks", F.posexplode(spans).alias("k", "span")
    )
    return exploded.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        (F.col("span.e") - F.col("span.s") + 1).cast("long").alias("n_tokens"),
        (F.col("span.s") - 1).cast("long").alias("start_pos"),
        (F.col("span.e") - 1).cast("long").alias("end_pos"),
        F.md5(
            F.array_join(
                F.slice(toks, F.col("span.s"), F.col("span.e") - F.col("span.s") + 1),
                " ",
            )
        ).alias("chunk_fingerprint"),
    )


def cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking — boundaries picked by a rolling k-gram
    hash (cut after token i when hash(tok[i−2..i]) ≡ 0 mod CDC_MOD)
    instead of fixed offsets, so an edit near the start of a document
    shifts every token position yet chunks after the next boundary
    RE-SYNCHRONIZE byte-for-byte (pytest pins this on a prefix-edited
    twin). The chunk-level dedup/storage primitive fixed-stride windows
    (docs_chunk_windows) cannot provide: their chunks never realign
    after an insertion. Emits per-chunk token span + an md5 chunk
    fingerprint — the content-addressed key downstream chunk-level dedup
    joins on.

    Scale shape: boundary flags are computed array-side per document
    (md5 of each k-gram — the hash both engines replay exactly, same
    construction as text_shard_split; a production run would swap in
    `xxhash64`, ~10× cheaper per gram, at the cost of the cross-engine
    oracle — boundary *placement* statistics are hash-agnostic); one doc-keyed repartition of
    doc-level arrays, then the per-doc cumulative boundary count and
    chunk aggregation reuse that partitioning (doc-bounded windows, no
    instance-level shuffle). Everything is integers/strings — hash-exact
    by construction."""
    return cdc_chunks_df(_docs(spark, sf_dir))


CDC_CHUNKS_SQL = f"""
WITH d0 AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
),
t0 AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS tok,
         toks
  FROM d0
),
t AS (
  SELECT doc_id, i, tok,
         CASE WHEN i >= {CDC_K}
                AND CAST(('0x' || substr(md5(toks[i-2] || ' ' || toks[i-1] || ' ' || toks[i]),
                                         1, 15)) AS BIGINT) % {CDC_MOD} = 0
              THEN 1 ELSE 0 END AS bnd
  FROM t0 WHERE tok <> ''
),
a AS (
  SELECT doc_id, i - 1 AS pos, tok,
         COALESCE(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS chunk_id
  FROM t
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(MIN(pos) AS BIGINT) AS start_pos,
       CAST(MAX(pos) AS BIGINT) AS end_pos,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fingerprint
FROM a GROUP BY doc_id, chunk_id
"""


registry.register("docs_benchmark_contamination", benchmark_contamination, CONTAMINATION_SQL)
registry.register("docs_fuzzy_contamination", fuzzy_contamination, _fuzzy_contamination_sql)
_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (the dataset-card pass): one row per column with
    exact row/null/distinct counts and string-cast min/max. Each column's
    stats come from its own single-column aggregate branch, so every
    branch's scan is COLUMN-PRUNED to just that column (total I/O ≈ one
    full-table scan, branches embarrassingly parallel) — and no branch
    mixes COUNT(DISTINCT) columns, so none triggers the multi-distinct
    Expand blowup (the star_store_stats_approx lesson, NEXT.md r3 #3).
    At 100 TB swap count_distinct for approx_count_distinct per branch;
    the shape is unchanged."""
    d = _docs(spark, sf_dir)
    branches = []
    for c in _PROFILE_COLS:
        branches.append(
            d.select(c).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_val"),
                F.max(F.col(c)).cast("string").alias("max_val"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


COLUMN_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM documents"""
    for c in _PROFILE_COLS
)


# UniMax mixing budget as an exact fraction of the corpus (docs kept
# across all languages ≈ NUM/DEN of the corpus). 2/3 exercises both
# waterfill branches on the test corpus: the smallest language fits its
# fair share untouched while the rest are capped at the waterline.
MIX_BUDGET_NUM, MIX_BUDGET_DEN = 2, 3


def mixture_waterfill(hist: DataFrame) -> DataFrame:
    """Exact integer waterfill over a per-language histogram
    (lang, c): allocate a total budget of ``total·NUM div DEN`` documents
    across languages as uniformly as possible, capped by each language's
    available count — the UniMax allocation (Chung et al. 2023) in
    closed form, no Python loop.

    Greedy equivalence: processing languages by ascending count, a
    language whose count fits under the running fair share
    ``(remaining budget) div (languages left)`` takes all its documents;
    the first language that exceeds it caps every remaining language at
    the waterline ``(budget − Σ smaller counts) div (languages left)``
    (with real arithmetic the fair share is invariant once capping
    starts, so one split point suffices; floor division only ever
    under-allocates — deterministic in both engines). All whole-frame
    windows run over the language histogram — O(distinct languages)
    rows, thousands at web scale — so the single-partition window is a
    non-issue; everything corpus-sized stays embarrassingly parallel."""
    w_ord = Window.orderBy("c", "lang")
    w_all = Window.partitionBy()
    ranked = hist.select(
        "lang",
        "c",
        F.row_number().over(w_ord).alias("rn"),
        F.coalesce(
            F.sum("c").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("s_prev"),
        F.count(F.lit(1)).over(w_all).alias("n_langs"),
        F.sum("c").over(w_all).alias("total"),
    ).select(
        "*",
        F.expr(f"(total * {MIX_BUDGET_NUM}) div {MIX_BUDGET_DEN}").alias("b"),
    )
    # First language whose count exceeds its fair share; every language
    # before it is fully satisfied (prefix sums of raw counts are then
    # the true allocations, making the one-pass formula exact).
    failed = ranked.select(
        "*",
        F.when(
            F.col("c") > F.expr("(b - s_prev) div (n_langs - rn + 1)"),
            F.col("rn"),
        ).alias("fail_rn"),
    )
    with_k = failed.select(
        "*",
        F.coalesce(F.min("fail_rn").over(w_all) - 1, F.col("n_langs")).alias("k"),
    )
    with_sk = with_k.select(
        "*",
        F.coalesce(
            F.sum(F.when(F.col("rn") <= F.col("k"), F.col("c"))).over(w_all),
            F.lit(0),
        ).alias("s_k"),
    )
    return with_sk.select(
        "lang",
        "c",
        F.when(F.col("rn") <= F.col("k"), F.col("c"))
        .otherwise(
            F.least(
                F.col("c"),
                F.expr("(b - s_k) div greatest(n_langs - k, 1)"),
            )
        )
        .alias("alloc"),
    )


def mixture_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax domain mixing (Chung et al. 2023): derive per-language
    sampling rates FROM the observed language histogram — budget-capped
    uniform allocation via exact integer waterfill — instead of the
    fixed hand-tuned rates of docs_stratified_sample. Rates land as
    integer thousandths; membership is the same salted content-hash
    threshold ('unimax|' salt, independent of the split/sample/pack
    hashes), so the sample is deterministic under re-ingestion and
    repartitioning. Kept rows carry the inverse-rate weight.

    Scale shape: one map-side-combinable language histogram (tiny),
    waterfill windows over that tiny table only, broadcast join of the
    rate table back onto the scan, then a scan-local filter — the
    corpus-sized path never shuffles."""
    d = _docs(spark, sf_dir)
    hist = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    rates = mixture_waterfill(hist).select(
        "lang",
        F.least(F.lit(1000), F.expr("(1000 * alloc) div c")).alias("rate_k"),
    )
    strat = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("unimax|"), _norm_col())), 1, 15), 16, 10)
        .cast("long"),
        F.lit(1000),
    )
    return (
        d.select("doc_id", "lang", strat.alias("strat"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("strat") < F.col("rate_k"))
        .select(
            "doc_id",
            "lang",
            "rate_k",
            (F.lit(1000).cast("double") / F.col("rate_k").cast("double")).alias(
                "weight"
            ),
        )
    )


MIXTURE_UNIMAX_SQL = f"""
WITH hist AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
w1 AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (ORDER BY c, lang) AS rn,
         COALESCE(SUM(c) OVER (ORDER BY c, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_prev,
         COUNT(*) OVER () AS n_langs,
         SUM(c) OVER () AS total
  FROM hist
),
w2 AS (
  SELECT *, (total * {MIX_BUDGET_NUM}) // {MIX_BUDGET_DEN} AS b FROM w1
),
w3 AS (
  SELECT *, CASE WHEN c > ((b - s_prev) // (n_langs - rn + 1))
                 THEN rn END AS fail_rn
  FROM w2
),
w4 AS (
  SELECT *, COALESCE(MIN(fail_rn) OVER () - 1, n_langs) AS k FROM w3
),
w5 AS (
  SELECT *, COALESCE(SUM(CASE WHEN rn <= k THEN c END) OVER (), 0) AS s_k
  FROM w4
),
alloc AS (
  SELECT lang, c,
         CASE WHEN rn <= k THEN c
              ELSE LEAST(c, (b - s_k) // GREATEST(n_langs - k, 1)) END AS alloc
  FROM w5
),
rates AS (
  SELECT lang, CAST(LEAST(1000, (1000 * alloc) // c) AS BIGINT) AS rate_k
  FROM alloc
),
s AS (
  SELECT doc_id, d.lang, rate_k,
         CAST(('0x' || substr(md5('unimax|' || {_NORM_SQL}), 1, 15)) AS BIGINT)
           % 1000 AS strat
  FROM documents d JOIN rates ON d.lang = rates.lang
)
SELECT doc_id, lang, rate_k,
       CAST(1000 AS DOUBLE) / CAST(rate_k AS DOUBLE) AS weight
FROM s WHERE strat < rate_k
"""


# Cross-document duplication signal (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better"): the memorization-risk
# flag fires when at least this fraction of a document's distinct
# 3-gram shingles also occur in some OTHER document. Distinct from
# text_repetition_stats (WITHIN-doc repetition) and from
# docs_benchmark_contamination (overlap with the held-out split only).
DUP_NGRAM_FLAG_FRACTION = 0.5


def duplicated_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: how much of it is duplicated text ANYWHERE else in
    the corpus — the fraction of its distinct 3-gram shingles that occur
    in ≥ 1 other document, plus the memorization-risk flag at
    DUP_NGRAM_FLAG_FRACTION. The cross-corpus companion of the
    within-doc repetition filter; high-fraction docs are the
    boilerplate/mirror pages whose n-grams an LM would memorize.

    Scale shape: one shingle scan (memo-shared with the dedup chain),
    a map-side-combinable per-shingle document count, and one join of
    shingle instances back against that count table on the 8-byte
    shingle hash — shuffle ∝ shingle instances, the same LM-scoring
    floor as the surprisal entries. No candidate pairs, no banding, no
    quadratic term anywhere."""
    from .dedup import _shingles_materialized

    sh = _shingles_materialized(spark, sf_dir)
    hashed = sh.select("doc_id", _shingle_hash().alias("h"))
    counts = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    dup_frac = F.sum((F.col("n_docs") >= 2).cast("long")).cast(
        "double"
    ) / F.count(F.lit(1)).cast("double")
    return (
        hashed.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_duplicated"),
            dup_frac.alias("dup_fraction"),
            (dup_frac >= DUP_NGRAM_FLAG_FRACTION).alias("is_dup_heavy"),
        )
    )


DUPLICATED_NGRAM_SQL = f"""
WITH sh AS ({{shingles}}),
hashed AS (SELECT doc_id, {_SHINGLE_HASH_SQL} AS h FROM sh),
c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_docs FROM hashed GROUP BY h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicated,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_fraction,
       (CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE)) >= {DUP_NGRAM_FLAG_FRACTION}
         AS is_dup_heavy
FROM hashed JOIN c USING (h)
GROUP BY doc_id
""".format(shingles=_SHINGLES_SQL.format(where=""))


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    document with the exact-integer unigram LM (text_unigram_surprisal's
    floor-log2 kernel), then split each LANGUAGE into equal-count
    head / middle / tail thirds by score — the canonical
    quality-stratification step before mixing.

    The terciles are EXACT equi-depth but never sort the corpus: the
    integer score ``score_milli = (1000·total_bits) div n_tokens`` has a
    small bounded domain (mean surprisal ≲ 40 bits → ≤ 40k distinct
    values), so cut points come from a cumulative window over the
    (lang, score) HISTOGRAM — O(langs × distinct scores) rows regardless
    of corpus size — and docs bucket by broadcast-joined threshold
    comparison. Equal scores land in the same bucket (ties are never
    split, unlike ntile — deterministic and rank-free). The per-lang
    ntile window a naive port would use puts a whole language in one
    reducer at 100 TB; this shape does not."""
    from .text import unigram_surprisal

    scored = unigram_surprisal(spark, sf_dir).select(
        "doc_id",
        F.expr("(1000 * total_surprisal_bits) div n_tokens").alias("score_milli"),
    )
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    sc = scored.join(d, "doc_id")
    hist = sc.groupBy("lang", "score_milli").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("lang").orderBy("score_milli")
    w_lang = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "score_milli",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_lang).alias("n"),
    )
    # cum ≥ ceil(n/3) ⇔ 3·cum ≥ n — integer-exact tercile cut points.
    thresholds = cum.groupBy("lang").agg(
        F.min(F.when(3 * F.col("cum") >= F.col("n"), F.col("score_milli"))).alias("t1"),
        F.min(F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("score_milli"))).alias(
            "t2"
        ),
    )
    return (
        sc.join(F.broadcast(thresholds), "lang")
        .select(
            "doc_id",
            "lang",
            "score_milli",
            F.when(F.col("score_milli") <= F.col("t1"), F.lit("head"))
            .when(F.col("score_milli") <= F.col("t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )


PERPLEXITY_BUCKETS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
),
t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
c AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
n AS (SELECT COUNT(*) AS n_total FROM t),
scored AS (
  SELECT doc_id,
         CAST((1000 * CAST(SUM(len(printf('%b', n_total)) - len(printf('%b', c.c)))
                           AS BIGINT)) // COUNT(*) AS BIGINT) AS score_milli
  FROM t JOIN c USING (tok), n
  GROUP BY doc_id
),
sc AS (
  SELECT s.doc_id, d.lang, s.score_milli
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
),
hist AS (
  SELECT lang, score_milli, COUNT(*) AS cnt FROM sc GROUP BY lang, score_milli
),
cum AS (
  SELECT lang, score_milli,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY score_milli) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS n
  FROM hist
),
th AS (
  SELECT lang,
         MIN(CASE WHEN 3 * cum >= n THEN score_milli END) AS t1,
         MIN(CASE WHEN 3 * cum >= 2 * n THEN score_milli END) AS t2
  FROM cum GROUP BY lang
)
SELECT sc.doc_id, sc.lang, sc.score_milli,
       CASE WHEN sc.score_milli <= th.t1 THEN 'head'
            WHEN sc.score_milli <= th.t2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM sc JOIN th ON sc.lang = th.lang
"""


# --- Weighted Bernoulli sampling (Horvitz–Thompson) -----------------------
#
# Length-weighted subsampling with unbiased reweighting — the
# budget-limited pipeline pass ("keep ~K documents, longer documents
# proportionally more likely, reweight so any corpus statistic stays
# unbiased").  Inclusion is a pure integer comparison on a 28-bit
# md5-derived uniform (U·Σw < K·w·2²⁸ — never a float RNG, so Spark and
# DuckDB select the IDENTICAL sample), and the Horvitz–Thompson weight
# 1/p is ONE IEEE division (1.0 where p ≥ 1).  The 28-bit grid bounds
# U·Σw ≤ 2²⁸·Σw in int64 while total chars < ~3·10¹⁰; past that the
# comparison widens to DECIMAL(38) unchanged in shape.  Scale: one
# 1-row total broadcast + a stateless per-row test — zero shuffle.
WSAMP_K = 100
WSAMP_BITS = 28


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    tot = d.agg(F.sum("n_chars").alias("tot"))
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")
    j = d.crossJoin(F.broadcast(tot))
    sel = u * F.col("tot") < F.lit(WSAMP_K) * F.col("n_chars") * F.lit(1 << WSAMP_BITS)
    ht = F.when(
        F.lit(WSAMP_K) * F.col("n_chars") >= F.col("tot"), F.lit(1.0)
    ).otherwise(
        F.col("tot").cast("double") / (F.lit(WSAMP_K) * F.col("n_chars")).cast("double")
    )
    return (
        j.filter(sel)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            ht.alias("ht_weight"),
        )
    )


WSAMP_SQL = f"""
WITH tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tot FROM documents),
u AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) AS u
  FROM documents
)
SELECT doc_id, lang, n_chars,
       CASE WHEN {WSAMP_K} * n_chars >= tot.tot THEN 1.0
            ELSE CAST(tot.tot AS DOUBLE) / CAST({WSAMP_K} * n_chars AS DOUBLE)
       END AS ht_weight
FROM u CROSS JOIN tot
WHERE u.u * tot.tot < {WSAMP_K} * n_chars * {1 << WSAMP_BITS}
"""


registry.register("docs_weighted_sample", weighted_sample, WSAMP_SQL)
registry.register("docs_cdc_chunks", cdc_chunks, CDC_CHUNKS_SQL)
registry.register("docs_mixture_unimax", mixture_unimax, MIXTURE_UNIMAX_SQL)
registry.register(
    "docs_duplicated_ngram_fraction", duplicated_ngram_fraction, DUPLICATED_NGRAM_SQL
)
registry.register("docs_perplexity_buckets", perplexity_buckets, PERPLEXITY_BUCKETS_SQL)
registry.register("docs_column_profile", column_profile, COLUMN_PROFILE_SQL)
registry.register("docs_chunk_windows", chunk_windows, CHUNK_WINDOWS_SQL)
registry.register("docs_stratified_sample", stratified_sample, STRATIFIED_SAMPLE_SQL)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing at T = 2 — the multilingual
    sampling rule (mC4/XLM-R style) between proportional (T = 1) and
    UniMax's budget-capped uniform: language i's share of the sampled
    budget is √nᵢ / Σ√nⱼ, up-weighting tails without UniMax's hard cap.
    Same salted content-hash membership and inverse-rate weights as the
    sibling mixture entries (salt 'temp2|'), so the sample is
    deterministic under re-ingestion and repartitioning.

    Exact-integer discipline: √n is the EXACT integer isqrt — floor of
    the double sqrt, then corrected by two integer comparisons, so both
    engines agree even where the FP sqrt rounds wrong; the share and the
    per-doc rate are two documented integer floors (share in
    thousandths first, then rate = share·budget / nᵢ — keeps every
    product within int64 at any corpus size).

    Scale shape: identical to docs_mixture_unimax — one tiny language
    histogram, rate arithmetic on that table only, broadcast join back,
    scan-local filter. Zero corpus shuffles."""
    d = _docs(spark, sf_dir)
    hist = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    s0 = F.floor(F.sqrt(F.col("c").cast("double"))).cast("long")
    isqrt = (
        s0
        - (s0 * s0 > F.col("c")).cast("long")
        + ((s0 + 1) * (s0 + 1) <= F.col("c")).cast("long")
    )
    w_all = Window.partitionBy()
    w = hist.select("lang", "c", isqrt.alias("s")).withColumn(
        "total", F.sum("c").over(w_all)
    )
    rates = (
        w.withColumn("ssum", F.sum("s").over(w_all))
        .withColumn("b", F.expr(f"(total * {MIX_BUDGET_NUM}) div {MIX_BUDGET_DEN}"))
        .select(
            "lang",
            F.least(
                F.lit(1000),
                F.expr("((1000 * s) div ssum * b) div c"),
            ).alias("rate_k"),
        )
        .filter(F.col("rate_k") >= 1)
    )
    strat = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("temp2|"), _norm_col())), 1, 15), 16, 10)
        .cast("long"),
        F.lit(1000),
    )
    return (
        d.select("doc_id", "lang", strat.alias("strat"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("strat") < F.col("rate_k"))
        .select(
            "doc_id",
            "lang",
            "rate_k",
            (F.lit(1000).cast("double") / F.col("rate_k").cast("double")).alias(
                "weight"
            ),
        )
    )


MIXTURE_TEMP_SQL = f"""
WITH hist AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
sq AS (
  SELECT lang, c,
         CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)
           - CASE WHEN CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)
                       * CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) > c
                  THEN 1 ELSE 0 END
           + CASE WHEN (CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) + 1)
                       * (CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) + 1) <= c
                  THEN 1 ELSE 0 END AS s
  FROM hist
),
tot AS (
  SELECT lang, c, s,
         SUM(c) OVER () AS total, SUM(s) OVER () AS ssum
  FROM sq
),
rates AS (
  SELECT lang,
         CAST(LEAST(1000,
           ((1000 * s) // ssum * ((total * {MIX_BUDGET_NUM}) // {MIX_BUDGET_DEN})) // c
         ) AS BIGINT) AS rate_k
  FROM tot
),
live AS (SELECT * FROM rates WHERE rate_k >= 1),
s AS (
  SELECT doc_id, d.lang, rate_k,
         CAST(('0x' || substr(md5('temp2|' || {_NORM_SQL}), 1, 15)) AS BIGINT)
           % 1000 AS strat
  FROM documents d JOIN live ON d.lang = live.lang
)
SELECT doc_id, lang, rate_k,
       CAST(1000 AS DOUBLE) / CAST(rate_k AS DOUBLE) AS weight
FROM s WHERE strat < rate_k
"""

registry.register("docs_mixture_temperature", mixture_temperature, MIXTURE_TEMP_SQL)
registry.register("docs_token_packing", token_packing, TOKEN_PACKING_SQL)
registry.register("docs_token_packing_bpe", token_packing_bpe, _token_packing_bpe_sql())
registry.register("docs_chunk_bpe_budget", chunk_bpe_budget, _chunk_bpe_budget_sql())

registry.register("docs_adaptive_quality_filter", adaptive_quality_filter, _adaptive_filter_sql())
registry.register("docs_shard_manifest", shard_manifest, SHARD_MANIFEST_SQL)
registry.register("docs_balanced_shards", balanced_shards, BALANCED_SHARDS_SQL)
