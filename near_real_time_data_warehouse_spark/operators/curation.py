"""The end-to-end corpus-curation pass — the single query a
training-data pipeline runs nightly: near-dup clustering, keep-best
selection, quality gating, and hash-stable split assignment composed
into one DataFrame.

Composes kernels that are each individually driver-verified
(dedup_components_minhash, text_token_stats, text_shard_split), so this
entry certifies their *composition*: one uncapped LSH component pass,
one shuffle on the cluster key for the keep-best window, and
scan-local projections for quality + split. Nothing here is new
machinery — that is the point: a curation pass should be a plan, not a
framework.

Two variants share one tail (projection/keep-best/quality/split —
``_curation_tail`` in Python, ``_curation_sql`` in SQL) and differ only
in the pair graph feeding connected components: lexical LSH pairs
(``docs_curation_pipeline``) or lexical ∪ embedding-verified semantic
pairs (``docs_curation_semantic`` — paraphrase clusters that share no
shingles still collapse to one representative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import registry
from .dedup import MINHASH_SQL, _docs, dedup_components_minhash
from .text import _NORM_SQL, _norm_col

# Quality gate: at least this many whitespace tokens (≈ p10 of the
# synthetic corpus, so both branches are populated at every SF).
MIN_TOKENS = 24


def _curation_tail(
    spark: SparkSession, sf_dir: str, comps: DataFrame
) -> DataFrame:
    """Per document, given its near-dup component: keep-best flag
    (longest in its cluster, tie-break lowest doc_id), quality flag,
    content-hash split, and the final ``selected`` verdict (cluster
    representative AND passes quality) — the rows that ship to
    training."""
    norm = _norm_col()
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_tokens"),
        F.pmod(
            F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long"), F.lit(10)
        ).alias("bucket"),
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_tokens"), "doc_id")
    joined = comps.join(docs, "doc_id")
    return joined.select(
        "doc_id",
        "component",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("is_representative"),
        (F.col("n_tokens") >= MIN_TOKENS).alias("passes_quality"),
        F.when(F.col("bucket") <= 7, "train")
        .when(F.col("bucket") == 8, "val")
        .otherwise("test")
        .alias("split"),
    ).withColumn(
        "selected", F.col("is_representative") & F.col("passes_quality")
    )


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _curation_tail(spark, sf_dir, dedup_components_minhash(spark, sf_dir))


def curation_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pass with the SEMANTIC merge stage (NEXT.md r3
    carryover, its own entry so docs_curation_pipeline's certified row
    stands): components run over lexical LSH pairs ∪ embedding-verified
    semantic pairs (sim_semantic_text_neardup's candidates with cosine ≥
    the semantic threshold, vec_id ≡ doc_id)."""
    from .dedup import _memoized_components, connected_components, minhash_lsh_pairs
    from .similarity import semantic_text_neardup

    def build() -> DataFrame:
        lex = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
        sem = (
            semantic_text_neardup(spark, sf_dir)
            .filter(F.col("is_semantic"))
            .select("doc_a", "doc_b")
        )
        pairs = lex.unionByName(sem).distinct()
        edges = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        return connected_components(_docs(spark, sf_dir).select("doc_id"), edges)

    comps = _memoized_components("semantic_union", spark, sf_dir, build)
    return _curation_tail(spark, sf_dir, comps)


def _curation_sql(pairs_sql: str) -> str:
    """The shared recursive-CC + tail oracle, parameterized by the CTE
    body producing the (doc_a, doc_b) pair graph."""
    return f"""
WITH RECURSIVE
docs AS (SELECT doc_id FROM documents),
pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
comp(doc_id, label) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT e.dst, c.label FROM comp c JOIN edges e ON e.src = c.doc_id
),
comps AS (SELECT doc_id, MIN(label) AS component FROM comp GROUP BY doc_id),
feat AS (
  SELECT doc_id,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                   ELSE len(string_split({_NORM_SQL}, ' ')) END AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5({_NORM_SQL}), 1, 15)) AS BIGINT) % 10 AS bucket
  FROM documents
),
ranked AS (
  SELECT c.doc_id, component, n_tokens, bucket,
         row_number() OVER (PARTITION BY component ORDER BY n_tokens DESC, c.doc_id) AS rn
  FROM comps c JOIN feat USING (doc_id)
)
SELECT doc_id, component, n_tokens,
       rn = 1 AS is_representative,
       n_tokens >= {MIN_TOKENS} AS passes_quality,
       CASE WHEN bucket <= 7 THEN 'train' WHEN bucket = 8 THEN 'val'
            ELSE 'test' END AS split,
       (rn = 1 AND n_tokens >= {MIN_TOKENS}) AS selected
FROM ranked
"""


CURATION_SQL = _curation_sql(f"SELECT doc_a, doc_b FROM ({MINHASH_SQL})")


def _curation_semantic_sql() -> str:
    from .similarity import NEAR_DUP_COSINE, _semantic_text_sql

    return _curation_sql(
        f"""SELECT doc_a, doc_b FROM ({MINHASH_SQL})
  UNION
  SELECT doc_a, doc_b FROM ({_semantic_text_sql()}) WHERE cosine >= {NEAR_DUP_COSINE}"""
    )


def curation_classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-gated curation v2 — the pass a classifier-filtered corpus
    (DCLM / FineWeb-Edu lineage) actually runs, composed from this
    round's individually-certified kernels: (1) hashing-classifier keep
    gate, (2) substring keep-one-copy REWRITE of the kept docs (span
    dedup changes the text, so it must precede content hashing),
    (3) exact dedup on the CLEANED content (min-doc_id representative),
    (4) hash-stable split on the cleaned fingerprint. One oracle embeds
    all four chains, certifying the composition — two docs that differ
    only in a boilerplate span collapse to one representative here,
    which raw-content exact dedup can never do.

    Scale shape is the sum of its parts: classifier is scan-local, the
    rewrite is the apply entry's plan (token-stream windows by doc), the
    dedup one groupBy on a 128-bit key, the split a projection. Note the
    keep-one-copy canon runs over the CLASSIFIER-KEPT corpus (defined
    semantics: you dedup what you ship)."""
    from .dedup import _local_checkpoint_stats_clean, substring_apply_df
    from .text import hash_classifier_df

    d = _docs(spark, sf_dir)
    # Checkpoint the classifier FLAGS before filtering: a filter on
    # `keep` pushes the predicate below the tokenization projection,
    # INLINING the split/filter chain at every lambda reference inside
    # the HOF score tree — each element access re-tokenizes the doc
    # (the _shingles docstring pathology, in filter form). Measured at
    # 50×: filter-on-lineage 251 s vs 7.8 s for the same columns
    # projected; with the cut the whole entry drops to the apply
    # entry's cost class. Stats-clean like every corpus-sized memo.
    flags = _local_checkpoint_stats_clean(
        hash_classifier_df(d).select("doc_id", "keep"), eager=False
    )
    kept = d.join(flags.filter("keep").select("doc_id"), "doc_id").select(
        "doc_id", "text"
    )
    cleaned = substring_apply_df(kept)
    fp = cleaned.select(
        "doc_id",
        "n_tokens",
        "n_removed_tokens",
        F.md5("cleaned_text").alias("fingerprint"),
    )
    # ONE map-side-combined aggregation keeps the representative row AND
    # the copy count (r14): min_by over the unique doc_id replaces the
    # groupBy + fingerprint self-join (two exchanges of the same rows →
    # one). doc_id is unique per fp row, so min_by is deterministic and
    # the kept (n_tokens, n_removed_tokens) are exactly the min-doc_id
    # row's — bit-identical to the join + rep filter.
    out = (
        fp.groupBy("fingerprint")
        .agg(
            F.min_by(
                F.struct("doc_id", "n_tokens", "n_removed_tokens"), F.col("doc_id")
            ).alias("rep"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            F.col("rep.doc_id").alias("doc_id"),
            F.col("rep.n_tokens").alias("n_tokens"),
            F.col("rep.n_removed_tokens").alias("n_removed_tokens"),
            "fingerprint",
            "n_copies",
        )
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("curate|"), F.col("fingerprint"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(10),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed_tokens",
        "fingerprint",
        "n_copies",
        F.when(bucket <= 7, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )


def _curation_classified_sql() -> str:
    from .dedup import SUBSTRING_APPLY_SQL
    from .text import HASH_CLASSIFIER_SQL

    # NB: the apply SQL defines its own CTE named "kept" — the outer
    # source CTE must not collide or the inner "d" binds circularly.
    apply_on_kept = SUBSTRING_APPLY_SQL.replace(
        "FROM documents\n", "FROM kept_docs\n", 1
    )
    return f"""
WITH kept_docs AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT doc_id FROM ({HASH_CLASSIFIER_SQL}) WHERE keep)
),
applied AS (SELECT * FROM ({apply_on_kept})),
fp AS (
  SELECT doc_id, n_tokens, n_removed_tokens,
         md5(cleaned_text) AS fingerprint
  FROM applied
),
groups AS (
  SELECT fingerprint, MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
  FROM fp GROUP BY fingerprint
)
SELECT f.doc_id, f.n_tokens, f.n_removed_tokens, f.fingerprint,
       CAST(g.n_copies AS BIGINT) AS n_copies,
       CASE WHEN CAST(('0x' || substr(md5('curate|' || f.fingerprint), 1, 15)) AS BIGINT) % 10 <= 7 THEN 'train'
            WHEN CAST(('0x' || substr(md5('curate|' || f.fingerprint), 1, 15)) AS BIGINT) % 10 = 8 THEN 'val'
            ELSE 'test' END AS split
FROM fp f JOIN groups g ON f.fingerprint = g.fingerprint AND f.doc_id = g.rep_id
"""


registry.register("docs_curation_pipeline", curation_pipeline, CURATION_SQL)
registry.register("docs_curation_semantic", curation_semantic, _curation_semantic_sql())
registry.register(
    "docs_curation_classified", curation_classified, _curation_classified_sql()
)
