"""Curation-operator queries (operators/curation.py) over ``documents``.

Every operator here is exactly SQL-expressible, so each query carries a
DuckDB oracle: the md5 bucket, window prefix-sums, and RE2-safe regex
patterns were chosen precisely so the oracle can mirror the engine
bit-for-bit (the driver value-hashes results — see test_oracle_parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators import curation
from medical_examination_data_etl_system_spark.operators.text_analysis import token_count
from medical_examination_data_etl_system_spark.queries import QueryDef, load

# Shared oracle fragment: engine-independent md5 bucket (operators/
# curation.hash_bucket). DuckDB parses '0x…'::BIGINT; Spark uses conv().
_BUCKET_SQL = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"


def docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 20% corpus sample: md5-bucket membership, map-only."""
    docs = load(spark, sf_dir, "documents")
    return (
        curation.hash_sample(docs, "doc_id", pct=20)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


HASH_SAMPLE_SQL = f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE {_BUCKET_SQL} < 20
ORDER BY doc_id
"""


def docs_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture re-weighting: per-source keep rates (src0 100%,
    src1 60%, src2 30%, src3 10%, everything else 50%) applied via the
    same md5 id-bucket as the flat sample — map-only, and monotone with
    docs_hash_sample (a doc kept at 20% flat is kept by any source rate
    ≥ 20)."""
    docs = load(spark, sf_dir, "documents")
    mixed = curation.domain_mix(
        docs,
        key_col="source",
        id_col="doc_id",
        rates={"src0": 100, "src1": 60, "src2": 30, "src3": 10},
        default_pct=50,
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


DOMAIN_MIX_SQL = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc_id
FROM documents
WHERE {_BUCKET_SQL} < CASE source
         WHEN 'src0' THEN 100 WHEN 'src1' THEN 60
         WHEN 'src2' THEN 30 WHEN 'src3' THEN 10 ELSE 50 END
GROUP BY source
ORDER BY source
"""


def docs_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at 40 docs (lowest doc_id first) — bounding any
    one domain's share of the corpus."""
    docs = load(spark, sf_dir, "documents")
    return (
        curation.cap_per_key(docs, "source", n=40, order_col="doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source")
    )


DOMAIN_CAP_SQL = """
WITH capped AS (
  SELECT * FROM documents
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 40
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       max(doc_id) AS max_doc_id
FROM capped
GROUP BY source
ORDER BY source
"""


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each source's documents (doc_id order) into ~256-token bins
    via one window prefix-sum; report per-bin fill."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    packed = curation.pack_sequences(
        docs, token_col="n_tokens", budget=256, part_col="source", order_col="doc_id"
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("source", "bin_id")
    )


PACK_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), binned AS (
  -- exact integer floor-division (`//`), mirroring Spark `div` — both
  -- engines stay integral, no double rounding past 2^53 (ADVICE r3)
  SELECT doc_id, source, n_tokens,
         CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
              // 256 AS BIGINT) AS bin_id
  FROM toks
)
SELECT source, bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc_id
FROM binned
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


def docs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit: deterministically inject an email + phone
    into each 3rd document (the synthetic corpus carries none), mask
    both, and report per-doc counts + redacted-text digest.

    The injection happens identically in the oracle, so the query
    checks the REDACTION (pattern semantics, replace-all, pass order)
    cross-engine, not the synthetic data.
    """
    docs = load(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    n_emails, n_phones = curation.pii_counts(injected)
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(curation.redact_pii(injected)).alias("redacted_digest"),
    ).orderBy("doc_id")


PII_SQL = """
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 555-867-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS BIGINT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g')) AS redacted_digest
FROM injected
ORDER BY doc_id
"""


def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token chunks every 24 tokens (8-token overlap):
    map-side 1→N posexplode fan-out; digest per chunk keeps the result
    compact while pinning exact chunk content."""
    docs = load(spark, sf_dir, "documents")
    chunks = curation.chunk_tokens(docs, "text", ["doc_id"], chunk=32, step=24)
    return chunks.select(
        "doc_id", "chunk_no", "n_chunk_tokens", F.md5("chunk_text").alias("chunk_digest")
    ).orderBy("doc_id", "chunk_no")


CHUNK_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
  FROM documents
), starts AS (
  SELECT doc_id, tk, n,
         CASE WHEN n <= 0 THEN 0
              ELSE CAST(floor((greatest(n - 32, 0) + 23) / 24) AS BIGINT) + 1 END AS n_starts
  FROM toks
), exploded AS (
  SELECT doc_id, tk, n, CAST(s AS BIGINT) AS chunk_no
  FROM starts, UNNEST(range(0, n_starts)) AS t(s)
)
SELECT doc_id, chunk_no,
       CAST(least(32, n - chunk_no * 24) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(tk, chunk_no * 24 + 1, chunk_no * 24 + 32), ' ')) AS chunk_digest
FROM exploded
ORDER BY doc_id, chunk_no
"""


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the pseudo-benchmark is the
    deterministic doc_id % 97 == 0 slice; every remaining document
    sharing any word trigram with it is dropped (n=3 rather than the
    production 8 so the short test documents actually collide)."""
    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return (
        curation.decontaminate(corpus, bench, n=3)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


# Tokenization mirrors operators/text_analysis.normalized_text
# (lower+trim+collapse-whitespace); grams compare as strings where the
# engine compares xxhash64 longs — hash-collision-exact, the
# ngram_jaccard stance.
DECONTAMINATE_SQL = """
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
bench AS (SELECT * FROM documents WHERE doc_id % 97 = 0),
cg AS (
  SELECT doc_id, unnest(list_transform(
           range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 2, 0) + 1),
           i -> array_to_string(string_split_regex(trim(lower(text)), '\\s+')[i:i+2], ' ')
         )) AS g
  FROM corpus
),
bg AS (
  SELECT DISTINCT unnest(list_transform(
           range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 2, 0) + 1),
           i -> array_to_string(string_split_regex(trim(lower(text)), '\\s+')[i:i+2], ' ')
         )) AS g
  FROM bench
)
SELECT doc_id, source, lang
FROM corpus
WHERE doc_id NOT IN (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (g))
ORDER BY doc_id
"""


def docs_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document bigram repetition signal."""
    docs = load(spark, sf_dir, "documents")
    return curation.repetition_stats(docs, n=2).orderBy("doc_id")


REPETITION_SQL = """
WITH grams AS (
  SELECT doc_id, unnest(list_transform(
           range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 1, 0) + 1),
           i -> array_to_string(string_split_regex(trim(lower(text)), '\\s+')[i:i+1], ' ')
         )) AS g
  FROM documents
)
SELECT doc_id,
       count(*) AS n_grams,
       count(DISTINCT g) AS n_distinct,
       round(1 - (count(DISTINCT g)::DOUBLE / count(*)), 4) AS rep_ratio
FROM grams
GROUP BY doc_id
ORDER BY doc_id
"""




def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional reproducible sample: 5 docs per source,
    weighted by n_chars (longer docs proportionally likelier) — the
    Efraimidis-Spirakis exponential-key top-k, md5-derived uniforms so
    the DuckDB oracle draws the identical sample."""
    docs = load(spark, sf_dir, "documents")
    return (
        curation.weighted_sample_per_key(
            docs, key_col="source", weight_col="n_chars", id_col="doc_id", k=5
        )
        .select("doc_id", "source", "n_chars", "sample_rank")
        .orderBy("source", "sample_rank")
    )


WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT)
             / 4503599627370496.0) / CAST(n_chars AS DOUBLE) AS wkey
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(rn AS INTEGER) AS sample_rank
FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY wkey, doc_id) AS rn
      FROM keyed)
WHERE rn <= 5
ORDER BY source, sample_rank
"""



def docs_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment from the same
    md5 id-bucket as hash_sample — split membership is a pure function
    of the id (stable across re-runs, engines, and corpus growth:
    adding documents never moves an existing one between splits), the
    property random splits lack. Summarized per (split, lang)."""
    docs = load(spark, sf_dir, "documents")
    bucket = curation.hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


SPLIT_SQL = f"""
SELECT CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_BUCKET_SQL} < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


def docs_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching: documents ntiled into 8 buckets by
    token count (key tie-break → deterministic), with each bucket's
    PADDING WASTE — the fraction of a max-length-padded batch that
    would be pad tokens (1 − sum_len / (count·max_len)). The metric
    length-grouped inference batching exists to minimize; bucketing by
    ntile keeps batch sizes equal under any length distribution.

    The ntile is computed with the VALUE-DOMAIN plan (the
    events_histogram_equidepth discipline), not a global window over
    documents: per-token-count tie-group counts + a cumulative offset
    window over the BOUNDED distinct-length domain, then a within-value
    row_number (partitioned by n_tokens) gives each doc its exact
    global rank and the ANSI ntile formula maps ranks to buckets —
    identical assignment to ``ntile(8) OVER (ORDER BY n_tokens,
    doc_id)``, but the only single-task frame is the length domain
    (≤ max doc tokens), never the corpus. (Was a corpus-wide ntile
    window; caught by plan_audit's unpartitioned-window gate, r7.)"""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    nb = 8
    n_tok = F.when(
        F.trim("text") == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim("text"), r"\s+")))
    staged = docs.select("doc_id", n_tok.alias("n_tokens"))
    sizes = staged.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "n_tokens", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    w_in = Window.partitionBy("n_tokens").orderBy("doc_id")
    ranked = staged.join(offsets, "n_tokens").select(
        "doc_id", "n_tokens", (F.col("off") + F.row_number().over(w_in)).alias("rnk")
    )
    total = staged.agg(F.count(F.lit(1)).alias("n"))
    bucketed = ranked.crossJoin(F.broadcast(total)).select(
        "n_tokens",
        # ANSI ntile: q = n div nb, r = n mod nb; first r buckets get q+1.
        F.expr(
            f"CASE WHEN rnk <= (n % {nb}) * (n div {nb} + 1) "
            f"THEN (rnk - 1) div (n div {nb} + 1) + 1 "
            f"ELSE (n % {nb}) + (rnk - (n % {nb}) * (n div {nb} + 1) - 1) div (n div {nb}) + 1 END"
        ).cast("int").alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_len"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_len"),
            F.round(
                F.lit(1.0)
                - F.sum("n_tokens")
                / (F.count(F.lit(1)) * F.max("n_tokens")),
                6,
            ).alias("pad_waste"),
        )
        .orderBy("bucket")
    )


LENGTH_BUCKETS_SQL = """
WITH staged AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), bucketed AS (
  SELECT *, CAST(ntile(8) OVER (ORDER BY n_tokens, doc_id) AS INTEGER) AS bucket
  FROM staged
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_tokens) AS min_len,
       max(n_tokens) AS max_len,
       CAST(sum(n_tokens) AS BIGINT) AS sum_len,
       round(1.0 - CAST(sum(n_tokens) AS DOUBLE) / (count(*) * max(n_tokens)), 6) AS pad_waste
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""

def docs_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM fluency score per document
    (operators/curation.bigram_coherence): integer ppm arithmetic end
    to end, three vocabulary-keyed shuffles, zero Python."""
    docs = load(spark, sf_dir, "documents")
    return curation.bigram_coherence(docs).orderBy("doc_id")


# Same tokenizer as every text oracle (lower+trim+split \s+); grams
# compare as strings where the engine compares xxhash64 longs —
# hash-collision-exact, the ngram_jaccard stance. All scoring is BIGINT
# ppm division, so sums are order-free exact on both engines.
BIGRAM_COHERENCE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(tk) - 1, 0) + 1),
           i -> array_to_string(tk[i:i+1], ' ')
         )) AS g,
         unnest(list_transform(
           range(1, greatest(len(tk) - 1, 0) + 1),
           i -> tk[i]
         )) AS pre
  FROM toks
), scored AS (
  SELECT doc_id,
         (1000000 * count(*) OVER (PARTITION BY g))
           // count(*) OVER (PARTITION BY pre) AS score_ppm
  FROM grams
)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(sum(score_ppm) AS BIGINT) AS score_sum,
       CAST(sum(score_ppm) // count(*) AS BIGINT) AS coherence_ppm
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum reproducible sampling: rare (lang, source) strata
    (< 25 docs) keep 60%, common strata 20% — the oversample-the-tail
    mixture move. Stratum sizes aggregate to a dim-sized frame that
    BROADCASTS back; membership stays the md5 id-bucket (map-side,
    deterministic, superset-consistent with the flat 20% sample for
    common strata)."""
    docs = load(spark, sf_dir, "documents")
    sizes = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("_n"))
    rate = F.when(F.col("_n") < 25, F.lit(60)).otherwise(F.lit(20))
    return (
        docs.join(F.broadcast(sizes), ["lang", "source"])
        .filter(curation.hash_bucket(F.col("doc_id")) < rate)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH sizes AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
)
SELECT d.doc_id, d.source, d.lang, d.n_chars
FROM documents d JOIN sizes s ON d.lang = s.lang AND d.source = s.source
WHERE {_BUCKET_SQL.replace('doc_id', 'd.doc_id')}
      < CASE WHEN s.n < 25 THEN 60 ELSE 20 END
ORDER BY d.doc_id
"""


def docs_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate collapse keeping the BEST copy (longest, then
    smallest id) rather than the first-seen — the curation variant
    where duplicates differ in truncation. One window over the
    fingerprint partition; grouping compares xxhash64 longs where the
    oracle compares normalized strings — hash-collision-exact."""
    from medical_examination_data_etl_system_spark.operators.text_analysis import normalized_text

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.xxhash64(normalized_text(F.col("text")))).orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


DEDUP_KEEP_BEST_SQL = """
WITH ranked AS (
  SELECT doc_id, source, lang, n_chars,
         row_number() OVER (
           PARTITION BY regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
           ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, source, lang, n_chars FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


def docs_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffling: each epoch's order is
    ``md5('epoch{e}:' || doc_id)`` — a pure function of (epoch, id), so
    re-runs, resumed jobs, and the oracle produce the IDENTICAL
    permutation (the reproducibility property ``rand()`` ordering
    lacks), and different epochs decorrelate. The full permutation is a
    distributed range sort (``orderBy`` on the key — no global window);
    here each epoch surfaces its first 100 positions, which Catalyst
    plans as TakeOrderedAndProject — top-k without sorting the corpus.
    """
    docs = load(spark, sf_dir, "documents")
    parts = []
    for epoch in (1, 2, 3):
        key = F.md5(F.concat(F.lit(f"epoch{epoch}:"), F.col("doc_id").cast("string")))
        head = (
            docs.select(F.lit(epoch).alias("epoch"), key.alias("_k"), "doc_id")
            .orderBy("_k", "doc_id")
            .limit(100)
        )
        w = Window.partitionBy("epoch").orderBy("_k", "doc_id")
        parts.append(
            head.select(
                "epoch", F.row_number().over(w).alias("position"), "doc_id"
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out.orderBy("epoch", "position")


EPOCH_SHUFFLE_SQL = """
WITH e AS (
  SELECT 1 AS epoch, md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS k, doc_id FROM documents
  UNION ALL
  SELECT 2, md5('epoch2:' || CAST(doc_id AS VARCHAR)), doc_id FROM documents
  UNION ALL
  SELECT 3, md5('epoch3:' || CAST(doc_id AS VARCHAR)), doc_id FROM documents
), ranked AS (
  SELECT epoch, row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS position, doc_id
  FROM e
)
SELECT epoch, CAST(position AS INTEGER) AS position, doc_id
FROM ranked WHERE position <= 100
ORDER BY epoch, position
"""


def docs_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate CLUSTER-SIZE distribution — the dedup
    diagnostic run before choosing a strategy (how much of the corpus
    is singletons vs mega-clusters): fingerprint → cluster sizes →
    size histogram, each a key-local aggregation. On the mostly-unique
    test corpus this pins the all-singleton baseline; on a crawl it is
    the duplication profile. Grouping compares xxhash64 longs where
    the oracle compares normalized strings — collision-exact."""
    from medical_examination_data_etl_system_spark.operators.text_analysis import normalized_text

    docs = load(spark, sf_dir, "documents")
    clusters = docs.groupBy(
        F.xxhash64(normalized_text(F.col("text"))).alias("_fp")
    ).agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        clusters.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            (F.count(F.lit(1)) * F.col("cluster_size")).cast("long").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


DEDUP_CLUSTER_SIZES_SQL = """
WITH clusters AS (
  SELECT regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS fp,
         count(*) AS cluster_size
  FROM documents GROUP BY 1
)
SELECT cluster_size,
       count(*) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs
FROM clusters GROUP BY cluster_size
ORDER BY cluster_size
"""


_BLOCKLIST = ["slow", "big", "hash", "merge"]


def docs_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety/blocklist screening (operators/curation.blocklist_matches):
    per-doc matched blocklist terms (distinct, sorted), hit count, and
    the keep/drop verdict — the pre-training content filter. Map-only:
    the term list is a plan literal, the whole query is one scan stage
    (plan-asserted zero Exchange up to the final sort)."""
    docs = load(spark, sf_dir, "documents")
    matched = curation.blocklist_matches(F.col("text"), _BLOCKLIST)
    return (
        docs.select(
            "doc_id",
            F.array_join(matched, ",").alias("matched"),
            F.size(matched).cast("int").alias("n_hits"),
            (F.size(matched) == 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


BLOCKLIST_SQL = """
WITH m AS (
  SELECT doc_id,
         list_sort(list_intersect(
           list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
           ['slow', 'big', 'hash', 'merge'])) AS matched
  FROM documents
)
SELECT doc_id,
       coalesce(array_to_string(matched, ','), '') AS matched,
       CAST(len(matched) AS INTEGER) AS n_hits,
       len(matched) = 0 AS keep
FROM m ORDER BY doc_id
"""


def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mix weights (the multilingual
    training-mix recipe: sample language ℓ ∝ tokens(ℓ)^α, α = 0.5) —
    per language the corpus share, the α-tempered sampling weight, and
    the docs drawn per 1000-sample epoch. α < 1 up-weights low-resource
    languages; α = 0.5 is written as sqrt(), which IEEE-754 rounds
    correctly in every engine, so the weights hash-match exactly.
    Cost shape: one map-side token count + one 5-row language
    aggregate; the global normalizer joins back as a broadcast single
    row (no unpartitioned window, no second scan)."""
    docs = load(spark, sf_dir, "documents")
    per_lang = (
        docs.select("lang", token_count(F.col("text")).alias("_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
        )
        .withColumn("_w", F.sqrt(F.col("n_tokens").cast("double")))
    )
    total = per_lang.agg(F.sum("_w").alias("_wsum"))
    return (
        per_lang.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("_w") / F.col("_wsum"), 4).alias("mix_weight"),
            F.round(F.lit(1000.0) * F.col("_w") / F.col("_wsum"), 1).alias(
                "docs_per_1000"
            ),
        )
        .orderBy("lang")
    )


TEMPERATURE_MIX_SQL = """
WITH per AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT)
           AS n_tokens
  FROM documents
  GROUP BY lang
), w AS (
  SELECT lang, n_docs, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS wt FROM per
), tot AS (
  SELECT sum(wt) AS wsum FROM w
)
SELECT lang, n_docs, n_tokens,
       round(wt / wsum, 4) AS mix_weight,
       round(1000.0 * wt / wsum, 1) AS docs_per_1000
FROM w CROSS JOIN tot
ORDER BY lang
"""


_STOPWORDS = ["a", "the", "and", "of", "to", "in"]


def docs_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveText RULE-BASED quality filter as one
    composite gate — the checklist production corpora run before any
    model-based scoring: token-count bounds, mean-word-length bounds,
    minimum share of alphabetic words, minimum stopword evidence,
    minimum type-token ratio. Per doc: every signal, every rule
    verdict, and the conjunction (`keep`), so the report doubles as a
    per-rule rejection breakdown.

    One token explode → ONE per-doc aggregate computes all five
    signals together (counts, length sum, alpha/stopword counts,
    distinct terms). Ratios are exact integer divisions rounded to 4;
    rule thresholds compare the rounded values — full DuckDB oracle."""
    from medical_examination_data_etl_system_spark.operators.text_analysis import normalized_text

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    sig = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum(F.length("w")) / F.count(F.lit(1)), 4).alias("mean_wlen"),
        F.round(
            F.sum(F.when(F.col("w").rlike("[a-z]"), 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("alpha_share"),
        F.sum(F.when(F.col("w").isin(_STOPWORDS), 1).otherwise(0)).alias("n_stopwords"),
        F.round(F.countDistinct("w") / F.count(F.lit(1)), 4).alias("ttr"),
    )
    rules = sig.select(
        "*",
        (F.col("n_tokens").between(50, 100_000)).alias("r_len"),
        (F.col("mean_wlen").between(3.0, 10.0)).alias("r_wlen"),
        (F.col("alpha_share") >= 0.8).alias("r_alpha"),
        (F.col("n_stopwords") >= 2).alias("r_stop"),
        (F.col("ttr") >= 0.2).alias("r_ttr"),
    )
    return rules.withColumn(
        "keep",
        F.col("r_len") & F.col("r_wlen") & F.col("r_alpha") & F.col("r_stop") & F.col("r_ttr"),
    ).orderBy("doc_id")


GOPHER_RULES_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
  FROM documents
), sig AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(CAST(sum(length(w)) AS DOUBLE) / count(*), 4) AS mean_wlen,
         round(CAST(sum(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS alpha_share,
         CAST(sum(CASE WHEN w IN ('a','the','and','of','to','in') THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords,
         round(CAST(count(DISTINCT w) AS DOUBLE) / count(*), 4) AS ttr
  FROM toks WHERE w <> ''
  GROUP BY doc_id
)
SELECT *,
       (r_len AND r_wlen AND r_alpha AND r_stop AND r_ttr) AS keep
FROM (
  SELECT *,
         n_tokens BETWEEN 50 AND 100000 AS r_len,
         mean_wlen BETWEEN 3.0 AND 10.0 AS r_wlen,
         alpha_share >= 0.8 AS r_alpha,
         n_stopwords >= 2 AS r_stop,
         ttr >= 0.2 AS r_ttr
  FROM sig)
ORDER BY doc_id
"""


def docs_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING-TRICK vectorizer (Vowpal/sklearn
    HashingVectorizer): every term maps to one of 64 buckets via the
    engine-independent md5 bucket, and each document becomes its
    sparse bucket→count vector — the fixed-width featurization that
    needs NO vocabulary pass, the reason the trick exists at corpus
    scale. Emitted exploded as (doc_id, bucket, cnt) — map-side
    bucket assignment, one (doc, bucket) aggregate, nothing global."""
    docs = load(spark, sf_dir, "documents")
    from medical_examination_data_etl_system_spark.operators.text_analysis import normalized_text

    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        toks.select("doc_id", curation.hash_bucket(F.col("w"), 64).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("doc_id", "bucket")
    )


FEATURE_HASHING_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
  FROM documents
)
SELECT doc_id,
       (('0x' || substr(md5(w), 1, 8))::BIGINT % 64) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM toks WHERE w <> ''
GROUP BY 1, 2
ORDER BY doc_id, bucket
"""


def customer_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC A/B EXPERIMENT ASSIGNMENT + balance audit — the
    pre-launch gate for any online experiment: arm = md5('ab1#' ||
    custkey) mod 2 (a pure function of the unit id, so re-runs,
    retries, and late-arriving events all agree — the hash_sample
    idiom with a per-experiment salt), then the two checks an
    experimentation platform runs before trusting the split: SAMPLE
    RATIO (arm sizes per segment; srm_ratio = |nA−nB|/(nA+nB)) and
    PRE-EXPOSURE COVARIATE BALANCE (exact lifetime spend cents per
    arm + rounded means — a pre-period metric must NOT differ by
    assignment).

    Exact counts/cents; two float entries (the two means), one ratio;
    map-side hash assignment (no shuffle until the segment aggregate).
    Customers without orders count with zero spend."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    arm = curation.hash_bucket(F.concat(F.lit("ab1#"), F.col("c_custkey").cast("string")), 2)
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"))
    )
    base = (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select("c_mktsegment", arm.alias("arm"), F.coalesce("y", F.lit(0)).alias("y"))
    )
    g = base.groupBy("c_mktsegment").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("spend_a_cents"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("spend_b_cents"),
    )
    return (
        g.select(
            F.col("c_mktsegment").alias("segment"),
            "n_a",
            "n_b",
            "spend_a_cents",
            "spend_b_cents",
            F.round(
                F.abs(F.col("n_a") - F.col("n_b")).cast("double")
                / (F.col("n_a") + F.col("n_b")),
                4,
            ).alias("srm_ratio"),
            F.when(
                F.col("n_a") > 0,
                F.round(F.col("spend_a_cents").cast("double") / F.col("n_a"), 2),
            ).alias("mean_a_cents"),
            F.when(
                F.col("n_b") > 0,
                F.round(F.col("spend_b_cents").cast("double") / F.col("n_b"), 2),
            ).alias("mean_b_cents"),
        )
        .orderBy("segment")
    )


AB_ASSIGNMENT_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), base AS (
  SELECT c.c_mktsegment,
         (('0x' || substr(md5('ab1#' || CAST(c.c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2) AS arm,
         coalesce(p.y, 0) AS y
  FROM customer c LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey
), g AS (
  SELECT c_mktsegment,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS spend_a_cents,
         sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS spend_b_cents
  FROM base GROUP BY 1
)
SELECT c_mktsegment AS segment, n_a, n_b,
       CAST(spend_a_cents AS BIGINT) AS spend_a_cents,
       CAST(spend_b_cents AS BIGINT) AS spend_b_cents,
       round(CAST(abs(n_a - n_b) AS DOUBLE) / (n_a + n_b), 4) AS srm_ratio,
       round(CAST(spend_a_cents AS DOUBLE) / NULLIF(n_a, 0), 2) AS mean_a_cents,
       round(CAST(spend_b_cents AS DOUBLE) / NULLIF(n_b, 0), 2) AS mean_b_cents
FROM g
ORDER BY segment
"""


def customer_cuped_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-ADJUSTED EXPERIMENT READOUT — the variance-reduction step
    every mature experimentation platform applies before the t-test
    (Deng et al., WSDM'13): with the X189 salted assignment, Y = each
    customer's spend in the SECOND half of the calendar range (the
    "experiment period"), X = spend in the first half (pre-exposure
    covariate), θ = cov(X,Y)/var(X) pooled across arms, and the
    readout is the adjusted mean Ȳ_arm − θ·(X̄_arm − X̄) per arm plus
    the variance-reduction factor ρ² (the fraction of Y-variance CUPED
    removes).

    Exactness: the period split is an integer epoch-day midpoint; all
    five moments (n, Σx, Σy, Σxy, Σxx, Σyy) accumulate as exact
    decimal(38,0)/HUGEINT cents so θ and ρ² are exact-integer algebra
    with one float entry each; per-arm means are one float division;
    zero-variance X degenerates to NULL adjustment on both engines.

    Scale shape: orders collapse per (customer, period) map-side; one
    broadcast-dim join for the arm; moments and the 2-row arm readout
    are global algebraic aggregates."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    arm = curation.hash_bucket(F.concat(F.lit("ab1#"), F.col("c_custkey").cast("string")), 2)
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("ed"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    b = orders.agg(F.min("ed").alias("mn"), F.max("ed").alias("mx"))
    per_cust = (
        orders.crossJoin(F.broadcast(b))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("ed") <= F.expr("(mn + mx) div 2"), F.col("cents")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ed") > F.expr("(mn + mx) div 2"), F.col("cents")).otherwise(0)
            ).alias("y"),
        )
    )
    base = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(
        arm.alias("arm"),
        F.coalesce("x", F.lit(0)).cast("decimal(38,0)").alias("x"),
        F.coalesce("y", F.lit(0)).cast("decimal(38,0)").alias("y"),
    )
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    g = base.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum("x").alias("ax"),
        F.sum("y").alias("ay"),
    )
    theta = F.when(vx > 0, cov / vx)
    rho2 = F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))
    xbar_all = F.col("sx").cast("double") / F.col("n")
    mean_y = F.col("ay").cast("double") / F.col("n_arm")
    mean_x = F.col("ax").cast("double") / F.col("n_arm")
    return (
        g.crossJoin(F.broadcast(m))
        .select(
            "arm",
            F.col("n_arm").alias("n"),
            F.round(mean_y, 2).alias("mean_post_cents"),
            F.round(mean_x, 2).alias("mean_pre_cents"),
            F.round(mean_y - theta * (mean_x - xbar_all), 2).alias("cuped_adjusted_cents"),
            F.round(theta, 6).alias("theta"),
            F.round(rho2, 4).alias("var_reduction"),
        )
        .orderBy("arm")
    )


CUPED_SQL = """
WITH orders_e AS (
  SELECT o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ed,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), b AS (
  SELECT min(ed) AS mn, max(ed) AS mx FROM orders_e
), per_cust AS (
  SELECT o_custkey,
         sum(CASE WHEN ed <= (mn + mx) // 2 THEN cents ELSE 0 END) AS x,
         sum(CASE WHEN ed > (mn + mx) // 2 THEN cents ELSE 0 END) AS y
  FROM orders_e CROSS JOIN b
  GROUP BY 1
), base AS (
  SELECT (('0x' || substr(md5('ab1#' || CAST(c.c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2) AS arm,
         CAST(coalesce(p.x, 0) AS HUGEINT) AS x,
         CAST(coalesce(p.y, 0) AS HUGEINT) AS y
  FROM customer c LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM base
), g AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_arm, sum(x) AS ax, sum(y) AS ay
  FROM base GROUP BY 1
)
SELECT arm, n_arm AS n,
       round(CAST(ay AS DOUBLE) / n_arm, 2) AS mean_post_cents,
       round(CAST(ax AS DOUBLE) / n_arm, 2) AS mean_pre_cents,
       round(CAST(ay AS DOUBLE) / n_arm
             - (CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                     THEN CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE) END)
               * (CAST(ax AS DOUBLE) / n_arm - CAST(sx AS DOUBLE) / n), 2)
         AS cuped_adjusted_cents,
       round(CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) END, 6) AS theta,
       round(CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                   AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
                       / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) END, 4)
         AS var_reduction
FROM g CROSS JOIN m
ORDER BY arm
"""


QUERIES = {
    "customer_ab_assignment": QueryDef(customer_ab_assignment, AB_ASSIGNMENT_SQL),
    "customer_cuped_readout": QueryDef(customer_cuped_readout, CUPED_SQL),
    "docs_gopher_quality_rules": QueryDef(docs_gopher_quality_rules, GOPHER_RULES_SQL),
    "docs_feature_hashing": QueryDef(docs_feature_hashing, FEATURE_HASHING_SQL),
    "docs_temperature_mix": QueryDef(docs_temperature_mix, TEMPERATURE_MIX_SQL),
    "docs_blocklist_filter": QueryDef(docs_blocklist_filter, BLOCKLIST_SQL),
    "docs_hash_sample": QueryDef(docs_hash_sample, HASH_SAMPLE_SQL),
    "docs_weighted_sample": QueryDef(docs_weighted_sample, WEIGHTED_SAMPLE_SQL),
    "docs_train_val_test_split": QueryDef(docs_train_val_test_split, SPLIT_SQL),
    "docs_length_buckets": QueryDef(docs_length_buckets, LENGTH_BUCKETS_SQL),
    "docs_domain_mix": QueryDef(docs_domain_mix, DOMAIN_MIX_SQL),
    "docs_domain_cap": QueryDef(docs_domain_cap, DOMAIN_CAP_SQL),
    "docs_pack_sequences": QueryDef(docs_pack_sequences, PACK_SQL),
    "docs_pii_redact": QueryDef(docs_pii_redact, PII_SQL),
    "docs_chunk_overlap": QueryDef(docs_chunk_overlap, CHUNK_SQL),
    "docs_decontaminate": QueryDef(docs_decontaminate, DECONTAMINATE_SQL),
    "docs_repetition_ratio": QueryDef(docs_repetition_ratio, REPETITION_SQL),
    "docs_bigram_coherence": QueryDef(docs_bigram_coherence, BIGRAM_COHERENCE_SQL),
    "docs_stratified_sample": QueryDef(docs_stratified_sample, STRATIFIED_SAMPLE_SQL),
    "docs_dedup_keep_best": QueryDef(docs_dedup_keep_best, DEDUP_KEEP_BEST_SQL),
    "docs_epoch_shuffle": QueryDef(docs_epoch_shuffle, EPOCH_SHUFFLE_SQL),
    "docs_dedup_cluster_sizes": QueryDef(docs_dedup_cluster_sizes, DEDUP_CLUSTER_SIZES_SQL),
}
