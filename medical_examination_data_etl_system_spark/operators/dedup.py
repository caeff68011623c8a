"""Deduplication operators: exact (keep-first), MinHash+LSH, SimHash,
n-gram Jaccard.

100 TB posture:
- exact dedup: one hash-shuffle on the fingerprint; map-side the
  fingerprint is computed inside the scan stage (codegen).
- MinHash LSH: signatures are a map-only stage (higher-order functions
  over the shingle array, JVM-side, no Python); candidate generation
  shuffles only (doc_id, band_hash) pairs — tiny vs the corpus; exact
  Jaccard verification joins shingle arrays back by doc_id (hash join on
  a much-reduced candidate set). No O(n²) stage anywhere.
- SimHash: one shuffle (explode tokens → groupBy doc) to build 64-bit
  fingerprints; banding on 16-bit chunks finds Hamming≤3 candidates by
  pigeonhole; verification is bit_count(xor) — pure JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.text_analysis import (
    content_fingerprint,
    normalized_text,
)

# ---------------------------------------------------------------------------
# Exact dedup (keep-first by sort key) — the pipeline's A2 pattern, scaled
# ---------------------------------------------------------------------------


def dedup_exact_keep_first(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep the first row (lowest order_col) per key — deterministic,
    unlike ``dropDuplicates``."""
    w = W.partitionBy(*key_cols).orderBy(order_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def dedup_documents_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content-exact dedup: fingerprint normalized text, keep lowest id."""
    with_fp = docs.withColumn("fingerprint", content_fingerprint(F.col(text_col)))
    return dedup_exact_keep_first(with_fp, ["fingerprint"], id_col)


# ---------------------------------------------------------------------------
# Character shingles + MinHash signatures (deterministic, hash-based)
# ---------------------------------------------------------------------------


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text."""
    norm = normalized_text(text)
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.array_distinct(F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k))))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> list[Column]:
    """num_hashes column expressions, each = min over shingles of a
    seeded xxhash64. Deterministic across runs and partitionings."""
    return [
        F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(F.concat(F.lit(f"{i}#"), s))))
        for i in range(num_hashes)
    ]


def minhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, exact-Jaccard verified.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    rows = num_hashes // bands
    shingled = docs.select(
        F.col(id_col).alias("_id"), char_shingles(F.col(text_col), shingle_k).alias("_sh")
    )
    sigs = minhash_signature(F.col("_sh"), num_hashes)
    # Candidate generation moves ONLY (doc_id, band_idx, band_hash) — the
    # shingle arrays never enter the LSH shuffle. At 100 TB the exploded
    # band frame is O(docs × bands) longs, orders of magnitude smaller
    # than the corpus; both self-join sides share one exchange
    # (ReusedExchange) since the subplans are identical.
    banded = shingled.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            "|", F.lit(b), *[s.cast("string") for s in sigs[b * rows : (b + 1) * rows]]
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band_idx", "_band_hash"),
    )
    left = banded.select(
        F.col("_band_idx").alias("bi"), F.col("_band_hash").alias("bh"), F.col("_id").alias("id_a")
    )
    right = banded.select(
        F.col("_band_idx").alias("bi"), F.col("_band_hash").alias("bh"), F.col("_id").alias("id_b")
    )
    candidates = (
        left.join(right, ["bi", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact-Jaccard verification: join shingles back onto the (tiny)
    # verified-candidate set — two hash joins keyed on doc_id.
    verified = (
        candidates.join(shingled.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(shingled.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
    )
    jaccard = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
        4,
    )
    return (
        verified.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) + Hamming banding
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash bigint): weighted sign-sum over token-hash bits."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("_tok"),
    )
    counted = toks.groupBy("_id", "_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    h = F.xxhash64("_tok")
    bit_sums = [
        F.sum(
            F.col("_cnt")
            * (F.shiftright(h, k).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"_b{k}")
        for k in range(64)
    ]
    per_doc = counted.groupBy("_id").agg(*bit_sums)
    fp = None
    for k in range(64):
        bit = (F.col(f"_b{k}") > 0).cast("long")
        term = F.shiftleft(bit, k)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return per_doc.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Banding: 4×16-bit chunks — any pair within Hamming 3 shares at least
    one chunk (pigeonhole), so candidate generation is 4 equi-joins, not
    an O(n²) scan."""
    fps = simhash_fingerprints(docs, text_col, id_col)
    chunks = fps.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.posexplode(
            F.array(*[F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF)) for c in range(4)])
        ).alias("_chunk_idx", "_chunk"),
    )
    left = chunks.select(
        F.col("_chunk_idx").alias("ci"), F.col("_chunk").alias("cv"),
        F.col("_id").alias("id_a"), F.col("simhash").alias("fp_a"),
    )
    right = chunks.select(
        F.col("_chunk_idx").alias("ci"), F.col("_chunk").alias("cv"),
        F.col("_id").alias("id_b"), F.col("simhash").alias("fp_b"),
    )
    return (
        left.join(right, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, oracle-expressible)
# ---------------------------------------------------------------------------


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Distinct word n-grams (joined by single space) of normalized text."""
    toks = F.split(normalized_text(text), " ")
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within the same block
    (blocking keeps the pair space linear-ish; at 100 TB the block
    column would be a coarse cluster key such as an LSH band)."""
    base = docs.select(
        F.col(id_col).alias("_id"),
        (F.col(block_col) if block_col else F.lit("all")).alias("_blk"),
        word_ngrams(F.col(text_col), n).alias("_ng"),
    )
    left = base.select(F.col("_blk"), F.col("_id").alias("id_a"), F.col("_ng").alias("ng_a"))
    right = base.select(F.col("_blk"), F.col("_id").alias("id_b"), F.col("_ng").alias("ng_b"))
    jaccard = F.round(
        F.size(F.array_intersect("ng_a", "ng_b")) / F.size(F.array_union("ng_a", "ng_b")), 4
    )
    return (
        left.join(right, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )
