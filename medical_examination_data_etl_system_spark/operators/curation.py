"""Training-data curation operators (SURVEY.md §2b extension).

The ops a 100 TB pretraining-data pipeline runs AFTER dedup/quality
scoring: reproducible sampling, per-source capping, sequence packing,
PII redaction, and context-window chunking. Design rules:

- **Reproducibility across runs and engines.** Sampling uses an md5
  bucket of the document id — not ``rand()`` (non-deterministic across
  retries/speculative tasks) and not engine hash functions (xxhash64 in
  Spark vs DuckDB ``hash()`` disagree). md5 is bit-stable everywhere,
  so a sampled corpus is re-derivable from ids alone and the DuckDB
  oracle reproduces it exactly.
- **Map-only where possible.** Sampling, redaction, and chunking are
  pure per-row column expressions (whole-stage codegen, no shuffle, no
  Python). Capping and packing need one shuffle each on their
  partition key — the minimum for the semantics.
- **No row-at-a-time UDFs.** Everything is built-in expression trees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _temp_name(df: DataFrame, base: str) -> str:
    """Collision-free scratch-column name (ADVICE r4: a fixed ``_rn`` /
    ``_prefix`` would silently overwrite-and-drop a user column of the
    same name). Suffix with counters until the name is absent."""
    cols = set(df.columns)
    name, i = base, 0
    while name in cols:
        i += 1
        name = f"{base}_{i}"
    return name


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic engine-independent bucket in [0, buckets).

    First 8 hex chars of md5 → unsigned 32-bit int → mod. 32 bits of
    the digest is plenty for bucket assignment; md5 is uniform enough
    that bucket populations are binomial around n/buckets.
    """
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % buckets)


def hash_sample(df: DataFrame, id_col: str, pct: int, buckets: int = 100) -> DataFrame:
    """Keep rows whose id hashes into the first ``pct`` of ``buckets``.

    The reproducible-sampling idiom for training corpora: membership is
    a pure function of the id, so (a) re-runs, retries, and speculative
    tasks agree, (b) a later run at a higher pct is a SUPERSET of the
    earlier sample (bucket < 5 ⊂ bucket < 10), which makes scaling-law
    subsample ladders consistent, and (c) no shuffle — the filter is
    map-side and combines with pushdown of any other predicate.
    """
    return df.filter(hash_bucket(F.col(id_col), buckets) < pct)


def domain_mix(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rates: dict[str, int],
    default_pct: int = 100,
    buckets: int = 100,
) -> DataFrame:
    """Weighted per-domain sampling: keep ``rates[key]`` percent of each
    domain's rows (``default_pct`` for unlisted domains), selected by
    the same deterministic md5 bucket as :func:`hash_sample`.

    Training-mixture construction — up/down-weighting sources (web vs
    books vs code) to hit a target distribution. Still map-only: the
    per-row rate is a literal-map lookup (``create_map`` → codegen
    ``GetMapValue``), the membership test the same id-hash filter, so
    the operator composes with pushdown and never shuffles. Because the
    bucket depends only on the id, per-domain samples at different
    rates remain mutually consistent (a row kept at 20% is kept at any
    higher rate), which keeps mixture re-weighting MONOTONE: raising
    one domain's rate only ADDS rows, so ablation ladders share
    documents instead of resampling the corpus.
    """
    mapping = F.create_map(
        *[F.lit(x) for k in sorted(rates) for x in (k, int(rates[k]))]
    )
    rate = F.coalesce(mapping[F.col(key_col)], F.lit(int(default_pct)))
    return df.filter(hash_bucket(F.col(id_col), buckets) < rate)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    order_col: str | list[str],
    keep_ties: bool = False,
) -> DataFrame:
    """Keep at most ``n`` rows per ``key_col``, lowest ``order_col`` first.

    Domain/source capping — bounding any one source's share of the
    corpus. One shuffle on the key; ``row_number`` (not ``rank``) gives
    the exact-n contract. At 100 TB the win over sort-based take-n is
    that AQE splits skewed keys' sort spill, and rows beyond n never
    leave the sort — no second pass. Heavy-hitter sources (the reason
    capping exists) are exactly the skewed keys, so AQE skew handling
    is load-bearing here, not incidental.

    Determinism contract (ADVICE r3): the combined ``order_col``
    columns must be UNIQUE per key — ``row_number`` breaks ties by
    partition-internal order, which is not stable across runs or
    engines. Pass a list ending in a unique id (e.g.
    ``["quality", "doc_id"]``) when the primary order column can tie.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    fn = F.rank if keep_ties else F.row_number
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    rn = _temp_name(df, "_rn")
    return df.withColumn(rn, fn().over(w)).filter(F.col(rn) <= n).drop(rn)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    part_col: str,
    order_col: str,
) -> DataFrame:
    """Assign each row a ``bin_id`` so consecutive rows (by ``order_col``
    within ``part_col``) accumulate ≈``budget`` tokens per bin.

    Sequence packing for training: concatenate documents into
    fixed-token-budget examples. Exact first-fit packing is inherently
    sequential; the scalable deterministic relaxation is CUMULATIVE
    packing — bin = floor(exclusive-prefix-sum / budget) — which needs
    only one window pass (one shuffle on ``part_col``) and gives bins
    that overflow by at most one document. Oracle-expressible because
    the prefix sum is order-deterministic.

    A document longer than ``budget`` still lands in exactly one bin
    (its own, usually), mirroring the "truncate/split later" stance of
    real packers — composing with :func:`chunk_tokens` upstream bounds
    document length so overflow is bounded too.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    # Exact integer floor-division (`div`), not float `/` + floor: a
    # per-partition cumulative token sum beyond 2^53 would lose integer
    # precision in a double and could floor to the wrong bin (ADVICE
    # r3). Both operands are integral and non-negative, so Spark `div`
    # (truncating) == floor == DuckDB `//` in the oracle.
    prefix = _temp_name(df, "_prefix")
    return df.withColumn(prefix, (cum - F.col(token_col)).cast("long")).withColumn(
        "bin_id", F.expr(f"`{prefix}` div {int(budget)}")
    ).drop(prefix)


def _word_gram_rows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(_id, _gram) — one row per word n-gram OCCURRENCE (not distinct).

    Same codegen construction as the Jaccard inverted index
    (operators/dedup.py): explode positions, slice + array_join +
    xxhash64 — a transform() lambda would fall back to interpreted
    eval. Grams travel as 8-byte hashes; distinct-counts and joins on
    them are hash-collision-exact at any realistic corpus (a collision
    can only merge two grams — same stance as ngram_jaccard_pairs).
    Docs with < n tokens produce no rows (empty positions branch).
    """
    from medical_examination_data_etl_system_spark.operators.text_analysis import normalized_text

    staged = df.select(
        F.col(id_col).alias("_id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    )
    count = F.greatest(F.size("_toks") - (n - 1), F.lit(0))
    positions = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return staged.select("_id", "_toks", F.explode(positions).alias("_pos")).select(
        "_id",
        F.xxhash64(F.array_join(F.slice(F.col("_toks"), F.col("_pos"), n), " ")).alias(
            "_gram"
        ),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Drop every document sharing ANY word ``n``-gram with the
    benchmark corpus — test-set decontamination, the curation step that
    keeps eval benchmarks out of training data.

    Plan shape: the benchmark's distinct gram set BROADCASTS (eval
    benchmarks are a few MB of grams against a 100 TB corpus), so the
    corpus side is one map-only gram explode + broadcast semi-join —
    the corpus never shuffles. The distinct-hit aggregation and the
    anti-join shuffle only the contaminated ids (≪ corpus). If the
    benchmark ever outgrows the broadcast threshold, drop the
    ``broadcast()`` hint and the same plan degrades to a shuffle
    semi-join — semantics unchanged.

    ``n`` trades precision for recall: standard pipelines use 8-13-word
    grams (an 8-gram collision between independent texts is vanishingly
    rare, so any shared gram is evidence of contamination).
    """
    doc_grams = _word_gram_rows(docs, text_col, id_col, n)
    bench_grams = (
        _word_gram_rows(benchmark, text_col, id_col, n).select("_gram").distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_gram")
        .select("_id")
        .distinct()
        .withColumnRenamed("_id", id_col)
    )
    return docs.join(hits, id_col, "left_anti")


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram repetition: (id, n_grams, n_distinct,
    rep_ratio = 1 − distinct/total) — the Gopher-style quality signal
    flagging boilerplate/spam (high duplicate-gram fraction).

    One shuffle (the per-doc aggregation); gram building is map-only
    codegen. Documents with < n tokens emit no row — repetition is
    undefined on an empty gram set, and the absence composes with a
    left join + null-handling at the caller.
    """
    return (
        _word_gram_rows(docs, text_col, id_col, n)
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.countDistinct("_gram").alias("n_distinct"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_distinct",
            F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_grams"), 4).alias(
                "rep_ratio"
            ),
        )
    )


# RE2-and-Java-compatible patterns (no lookaround, no backrefs): the
# oracle runs them in DuckDB (RE2), the engine in the JVM (java.util.regex).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"


def redact_pii(col: Column) -> Column:
    """Mask emails then phone numbers with typed placeholder tokens.

    Pure per-row ``regexp_replace`` chain: map-only, codegen, no UDF.
    The two-pass order matters — email first so digit runs inside a
    masked email can't be re-matched as phones.
    """
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in ``col`` — audit columns for the
    redaction pass."""
    return (
        F.regexp_count(col, F.lit(EMAIL_RE)).cast("long"),
        F.regexp_count(col, F.lit(PHONE_RE)).cast("long"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    chunk: int = 32,
    step: int = 24,
) -> DataFrame:
    """Explode each document into overlapping ``chunk``-token windows
    starting every ``step`` tokens (overlap = chunk - step).

    Context-window chunking for embedding/RAG pipelines. Map-side
    1→N fan-out via ``posexplode`` over a generated start-offset array —
    no shuffle, no Python; the token array is built once per row and
    shared by every chunk expression. Empty/whitespace-only documents
    produce zero chunks (guarded ``sequence`` with explicit positive
    step — Spark's default step is -1 when start > stop, ADVICE r2).

    Returns ``id_cols`` + (chunk_no, n_chunk_tokens, chunk_text).
    """
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    # starts: 0, step, 2*step, ... ; last start ≤ max(n - chunk, 0) padded
    # up so a final partial window is emitted iff it contains new tokens.
    n_starts = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((F.greatest(n - F.lit(chunk), F.lit(0)) + F.lit(step) - 1) / F.lit(step)) + 1
    )
    starts = F.when(
        n_starts > 0,
        F.sequence(F.lit(0), ((n_starts - 1) * F.lit(step)).cast("int"), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    tk, nn, start = (_temp_name(df, b) for b in ("_tk", "_n", "_start"))
    out = df.select(
        *id_cols,
        toks.alias(tk),
        n.alias(nn),
        F.posexplode(starts).alias("chunk_no", start),
    )
    piece = F.slice(F.col(tk), F.col(start) + 1, chunk)
    return out.select(
        *id_cols,
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.least(F.lit(chunk), F.col(nn) - F.col(start)).cast("long").alias(
            "n_chunk_tokens"
        ),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def weighted_sample_per_key(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Reproducible weighted sampling WITHOUT replacement, ``k`` rows
    per ``key_col`` group (Efraimidis–Spirakis A-Res): each row draws
    u = md5-uniform(id) ∈ [0,1) and ranks by the exponential key
    −ln(u)/w — the top-k per group is a weight-proportional sample.

    Deterministic and engine-independent like ``hash_sample``: u comes
    from the first 13 hex chars of md5(id) (52 exact mantissa bits /
    2⁵²), so re-runs, retries, and the DuckDB oracle draw the SAME
    sample. One row_number window per group — no shuffle beyond the
    group key, no RNG state, no driver involvement; the idiom for
    quality-weighted corpus subsampling at 100 TB.
    """
    from pyspark.sql import Window

    rn = _temp_name(df, "_wrs_rn")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(1 << 52))
    )
    key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(key_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= k)
        .withColumnRenamed(rn, "sample_rank")
    )


def bigram_coherence(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document fluency signal from a corpus-trained bigram model:
    for every bigram occurrence (w1, w2), the MLE conditional estimate
    P(w2|w1) = C(w1 w2) / C(w1 ·) — C counting bigram INSTANCES corpus-
    wide — scored in parts-per-million INTEGER arithmetic
    (``(1e6·C_bg) div C_prefix``), so per-doc sums are exact BIGINTs
    with no float-summation order anywhere (the discipline that keeps
    the oracle hash-green). Output: (id, n_bigrams, score_sum,
    coherence_ppm = score_sum div n_bigrams); docs with < 2 tokens emit
    no row (undefined, same absence-composes stance as repetition_stats).

    Plan: gram building is the shared map-only codegen construction
    (hashed 8-byte grams — collision-exact); the two corpus-wide counts
    are ``count(*) over (partition by hash)`` windows — each one
    Exchange on a vocabulary-cardinality key, no join back (the count
    rides the same partitioning the window created); then one per-doc
    aggregation. Three shuffles total, all on high-cardinality keys; at
    100 TB the gram stream is ~|tokens| rows of (long, long, long) —
    the same volume the tf-idf and entropy kernels already move.
    """
    grams = _word_gram_rows2(docs, text_col, id_col)
    w_bg = Window.partitionBy("_gram")
    w_pre = Window.partitionBy("_prefix")
    scored = (
        grams.select(
            "_id",
            F.count(F.lit(1)).over(w_bg).alias("_c_bg"),
            F.count(F.lit(1)).over(w_pre).alias("_c_pre"),
        )
        .select("_id", F.expr("(1000000 * _c_bg) div _c_pre").alias("score_ppm"))
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("score_ppm").alias("score_sum"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_bigrams",
            "score_sum",
            F.expr("score_sum div n_bigrams").alias("coherence_ppm"),
        )
    )


def _word_gram_rows2(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(_id, _gram, _prefix) — bigram occurrences with the leading
    unigram alongside, both as xxhash64 longs (same construction and
    collision stance as ``_word_gram_rows``)."""
    from medical_examination_data_etl_system_spark.operators.text_analysis import normalized_text

    staged = df.select(
        F.col(id_col).alias("_id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("_toks"),
    )
    count = F.greatest(F.size("_toks") - 1, F.lit(0))
    positions = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return staged.select("_id", "_toks", F.explode(positions).alias("_pos")).select(
        "_id",
        F.xxhash64(F.array_join(F.slice(F.col("_toks"), F.col("_pos"), 2), " ")).alias("_gram"),
        F.xxhash64(F.array_join(F.slice(F.col("_toks"), F.col("_pos"), 1), " ")).alias("_prefix"),
    )


def blocklist_matches(text: Column, terms: list[str]) -> Column:
    """Sorted array of blocklist terms present in ``text`` (distinct
    whitespace tokens, case-folded) — the safety/blocklist filter every
    LLM-corpus curation pass runs before training. Map-only codegen
    (split → array_distinct → array_intersect against a literal array);
    the term list is a plan literal, so at 100 TB this is a pure scan
    stage with zero shuffle and the filter predicate pushes into the
    same stage as the read."""
    toks = F.array_distinct(F.split(F.lower(F.trim(text)), r"\s+"))
    return F.sort_array(F.array_intersect(toks, F.array(*[F.lit(t) for t in terms])))
