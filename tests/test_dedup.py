"""Edge-case and cache-hygiene tests for the dedup operators.

The short-document cases pin the ADVICE r1 fix: ``F.sequence`` defaults
to step -1 when start > stop, so an unguarded sequence(1, 0) produced
[1, 0] and ``slice(toks, 0, n)`` aborted the whole job on any corpus
containing a 0/1-token document.
"""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel

from medical_examination_data_etl_system_spark.operators import cache
from medical_examination_data_etl_system_spark.operators.dedup import (
    minhash_near_duplicates,
    ngram_jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ngram_jaccard_survives_short_and_empty_docs(spark):
    rows = [
        (1, "one", "s"),               # single token → zero bigrams
        (2, "", "s"),                  # empty text
        (3, "   ", "s"),               # whitespace only
        (4, "alpha beta gamma delta", "s"),
        (5, "alpha beta gamma delta", "s"),  # exact dup of 4
    ]
    out = ngram_jaccard_pairs(_docs(spark, rows), threshold=0.2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs == {(4, 5): 1.0}


def test_ngram_df_cap_drops_stopword_grams(spark):
    # "of the" appears in every doc — with max_df below the corpus size
    # it must leave the index, and pairs that only shared it vanish.
    rows = [(i, f"of the word{i}", "s") for i in range(1, 6)]
    capped = ngram_jaccard_pairs(_docs(spark, rows), threshold=0.1, max_df=2).collect()
    assert capped == []
    uncapped = ngram_jaccard_pairs(_docs(spark, rows), threshold=0.1).collect()
    assert len(uncapped) == 10  # all C(5,2) pairs share "of the"


def test_cache_scope_releases_operator_persists(spark):
    docs = _docs(spark, [(i, f"the quick brown fox {i} jumps over", "s") for i in range(20)])
    with cache.cache_scope() as frames:
        # collapse_exact forced on: "auto" would skip it (unique corpus)
        # and persist one frame fewer — this test pins RELEASE, not the
        # probe decision.
        minhash_near_duplicates(docs, threshold=0.9, collapse_exact=True).collect()
        assert len(frames) == 4  # collapse window + shingle rows + distinct index + bands
        assert all(f.storageLevel != StorageLevel.NONE for f in frames)
    assert all(f.storageLevel == StorageLevel.NONE for f in frames)


def test_unscoped_persists_are_tracked_and_releasable(spark):
    docs = _docs(spark, [(i, f"a b c d e f {i}", "s") for i in range(5)])
    before = len(cache.tracked_frames())
    minhash_near_duplicates(docs, threshold=0.9, collapse_exact=True).collect()
    assert len(cache.tracked_frames()) == before + 4
    cache.release_all()
    assert cache.tracked_frames() == []


def test_minhash_collapse_exact_equivalence(spark):
    """collapse_exact=True must return byte-identical pairs to the
    direct form on a corpus with exact-dup clusters AND near-dup
    (non-identical) pairs."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(4):  # cluster of 4 exact copies
        rows.append((100 + i, base, "s"))
    rows.append((200, base + " slightly changed tail", "s"))  # near-dup of cluster
    rows.append((300, "completely different content entirely unrelated text", "s"))
    docs = _docs(spark, rows)
    fast = minhash_near_duplicates(docs, threshold=0.5).collect()
    direct = minhash_near_duplicates(docs, threshold=0.5, collapse_exact=False).collect()
    key = lambda rs: sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rs)  # noqa: E731
    assert key(fast) == key(direct)
    # sanity: the exact cluster contributes C(4,2)=6 jaccard-1.0 pairs
    ones = [r for r in fast if r["jaccard"] == 1.0]
    assert len(ones) >= 6


def test_ngram_collapse_exact_equivalence(spark):
    """Block-aware exact-collapse must match the direct inverted-index
    form, including the no-pair behavior of <n-token docs and exact
    dups split across different blocks."""
    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, base, "s1"), (2, base, "s1"), (3, base, "s1"),       # dup cluster in s1
        (4, base, "s2"),                                          # same text, other block
        (5, base + " eta", "s1"),                                 # near-dup in s1
        (6, "tok", "s1"), (7, "tok", "s1"),                       # 1-token dups: NO pair
        (8, "unrelated words entirely different here now", "s1"),
    ]
    docs = _docs(spark, rows)
    fast = ngram_jaccard_pairs(docs, threshold=0.2).collect()
    direct = ngram_jaccard_pairs(docs, threshold=0.2, collapse_exact=False).collect()
    key = lambda rs: sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rs)  # noqa: E731
    assert key(fast) == key(direct)
    pairs = {(r["id_a"], r["id_b"]) for r in fast}
    assert (1, 2) in pairs and (2, 3) in pairs      # intra-cluster
    assert (1, 4) not in pairs                       # cross-block never pairs
    assert (6, 7) not in pairs                       # sub-n-token docs never pair


def test_simhash_collapse_exact_equivalence(spark):
    from medical_examination_data_etl_system_spark.operators.dedup import simhash_near_duplicates

    base = "many common words shared across documents with small edits"
    rows = [(i, base, "s") for i in range(1, 4)]            # exact cluster
    rows += [(10, base.replace("small", "tiny"), "s")]       # near-dup
    rows += [(20, "entirely different text goes here now", "s"), (21, "", "s"), (22, "", "s")]
    docs = _docs(spark, rows)
    fast = simhash_near_duplicates(docs).collect()
    direct = simhash_near_duplicates(docs, collapse_exact=False).collect()
    key = lambda rs: sorted((r["id_a"], r["id_b"], r["hamming"]) for r in rs)  # noqa: E731
    assert key(fast) == key(direct)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in fast}
    assert pairs[(1, 2)] == 0 and pairs[(21, 22)] == 0


def test_collapse_probe_decides_by_duplication(spark):
    """_should_collapse: mostly-unique corpus → skip; duplicate-heavy
    (10x replication) → collapse."""
    from medical_examination_data_etl_system_spark.operators.dedup import _should_collapse

    unique = spark.createDataFrame(
        [(i, f"totally unique document number {i} with words {i*7}") for i in range(300)],
        ["doc_id", "text"],
    )
    assert not _should_collapse(unique, "text")
    replicated = spark.createDataFrame(
        [(i * 100 + r, f"shared text {i}") for i in range(30) for r in range(10)],
        ["doc_id", "text"],
    )
    assert _should_collapse(replicated, "text")


def test_minhash_auto_equals_forced_modes(spark):
    """collapse_exact 'auto'/True/False must emit identical pairs on
    both a unique-heavy and a duplicate-heavy corpus (the probe is a
    cost decision, never a semantic one)."""
    from medical_examination_data_etl_system_spark.operators.dedup import minhash_near_duplicates

    base = [(i, f"some base document text number {i} padded with shared words") for i in range(40)]
    dup_heavy = base + [(1000 + i, base[i % 10][1]) for i in range(60)]
    for rows in (base, dup_heavy):
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            mode: sorted(
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in minhash_near_duplicates(docs, collapse_exact=mode).collect()
            )
            for mode in ("auto", True, False)
        }
        assert out["auto"] == out[True] == out[False]


def test_ngram_pairs_match_bruteforce(spark):
    """Randomized brute-force equivalence pin for BOTH set-overlap
    metrics: reproduce all-pairs Python output on a corpus mixing doc
    lengths, blocks, stop-word-heavy texts, near-dup perturbations,
    and thresholds (incl. integer-boundary ones). Written while
    evaluating an AllPairs/PPJoin prefix-filter rewrite of
    _gram_pair_counts — the rewrite passed this test but MEASURED
    2.7× SLOWER at adversarial 100× (short ~10-60-gram docs, huge
    true answers: array-shipping verification loses to the inverted
    index's map-side-combined count aggregation), so the aggregation
    plan stayed and this pin remains as its equivalence gate."""
    import random

    from medical_examination_data_etl_system_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(30)] + ["of", "the", "and"] * 4  # heavy stop-words
    rows = []
    i = 0
    for _ in range(35):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 14))]
        rows.append((i, " ".join(toks), f"b{i % 2}")); i += 1
        if rng.random() < 0.4:  # perturbed sibling (same block)
            s = list(toks)
            for _ in range(rng.randint(1, 3)):
                p = rng.randrange(len(s))
                if rng.random() < 0.5 and len(s) > 1:
                    del s[p]
                else:
                    s[p] = rng.choice(vocab)
            rows.append((i, " ".join(s), f"b{(i - 1) % 2}")); i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def grams(text, n=2):
        toks = " ".join(text.lower().split()).split(" ")
        return {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}

    gsets = {d: grams(t) for d, t, _ in rows}
    blk = {d: b for d, _, b in rows}

    for thr in (0.2, 0.25, 0.5, 1.0):
        expect_j, expect_c = [], []
        for a in sorted(gsets):
            for b in sorted(gsets):
                if a >= b or blk[a] != blk[b] or not gsets[a] or not gsets[b]:
                    continue
                inter = len(gsets[a] & gsets[b])
                j = round(inter / (len(gsets[a]) + len(gsets[b]) - inter), 4)
                c = round(inter / min(len(gsets[a]), len(gsets[b])), 4)
                if j >= thr:
                    expect_j.append((a, b, j))
                if c >= thr:
                    expect_c.append((a, b, c))
        got_j = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(docs, threshold=thr, collapse_exact=False).collect()
        )
        got_c = sorted(
            (r["id_a"], r["id_b"], r["containment"])
            for r in ngram_containment_pairs(docs, threshold=thr, collapse_exact=False).collect()
        )
        assert got_j == sorted(expect_j), f"jaccard mismatch at t={thr}"
        assert got_c == sorted(expect_c), f"containment mismatch at t={thr}"
