"""Dedup semantics: LSH/SimHash validated against exact baselines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_spark.catalog import load_table
from cdc_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash,
    simhash_pairs,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    rows = {r.keep_id: r.n_copies for r in exact_dedup(df, "text", "doc_id").collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_signature_shape_and_determinism(spark, docs):
    sigs = minhash_signature(docs, "text", "doc_id", num_hashes=32)
    row = sigs.where(F.col("doc_id") == 0).first()
    assert len(row.sig) == 32
    # deterministic across runs
    row2 = minhash_signature(docs, "text", "doc_id", num_hashes=32).where(
        F.col("doc_id") == 0
    ).first()
    assert row.sig == row2.sig


def test_identical_docs_have_identical_signatures(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.sig for r in
            minhash_signature(df, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]


def test_lsh_recall_against_exact_jaccard(spark, docs):
    """LSH candidates must cover the exact near-dup pairs on this
    corpus (32 hashes, 8x4 banding, j≈0.9+ pairs ⇒ expected recall ~1)."""
    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            docs, "text", "doc_id", threshold=0.8
        ).collect()
    }
    assert exact, "corpus should contain near-dup pairs"
    sigs = minhash_signature(docs, "text", "doc_id", num_hashes=32)
    cands = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id").collect()
    }
    missed = exact - cands
    assert not missed, f"LSH missed near-dup pairs: {missed}"


def test_lsh_prunes_most_pairs(spark, docs):
    sigs = minhash_signature(docs, "text", "doc_id", num_hashes=32)
    n_cand = lsh_candidate_pairs(sigs, "doc_id").count()
    n_docs = docs.count()
    all_pairs = n_docs * (n_docs - 1) // 2
    assert n_cand < all_pairs * 0.05, (
        f"LSH should prune >95% of {all_pairs} pairs, got {n_cand}"
    )


def test_simhash_pairs_are_true_near_dups(spark, docs):
    """Every Hamming<=3 simhash pair must be a genuine near-dup
    (jaccard >= 0.5) — precision check."""
    fps = simhash(docs, "text", "doc_id")
    sh_pairs = {
        (r.id_a, r.id_b) for r in simhash_pairs(fps, "doc_id").collect()
    }
    assert sh_pairs, "expected some simhash near-dup pairs"
    loose = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5
        ).collect()
    }
    false_pos = sh_pairs - loose
    assert not false_pos, f"simhash false positives: {false_pos}"


def test_jaccard_with_candidates_matches_unrestricted(spark, docs):
    """Candidate-restricted verification returns exactly the candidate
    ∩ exact set (no extra, no dropped)."""
    sigs = minhash_signature(docs, "text", "doc_id", num_hashes=32)
    cands = lsh_candidate_pairs(sigs, "doc_id")
    restricted = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(
            docs, "text", "doc_id", threshold=0.8, candidates=cands
        ).collect()
    }
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(
            docs, "text", "doc_id", threshold=0.8
        ).collect()
    }
    assert restricted <= full
    # with recall-1 banding on this corpus they are equal
    assert restricted == full


def test_common_ngram_exposure_synthetic(spark):
    from cdc_spark.operators.dedup import common_ngram_doc_stats

    boiler = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [
            (1, boiler + " alpha beta"),
            (2, boiler + " gamma delta"),
            (3, boiler + " epsilon zeta"),
            (4, "totally unrelated words here only once ever"),
            (5, "tiny"),  # < k tokens: no shingles, absent from output
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in common_ngram_doc_stats(
            df, "text", "doc_id", k_shingle=5, min_docs=3
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # the 5-gram "the quick brown fox jumps" occurs in docs 1-3
    for d in (1, 2, 3):
        assert out[d].n_common == 1
        assert out[d].n_shingles == 3
        assert abs(out[d].dup_fraction - 0.3333) < 1e-4
        assert not out[d].flagged
    assert out[4].n_common == 0 and not out[4].flagged


def test_common_ngram_exposure_flagging(spark):
    from cdc_spark.operators.dedup import common_ngram_doc_stats

    # doc 4 is pure boilerplate: every one of its shingles is common
    shared = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (1, shared + " one"),
            (2, shared + " two"),
            (3, shared + " three"),
            (4, shared),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in common_ngram_doc_stats(
            df, "text", "doc_id", k_shingle=5, min_docs=3, flag_fraction=0.9
        ).collect()
    }
    assert out[4].dup_fraction == 1.0 and out[4].flagged
    assert not out[1].flagged


def test_common_ngram_portable_matches_default(spark):
    from cdc_spark.operators.dedup import common_ngram_doc_stats

    docs = load_table(spark, SF, "documents").limit(200)
    a = common_ngram_doc_stats(
        docs, "text", "doc_id", k_shingle=5, min_docs=3, portable=False
    )
    b = common_ngram_doc_stats(
        docs, "text", "doc_id", k_shingle=5, min_docs=3, portable=True
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_aligned_duplicate_spans_synthetic(spark):
    from cdc_spark.operators.dedup import aligned_duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),
            (2, "x y a b c d e f g z w q"),  # shares 'a b c d e f g' (7)
            (3, "p q r s t u v w n m o k"),
        ],
        "doc_id long, text string",
    )
    out = aligned_duplicate_spans(
        df, "text", "doc_id", k_shingle=3, min_span_tokens=5
    ).collect()
    assert [(r.id_a, r.id_b, r.longest_span_tokens) for r in out] == [
        (1, 2, 7)
    ]
    # threshold above the span: pair drops out
    assert (
        aligned_duplicate_spans(
            df, "text", "doc_id", k_shingle=3, min_span_tokens=8
        ).count()
        == 0
    )


def test_aligned_spans_repeated_shingle_alignment(spark):
    from cdc_spark.operators.dedup import aligned_duplicate_spans

    # the repeated 'a b a b' motif creates multiple diagonals; the
    # longest single alignment is the full 6-token overlap
    df = spark.createDataFrame(
        [(1, "a b a b a b c d"), (2, "a b a b a b x y")],
        "doc_id long, text string",
    )
    out = aligned_duplicate_spans(
        df, "text", "doc_id", k_shingle=3, min_span_tokens=4
    ).collect()
    assert len(out) == 1 and out[0].longest_span_tokens == 6


def test_containment_pairs_embedded_doc(spark):
    from cdc_spark.operators.dedup import containment_pairs

    small = "alpha beta gamma delta epsilon zeta"
    host = "intro words here " + small + " trailing content words"
    other = "nothing shared with the others at all whatsoever"
    df = spark.createDataFrame(
        [(1, small), (2, host), (3, other)], "doc_id long, text string"
    )
    rows = containment_pairs(
        df, "text", "doc_id", k_shingle=3, threshold=0.9
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # the small doc's shingles are all inside the host: score 1.0,
    # and the smaller doc is named as the one to drop
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment == 1.0
    assert r.contained == 1


def test_lsh_cross_candidates_only_cross_pairs(spark):
    from cdc_spark.operators.dedup import (
        lsh_cross_candidates,
        minhash_signature,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (1, base + "alpha"),       # set A
        (2, base + "alpha beta"),  # set A — near-dup of 1 (intra-A)
        (10, base + "alpha"),      # set B — near-dup of 1 and 2
        (11, "completely different text with no shared shingles at all"
             " here nothing matches anything else whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signature(df, "text", "doc_id", k_shingle=3)
    a = sigs.where(F.col("doc_id") < 10)
    b = sigs.where(F.col("doc_id") >= 10)
    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_cross_candidates(a, b, "doc_id").collect()
    }
    # cross-set near-dups found; the intra-A pair (1,2) must NOT appear
    assert (1, 10) in pairs and (2, 10) in pairs
    assert all(ia < 10 <= ib for ia, ib in pairs)
    assert not any(ib == 11 for _, ib in pairs)
