"""Corpus-cleaning operators: C4 line dedup, PII scrub, decontamination.

The gate verifies these against DuckDB oracles on the sf corpus; here we
pin the operator semantics on hand-built corpora (first-occurrence rule,
redaction counts, hot-shingle cap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2gtfs_spark.operators import dedup as DD
from osm2gtfs_spark.operators import text as TXT


def test_line_dedup_first_occurrence_wins(spark):
    rows = [
        (1, "alpha\nshared\nbeta"),
        (2, "shared\ngamma"),      # 'shared' already seen in doc 1
        (3, "alpha\nalpha"),       # intra-doc dup: only idx 0 survives...
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in TXT.line_dedup(df).collect()}
    assert (got[1].n_lines, got[1].n_kept) == (3, 3)
    assert got[1].text_deduped == "alpha\nshared\nbeta"
    assert (got[2].n_lines, got[2].n_kept) == (2, 1)
    assert got[2].text_deduped == "gamma"
    # 'alpha' was first seen in doc 1 (lower doc_id), so doc 3 keeps none
    assert (got[3].n_lines, got[3].n_kept) == (2, 0)
    assert got[3].text_deduped == ""


def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        (1, "mail me at a.b+c@ex-ample.org or root@h.io thanks"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "clean text with no pii at all"),
        (4, "mixed x@y.com on 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in TXT.pii_scrub(df).collect()}
    assert (got[1].n_emails, got[1].n_ips) == (2, 0)
    assert got[1].text_clean == "mail me at <EMAIL> or <EMAIL> thanks"
    assert (got[2].n_emails, got[2].n_ips) == (0, 2)
    assert got[2].text_clean == "server <IP> and <IP> up"
    assert (got[3].n_emails, got[3].n_ips) == (0, 0)
    assert got[4].text_clean == "mixed <EMAIL> on <IP>"


def test_decontaminate_overlap_and_cap(spark):
    bench = spark.createDataFrame(
        [(0, "secret eval question one"), (1, "another hidden answer two"),
         (2, "common common common common")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (100, "contains secret eval question one verbatim"),
            (101, "totally unrelated text here now"),
            (102, "common common common common padding"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_overlap for r in DD.decontaminate(corpus, bench, n=3).collect()}
    assert got[100] >= 2           # leaked 3-grams detected
    assert 101 not in got          # clean doc absent from output
    assert 102 in got
    # cap at 0 benchmark docs -> every shingle is "hot" -> nothing flagged
    none = DD.decontaminate(corpus, bench, n=3, max_shingle_docs=0).count()
    assert none == 0


def test_line_dedup_corpus_invariants(spark):
    """Property: across the deduped corpus every distinct line appears
    exactly once, each doc's surviving lines are a subsequence of its
    original lines, and per-doc counts are consistent."""
    import random

    rng = random.Random(11)
    vocab = [f"line{j}" for j in range(12)]  # small vocab → many dups
    rows = [
        (i, "\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in TXT.line_dedup(df).collect()}

    all_kept: list[str] = []
    for doc_id, text in rows:
        orig = text.split("\n")
        r = out[doc_id]
        assert r.n_lines == len(orig)
        kept = r.text_deduped.split("\n") if r.text_deduped else []
        assert r.n_kept == len(kept)
        # subsequence of original order
        it = iter(orig)
        assert all(any(k == o for o in it) for k in kept), (doc_id, orig, kept)
        all_kept.extend(kept)
    # exactly-once corpus-wide, and nothing lost
    assert sorted(set(all_kept)) == sorted(all_kept)
    used = {line for _, text in rows for line in text.split("\n")}
    assert set(all_kept) == used


def test_pii_scrub_staged_counts(spark):
    """ADVICE r3: counts are replacements made — an IPv4 embedded in an
    email address is redacted as part of <EMAIL> and NOT counted as an
    IP; a standalone IP still is."""
    from osm2gtfs_spark.operators.text import pii_scrub

    rows = [
        (1, "mail 10.1.2.3@example.com now"),        # IP only inside the email
        (2, "server 10.1.2.3 and bob@x.org"),        # both standalone
        (3, "no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (got[1].n_emails, got[1].n_ips) == (1, 0)
    assert "<EMAIL>" in got[1].text_clean and "<IP>" not in got[1].text_clean
    assert (got[2].n_emails, got[2].n_ips) == (1, 1)
    assert (got[3].n_emails, got[3].n_ips) == (0, 0)


def test_bigram_fluency_known_counts(spark):
    from osm2gtfs_spark.operators.text import bigram_fluency

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),      # bigrams: "a b" x2, "b a" x1
            (2, "a b"),          # "a b" x1  → corpus "a b" count 3
            (3, "zz"),           # no bigram → absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_fluency(docs).collect()}
    assert set(out) == {1, 2}
    # corpus counts: "a b" -> 3 (bits 2), "b a" -> 1 (bits 1)
    assert out[1].score_bits == 2 + 1 + 2 and out[1].n_bigrams == 3
    assert out[2].score_bits == 2 and out[2].n_bigrams == 1
    assert out[1].avg_millibits == (5 * 1000) // 3
