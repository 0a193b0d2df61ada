"""Corpus-curation operators beyond dedup: benchmark decontamination,
repetition-based quality stats (Gopher-style), PII redaction, and
domain-weighted mixture sampling.

All hot paths are pure Catalyst expressions or equi-joins — no Python
UDFs. Scale notes inline per function; the common theme is that the
corpus side is touched exactly once per operator and every join
against it is either broadcast (eval sets, weight tables) or
collision-bounded (matched n-grams only).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_toolkit_spark.llm.text import shingles_from_words, words

__all__ = [
    "decontaminate",
    "decontaminate_indexed",
    "with_repetition_stats",
    "with_rarity_scores",
    "with_boilerplate_stats",
    "redact_pii",
    "mixture_sample",
    "curate_corpus",
    "PII_PATTERNS",
]


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with an
    evaluation/benchmark set (train-test contamination check).

    Returns one row per corpus document: ``(id_col,
    eval_ngram_hits, contaminated)`` where ``eval_ngram_hits`` counts
    DISTINCT eval n-grams found in the document.

    Scale: the eval set is benchmark-sized (thousands of docs), so its
    distinct n-gram table is broadcast — the 100 TB corpus is scanned
    once, never shuffled on text. Only MATCHED (corpus gram ∩ eval
    gram) rows reach the aggregation, so the groupBy is bounded by
    collision count, not corpus size. NULL/short texts produce zero
    grams and survive with ``eval_ngram_hits = 0``.
    """

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), words(text_col).alias("__w")
        ).select(
            F.col(id_col),
            F.explode(shingles_from_words("__w", n)).alias("gram"),
        )

    eval_grams = grams(eval_df).select("gram").distinct()
    hits = (
        grams(corpus)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("eval_ngram_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("eval_ngram_hits", F.lit(0)).alias("eval_ngram_hits"),
            (F.coalesce("eval_ngram_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_indexed(
    index,
    eval_df: DataFrame,
    eval_text_col: str = "text",
    n: int = 5,
    matched_only: bool = False,
    slop: int = 0,
    at: dict | None = None,
) -> DataFrame:
    """:func:`decontaminate` served from a
    :class:`~datalake_toolkit_spark.llm.search.PostingsIndex` — the
    corpus TEXT is never rescanned: each distinct eval ``n``-gram
    probes the index as a phrase (posting intersection in the probed
    term buckets, adjacency verified on the STORED position arrays),
    so the scan cost is bounded by the eval grams' buckets, not the
    corpus. The right shape when the corpus is already indexed and
    eval sets arrive repeatedly (every new benchmark re-scans 100 TB
    under the batch operator; here it reads a few hundred bucket
    directories).

    Output contract matches :func:`decontaminate` over the INDEXED
    universe: one row per indexed document — ``(doc_id,
    eval_ngram_hits, contaminated)``, zeros included (the id list
    comes from the narrow 2-column doc_stats table, the one
    corpus-sized read, text-free) — or only matched rows with
    ``matched_only=True``. Token convention is the index's
    (whitespace split, empty tokens dropped), so texts with leading/
    repeated whitespace gram slightly differently than the batch
    operator's unfiltered split.

    ``slop > 0`` relaxes each eval gram from exact adjacency to
    ORDERED PROXIMITY (at most ``slop`` extra tokens interleaved
    across the gram, the Lucene sloppy-phrase contract, verified on
    the stored positions) — catching near-verbatim contamination
    where small edits pushed the benchmark text off the exact n-gram
    lattice. ``at`` pins an index :meth:`snapshot` so a
    decontamination report is reproducible against one corpus
    state."""
    from datalake_toolkit_spark.llm.search import (
        _index_phrase_verified,
        _tokens,
    )

    grams = (
        eval_df.select(_tokens(eval_text_col).alias("__w"))
        .select(F.explode(shingles_from_words("__w", n)).alias("gram"))
        .distinct()
    )
    queries = grams.select(
        F.col("gram").alias("query_id"), F.col("gram").alias("query_text")
    )
    verified = _index_phrase_verified(
        index, queries, "query_id", "query_text", at=at, slop=slop
    )
    hits = verified.groupBy("doc_id").agg(
        F.count_distinct("query_id").alias("eval_ngram_hits")
    )
    if matched_only:
        return hits.select(
            "doc_id", "eval_ngram_hits", F.lit(True).alias("contaminated")
        )
    ids = index.doc_stats_t.read(
        version=index._pin(at, "doc_stats") if at is not None else None
    ).select("doc_id")
    return ids.join(hits, ["doc_id"], "left").select(
        "doc_id",
        F.coalesce("eval_ngram_hits", F.lit(0)).alias("eval_ngram_hits"),
        (F.coalesce("eval_ngram_hits", F.lit(0)) > 0).alias("contaminated"),
    )


def with_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_bigram_threshold: float = 0.18,
    dup_trigram_threshold: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_bigram_char_frac``: max over word-2-grams of
      (count * gram chars) / total 2-gram char mass — high when one
      phrase dominates;
    - ``dup_trigram_char_frac``: char mass of word-3-grams occurring
      more than once / total 3-gram char mass — high for boilerplate
      and looped text;
    - ``is_repetitive``: either fraction above its threshold.

    Both fractions are defined over integer char masses (count × gram
    length) so they are order-independent and oracle-exact; the
    max-of-products formulation avoids an argmax tie-break entirely.

    Scale: one explode of (n, gram) rows and ONE shuffle on
    (id, n, gram) — partial aggregation (map-side combine) collapses
    within-document repeats before the exchange, so shuffle volume is
    bounded by distinct grams per doc. Output is one row per input
    row; NULL/short texts get 0.0 fractions.
    """
    wdf = df.select(F.col(id_col), words(text_col).alias("__w"))
    pairs = wdf.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(
                    shingles_from_words("__w", 2),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
                ),
                F.transform(
                    shingles_from_words("__w", 3),
                    lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram")),
                ),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.n").alias("n"), F.col("p.gram").alias("gram"))
    counted = pairs.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    mass = F.col("cnt") * F.length("gram")
    per_doc = counted.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == 2, mass).otherwise(F.lit(0))).alias("_top2"),
        F.sum(F.when(F.col("n") == 2, mass).otherwise(F.lit(0))).alias("_tot2"),
        F.sum(
            F.when((F.col("n") == 3) & (F.col("cnt") > 1), mass).otherwise(F.lit(0))
        ).alias("_dup3"),
        F.sum(F.when(F.col("n") == 3, mass).otherwise(F.lit(0))).alias("_tot3"),
    )
    top_frac = F.round(
        F.col("_top2").cast("double") / F.greatest(F.col("_tot2"), F.lit(1)), 4
    )
    dup_frac = F.round(
        F.col("_dup3").cast("double") / F.greatest(F.col("_tot3"), F.lit(1)), 4
    )
    stats = per_doc.select(
        F.col(id_col),
        top_frac.alias("top_bigram_char_frac"),
        dup_frac.alias("dup_trigram_char_frac"),
    )
    return (
        df.select(id_col)
        .join(stats, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("top_bigram_char_frac", F.lit(0.0)).alias(
                "top_bigram_char_frac"
            ),
            F.coalesce("dup_trigram_char_frac", F.lit(0.0)).alias(
                "dup_trigram_char_frac"
            ),
            (
                (F.coalesce("top_bigram_char_frac", F.lit(0.0))
                 > F.lit(top_bigram_threshold))
                | (F.coalesce("dup_trigram_char_frac", F.lit(0.0))
                   > F.lit(dup_trigram_threshold))
            ).alias("is_repetitive"),
        )
    )


# Ordered: EMAIL before URL is irrelevant here (disjoint shapes), but the
# tuple order IS the replacement order and both engines apply it
# identically. Patterns restricted to the Java∩RE2 common dialect —
# character classes, bounded repeats, \b — so the DuckDB oracle runs the
# very same strings.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("url", r"https?://[^\s]+", "[URL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,2} \d{3}-\d{4}", "[PHONE]"),
    # 16-digit card shapes (4-4-4-4); Luhn validation is out of regex
    # reach — a redactor over-redacts rather than leaks
    ("cc", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "[CC]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Replace emails / URLs / IPv4s / phone numbers with typed
    placeholder tokens and append per-category match counts
    (``n_email``, ``n_url``, ``n_ip``, ``n_phone``).

    Pure ``regexp_replace`` / ``regexp_extract_all`` projection —
    narrow, codegen'd, zero shuffles; counts are taken against the
    text state each pattern actually sees (replacements apply in
    ``PII_PATTERNS`` order). NULL text passes through as NULL with
    NULL counts, mirroring SQL semantics.
    """
    cur = F.col(text_col)
    out = df
    for name, pat, tok in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        )
        cur = F.regexp_replace(cur, pat, tok)
    return out.withColumn(out_col, cur)


def mixture_sample(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    seed: str = "mix",
) -> DataFrame:
    """Domain-weighted mixture sampling: each row appears
    ``floor(w)`` times plus one more with probability ``frac(w)``,
    where ``w`` is its source's target weight — the standard
    up/down-sampling step that turns raw domain counts into a
    training mixture (w < 1 downsamples, w > 1 upsamples / extra
    epochs).

    Deterministic: the fractional coin is the first 8 md5 hex digits
    of ``seed|source|id`` over 16^8 — reproducible across engines and
    runs, and independent per (source, id). Pick weights whose
    fractional parts are binary-exact (x.0 / x.25 / x.5 / x.75) so
    the ``frac < w - floor(w)`` comparison can never straddle an ULP.

    Scale: pure projection + explode, no shuffle; the weight table is
    a literal when-chain (domains are few). Output carries ``copy``
    (1-based replica index) so downstream global shuffles can keep
    replicas apart.
    """
    w = F.lit(float(default_weight))
    for src, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(w)
    frac = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(seed), F.col(source_col), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(16**8))
    )
    repeats = (
        F.floor(w).cast("long")
        + F.when(frac < (w - F.floor(w)), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        df.withColumn("_rep", repeats)
        .where(F.col("_rep") >= 1)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("_rep"))))
        .drop("_rep")
    )


def with_rarity_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained rarity scoring — the integer-exact cousin of an
    n-gram LM perplexity filter (CCNet-style): build the corpus vocab,
    rank words by descending frequency, and score each document by the
    mean and max rank of its words (repeats counted). High mean rank =
    rare-word-heavy (OCR noise, code dumps, gibberish); low = stopword
    soup. Appends ``n_words_scored``, ``mean_word_rank``,
    ``max_word_rank``.

    Integer-exact on purpose: log-probabilities differ at the last ULP
    between libm implementations, so a true LM perplexity cannot be
    hash-verified cross-engine — ranks are integers, their mean is one
    exact division, and the whole thing oracles bit-for-bit.

    Scale: vocab ranking uses the range-partitioned consecutive-id
    operator (no single-partition global window over the vocabulary);
    the token->vocab join shuffles on the word key and is bounded by
    corpus token count. NULL/empty texts survive with zero scores.
    """
    from datalake_toolkit_spark.operators import with_consecutive_id

    tokens = df.select(
        F.col(id_col), F.explode(words(text_col)).alias("word")
    )
    vocab = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = with_consecutive_id(
        vocab.withColumn("_negcnt", -F.col("cnt")),
        ["_negcnt", "word"],
        id_col="rank",
        start=1,
    ).select("word", "rank")
    # shuffle_hash: the ranked vocab scales with the corpus (never
    # assume it broadcasts)
    scored = (
        tokens.join(ranked.hint("shuffle_hash"), "word")
        .groupBy(id_col)
        .agg(
            F.sum("rank").alias("_sr"),
            F.count(F.lit(1)).alias("_n"),
            F.max("rank").alias("_mx"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_words_scored"),
            F.coalesce(
                F.round(F.col("_sr").cast("double") / F.col("_n"), 4), F.lit(0.0)
            ).alias("mean_word_rank"),
            F.coalesce("_mx", F.lit(0)).cast("long").alias("max_word_rank"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    mixture_weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    window_tokens: int = 2048,
    min_quality: float = 0.5,
    ngram_n: int = 5,
) -> DataFrame:
    """The whole pretraining-data pipeline as ONE composed lazy plan:

    1. exact dedup (min-id survivor per distinct text);
    2. quality gate: heuristic quality_score >= ``min_quality`` AND
       not flagged repetitive (Gopher fractions);
    3. decontamination against ``eval_df`` (drop any doc sharing a
       word ``ngram_n``-gram with the benchmark set);
    4. domain mixture (``mixture_weights`` per source, 1.0 default);
    5. concat-and-chunk packing onto ``window_tokens`` training
       windows under (id, copy) order.

    Returns one row per surviving (doc, copy) with the text, token
    count, and window layout columns — the frame a trainer's loader
    writes out, sharded by ``window_start``.

    Everything stays declarative: each stage is the already-verified
    operator, so Catalyst sees one plan (filters push through the
    dedup semi-join; nothing materializes between stages) and the
    per-stage oracles transfer to the composition.
    """
    from datalake_toolkit_spark.llm.dedup import exact_dedup
    from datalake_toolkit_spark.llm.sample import pack_training_windows
    from datalake_toolkit_spark.llm.text import with_text_stats

    out = exact_dedup(docs, id_col, text_col=text_col)
    out = with_text_stats(out, text_col).where(F.col("quality_score") >= min_quality)
    rep = with_repetition_stats(out, id_col, text_col).where(~F.col("is_repetitive"))
    out = out.join(rep.select(id_col), [id_col], "leftsemi")
    if eval_df is not None:
        clean = decontaminate(out, eval_df, id_col, text_col, n=ngram_n).where(
            ~F.col("contaminated")
        )
        out = out.join(clean.select(id_col), [id_col], "leftsemi")
    if mixture_weights:
        out = mixture_sample(
            out, mixture_weights, source_col=source_col, id_col=id_col
        )
    else:
        out = out.withColumn("copy", F.lit(1))
    return pack_training_windows(
        out.withColumn("n_tok", F.col("n_tokens").cast("long")),
        "n_tok",
        [id_col, "copy"],
        window_tokens,
    )


def with_boilerplate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate signal: an ``n``-gram is boilerplate
    when it appears in at least ``min_docs`` DISTINCT documents
    (headers, footers, license blurbs, navigation chrome — the text
    that repeats across a crawl rather than within one page). Appends
    per document:

    - ``n_grams``: its n-gram count (with repeats);
    - ``boilerplate_frac``: fraction of those occurrences whose gram
      is corpus-boilerplate (round 4, exact integer division);
    - ``is_boilerplate``: fraction > 0.5.

    Complements :func:`with_repetition_stats`, which only sees
    WITHIN-document repetition — a page whose every line appears on
    10k sibling pages looks clean to it and lights up here.

    Scale: one (gram -> distinct-doc-count) aggregation — two-level
    hash agg with map-side partials, shuffle bounded by distinct
    (doc, gram) pairs — then an equi-join of the doc grams against the
    boilerplate gram set. That set is corpus-dependent: join hash on
    the gram key (hint left to Catalyst/AQE, which broadcasts it only
    when it measures small). NULL/short texts survive with 0.0.
    """
    grams = df.select(F.col(id_col), words(text_col).alias("__w")).select(
        F.col(id_col), F.explode(shingles_from_words("__w", n)).alias("gram")
    )
    boiler = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("_docs"))
        .where(F.col("_docs") >= min_docs)
        .select("gram")
    )
    # shuffle_hash: the boilerplate gram set scales with the corpus —
    # a broadcast mis-estimate here OOMs executors at 100 TB
    tagged = grams.join(
        boiler.withColumn("_bp", F.lit(1)).hint("shuffle_hash"), ["gram"], "left"
    )
    per_doc = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.coalesce("_bp", F.lit(0))).alias("_b"),
    )
    frac = F.round(F.col("_b").cast("double") / F.col("_n"), 4)
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(frac, F.lit(0.0)).alias("boilerplate_frac"),
            (F.coalesce(frac, F.lit(0.0)) > F.lit(0.5)).alias("is_boilerplate"),
        )
    )
