"""Text analysis operators: tokenization, quality scoring, language
identification, fingerprinting.

All pure Catalyst expressions (split / regexp / higher-order array
functions) — no Python in the hot path, so these run inside
whole-stage codegen over arbitrarily many documents. Engine-neutral
determinism: every float is derived from integer counts through a
fixed expression tree, and every hash is md5 (identical hex in any
engine), so results verify bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish lexer: words | numbers | any single non-space symbol.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein"),
    "es": ("el", "la", "de", "los", "que", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "une", "que"),
}

_PUNCT_CLASS = r"[^\.,;:!\?]"


def words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles of a text column, as an array of strings.

    ``transform`` with the element index builds each window via
    ``slice``; short tails yield NULL and are filtered. Narrow op.

    PERF: if the words array is already materialized as a column,
    call :func:`shingles_from_words` on it instead — referencing the
    ``split`` expression inside the lambda makes Catalyst re-evaluate
    it per array element (O(n_words^2) per row, ~10x slower)."""
    return shingles_from_words(words(col), k)


def shingles_from_words(wcol: Column | str, k: int = 3) -> Column:
    """k-word shingles from an already-materialized words-array
    column. Keep the words array in its own projection (a plain
    attribute reference) so each lambda element reads it, not
    re-evaluates it."""
    w = F.col(wcol) if isinstance(wcol, str) else wcol
    return F.filter(
        F.transform(
            w,
            lambda x, i: F.when(
                i + F.lit(k) <= F.size(w), F.concat_ws(" ", F.slice(w, i + 1, k))
            ),
        ),
        lambda s: s.isNotNull(),
    )


def _stopword_hits(words_col: Column, stopwords: tuple[str, ...]) -> Column:
    return F.size(F.filter(words_col, lambda w: w.isin(*stopwords)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_words / n_tokens / n_punct / stopword_ratio /
    quality_score columns.

    quality_score is a fixed blend of length, punctuation, and
    stopword signals in [0, 1] — the cheap heuristic a pretraining
    pipeline uses to pre-filter before expensive model scoring."""
    df = df.withColumn("__w", words(text_col))
    w = F.col("__w")
    n_words = F.size(w)
    n_tokens = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), F.lit(0)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), _PUNCT_CLASS, ""))
    hits = _stopword_hits(w, LANG_STOPWORDS["en"])
    n_chars = F.length(F.col(text_col))
    stop_ratio = hits.cast("double") / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_words.cast("double") / F.lit(50.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_punct", n_punct)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", quality)
        .drop("__w")
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred``: argmax of per-language stopword hit
    counts, ties broken in fixed language order, 'unknown' when no
    list matches. A deterministic heuristic language-ID — the shape
    (not the quality) of a fastText-style classifier, kept
    SQL-expressible so the oracle can verify it.

    Three stacked projections — words array, then the four score
    columns, then the argmax — so each stage's lambdas read real
    attributes. Folding the score expressions into the argmax
    when-chain would re-evaluate each interpreted array filter up to
    8x per row (~10x slower). Fully narrow: no shuffle, no join."""
    order = list(LANG_STOPWORDS)
    staged = df.withColumn("__w", words(text_col))
    for lang, sw in LANG_STOPWORDS.items():
        staged = staged.withColumn(
            f"score_{lang}", _stopword_hits(F.col("__w"), sw)
        )
    pred = F.lit("unknown")
    # build when-chain in reverse so earlier languages win ties
    for lang in reversed(order):
        others_max = F.greatest(
            *[F.col(f"score_{o}") for o in order if o != lang], F.lit(0)
        )
        cond = (F.col(f"score_{lang}") > 0) & (F.col(f"score_{lang}") >= others_max)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return staged.withColumn("lang_pred", pred).drop("__w")


def with_fingerprints(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Append document fingerprints:

    - ``md5_fp``: full-text md5 (exact-dup key);
    - ``winnow_fp``: min md5 over k-word shingles — a winnowing-style
      selection that is stable under small edits outside the minimal
      window (near-dup blocking key).
    """
    sh = shingles_from_words("__w", k)
    return (
        df.withColumn("__w", words(text_col))
        .withColumn("md5_fp", F.md5(F.col(text_col)))
        .withColumn(
            "winnow_fp",
            F.coalesce(F.array_min(F.transform(sh, F.md5)), F.md5(F.col(text_col))),
        )
        .drop("__w")
    )


def bigram_familiarity(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-grounded fluency signal (the integer-exact cousin of
    CCNet's LM-perplexity filter): for each document, the share of its
    word-bigram OCCURRENCES whose corpus-wide frequency reaches
    ``min_count``. Gibberish, OCR noise, and shuffled text are built
    from bigrams the rest of the corpus never repeats — low
    familiarity flags them without training a language model.

    Returns ``(id, n_bigrams, n_familiar, familiarity,
    median_bigram_count)``: occurrence counts, their ratio, and the
    lower median of the doc's bigram corpus-frequencies. Docs with
    fewer than two words have no bigrams and are absent.

    Scale: one explode over bigram occurrences, one bigram-keyed count
    (map-side partial), one bigram-keyed hash join back (both sides
    corpus-sized — shuffle_hash, never broadcast), then ONE doc-keyed
    window pass: the lower median is the row at rank
    ``floor((n+1)/2)`` of the doc's frequency-ordered occurrences, and
    the doc totals ride the same partitioning as unbounded-frame
    window aggregates — a spillable in-partition sort, never a per-doc
    ``collect_list`` array (a single long document would otherwise
    materialize millions of elements in one aggregation buffer).
    Every output is an integer or an exact integer ratio, so results
    hash identically across engines — no transcendental (log-prob)
    math to drift in the last ulp."""
    from pyspark.sql import Window

    ex = (
        df.select(F.col(id_col), F.col(text_col))
        .select(F.col(id_col), words(text_col).alias("__w"))
        .where(F.size("__w") >= 2)
        .select(
            F.col(id_col),
            F.explode(shingles_from_words("__w", 2)).alias("bigram"),
        )
    )
    counts = ex.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy(id_col)
    wo = wp.orderBy("c")
    return (
        ex.hint("shuffle_hash")
        .join(counts.hint("shuffle_hash"), "bigram")
        .withColumn("__r", F.row_number().over(wo))
        .withColumn("__n", F.count(F.lit(1)).over(wp))
        .withColumn(
            "__fam",
            F.sum((F.col("c") >= min_count).cast("bigint")).over(wp),
        )
        # exactly one surviving row per doc: ties in c share the value,
        # so the rank-row choice among them cannot change the median
        .where(F.col("__r") == F.floor((F.col("__n") + 1) / 2))
        .select(
            F.col(id_col),
            F.col("__n").alias("n_bigrams"),
            F.col("__fam").alias("n_familiar"),
            (F.col("__fam").cast("double") / F.col("__n")).alias(
                "familiarity"
            ),
            F.col("c").alias("median_bigram_count"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into word-bounded training chunks with overlap:
    one output row per chunk — (id, chunk_idx, chunk_text, n_words).

    Pure expression tree (split -> sequence of window starts ->
    slice + join, posexploded), so chunking a 100 TB corpus is a
    narrow codegen'd pass with zero shuffles and the result is
    bit-identical in any engine (oracle-verified). Empty documents
    yield no rows; the final short tail is kept (training pipelines
    pad, they don't drop).
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError(f"need 0 <= overlap < chunk_words, got {overlap}/{chunk_words}")
    step = chunk_words - overlap
    w = F.col("_w")
    # stop starts at size - overlap - 1: a window starting inside the
    # final overlap region would be entirely contained in the previous
    # chunk (100% duplicated text — poison for a training corpus);
    # greatest(.., 0) keeps the mandatory start-0 window for short docs
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(w) - 1 - overlap, F.lit(0)), F.lit(step)
    )
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(w, s + 1, chunk_words)))
    return (
        # trim filter, not size: split('') gives [''] in Spark and
        # DuckDB alike, which would emit one empty chunk
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), words(text_col).alias("_w"))
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn("n_words", F.size(F.split("chunk_text", r"\s+")))
    )


def hashed_embeddings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", dim: int = 32
) -> DataFrame:
    """Signed feature-hashing document vectors (the hashing trick):
    each word hashes to a bucket in [0, dim) with a ±1 sign drawn from
    another hash bit; the document vector is the per-bucket signed
    count. The standard trainable-featurizer-free embedding — sparse
    bag-of-words compressed to a fixed dense width, usable directly by
    the cosine/LSH/IVF similarity operators.

    Integer-exact end to end (counts, not floats), so the vectors
    hash-verify against the SQL oracle bit-for-bit. One shuffle on
    (doc, bucket) with map-side combine, then the dense assembly is a
    per-row expression (map lookup over a dim-length sequence). NULL
    or empty texts produce the zero vector.
    """
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("w"))
    h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    hashed = toks.select(
        F.col(id_col),
        (h % dim).alias("b"),
        F.when(F.shiftright(h, 8).bitwiseAND(1) == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    agg = hashed.groupBy(id_col, "b").agg(F.sum("s").cast("long").alias("v"))
    maps = agg.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("b", "v"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(F.element_at(F.col("m"), d.cast("long")), F.lit(0)).cast(
            "long"
        ),
    )
    return (
        df.select(id_col)
        .join(maps, [id_col], "left")
        .select(F.col(id_col), dense.alias("embedding"))
    )


def tfidf_embeddings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", dim: int = 32
) -> DataFrame:
    """Hashed TF-IDF document vectors: the signed hashing trick of
    :func:`hashed_embeddings` with each word weighted by its smoothed
    inverse document frequency, ``idf = ln((N + 1) / (df + 1)) + 1``
    (the scikit-learn smoothing — never zero, no division by zero).

    The weighting needs floats, so unlike the raw hashed counts this
    is NOT SQL-hash-oracled (ln's last ULP differs across libm
    implementations); the pytest reference check recomputes the exact
    formula in NumPy instead. Within an engine it IS bit-deterministic:
    the per-bucket reduction is a value-sorted fold, not a
    partition-order-dependent double sum.

    Scale: one corpus pass for document frequencies (word-keyed hash
    agg), a vocabulary-sized shuffle-hash join of tokens against the
    idf table, then the same (doc, bucket) aggregation + dense
    assembly as the count vectors. Fully lazy like the rest of the
    module: N enters the idf table as a broadcast one-row aggregate
    (a keyless broadcast plans as an O(n)
    BroadcastNestedLoopJoin by design), so building the
    transformation triggers no corpus scan.
    """
    n_docs = df.where(F.col(text_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(words(text_col))).alias("w")
    )
    dfreq = toks.groupBy("w").agg(F.countDistinct(id_col).alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "w",
        (F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0).alias("_idf"),
    )
    all_toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("w"))
    h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    hashed = all_toks.join(idf.hint("shuffle_hash"), "w").select(
        F.col(id_col),
        (h % dim).alias("b"),
        (
            F.when(F.shiftright(h, 8).bitwiseAND(1) == 1, F.lit(1.0)).otherwise(
                F.lit(-1.0)
            )
            * F.col("_idf")
        ).alias("s"),
    )
    # value-sorted fold, not F.sum: double summation order varies with
    # partitioning, and the repo rule is that float reductions must be
    # bit-deterministic (the q_embedding_pool lesson)
    agg = hashed.groupBy(id_col, "b").agg(
        F.aggregate(
            F.array_sort(F.collect_list("s")), F.lit(0.0), lambda a, x: a + x
        ).alias("v")
    )
    maps = agg.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("b", "v"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(F.element_at(F.col("m"), d.cast("long")), F.lit(0.0)),
    )
    return (
        df.select(id_col)
        .join(maps, [id_col], "left")
        .select(F.col(id_col), dense.alias("embedding"))
    )
