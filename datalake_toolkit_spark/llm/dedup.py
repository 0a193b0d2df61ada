"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Design for 100 TB:

- Exact dedup is a hash-groupBy — one shuffle on the 32-hex md5 key,
  uniformly distributed by construction (no skew).
- MinHash-LSH is the scale path for near-dup: signatures are computed
  in a single narrow projection (nested higher-order functions, no
  shuffle), band keys explode to B rows/doc, and only docs sharing a
  band bucket are pair-joined — candidate count is O(collisions), not
  O(n^2). The exact-Jaccard verify runs only on candidates.
- n-gram Jaccard (jaccard_pairs) is the exact quadratic-ish baseline:
  the shingle inverted-index join prunes to pairs sharing >= 1
  shingle. Use it to validate LSH recall at small scale; use LSH in
  production.
- Hash choice is md5 everywhere (not xxhash/murmur) so results are
  reproducible across engines — the DuckDB oracle computes the same
  signatures. Swap in ``F.xxhash64`` for ~3x faster signatures when
  cross-engine verification isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datalake_toolkit_spark.llm.text import shingles_from_words, words
from datalake_toolkit_spark.operators import ensure_min_partitions


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """One row per distinct text: (text_hash, keep_id = min id,
    n_copies). The canonical exact-dedup ledger."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the min-id row per distinct text. Implemented as a
    min_by aggregation (single shuffle), not a window — no per-group
    sort needed."""
    keep = exact_dedup_groups(df, id_col, text_col).select("keep_id")
    return df.join(keep, df[id_col] == keep.keep_id, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    shingles_col: Column | str, num_hashes: int = 12
) -> Column:
    """MinHash signature as an array<string> of length ``num_hashes``:
    element i = min over shingles of md5(shingle + '#' + i).

    Min over the md5 hex string is order-invariant, so the signature
    is computed per-row with zero shuffles. The classic estimator:
    P[sig_a[i] == sig_b[i]] = Jaccard(a, b)."""
    sh = F.col(shingles_col) if isinstance(shingles_col, str) else shingles_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, F.lit("#"), i.cast("string"))))
        ),
    )


def minhash_band_keys(
    sig_col: Column | str, bands: int, rows_per_band: int
) -> Column:
    """LSH banding: array of ``bands`` bucket keys, key b =
    md5(b + '|' + sig[b*r .. b*r+r])."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat(
                b.cast("string"),
                F.lit("|"),
                F.array_join(F.slice(sig, b * F.lit(rows_per_band) + 1, rows_per_band), "|"),
            )
        ),
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    # Two projections on purpose: the words array must be a real
    # attribute before the shingle lambda reads it, else Catalyst
    # re-evaluates the split per element (~10x slower). The non-empty
    # guard is on word count (>= 1 shingle iff >= k words), NOT on
    # size(sh): a size(sh) predicate is pushed below the projection
    # with the whole shingle expression inlined, re-paying the
    # quadratic evaluation on every input row.
    return (
        ensure_min_partitions(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), words(text_col).alias("__w"))
        .where(F.size("__w") >= k)
        .select(
            F.col(id_col),
            F.array_distinct(shingles_from_words("__w", k)).alias("sh"),
        )
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH blocking + exact-Jaccard
    verification.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold.

    Pipeline: narrow signature projection -> explode band keys
    (bands rows/doc) -> self-join on band key (the only quadratic
    surface, bounded by bucket collisions) -> distinct candidate
    pairs -> shingle-join verify restricted to candidates.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}); {num_hashes % bands} trailing hash functions "
            "would be silently ignored"
        )
    rows_per_band = num_hashes // bands
    docs = _doc_shingles(df, id_col, text_col, k)
    # Signatures as a codegen'd hash-aggregate over the exploded
    # shingles — one min() per hash function — rather than nested
    # array lambdas (array_min over transform), which evaluate
    # interpreted and cost ~2x the whole pipeline. Map-side partial
    # min means the shuffle carries one signature row per doc per
    # partition.
    sig = _signatures(docs, id_col, num_hashes)
    band_keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"__s{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
            )
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col),
        # explode_outer on purpose: the band-key array is never empty
        # (fixed length = bands), and inner explode triggers
        # InferFiltersFromGenerate, which pushes a size()>0 filter
        # down with the whole signature aggregate inlined.
        F.explode_outer(F.array(*band_keys)).alias("bkey"),
    )
    # shuffle_hash: both sides of the bucket self-join are
    # corpus-sized (bands rows per doc) — never broadcast-able at
    # scale.
    a = banded.select(F.col(id_col).alias("doc_a"), "bkey").hint("shuffle_hash")
    b = banded.select(F.col(id_col).alias("doc_b"), "bkey").hint("shuffle_hash")
    cand = (
        a.join(b, "bkey")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(cand, docs, id_col, threshold)


def _verify_jaccard(
    cand: DataFrame, docs: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs only: explode each side's
    shingle set, count matches, |A∪B| = |A| + |B| - |A∩B|."""
    # explode_outer: sh is non-empty by the >= k words pre-filter;
    # inner explode would re-inline the shingle expression into a
    # pushed-down size()>0 scan filter (quadratic re-evaluation).
    ex = docs.select(F.col(id_col), F.explode_outer("sh").alias("shingle"))
    # Set sizes from the exploded rows (sh is distinct already), not
    # F.size("sh"): a size() projection feeding the final jaccard
    # filter gets a null-check inferred and pushed to the scan with
    # the whole shingle expression inlined.
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    # shuffle_hash hints: the inverted index and the per-doc size
    # table are both corpus-sized, so broadcast is wrong at scale
    # (and in local mode repeated corpus broadcasts accumulate until
    # GC pressure doubles run time). Shuffled hash join partitions
    # both sides by key with no sort.
    ex_a = ex.select(F.col(id_col).alias("doc_a"), F.col("shingle")).hint(
        "shuffle_hash"
    )
    ex_b = ex.select(F.col(id_col).alias("doc_b"), F.col("shingle")).hint(
        "shuffle_hash"
    )
    inter = (
        cand.join(ex_a, "doc_a")
        .join(ex_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na.hint("shuffle_hash"), "doc_a")
        .join(nb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted
    index (no LSH) — ground truth for LSH recall checks. Pairs
    sharing zero shingles never materialize; still quadratic in the
    worst case, so prefer :func:`minhash_near_dup_pairs` at scale."""
    docs = _doc_shingles(df, id_col, text_col, k)
    # explode_outer: sh is non-empty by the >= k words pre-filter;
    # inner explode would re-inline the shingle expression into a
    # pushed-down size()>0 scan filter (quadratic re-evaluation).
    ex = docs.select(F.col(id_col), F.explode_outer("sh").alias("shingle"))
    # shuffle_hash: both self-join sides are the corpus-sized
    # inverted index — broadcast would OOM at scale (see
    # _verify_jaccard).
    inter = (
        ex.select(F.col(id_col).alias("doc_a"), "shingle")
        .hint("shuffle_hash")
        .join(
            ex.select(F.col(id_col).alias("doc_b"), "shingle").hint("shuffle_hash"),
            "shingle",
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # Set sizes from the exploded rows (sh is distinct already) — see
    # _verify_jaccard for why not F.size("sh").
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na.hint("shuffle_hash"), "doc_a")
        .join(nb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a prefix-filtered
    set-similarity join (AllPairs / PPJoin family — Bayardo et al.
    WWW'07, Xiao et al. WWW'08).

    Same output as :func:`jaccard_pairs`, but the scale path for
    EXACT (non-LSH) similarity: for Jaccard >= t, any qualifying pair
    must share a token among the first ``n - ceil(t*n) + 1`` of each
    doc's ``n`` shingles under a common total order, so only that
    prefix enters the inverted index. Ordering tokens by ascending
    document frequency makes prefix tokens the RAREST ones — short
    postings lists — so the candidate join touches near-linear pairs
    on real corpora instead of every co-occurring pair. A symmetric
    length filter (``t*|x| <= |y|`` both ways) prunes candidates
    before the exact verify, which runs only on survivors.
    """
    docs = _doc_shingles(df, id_col, text_col, k)
    # explode_outer, not explode: see jaccard_pairs.
    ex = docs.select(F.col(id_col), F.explode_outer("sh").alias("shingle"))
    # Global token order = (document frequency asc, shingle text) — a
    # deterministic total order every doc sorts by. freq is
    # vocabulary-sized, NOT broadcastable at corpus scale.
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_tok"))
    w_doc = Window.partitionBy(id_col)
    ranked = (
        ex.hint("shuffle_hash")
        .join(freq.hint("shuffle_hash"), "shingle")
        .select(
            F.col(id_col),
            F.col("shingle"),
            F.row_number()
            .over(w_doc.orderBy("df_tok", "shingle"))
            .alias("pos"),
            F.count(F.lit(1)).over(w_doc).alias("n"),
        )
    )
    # Prefix length p = n - ceil(t*n) + 1. The epsilon keeps float
    # noise (0.8 is not a dyadic rational) from rounding ceil UP —
    # that would SHRINK the prefix and silently drop true pairs.
    # Erring the other way only admits extra candidates, and the
    # verify step is exact.
    tceil = F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9))
    prefix = ranked.where(F.col("pos") <= F.col("n") - tceil + 1)
    pa = prefix.select(
        F.col(id_col).alias("doc_a"), "shingle", F.col("n").alias("n_a")
    )
    pb = prefix.select(
        F.col(id_col).alias("doc_b"), "shingle", F.col("n").alias("n_b")
    )
    # Length filter: jaccard >= t forces t*max(|x|,|y|) <= min(|x|,|y|).
    cand = (
        pa.hint("shuffle_hash")
        .join(pb.hint("shuffle_hash"), "shingle")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a") - F.lit(1e-9))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b") - F.lit(1e-9))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Array-based exact verify: candidates are few by construction, so
    # joining them against the per-doc shingle ARRAYS (two hash joins,
    # corpus partitioned by id) beats _verify_jaccard's re-explosion
    # of the whole inverted index (measured 4.5s -> 2.4s at sf0.1).
    da = docs.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    db = docs.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(da.hint("shuffle_hash"), "doc_a")
        .join(db.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def dup_ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Span-level duplication signal: for each document, how many of
    its distinct word ``k``-grams also appear in at least one OTHER
    document. The practical distributed stand-in for suffix-array
    substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): doc-level dedup misses shared
    boilerplate, licenses, and quoted passages — a high ``dup_ratio``
    with no whole-doc near-dup is exactly that case.

    Scale: one explode (distinct grams per doc), one gram-keyed
    aggregation for document frequency, one gram-keyed join back, one
    doc-keyed aggregation. Every stage is hash-partitioned with
    map-side partial aggregation; nothing is quadratic and nothing is
    collected. Docs with fewer than ``k`` words have no k-grams and
    are absent from the output.

    Returns ``(id, n_grams, n_dup_grams, dup_ratio, max_gram_docs)``:
    distinct-gram count, how many of those occur elsewhere, their
    ratio, and the document frequency of the doc's most-duplicated
    gram (1 = nothing shared; large = contains a viral span).
    """
    docs = _doc_shingles(df, id_col, text_col, k)
    # explode_outer, not explode: see jaccard_pairs.
    ex = docs.select(F.col(id_col), F.explode_outer("sh").alias("gram"))
    # sh is distinct per doc, so count(*) per gram = document frequency.
    docfreq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    # Both sides are corpus-sized — shuffle hash join, never broadcast.
    return (
        ex.hint("shuffle_hash")
        .join(docfreq.hint("shuffle_hash"), "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("n_docs") >= 2).cast("bigint")).alias("n_dup_grams"),
            F.max("n_docs").alias("max_gram_docs"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_dup_grams",
            (F.col("n_dup_grams").cast("double") / F.col("n_grams")).alias(
                "dup_ratio"
            ),
            "max_gram_docs",
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Per-document SimHash: each word hashes to a ``bits``-wide
    integer (md5-prefix, engine-portable); bit b of the output is the
    majority vote of bit b across the document's words.

    Implemented as explode(word hashes) -> hash-aggregate with one
    vote sum per bit -> bit reassembly. The all-expression
    alternative (16 nested ``aggregate`` lambdas over the word-hash
    array) is ~8x slower: deeply nested higher-order functions
    evaluate interpreted, while explode + groupBy runs inside
    whole-stage codegen with map-side partial aggregation — the
    shuffle carries one 17-column row per doc per input partition,
    not the exploded words."""
    hashes = ensure_min_partitions(
        df.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        # explode_outer so Catalyst doesn't infer a size()>0 filter
        # that re-inlines the per-word md5 transform into the scan.
        F.explode_outer(
            F.transform(
                F.split(F.col(text_col), r"\s+"),
                lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long"),
            )
        ).alias("h"),
    )
    votes = hashes.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"__v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(F.col(id_col), fp.alias("simhash"))


# ---------------------------------------------------------------------------
# Incremental dedup (continuous ingestion against a persistent ledger)
# ---------------------------------------------------------------------------


def incremental_dedup(
    new_docs: DataFrame,
    ledger,
    id_col: str = "doc_id",
    text_col: str = "text",
    before_commit=None,
) -> DataFrame:
    """Production exact dedup under continuous ingestion: drop rows of
    ``new_docs`` whose text hash was already committed to ``ledger``
    (a ``lakehouse.LakeTable`` of fingerprints), dedup the batch
    internally (min-id survivor), and commit the survivors'
    fingerprints so the next batch sees them.

    Returns the surviving rows of this batch. The ledger schema is
    (text_hash, keep_id, n_copies, hash_prefix); ``upsert`` keyed on
    text_hash makes re-running a failed batch idempotent — replayed
    fingerprints merge instead of duplicating. ``hash_prefix`` (first
    2 hex chars, 256 uniform buckets) is the intended ledger partition
    key: construct the LakeTable with ``partition_by=("hash_prefix",)``
    so a batch rewrites only the buckets it touches, not the ledger.

    ``before_commit(survivors)`` runs BETWEEN computing survivors and
    committing their fingerprints: downstream writes (e.g. appending
    survivors to a corpus table) must happen there, because once the
    fingerprints commit, a replay of the same batch anti-joins to
    empty — fingerprints-last is what makes a crash between the two
    writes recoverable instead of silently dropping documents.

    NULL-text rows are DROPPED, not deduped: ``md5(NULL)`` is NULL, so
    a null-text row can never match the ledger's equi-keyed anti-join
    (NULL != NULL) — it would re-survive every micro-batch and insert a
    fresh NULL-keyed ledger row each time, breaking both the
    one-row-per-distinct-text invariant and replay idempotency. A
    content-keyed dedup has no meaningful identity for contentless
    rows; filter them upstream if they must be kept.

    Scale: one hash shuffle for the batch-internal dedup, one anti-join
    of the batch against the ledger scan with the ledger side pinned to
    shuffle (never let Spark mis-estimate a 100 TB ledger into a
    broadcast; for left_anti only the RIGHT side can build, so the hint
    must sit on the ledger). Ledger keys are uniform md5 — no skew.
    """
    # materialize the hashed batch once: it feeds the bucket-prune
    # collect, the ledger anti-join, and the fingerprint commit
    # (batch-sized by design)
    hashed = new_docs.where(F.col(text_col).isNotNull()).withColumn(
        "_th", F.md5(F.col(text_col))
    ).localCheckpoint(eager=True)
    try:
        # probe ONLY the hash_prefix buckets this batch touches: with
        # the documented partitioning a small batch lists a handful of
        # the 256 bucket dirs, never the whole fingerprint index
        if tuple(ledger.partition_by) == ("hash_prefix",):
            existing = set(ledger._manifest()["owners"])
            touched = {
                f"hash_prefix={r['p']}"
                for r in hashed.select(
                    F.substring("_th", 1, 2).alias("p")
                )
                .distinct()
                .collect()  # bounded: at most 256 rows
            }
            probe = sorted(touched & existing)
            seen_src = (
                ledger.read()
                if len(probe) == len(existing)
                else ledger.read(partitions=probe)
            )
        else:
            seen_src = ledger.read()
        seen = seen_src.select(F.col("text_hash").alias("_th"))
        fresh = hashed.join(seen.hint("shuffle_hash"), "_th", "left_anti")
    except FileNotFoundError:  # first batch: empty ledger
        fresh = hashed
    survivors = exact_dedup(fresh.drop("_th"), id_col, text_col)
    if before_commit is not None:
        # materialize once: the callback and the fingerprint commit
        # both consume this plan (anti-join + dedup), and the callback
        # typically runs its own multi-action write
        survivors = survivors.localCheckpoint(eager=True)
        before_commit(survivors)
    new_fps = exact_dedup_groups(fresh.drop("_th"), id_col, text_col).withColumn(
        "hash_prefix", F.substring("text_hash", 1, 2)
    )
    # hash_prefix is a pure function of the merge key, so matched
    # ledger rows can only live in the source's buckets: the scoped
    # merge never scans the full fingerprint index
    ledger.upsert(
        new_fps,
        keys=["text_hash"],
        partition_scoped=tuple(ledger.partition_by) == ("hash_prefix",),
    )
    return survivors


def _signatures(
    docs: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """(id, __s0..__sN) MinHash signatures from a ``_doc_shingles``
    frame — the codegen'd hash-aggregate formulation."""
    ex = docs.select(F.col(id_col), F.explode_outer("sh").alias("shingle"))
    return ex.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"__s{i}")
            for i in range(num_hashes)
        ]
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    ledger,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
    before_commit=None,
) -> DataFrame:
    """Production NEAR-dup dedup under continuous ingestion: drop rows
    of ``new_docs`` that near-duplicate anything already committed to
    ``ledger`` (a ``lakehouse.LakeTable`` of MinHash band keys +
    signatures) — the 100 TB historical corpus is never rescanned,
    only its band index is probed. The batch first collapses
    internally via exact-Jaccard-verified MinHash pairs; survivors
    then probe the ledger's band keys, and candidates verify by
    SIGNATURE-estimated Jaccard (matching positions / num_hashes —
    the historical text is not retained, so the estimator IS the
    verification; in-batch dedup stays exact). Surviving canonicals'
    band rows commit LAST (the crash-recovery order of
    :func:`incremental_dedup`): ``before_commit(survivors)`` is where
    downstream corpus writes belong.

    Ledger schema: (bkey, band, keep_id, signature, key_prefix) with
    ``bands`` rows per committed doc, upsert-keyed on (bkey, keep_id)
    so replays merge. Construct the LakeTable with
    ``partition_by=("key_prefix",)`` (first 2 hex chars of the band
    key, 256 uniform buckets) so a batch rewrites only touched
    buckets. k / num_hashes / bands are part of the ledger's identity:
    probing with different parameters than it was built with finds
    nothing — pass the same values every batch.

    Scale: signatures are one hash-agg per batch; the ledger probe is
    an equi-join on band key with the ledger side pinned to
    shuffle_hash (never let a 100 TB index broadcast); estimated
    verification touches only collided pairs.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands ({bands})"
        )
    rows_per_band = num_hashes // bands

    # 1. batch-internal collapse (exact-verified near-dup canonicals)
    from datalake_toolkit_spark.llm.cluster import dedup_keep_canonical

    batch = new_docs.where(F.col(text_col).isNotNull())
    pairs = minhash_near_dup_pairs(
        batch, id_col, text_col, k=k, num_hashes=num_hashes,
        bands=bands, threshold=threshold,
    ).select("doc_a", "doc_b")
    survivors = dedup_keep_canonical(batch, pairs, id_col)

    # 2. signatures + band rows for the surviving batch docs
    docs = _doc_shingles(survivors, id_col, text_col, k)
    sig = _signatures(docs, id_col, num_hashes)
    sig_str = F.concat_ws("|", *[F.col(f"__s{i}") for i in range(num_hashes)])
    band_rows = sig.select(
        F.col(id_col),
        sig_str.alias("signature"),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(str(b)),
                            *[
                                F.col(f"__s{i}")
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bkey"),
    )

    # 3. probe the historical band index; verify by signature estimate.
    # The batch's band rows materialize ONCE here (they feed the
    # bucket-prune collect, the probe join, and the final commit —
    # batch-sized by design), and the probe reads ONLY the ledger
    # buckets the batch actually touches: with the documented
    # key_prefix partitioning, a small batch lists a handful of the
    # 256 bucket dirs instead of the whole index.
    band_rows = band_rows.localCheckpoint(eager=True)
    try:
        if tuple(ledger.partition_by) == ("key_prefix",):
            existing = set(ledger._manifest()["owners"])
            touched = {
                f"key_prefix={r['p']}"
                for r in band_rows.select(
                    F.substring("bkey", 1, 2).alias("p")
                )
                .distinct()
                .collect()  # bounded: at most 256 rows
            }
            probe = sorted(touched & existing)
            seen_src = (
                ledger.read()
                if len(probe) == len(existing)
                else ledger.read(partitions=probe)
            )
        else:
            seen_src = ledger.read()
        seen = seen_src.select(
            "bkey", F.col("signature").alias("_old_sig")
        )
        est = (
            F.aggregate(
                F.zip_with(
                    F.split(F.col("signature"), r"\|"),
                    F.split(F.col("_old_sig"), r"\|"),
                    lambda a, b: F.when(a == b, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.lit(float(num_hashes))
        )
        dup_ids = (
            band_rows.hint("shuffle_hash")
            .join(seen.hint("shuffle_hash"), "bkey")
            .where(est >= threshold)
            .select(id_col)
            .distinct()
        )
        fresh = survivors.join(dup_ids, [id_col], "left_anti")
        fresh_bands = band_rows.join(dup_ids, [id_col], "left_anti")
    except FileNotFoundError:  # first batch: empty ledger
        fresh = survivors
        fresh_bands = band_rows
    if before_commit is not None:
        fresh = fresh.localCheckpoint(eager=True)
        before_commit(fresh)

    # 4. band rows commit LAST; short docs (< k words) have no
    # shingles, hence no band rows — they pass through undeduped by
    # design (no content identity at this granularity). Each row is
    # stamped with the ledger version it commits toward (``seq``) so
    # retention can tell a keep_id's LATEST signature from superseded
    # ones (a re-admitted doc with changed text leaves band rows of
    # both signatures behind — see :func:`minhash_ledger_retention`).
    cur = ledger.current_version()
    seq = 0 if cur is None else cur + 1
    new_rows = fresh_bands.join(
        fresh.select(id_col), [id_col], "left_semi"
    ).select(
        "bkey",
        F.col("band").cast("int").alias("band"),
        F.col(id_col).alias("keep_id"),
        "signature",
        F.substring("bkey", 1, 2).alias("key_prefix"),
        F.lit(seq).cast("bigint").alias("seq"),
    )
    # key_prefix derives from bkey (a merge key): the scoped merge
    # rewrites only the touched band buckets, never the whole ledger
    ledger.upsert(
        new_rows,
        keys=["bkey", "keep_id"],
        partition_scoped=tuple(ledger.partition_by) == ("key_prefix",),
    )
    return fresh


def incremental_semantic_dedup(
    new_docs: DataFrame,
    ledger,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 6,
    n_bands: int = 3,
    dim: int = 64,
    before_commit=None,
) -> DataFrame:
    """:func:`incremental_minhash_dedup` in EMBEDDING space — the
    missing cell of the dedup matrix (exact / MinHash / semantic, each
    batch AND incremental): drop rows of ``new_docs`` whose vector
    cosine-matches anything already committed to ``ledger`` (a
    ``lakehouse.LakeTable`` of per-band sign-LSH bucket keys +
    vectors). The historical corpus is never rescanned — only the
    band buckets the batch touches are probed, and candidates verify
    by EXACT cosine against the stored vector (unlike the MinHash
    ledger, the identity payload — the embedding — is small enough to
    retain, so incremental verification stays exact).

    Flow per batch (the crash-recovery order of
    :func:`incremental_dedup`): batch-internal collapse via
    OR-amplified LSH pairs + connected components
    (:func:`~datalake_toolkit_spark.llm.similarity.cosine_near_dup_pairs`
    with ``n_bands`` disjoint ``n_planes``-plane families), probe the
    ledger on (band, bucket) key, exact-cosine verify, call
    ``before_commit(survivors)`` (corpus writes), commit survivors'
    band rows LAST. Zero-norm / NULL vectors pass through undeduped
    (no identity at this granularity) and never enter the ledger —
    cosine on them is 0/0 = NaN and NaN-vs-threshold semantics differ
    between engines.

    Ledger schema mirrors the MinHash band ledger: (bkey, band,
    keep_id, vec, norm, key_prefix, seq), upsert-keyed on
    (bkey, keep_id), ``partition_by=("key_prefix",)`` for bucket-local
    probes and commits, seq-stamped so
    :func:`minhash_ledger_retention` applies verbatim. n_planes /
    n_bands / dim are the ledger's identity — keep them constant.

    Scale: bucketing is a narrow projection (driver-folded plane
    literals, no shuffle); the probe is an equi-join on band key with
    both sides pinned to shuffle_hash (never broadcast a 100 TB
    index); verification touches only collided pairs."""
    from datalake_toolkit_spark.llm.cluster import dedup_keep_canonical
    from datalake_toolkit_spark.llm.similarity import (
        _as_double,
        _fold_sum,
        _l2_norm,
        cosine_near_dup_pairs,
        hyperplane_bucket,
        pair_cosine_arrow,
    )

    sq_norm = _fold_sum(F.transform(_as_double(vec_col), lambda x: x * x))
    nonzero = new_docs.where(F.col(vec_col).isNotNull() & (sq_norm > 0))
    zeroes = new_docs.where(F.col(vec_col).isNull() | ~(sq_norm > 0))

    # 1. batch-internal collapse (exact-cosine-verified LSH canonicals)
    pairs = cosine_near_dup_pairs(
        nonzero, threshold=threshold, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, dim=dim, n_bands=n_bands,
    )
    survivors = dedup_keep_canonical(
        nonzero, pairs, id_col, src="id_a", dst="id_b"
    )

    # 2. per-band bucket rows for the surviving batch docs; bkey is
    # md5(band:bucket) so key_prefix buckets stay md5-uniform exactly
    # like the MinHash ledger's
    staged = survivors.select(
        F.col(id_col), _as_double(vec_col).alias("_v")
    ).withColumn("_n", _l2_norm(F.col("_v")))
    band_rows = staged.select(
        id_col,
        "_v",
        "_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(str(b)),
                                hyperplane_bucket(
                                    F.col("_v"), n_planes, dim,
                                    plane_offset=b * n_planes,
                                ).cast("string"),
                            )
                        ).alias("bkey"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(
        id_col, "_v", "_n",
        F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"),
    )

    # 3. probe the historical index, bucket-pruned like the MinHash
    # path; batch band rows materialize once (probe + commit)
    band_rows = band_rows.localCheckpoint(eager=True)
    try:
        if tuple(ledger.partition_by) == ("key_prefix",):
            existing = set(ledger._manifest()["owners"])
            touched = {
                f"key_prefix={r['p']}"
                for r in band_rows.select(
                    F.substring("bkey", 1, 2).alias("p")
                )
                .distinct()
                .collect()  # bounded: at most 256 rows
            }
            probe = sorted(touched & existing)
            seen_src = (
                ledger.read()
                if len(probe) == len(existing)
                else ledger.read(partitions=probe)
            )
        else:
            seen_src = ledger.read()
        seen = seen_src.select(
            "bkey",
            F.col("vec").alias("_ov"),
            F.col("norm").alias("_on"),
        )
        # pair scoring in the map-only Arrow kernel (bit-identical to
        # cosine_with_norms — see pair_cosine_arrow); the pre-kernel
        # select keeps only the four scoring columns plus the id so
        # column pruning survives the opaque mapInArrow (guide §4)
        dup_ids = (
            pair_cosine_arrow(
                band_rows.hint("shuffle_hash")
                .join(seen.hint("shuffle_hash"), "bkey")
                .select(
                    F.col(id_col),
                    F.col("_v").alias("va"),
                    F.col("_ov").alias("vb"),
                    F.col("_n").alias("na"),
                    F.col("_on").alias("nb"),
                )
            )
            .where(F.col("cosine") >= threshold)
            .select(id_col)
            .distinct()
        )
        fresh = survivors.join(dup_ids, [id_col], "left_anti")
        fresh_bands = band_rows.join(dup_ids, [id_col], "left_anti")
    except FileNotFoundError:  # first batch: empty ledger
        fresh = survivors
        fresh_bands = band_rows
    fresh = fresh.unionByName(zeroes)
    if before_commit is not None:
        fresh = fresh.localCheckpoint(eager=True)
        before_commit(fresh)

    # 4. band rows commit LAST, seq-stamped for retention
    cur = ledger.current_version()
    seq = 0 if cur is None else cur + 1
    new_rows = fresh_bands.join(
        fresh.select(id_col), [id_col], "left_semi"
    ).select(
        "bkey",
        F.col("band").cast("int").alias("band"),
        F.col(id_col).alias("keep_id"),
        F.col("_v").alias("vec"),
        F.col("_n").alias("norm"),
        F.substring("bkey", 1, 2).alias("key_prefix"),
        F.lit(seq).cast("bigint").alias("seq"),
    )
    ledger.upsert(
        new_rows,
        keys=["bkey", "keep_id"],
        partition_scoped=tuple(ledger.partition_by) == ("key_prefix",),
    )
    return fresh


def minhash_ledger_retention(ledger) -> int:
    """Maintenance for the band ledger (r8 verdict #6): the ledger only
    grows under ingestion — every batch appends band rows, and a
    keep_id re-admitted with CHANGED text leaves rows from both its
    old and new signatures (upsert keys are (bkey, keep_id); different
    text yields different bkeys, so nothing collides). Superseded
    rows keep probe-matching future docs against text the corpus no
    longer contains. This pass keeps, per keep_id, only the rows of
    its latest-committed signature (max ``seq``) and rewrites the
    ledger in one compacted snapshot — file count drops to one token,
    old versions become ``vacuum`` candidates, and dedup decisions
    against the corpus's CURRENT content are unchanged.

    Scale: one full ledger read + a max-window shuffled on keep_id —
    O(ledger) by design, a SCHEDULED maintenance op (run it when the
    superseded fraction warrants, not per batch). Returns the new
    version. Applies verbatim to the semantic embedding ledger
    (:func:`incremental_semantic_dedup`) — both schemas carry
    (keep_id, seq)."""
    rows = ledger.read()
    w = Window.partitionBy("keep_id")
    latest = (
        rows.withColumn("_mx", F.max("seq").over(w))
        .where(F.col("seq") == F.col("_mx"))
        .drop("_mx")
    )
    return ledger.write(latest, op="ledger_retention")


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup candidate pairs via pigeonhole bit-banding:
    the fingerprint splits into ``max_hamming + 1`` equal bands, and
    any pair within ``max_hamming`` bit flips must agree on at least
    one whole band — so candidates come from an equi-join on
    (band, band_value) and the exact hamming check
    (``bit_count(xor)``) runs on candidates only. Returns
    ``(doc_a, doc_b, hamming)`` with ``doc_a < doc_b``.

    Same scale contract as the MinHash path: O(band collisions),
    never all-pairs; both self-join sides carry ``shuffle_hash``
    (corpus-sized, must not broadcast). NULL texts are excluded — a
    no-word document's fingerprint is vacuously 0 and would pair with
    every other empty doc.
    """
    n_bands = max_hamming + 1
    if bits % n_bands:
        raise ValueError(
            f"bits ({bits}) must divide evenly into max_hamming+1 "
            f"({n_bands}) pigeonhole bands"
        )
    width = bits // n_bands
    mask = (1 << width) - 1
    sims = simhash(
        df.where(F.col(text_col).isNotNull()), id_col, text_col, bits
    )
    banded = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(mask)
                        .alias("bval"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.bval").alias("bval"))
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "bval"
    ).hint("shuffle_hash")
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "bval"
    ).hint("shuffle_hash")
    cand = (
        a.join(b, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
