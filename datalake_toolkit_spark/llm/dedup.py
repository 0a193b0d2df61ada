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

from datalake_toolkit_spark.llm.text import word_shingles


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
    return df.select(
        F.col(id_col), F.array_distinct(word_shingles(text_col, k)).alias("sh")
    ).where(F.size("sh") > 0)


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
    rows_per_band = num_hashes // bands
    docs = _doc_shingles(df, id_col, text_col, k)
    banded = docs.select(
        F.col(id_col),
        F.explode(
            minhash_band_keys(minhash_signature("sh", num_hashes), bands, rows_per_band)
        ).alias("bkey"),
    )
    a = banded.select(F.col(id_col).alias("doc_a"), "bkey")
    b = banded.select(F.col(id_col).alias("doc_b"), "bkey")
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
    ex = docs.select(F.col(id_col), F.explode("sh").alias("shingle"))
    sizes = docs.select(F.col(id_col), F.size("sh").alias("n"))
    ex_a = ex.select(F.col(id_col).alias("doc_a"), F.col("shingle"))
    ex_b = ex.select(F.col(id_col).alias("doc_b"), F.col("shingle"))
    inter = (
        cand.join(ex_a, "doc_a")
        .join(ex_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
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
    ex = docs.select(F.col(id_col), F.explode("sh").alias("shingle"))
    inter = (
        ex.select(F.col(id_col).alias("doc_a"), "shingle")
        .join(ex.select(F.col(id_col).alias("doc_b"), "shingle"), "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = docs.select(F.col(id_col), F.size("sh").alias("n"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
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


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Per-document SimHash: each word hashes to a ``bits``-wide
    integer (md5-prefix, engine-portable); bit b of the output is the
    majority vote of bit b across the document's words.

    Narrow, pure-expression computation (sequence x aggregate) — no
    shuffle, no UDF. Near-dup docs differ in few bits; pair search is
    a Hamming-ball join on the fingerprint (block on bit-slices the
    same way minhash bands work)."""
    w = F.split(F.col(text_col), r"\s+")
    hexw = F.transform(w, lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long"))
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            hexw,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.pow(F.lit(2.0), b).cast("long")) > 0, 1).otherwise(-1),
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(v > 0, F.pow(F.lit(2.0), b).cast("long")).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), fp.alias("simhash"))
