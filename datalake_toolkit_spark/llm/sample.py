"""Deterministic corpus sampling for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines draw fixed-size
per-stratum samples (N docs per language/source/quality bucket) for
mixture tuning, eval splits, and ablations. Random sampling is
irreproducible across runs and engines; here the sample order is
md5(id) — a deterministic, uniformly-distributed permutation both
Spark and DuckDB compute identically, so the exact sample is
hash-checkable and stable across re-runs, engines, and cluster sizes.

Scale: one hash-partition shuffle on the strata columns; the window
ranks within each stratum only (never a global sort). Skewed strata
are bounded by the rank filter — each reducer emits at most
``n_per_stratum`` rows regardless of stratum size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the
    stratum is smaller), chosen by the md5(salt || id) order.

    ``salt`` yields independent samples from the same corpus (eval
    vs train draws) while keeping each draw fully deterministic."""
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(order.asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def split_train_eval(
    df: DataFrame,
    id_col: str,
    eval_fraction: float = 0.01,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/eval assignment: a doc's split never changes
    across runs or data growth (hash-bucketed, not positional). Adds
    a ``split`` column ('train' | 'eval').

    The md5 prefix is uniform on [0, 16^8); the eval cut is the
    fraction of that space — no shuffle, no count, pure projection."""
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    cut = F.lit(int(eval_fraction * 16**8))
    return df.withColumn(
        "split", F.when(bucket < cut, F.lit("eval")).otherwise(F.lit("train"))
    )


def shard_by_token_budget(
    df: DataFrame,
    tokens_col: str,
    order_cols: Sequence[str],
    shard_tokens: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Pack rows into consecutive training shards of ~``shard_tokens``
    tokens each under a deterministic total order:
    ``shard_id = floor((running_total - tokens) / shard_tokens)`` —
    i.e. a row belongs to the shard its FIRST token lands in, so every
    shard except the last holds at least ``shard_tokens`` tokens'
    worth of starts and assignment never depends on partition count.

    Built on the range-partitioned running total (no single-partition
    global window — see operators.with_running_total); the follow-up
    ``write.partitionBy(shard_col)`` gives one output dir per shard.
    """
    from datalake_toolkit_spark.operators import with_running_total

    run = with_running_total(df, list(order_cols), tokens_col, out_col="_cum")
    return run.withColumn(
        shard_col,
        F.floor((F.col("_cum") - F.col(tokens_col)) / F.lit(shard_tokens)).cast("long"),
    ).drop("_cum")


def pack_training_windows(
    df: DataFrame,
    tokens_col: str,
    order_cols: Sequence[str],
    window_tokens: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end to
    end under a deterministic total order and cut into fixed
    ``window_tokens`` training windows; a document may straddle a cut
    (GPT-style packing — no padding waste). Appends per document:

    - ``tok_offset``: the document's first-token position in the
      global concatenated stream (0-based);
    - ``window_start`` / ``window_end``: first / last training window
      the document's tokens land in;
    - ``n_windows``: how many windows it spans (straddle degree).

    Differs from :func:`shard_by_token_budget` (whole-doc shard
    assignment for output files): this maps docs onto FIXED-length
    model sequences, the layout a trainer's data loader consumes.

    Scale shape: identical to the running total it is built on —
    range partition + in-plan offsets, no single-partition window.
    Zero-token docs occupy no window: they get ``window_start =
    window_end`` at their offset and ``n_windows = 0``.
    """
    from datalake_toolkit_spark.operators import with_running_total

    run = with_running_total(df, list(order_cols), tokens_col, out_col="_cum")
    off = (F.col("_cum") - F.col(tokens_col)).cast("long")
    toks = F.col(tokens_col).cast("long")
    last = off + F.greatest(toks, F.lit(1)) - F.lit(1)
    return (
        run.withColumn("tok_offset", off)
        .withColumn(
            "window_start", F.floor(off / F.lit(window_tokens)).cast("long")
        )
        .withColumn(
            "window_end", F.floor(last / F.lit(window_tokens)).cast("long")
        )
        .withColumn(
            "n_windows",
            F.when(toks <= 0, F.lit(0)).otherwise(
                F.col("window_end") - F.col("window_start") + F.lit(1)
            ).cast("long"),
        )
        .drop("_cum")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (A-ES /
    exponential-keys): each row draws u = md5-uniform(salt, id) and is
    ranked by u^(1/w) descending; the top n are an exact weighted
    sample — inclusion probability proportional to weight, yet fully
    reproducible across runs, engines, and cluster sizes (no RNG
    state). Rows with NULL, zero, or negative weight are excluded.

    The standard curation move "sample N docs proportional to
    quality score" without a global shuffle of the corpus: the key is
    a narrow projection, and selection is orderBy+limit — Spark plans
    TakeOrderedAndProject (per-partition top-n, merge of n-row heaps),
    never a global sort or a single-partition window.

    Float caveat (why this has no SQL hash-oracle): u^(1/w) crosses
    ``pow``, whose last ULP differs between libm implementations, so
    cross-engine rank boundaries can flip. WITHIN an engine it is
    bit-deterministic — pytest pins determinism and the
    weight-monotone inclusion property instead.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("_ak", key)
        .orderBy(F.desc("_ak"), F.col(id_col))
        .limit(n)
        .drop("_ak")
    )
