"""BPE tokenizer training on Spark — the real algorithm, scalably.

Classic byte-pair-encoding trains on the WORD-FREQUENCY table, not the
raw corpus: one corpus pass builds (word, freq), and every merge round
then works on distinct words only (bounded by vocabulary size, not
corpus size — exactly how production tokenizer trainers shard the
work). Each round is one pair-count aggregation with map-side combine
weighted by word frequency, a single-row collect of the argmax pair
(deterministic tie-break: count desc, then pair lexicographic), and an
expression-only merge fold over the symbol arrays. Lineage is
localCheckpoint-truncated every few rounds like the connected
components loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalake_toolkit_spark.llm.text import words

END = "</w>"
_CHECKPOINT_EVERY = 8


def _char_symbols(word: Column) -> Column:
    """word -> array of single characters + the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )
    return F.concat(chars, F.array(F.lit(END)))


def _merge_once(symbols: Column, a: str, b: str) -> Column:
    """One BPE merge applied to a symbol array: every adjacent (a, b)
    becomes a+b, left to right, via an expression fold."""
    ab = a + b

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(acc, -1)
        merged = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
        )
        return F.when(
            (F.size(acc) > 0) & (last == a) & (x == b), merged
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        symbols, F.array().cast("array<string>"), step
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: (word, freq, symbols) with symbols initialized
    to characters + end marker. Everything after trains on this."""
    wf = (
        df.select(F.explode(words(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return wf.withColumn("symbols", _char_symbols(F.col("word")))


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges over the corpus. Returns
    (merges, trained word table) where the table carries each word's
    final symbol segmentation — join corpus words against it to
    tokenize (`bpe_tokenize`).

    Each round: pair counts = explode adjacent symbol pairs weighted
    by word freq (shuffle bounded by distinct (pair) keys), argmax via
    orderBy+limit(1) (TakeOrdered, one row to the driver), stop when
    the best pair drops under ``min_count``.
    """
    wf = word_frequencies(df, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = wf.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("symbols", 1, F.size("symbols") - 1),
                    F.slice("symbols", 2, F.size("symbols") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        wf = wf.withColumn("symbols", _merge_once(F.col("symbols"), a, b))
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            wf = wf.localCheckpoint(eager=False)
    return merges, wf.select("word", "freq", "symbols")


def bpe_tokenize(
    df: DataFrame,
    trained: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a trained BPE table: explode words with
    position, join the word->symbols segmentation (shuffle-hash on the
    word key; the trained table is vocabulary-sized), re-assemble in
    word order, flatten. Words unseen at training time fall back to
    characters + end marker (the untrained segmentation). Returns
    (id_col, tokens array<string>, n_tokens)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(words(text_col)).alias("pos", "word"),
    ).where(F.length("word") > 0)
    seg = trained.select("word", F.col("symbols").alias("_seg"))
    joined = toks.join(seg.hint("shuffle_hash"), "word", "left").withColumn(
        "_seg", F.coalesce(F.col("_seg"), _char_symbols(F.col("word")))
    )
    per_doc = joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", F.col("_seg").alias("seg")))
                ),
                lambda s: s["seg"],
            )
        ).alias("tokens")
    )
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
            F.coalesce(F.size("tokens"), F.lit(0)).cast("int").alias("n_tokens"),
        )
    )
