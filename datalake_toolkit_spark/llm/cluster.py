"""Duplicate clustering: near-dup PAIRS -> duplicate CLUSTERS.

The dedup operators (``llm.dedup``) emit candidate pairs; a training
pipeline then needs the transitive closure — if A~B and B~C, all
three are one duplicate cluster and exactly one survives. This is
connected components over the pair graph.

Spark-first implementation: iterative min-label propagation with a
pointer-doubling shortcut — each round a node adopts the smallest
component id among its neighbors, then additionally the label OF its
label (path halving). Reach roughly doubles per round, so convergence
is O(log diameter) shuffle rounds, not O(diameter): near-dup graphs
are overwhelmingly star/clique-shaped (2 rounds either way), but the
log bound is what makes adversarial chain-shaped corpora safe at
100 TB. ``localCheckpoint`` truncates the growing lineage each round —
without it the plan doubles per iteration and Catalyst analysis time
explodes long before data does.

No GraphFrames/GraphX dependency: plain DataFrame joins only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component is the
    smallest node id reachable through the pair graph. Deterministic.

    Scale: each round is two id-keyed shuffle joins — neighbor-min
    propagation, then pointer doubling (comp := min(comp, comp[comp]))
    which contracts label chains exponentially. Edges are re-used
    as-is (one symmetrized distinct, computed once). The loop stops as
    soon as a round changes nothing."""
    edges = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).where(F.col(src) != F.col(dst))
    edges = (
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("n_comp"))
        )
        cand = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer doubling: comp values are themselves node ids, so one
        # self-join pulls each node's label's label — label chains
        # contract by half every round (a->b->c->d becomes a->c->d->d)
        relabel = cand.select(
            F.col("node").alias("c_node"), F.col("comp").alias("c_comp")
        )
        new_labels = (
            cand.join(relabel, cand["comp"] == relabel["c_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("c_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Docs annotated with their duplicate cluster: ``cluster_id`` is
    the smallest member id (singletons are their own cluster) and
    ``is_canonical`` marks the one survivor per cluster."""
    comps = connected_components(pairs, src=src, dst=dst)
    return docs.join(
        comps, docs[id_col] == comps["node"], "left"
    ).select(
        docs["*"],
        F.coalesce(F.col("comp"), docs[id_col]).alias("cluster_id"),
    ).withColumn(
        "is_canonical", F.col("cluster_id") == F.col(id_col)
    )


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.9375,
    n_planes: int | None = 4,
    dim: int = 64,
    universe: DataFrame | None = None,
    center: bool = False,
    n_bands: int = 1,
) -> DataFrame:
    """Embedding-space deduplication, end to end: cosine near-dup
    pairs (LSH-blocked when ``n_planes`` is set) -> connected
    components -> min-id canonical per cluster. The semantic twin of
    ``exact_dedup`` — returns ``(id_col, cluster_id, is_canonical)``
    for EVERY input row (singletons are their own cluster).

    Zero-norm vectors (NULL/empty documents hash to the zero vector)
    are excluded from pairing before any cosine is computed: their
    cosine is 0/0 = NaN, and NaN-vs-threshold comparison semantics
    differ between engines (Spark orders NaN above every value), so
    the guard is correctness, not taste. They survive as singleton
    clusters.

    Scale: the pair stage is the LSH-blocked candidate join
    (O(bucket collisions), never all-pairs); components run min-label
    propagation + pointer doubling (O(log diameter) rounds); the
    final join is one id-keyed shuffle. Pick a binary-exact threshold
    (x.9375, x.875) so the >= comparison never straddles a ULP.

    Tune ``n_planes`` to the corpus geometry: sign buckets balance
    only when vector directions spread. Correlated vectors (raw
    bag-of-words counts share the stopword-dominated direction) pile
    into one bucket and the candidate join goes quadratic — measured
    on the sf0.1 synthetic corpus, 4 planes put 58% of docs in a
    single bucket (4.7M candidates) while 16 planes spread them over
    1542 buckets (53k candidates, ~25x faster) at an explicit recall
    trade. Mean-centering or TF-IDF weighting the vectors before
    bucketing is the other lever: both remove the shared component.

    ``universe`` (optional): a cheap ``(id_col)`` frame covering the
    same ids as ``vectors``. When the vector column is itself a
    derived pipeline (hashed embeddings over text), the final
    annotate-every-row join would re-run that pipeline just to list
    ids — pass the underlying id source instead and it is scanned
    once.
    """
    from datalake_toolkit_spark.llm.similarity import (
        _as_double,
        _fold_sum,
        cosine_near_dup_pairs,
    )

    sq_norm = _fold_sum(
        F.transform(_as_double(vec_col), lambda x: x * x)
    )
    nonzero = vectors.select(id_col, vec_col).where(sq_norm > 0)
    pairs = cosine_near_dup_pairs(
        nonzero,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        dim=dim,
        center=center,
        n_bands=n_bands,
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    ids = vectors.select(id_col) if universe is None else universe.select(id_col)
    return dedup_clusters(ids, pairs, id_col=id_col)


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """The deduplicated corpus: one canonical doc (smallest id) per
    duplicate cluster, all other members dropped."""
    return (
        dedup_clusters(docs, pairs, id_col=id_col, src=src, dst=dst)
        .where(F.col("is_canonical"))
        .drop("cluster_id", "is_canonical")
    )
