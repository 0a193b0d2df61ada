"""Similarity search over embedding columns (array<float>).

Two strategies:

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, score with a pure-expression cosine
  (zip_with + fold, JVM-side), take per-query top-k with a window.
  At 100 TB this is one corpus scan per query batch: the right
  baseline, and exact.
- ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH.
  Deterministic pseudo-hyperplanes are derived from md5(plane, dim)
  (engine-portable, no RNG state), each vector gets a sign-bit
  bucket key, and search only scores candidates in the query's
  bucket (plus optional multi-probe neighbors). Trades recall for a
  candidate set ~n/2^planes.

Embeddings are cast to double before arithmetic: float32 folds are
not associative either, and double scoring makes Spark and DuckDB
produce bit-identical cosines (verified empirically).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_toolkit_spark.operators import ensure_min_partitions


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """cos(a, b) as a Catalyst expression (left fold, deterministic)."""
    dot = _fold_sum(F.zip_with(a, b, lambda x, y: x * y))
    return dot / (_l2_norm(a) * _l2_norm(b))


def _l2_norm(v: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(v, lambda x: x * x)))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cos(a, b) given each side's precomputed L2 norm: ONE array fold
    per candidate pair instead of three. Norms are per-VECTOR, so
    computing them in the pre-join projection (once per row) instead
    of inline (once per candidate pair) cuts ~2/3 of the interpreted
    lambda work in pair scoring — bit-identical output, because the
    norm column is the very same expression tree evaluated earlier."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y)) / (na * nb)


def embedding_norms(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    v = _as_double(vec_col)
    return df.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        F.sqrt(_fold_sum(F.transform(v, lambda x: x * x))).alias("l2_norm"),
    )


def pair_cosine_arrow(
    paired: DataFrame,
    a: str = "va",
    b: str = "vb",
    na: str = "na",
    nb: str = "nb",
    out: str = "cosine",
) -> DataFrame:
    """Candidate-pair cosine scoring as a map-only Arrow kernel —
    BIT-IDENTICAL to ``cosine_with_norms(a, b, na, nb)`` (the same
    IEEE doubles through the same op sequence: products in dimension
    order, one strict-left-fold add per dimension — a vectorized
    ``+=`` per dim is exactly ``_fold_sum``'s sequence — then
    ``dot / (na * nb)``), with the interpreted per-element lambda cost
    removed (guide §4.2). Drops the vector/norm columns and appends
    ``out``; every other column passes through.

    ``mapInArrow``, not a pandas UDF, deliberately: Spark's
    pandas→Arrow conversion turns float NaN into NULL, which would
    corrupt genuine NaN cosines (zero-norm vectors) — pyarrow arrays
    built with an explicit validity mask keep NaN as NaN and NULL as
    NULL, exactly like the expression. NULL semantics reproduced
    per row: a NULL vector, a NULL element, or a length mismatch
    (``zip_with`` pads with nulls, nullifying the fold) scores NULL;
    such rows take a per-row fallback that replays the fold
    (pinned by test_pair_cosine_arrow_bit_equality)."""
    import numpy as np
    import pyarrow as pa

    carry = [c for c in paired.columns if c not in (a, b, na, nb)]
    schema = T.StructType(
        [f for f in paired.schema.fields if f.name in carry]
        + [T.StructField(out, T.DoubleType(), True)]
    )

    def list_mat(arr):
        """(n x d matrix, d) for a clean fixed-width list column, or
        (None, None) when any row needs the exact fallback."""
        if arr.null_count != 0:
            return None, None
        if isinstance(arr, pa.ChunkedArray):  # defensive; batches are flat
            arr = arr.combine_chunks()
        vals = arr.values
        if vals.null_count != 0:
            return None, None
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        widths = np.diff(offs)
        if len(widths) == 0:
            return np.empty((0, 0), dtype=np.float64), 0
        d = int(widths[0])
        if not (widths == d).all():
            return None, None
        flat = vals.to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False
        )
        return flat[offs[0]: offs[-1]].reshape(len(arr), d), d

    def fold_cos(va_r, vb_r, na_r, nb_r):
        # exact zip_with + 0.0-seeded fold replay (None nullifies)
        if va_r is None or vb_r is None:
            return None
        m = max(len(va_r), len(vb_r))
        acc = 0.0
        for i in range(m):
            x = va_r[i] if i < len(va_r) else None
            y = vb_r[i] if i < len(vb_r) else None
            if x is None or y is None:
                return None
            acc = acc + x * y
        if na_r is None or nb_r is None:
            return None
        return acc / (na_r * nb_r)

    def score(batches):
        for batch in batches:
            n = batch.num_rows
            cols = {name: batch.column(name) for name in batch.schema.names}
            va, vb = cols[a], cols[b]
            nas, nbs = cols[na], cols[nb]
            ma, d_a = list_mat(va)
            mb, d_b = list_mat(vb)
            if (
                ma is not None
                and mb is not None
                and d_a == d_b
                and nas.null_count == 0
                and nbs.null_count == 0
            ):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(d_a):
                    acc += ma[:, d] * mb[:, d]
                res = acc / (
                    nas.to_numpy(zero_copy_only=False)
                    * nbs.to_numpy(zero_copy_only=False)
                )
                out_arr = pa.array(res, type=pa.float64())  # NaN stays NaN
            else:
                va_l, vb_l = va.to_pylist(), vb.to_pylist()
                na_l, nb_l = nas.to_pylist(), nbs.to_pylist()
                out_arr = pa.array(
                    [
                        fold_cos(va_l[i], vb_l[i], na_l[i], nb_l[i])
                        for i in range(n)
                    ],
                    type=pa.float64(),
                    from_pandas=False,
                )
            yield pa.RecordBatch.from_arrays(
                [cols[c] for c in carry] + [out_arr],
                names=carry + [out],
            )

    return paired.mapInArrow(score, schema=schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (qid, cid, cosine), self
    excluded.

    The query side is broadcast (query batches are small by
    construction); the corpus is scanned once — no shuffle of the
    corpus. The window ranks per query over the scored rows; with
    AQE the post-score partitioning is by qid, so the sort is
    per-query local."""
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _l2_norm(F.col("qv")))
    c = ensure_min_partitions(
        corpus.select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv"))
    ).withColumn("cn", _l2_norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def dimension_means(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """ONE-row frame holding the per-dimension mean of ``vec_col`` as
    an ordered ``array<double>`` column ``_mean`` — the centering
    vector for skew-resistant LSH bucketing. Lazy by construction:
    compose it via ``crossJoin(broadcast(...))`` (a keyless one-row
    broadcast plans as an O(n) BroadcastNestedLoopJoin by design).

    Determinism: computed as exact sum / count, one division at the
    end. For INTEGRAL vectors (hashed counts) every partial sum is an
    exact double, so the mean is bit-identical across engines and
    partitionings; for float vectors the sum is order-dependent and
    centering should not feed an exact-hash oracle."""
    exploded = df.select(F.posexplode(_as_double(vec_col)).alias("_d", "_x"))
    per_dim = exploded.groupBy("_d").agg(
        F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_dim.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("_d", (F.col("_s") / F.col("_n")).alias("_m"))
                )
            ).alias("_pairs")
        )
        .select(F.transform("_pairs", lambda p: p["_m"]).alias("_mean"))
    )


def _plane_component(p: int, d: int) -> float:
    """Pseudo-hyperplane component (p, d) = (md5-prefix(p:d) % 2001 -
    1000) / 1000 — deterministic, engine-portable, approximately
    uniform in [-1, 1]. Same derivation as the SQL oracle's md5
    expression, but evaluated once on the driver."""
    h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def seed_centroid_frame(spark, n_lists: int, dim: int) -> DataFrame:
    """The deterministic seed directions as a ``(list_id, centroid)``
    frame computed IN the JVM — bit-identical to the driver-side
    ``_plane_component`` comprehension (same md5-prefix integer
    arithmetic, one double division), without pickling n_lists x dim
    Python floats through ``createDataFrame`` (~2 s per evaluation at
    16384 x 64, paid once per lineage evaluation)."""
    return spark.range(n_lists).select(
        F.col("id").cast("int").alias("list_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws(":", F.col("id"), d)), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2001
                    - 1000
                )
                / 1000.0
            ),
        ).alias("centroid"),
    )


def _matrix_lit(m: list[list[float]]) -> Column:
    """2-D double-array literal rendered as ONE SQL expression string:
    a single py4j round trip and one Catalyst literal node, vs
    rows*cols F.lit calls (a 16x64 centroid matrix is 1024 round
    trips per plan otherwise)."""
    body = ",".join(
        "array(" + ",".join(f"{x!r}D" for x in row) + ")" for row in m
    )
    return F.expr(f"array({body})")


def projection_matrix(
    out_dim: int, in_dim: int, plane_offset: int = 100_000
) -> list[list[float]]:
    """The deterministic Johnson-Lindenstrauss projection matrix:
    ``out_dim`` pseudo-hyperplane rows from the same md5 derivation as
    the LSH planes (:func:`_plane_component`), offset far past them so
    projection and bucketing never share a direction. Entries are
    ~uniform in [-1, 1] (variance 1/3); rows are scaled by
    ``sqrt(3 / out_dim)`` at apply time so projected vectors preserve
    squared norm in expectation."""
    return [
        [_plane_component(plane_offset + j, d) for d in range(in_dim)]
        for j in range(out_dim)
    ]


def project_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    in_dim: int = 64,
    plane_offset: int = 100_000,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress an embedding
    column to ``out_dim`` dimensions with a deterministic seeded
    matrix — the standard pre-ANN footprint lever (64 -> 16 dims is
    4x fewer probe bytes and 4x cheaper cosines, with pairwise
    distances preserved within the JL bound). One narrow projection
    per row, fully inside Catalyst: y_j = <x, R_j> * sqrt(3/out_dim),
    the matrix a single literal node (one py4j round trip). NULL
    vectors project to NULL; the same md5 derivation is reproducible
    in SQL, so projections hash-check exactly across engines.

    Scale shape: O(rows * out_dim * in_dim) multiply-adds with no
    shuffle, no UDF, no state — a map-only stage that pipelines into
    whatever consumes it (typically ``IVFIndex.build`` on the
    projected column).

    Every OTHER column of the input passes through untouched (labels,
    partition keys, filter metadata ride along); only ``vec_col`` is
    replaced by its projection."""
    import math

    scale = math.sqrt(3.0 / out_dim)
    mat = _matrix_lit(projection_matrix(out_dim, in_dim, plane_offset))
    # materialize the cast array first: a non-trivial expression
    # referenced inside the transform lambda would re-cast the input
    # per OUTPUT element (the documented HOF pitfall)
    passthrough = [c for c in df.columns if c not in (id_col, vec_col)]
    base = df.select(
        F.col(id_col), _as_double(vec_col).alias("_v"), *passthrough
    )
    proj = F.transform(
        mat,
        lambda row: _fold_sum(
            F.zip_with(F.col("_v"), row, lambda x, w: x * w)
        )
        * F.lit(scale),
    )
    # without the guards a NULL input projects to an array of NULLs
    # (transform iterates the non-null matrix), and a WRONG-LENGTH
    # input zip_pads to the same silent NULL components — which
    # downstream index builds would then silently drop. NULL stays
    # NULL; a dimension mismatch fails loudly.
    proj = (
        F.when(F.col("_v").isNull(), F.lit(None))
        .when(F.size("_v") == F.lit(in_dim), proj)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"project_embeddings: expected in_dim={in_dim}, got "
                    ),
                    F.size("_v").cast("string"),
                )
            )
        )
    )
    return base.select(F.col(id_col), proj.alias(vec_col), *passthrough)


def hyperplane_bucket(
    vec_col: Column | str,
    n_planes: int = 8,
    dim: int = 64,
    plane_offset: int = 0,
) -> Column:
    """Sign-bit LSH bucket id in [0, 2^n_planes):
    bit p = [dot(vec, plane_{p + plane_offset}) > 0].

    The plane matrix is row-invariant, so it is folded into a single
    array literal on the driver instead of md5-hashed per row (the
    naive in-expression derivation costs n_planes * dim md5 calls per
    vector). Pass a materialized double-array column to avoid
    re-casting per plane. ``plane_offset`` selects an independent
    plane family — band b of a multi-band scheme uses offset
    b * n_planes so bands never share a plane."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _matrix_lit(
        [
            [_plane_component(p + plane_offset, d) for d in range(dim)]
            for p in range(n_planes)
        ]
    )
    bits = F.transform(
        planes,
        lambda plane, p: F.when(
            _fold_sum(F.zip_with(v, plane, lambda x, w: x * w)) > 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc + b)


def hyperplane_probe_buckets(
    vec_col: Column | str,
    n_planes: int = 8,
    dim: int = 64,
    n_flip: int = 0,
) -> Column:
    """Multi-probe bucket list: the base sign-bit bucket plus the
    ``n_flip`` buckets reached by flipping the planes with the
    smallest |dot| margin — the planes the vector most narrowly
    sided with, i.e. where its true neighbors most likely landed on
    the other side. Classic multi-probe LSH: recall rises toward the
    fewer-planes level without shrinking the planes (bucket
    selectivity for the corpus side is unchanged).

    Returns array<long> of 1 + n_flip bucket ids (pure expression)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _matrix_lit(
        [[_plane_component(p, d) for d in range(dim)] for p in range(n_planes)]
    )
    dots = F.transform(
        planes, lambda plane: _fold_sum(F.zip_with(v, plane, lambda x, w: x * w))
    )
    base = F.aggregate(
        F.transform(
            dots,
            lambda d, p: F.when(d > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc + b,
    )
    if n_flip <= 0:
        return F.array(base)
    margins = F.array_sort(
        F.transform(dots, lambda d, p: F.struct(F.abs(d).alias("m"), p.alias("p")))
    )
    flips = F.transform(
        F.slice(margins, 1, n_flip),
        lambda s: base.bitwiseXOR(
            F.pow(F.lit(2.0), s.getField("p")).cast("long")
        ),
    )
    return F.concat(F.array(base), flips)


def _ivf_assign_expr(mat: Column, v: Column) -> Column:
    """Nearest-centroid (max inner product) list id over a matrix
    COLUMN — argmax spelled as ``array_max`` over (dot, -list_id)
    structs: one transform, size linear in n_lists. A chained
    ``when(dot > best)`` argmax embeds the running best twice per
    step and the tree grows O(2^n_lists) — at 16 lists that alone
    costs seconds of analysis/codegen per pass. Negated id keeps the
    smallest list id on ties. One expression tree shared by the
    literal path (:func:`ivf_assign_col`) and the matrix-as-data path
    (:func:`ivf_assign_with_frame`), so the two can never drift —
    the floats go through identical op sequences either way."""
    dots = F.transform(
        mat,
        lambda c, i: F.struct(
            _fold_sum(F.zip_with(v, c, lambda x, w: x * w)).alias("dot"),
            (-i).alias("neg_id"),
        ),
    )
    return -F.array_max(dots).getField("neg_id")


def _ivf_probe_expr(mat: Column, n_probe: int, v: Column) -> Column:
    """The query-side complement of :func:`_ivf_assign_expr`: the
    ``n_probe`` nearest centroids' list ids (inner product, largest
    list id on ties — ``reverse(array_sort)`` over (dot, list_id)
    structs) as an array expression over a matrix column."""
    dots = F.transform(
        mat,
        lambda c, i: F.struct(
            _fold_sum(F.zip_with(v, c, lambda x, w: x * w)).alias("dot"),
            i.alias("list_id"),
        ),
    )
    ranked = F.reverse(F.array_sort(dots))
    return F.transform(
        F.slice(ranked, 1, n_probe), lambda s: s.getField("list_id")
    )


def ivf_assign_col(
    cents: list[list[float]], vec_col: Column | str = "v"
) -> Column:
    """:func:`_ivf_assign_expr` over a LITERAL centroid matrix — the
    small-n_lists path (one Catalyst literal node; fine to a few
    hundred lists, see :func:`ivf_assign_with_frame` for the scale
    path). Shared by :func:`ivf_assignments` (build/refine passes)
    and :class:`~datalake_toolkit_spark.llm.ann_index.IVFIndex.add`
    (incremental assignment against STORED centroids)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _ivf_assign_expr(_matrix_lit(cents), v)


def ivf_probe_col(
    cents: list[list[float]],
    n_probe: int,
    vec_col: Column | str = "qv",
) -> Column:
    """:func:`_ivf_probe_expr` over a LITERAL centroid matrix.
    Shared by :func:`ivf_topk` and
    :class:`~datalake_toolkit_spark.llm.ann_index.IVFIndex.search`."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _ivf_probe_expr(_matrix_lit(cents), n_probe, v)


def centroid_matrix_frame(cents_df: DataFrame) -> DataFrame:
    """ONE-row ``(cmat)`` frame holding the centroid matrix in
    list_id order as plain DATA — the large-n_lists alternative to
    ``_matrix_lit``, whose k x dim literal strains Catalyst analysis
    well before k reaches the ~sqrt(N) lists a 100 TB corpus wants.
    Broadcast-joined into a plan, the matrix costs O(1) expression
    nodes however large k grows; the collect_list is bounded by
    n_lists (the same bound the driver-side collect had), but the
    values never leave the cluster."""
    return cents_df.groupBy().agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("list_id"), F.col("centroid")))
            ),
            lambda s: s.getField("centroid"),
        ).alias("cmat")
    )


def ivf_assign_with_frame(
    df: DataFrame,
    cents_mat: DataFrame,
    vec_col: Column | str = "v",
    out_col: str = "list_id",
) -> DataFrame:
    """Assign every row's vector to its nearest centroid with the
    matrix-as-data path — no k x dim literal ever enters a plan, and
    results are bit-identical to :func:`ivf_assign_col` (the same
    IEEE doubles through the same op sequence). Since r14 the dots
    run in a salt-cogrouped Arrow kernel (NumPy left-fold — see
    :func:`_best_fine_arrow` for the bit-equality argument) instead
    of the interpreted per-element expression: a deterministic salt
    (``pmod(xxhash64(vec), P)``, guide §2.5) spreads rows over P
    tasks and the matrix frame is replicated P ways, so the kernel
    sees each (salt, batch) once and the matrix crosses the Python
    boundary once per task, never per row."""
    import numpy as np
    import pandas as pd

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    vname = vec_col if isinstance(vec_col, str) else "__ivf_vec"
    src = df if isinstance(vec_col, str) else df.withColumn(vname, v)
    n_salt = max(1, df.sparkSession.sparkContext.defaultParallelism)
    left = src.withColumn(
        "_slt", F.pmod(F.xxhash64(F.col(vname)), F.lit(n_salt)).cast("int")
    )
    right = cents_mat.crossJoin(
        cents_mat.sparkSession.range(n_salt).select(
            F.col("id").cast("int").alias("_slt")
        )
    ).select("_slt", "cmat")
    fields = [
        T.StructField(f.name, f.dataType, f.nullable)
        for f in src.schema.fields
    ]
    out_schema = T.StructType(
        fields + [T.StructField(out_col, T.IntegerType(), True)]
    )
    cols = [f.name for f in src.schema.fields]

    def assign(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            return pd.DataFrame(columns=cols + [out_col])
        if len(r["cmat"].iloc[0]) == 0:
            # empty matrix: argmax over no dots — null list ids, the
            # same rows the expression path would produce. The vec
            # column still needs the all-null object-dtype
            # normalization below (a float64-NaN column can't Arrow-
            # cast to array<double>)
            out = l.drop(columns=["_slt"])
            if out[vname].dtype != object:
                out[vname] = pd.Series(
                    [None] * len(out), dtype=object, index=out.index
                )
            out[out_col] = None
            return out
        mat = np.stack(
            [np.asarray(c, dtype=np.float64) for c in r["cmat"].iloc[0]]
        )
        out = l.drop(columns=["_slt"])
        # NULL vectors -> list 0, the expression path's value (see
        # ivf_assign_lit_kernel; same all-null-batch normalization)
        ok = np.array(
            [isinstance(x, (list, np.ndarray)) for x in l[vname]]
        )
        if out[vname].dtype != object:
            out[vname] = pd.Series(
                [None] * len(out), dtype=object, index=out.index
            )
        lid = np.zeros(len(l), dtype=np.int32)
        if ok.any():
            vecs = np.stack(
                [np.asarray(x, dtype=np.float64) for x in l[vname][ok]]
            )
            acc = np.zeros(
                (vecs.shape[0], mat.shape[0]), dtype=np.float64
            )
            for d in range(vecs.shape[1]):
                acc += vecs[:, d : d + 1] * mat[None, :, d]
            # first max == smallest list id on ties, matching
            # array_max over (dot, -i) structs
            lid[ok] = np.argmax(acc, axis=1).astype(np.int32)
        out[out_col] = lid
        return out

    res = (
        left.groupBy("_slt")
        .cogroup(right.groupBy("_slt"))
        .applyInPandas(assign, schema=out_schema)
    )
    return res if isinstance(vec_col, str) else res.drop(vname)


def ivf_assign_lit_kernel(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "v",
    out_col: str = "list_id",
) -> DataFrame:
    """The LITERAL-centroids assignment as a MAP-ONLY Arrow kernel —
    bit-identical to ``withColumn(out_col, ivf_assign_col(cents,
    vec_col))`` (the same doubles through the same left-fold/argmax
    sequence — see :func:`_best_fine_arrow`), but the dots run
    vectorized in NumPy instead of per-element interpreted. The
    centroids are already driver-side on this path, so they travel in
    the function closure and are turned into one ndarray ONCE PER
    TASK (guide §4.5) — no shuffle, no join, no extra frame; strictly
    the old map-only plan shape with the compute moved to Arrow. For
    the batch paths (builds, adds, Lloyd passes); the expression form
    stays for per-row audit checks."""
    import numpy as np
    import pandas as pd

    mat_rows = [[float(x) for x in c] for c in cents]
    fields = [
        T.StructField(f.name, f.dataType, f.nullable)
        for f in df.schema.fields
    ]
    out_schema = T.StructType(
        fields + [T.StructField(out_col, T.IntegerType(), True)]
    )

    def assign(batches):
        mat = (
            np.asarray(mat_rows, dtype=np.float64)
            if mat_rows
            else None
        )  # once per task, reused across batches
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            if mat is None:
                out[out_col] = None  # argmax over no dots, as before
                yield out
                continue
            # NULL vectors: every dot is null, and the struct max then
            # falls through to the greatest neg_id — list 0. Same
            # value the expression path produced (verified), without
            # crashing np.stack on a missing array. (An ALL-null batch
            # arrives as a float64-NaN column, not object — normalize
            # it back to None so Arrow can emit list<double> nulls.)
            ok = np.array(
                [isinstance(x, (list, np.ndarray)) for x in pdf[vec_col]]
            )
            if out[vec_col].dtype != object:
                out[vec_col] = pd.Series(
                    [None] * len(out), dtype=object, index=out.index
                )
            lid = np.zeros(len(pdf), dtype=np.int32)
            if ok.any():
                vecs = np.stack(
                    [
                        np.asarray(x, dtype=np.float64)
                        for x in pdf[vec_col][ok]
                    ]
                )
                acc = np.zeros(
                    (vecs.shape[0], mat.shape[0]), dtype=np.float64
                )
                for d in range(vecs.shape[1]):
                    acc += vecs[:, d : d + 1] * mat[None, :, d]
                # first max == smallest list id on ties (array_max rule)
                lid[ok] = np.argmax(acc, axis=1).astype(np.int32)
            out[out_col] = lid
            yield out

    return df.mapInPandas(assign, schema=out_schema)


def ivf_probe_with_frame(
    df: DataFrame,
    cents_mat: DataFrame,
    n_probe: int,
    vec_col: Column | str = "qv",
    out_col: str = "probe_lists",
) -> DataFrame:
    """Query-side complement of :func:`ivf_assign_with_frame`: attach
    the ``n_probe`` nearest list ids as an ARRAY column (callers
    explode), matrix-as-data, map-only."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return (
        df.crossJoin(F.broadcast(cents_mat))
        .withColumn(out_col, _ivf_probe_expr(F.col("cmat"), n_probe, v))
        .drop("cmat")
    )


def _lloyd_means_arrow(
    assigned: DataFrame, dim: int, mean_buckets: int = 256
) -> DataFrame:
    """One Lloyd mean pass, Arrow-vectorized: ``(list_id, centroid)``
    for every list that has members — bit-identical to the
    posexplode + double-groupBy expression form (the deterministic
    two-level value-sorted mean: per (list, d, vid % mean_buckets) a
    0.0-seeded left fold over VALUE-SORTED elements, then a
    value-sorted fold over the subtotals, divided by the member
    count).

    The per-segment fold is genuinely SEQUENTIAL: segments are laid
    out as rows of a zero-padded rectangle and summed one element
    position at a time (``subs += rect[:, j]``), which performs
    exactly the fold's IEEE add sequence per segment.
    ``np.add.reduceat`` / ``np.sum`` would NOT be — numpy reduces use
    pairwise/unrolled summation past ~8 elements, which ULP-diverges
    from the strict fold the DuckDB oracle and the expression path
    compute (r14 ADVICE #1; regression-pinned by
    test_lloyd_arrow_long_segments). The tail padding is exact: a
    0.0-seeded fold can never produce -0.0 (IEEE: x + (-x) rounds to
    +0.0), so appending +0.0 terms reproduces the unpadded result bit
    for bit. The outer <= mean_buckets subtotal fold is an explicit
    sequential loop. One shuffle of whole vectors instead of two
    shuffles of n x dim exploded rows, and NumPy instead of
    per-element interpreted lambdas (guide §§2.3, 4.2).

    Memory bound: each list's member set is concentrated into ONE
    applyInPandas group — O(members x dim x 8 B) plus the same again
    for the padded rectangle in one Python worker (the r14 trade for
    killing the exploded double-shuffle; ADVICE documents it). Lists
    are ~N/n_lists ~ sqrt(N) rows by construction, so at 100 TB /
    n_lists=16k a 64-dim list is ~tens of MB — well inside a worker.
    For pathologically skewed lists, rebuild with more lists."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("list_id", T.IntegerType(), False),
            T.StructField(
                "centroid", T.ArrayType(T.DoubleType()), False
            ),
        ]
    )

    def mean(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL vectors never entered the mean: posexplode(NULL) emits
        # no rows — drop them here the same way (an all-null list
        # emits no row and keeps its previous centroid)
        pdf = pdf[
            np.array(
                [isinstance(r, (list, np.ndarray)) for r in pdf["v"]]
            )
        ]
        if pdf.empty:
            # object-dtyped empty columns: a bare {} literal would
            # infer float64, which Arrow can't cast to list<double>
            return pd.DataFrame(columns=["list_id", "centroid"])
        vecs = np.stack(
            [np.asarray(r, dtype=np.float64) for r in pdf["v"]]
        )
        b = (pdf["vid"].to_numpy() % mean_buckets).astype(np.int64)
        n, ndim = vecs.shape
        # segment layout depends only on the BUCKET multiset (bucket
        # is the primary sort key in every per-dim lexsort below), so
        # compute it once and share it across dimensions
        bs = np.sort(b)
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        counts = np.diff(np.r_[starts, n])
        nseg, maxlen = len(starts), int(counts.max())
        seg_of = np.repeat(np.arange(nseg), counts)
        pos_in = np.arange(n) - np.repeat(starts, counts)
        # zero-padded rectangle: row = segment, columns = the
        # segment's VALUE-SORTED elements then +0.0 padding
        rect = np.zeros((nseg, maxlen, ndim), dtype=np.float64)
        for d in range(ndim):
            x = vecs[:, d]
            order = np.lexsort((x, b))  # by bucket, then by value
            rect[seg_of, pos_in, d] = x[order]
        # strict sequential left fold per segment: one IEEE add per
        # element position, in order — 0.0 + x0 + x1 + ...; the
        # padding terms are exact no-ops (a 0.0-seeded fold is never
        # -0.0, and r + 0.0 == r for every other float)
        subs = np.zeros((nseg, ndim), dtype=np.float64)
        for j in range(maxlen):
            subs += rect[:, j, :]
        # value-sorted sequential fold over the <= mean_buckets
        # subtotals (per dimension), then the mean
        subs = np.sort(subs, axis=0)
        total = np.zeros(ndim, dtype=np.float64)
        for k in range(nseg):
            total += subs[k, :]
        cent = total / n
        return pd.DataFrame(
            {
                "list_id": [int(pdf["list_id"].iloc[0])],
                "centroid": [cent.tolist()],
            }
        )

    return (
        assigned.select("vid", "v", "list_id")
        .groupBy("list_id")
        .applyInPandas(mean, schema=out_schema)
    )


def ivf_assignments(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    lloyd_iters: int = 2,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (inverted list).

    Centroids start as deterministic pseudo-random unit directions
    (same md5 derivation as the LSH planes, so runs are reproducible
    with no RNG state) and are refined with ``lloyd_iters`` Lloyd
    iterations — each iteration is one narrow assignment pass plus a
    two-level deterministic-mean shuffle (value-sorted folds inside
    id-keyed sub-buckets, then over the subtotals — bit-reproducible,
    unlike avg()); centroids come back to the driver (n_lists x dim
    floats, tiny) and re-enter the plan as literals.

    Returns (assignments DataFrame: id, list_id, vector; centroids).
    This is the k-means-style iterative-algorithm shape: driver-side
    loop over DataFrame jobs, nothing collected but the centroids.
    """
    staged = ensure_min_partitions(
        corpus.select(F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"))
    )
    if lloyd_iters > 0:
        # iterative refinement re-scans the vectors once per pass;
        # persist the cast working set for the duration (the MLlib
        # KMeans pattern — spills to disk if it doesn't fit executor
        # memory, evicted LRU afterwards)
        staged = staged.persist()
    centroids = [
        [_plane_component(p, d) for d in range(dim)] for p in range(n_lists)
    ]

    # Lloyd means MUST be bit-deterministic: a plain avg() sums floats
    # in shuffle-fetch order, and a ULP of run-to-run (or Spark-vs-
    # oracle) drift feeds a discrete argmax that can flip a list
    # assignment. Same rule as pool_embeddings: strict left fold over
    # VALUE-SORTED elements — but corpus-sized lists can't collect into
    # one array, so fold at two levels: deterministic id-keyed
    # sub-buckets (vid % _MEAN_BUCKETS, bounded arrays), then a sorted
    # fold over the <= _MEAN_BUCKETS subtotals. Both levels are one
    # IEEE sequence either engine reproduces exactly.
    for _ in range(lloyd_iters):
        assigned = ivf_assign_lit_kernel(
            staged.select("vid", "v"), centroids
        )
        moved = {
            r["list_id"]: list(r["centroid"])
            for r in _lloyd_means_arrow(assigned, dim).collect()
        }
        # empty lists keep their previous centroid (the mean emits all
        # dims for every assigned list — same merge rule as before)
        centroids = [
            moved.get(i, centroids[i]) for i in range(len(centroids))
        ]
    return (
        ivf_assign_lit_kernel(staged.select("vid", "v"), centroids),
        centroids,
    )


def ivf_assignments_frames(
    corpus: DataFrame,
    n_lists: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    lloyd_iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Large-n_lists IVF quantization: the same contract (and the
    same bit-level results) as :func:`ivf_assignments`, but centroids
    live in a DataFrame END TO END — no k x dim literal ever enters a
    plan and the Lloyd refinement never collects corpus-derived
    values to the driver. This is the path a 100 TB index wants,
    where n_lists ~ sqrt(N) reaches 10^4-10^5 and a literal
    array-of-arrays per pass strains Catalyst (the r11 verdict's
    scale ceiling #3).

    Per pass: assignment is the map-only matrix-as-data cross-join
    (:func:`ivf_assign_with_frame`); the deterministic two-level
    value-sorted mean (identical fold structure to the literal path)
    stays a DataFrame, per-list rows are rebuilt by a sorted
    collect over the dim components (every assigned list has all
    components; empty lists KEEP their previous centroid row, the
    same rule the driver-side merge applied), and the k-row result is
    ``localCheckpoint``-ed to cut the per-iteration lineage — the
    only materialization, k x dim doubles spread over the cluster.

    Seed directions are generated on the driver (pure function of
    (p, d), bounded by n_lists x dim — no corpus data round-trips)
    so both paths start from identical floats.

    Returns (assignments (vid, v, list_id), centroids (list_id,
    centroid))."""
    spark = corpus.sparkSession
    staged = ensure_min_partitions(
        corpus.select(
            F.col(id_col).alias("vid"), _as_double(vec_col).alias("v")
        )
    )
    if lloyd_iters > 0:
        staged = staged.persist()
    cents = seed_centroid_frame(spark, n_lists, dim)
    for _ in range(lloyd_iters):
        assigned = ivf_assign_with_frame(
            staged, centroid_matrix_frame(cents), "v"
        )
        moved = _lloyd_means_arrow(assigned, dim)
        kept = cents.join(moved, "list_id", "left_anti")
        cents = moved.unionByName(kept).localCheckpoint(eager=True)
    return (
        ivf_assign_with_frame(staged, centroid_matrix_frame(cents), "v"),
        cents,
    )


def two_level_cell_rows(
    cents: DataFrame, dim: int, n_cells: int | None = None,
    lloyd_iters: int = 1,
) -> tuple[DataFrame, DataFrame, int]:
    """The PERSISTABLE half of :func:`two_level_centroid_frames`:
    ``(coarse_rows (cell_id, centroid), cells (cell_id, fids, fmat),
    n_cells_requested)`` — plain row frames an
    :class:`~datalake_toolkit_spark.llm.ann_index.IVFIndex` commits
    as LakeTables (coarse snapshot-written, cells partitioned by
    cell_id so a probe LISTS only the probed cells' directories).
    Deterministic in ``cents`` — recomputing from the same committed
    fine centroids always yields the same cells."""
    return _two_level_cell_rows_impl(cents, dim, n_cells, lloyd_iters)


def two_level_centroid_frames(
    cents: DataFrame, dim: int, n_cells: int | None = None,
    lloyd_iters: int = 1,
) -> dict:
    """Two-level coarse quantizer over a FINE centroid frame
    (list_id, centroid) — the n_lists >= ~10^4 lever the flat
    matrix-as-data path stops short of (its one-row broadcast is
    O(n_lists x dim) and every vector pays n_lists dot products).
    Cluster the fine centroids themselves into ``n_cells``
    (default ceil(sqrt(k))) coarse cells with the same deterministic
    seed + Lloyd machinery (a k-row job — tiny), then group the fine
    matrix per cell. Returns ``{"coarse": one-row coarse matrix
    frame (O(sqrt(k) x dim) broadcast), "cells": (cell_id, fids,
    fmat) — one row per cell, the fine centroids as DATA, "n_cells"}``.
    Assignment/probing against these frames costs O(sqrt(k)) coarse
    dots plus O(k / sqrt(k)) fine dots per probed cell instead of
    O(k), and no plan node or broadcast ever scales with k.

    The coarse matrix holds ONLY non-empty cells, their ids remapped
    contiguously so the index-as-id contract of
    :func:`centroid_matrix_frame` still holds (r13 ADVICE #1: empty
    cells kept their seed positions in the matrix, so a vector whose
    n_probe_cells nearest coarse centroids were ALL empty inner-joined
    against nothing and silently vanished from the assignment — data
    loss, not a recall trade). Every fine centroid lands in some
    cell, so the non-empty cells partition the full fine matrix and
    full-cell probes stay bit-equal to the flat path."""
    coarse_rows, cells, n_cells = _two_level_cell_rows_impl(
        cents, dim, n_cells, lloyd_iters
    )
    return {
        "coarse": centroid_matrix_frame(
            coarse_rows.select(
                F.col("cell_id").alias("list_id"), "centroid"
            )
        ),
        "cells": cells,
        "n_cells": n_cells,
        # the persistable row form, so IVFIndex.build commits the
        # SAME computed structure instead of re-deriving it
        "coarse_rows": coarse_rows,
    }


def _two_level_cell_rows_impl(
    cents: DataFrame, dim: int, n_cells: int | None = None,
    lloyd_iters: int = 1,
) -> tuple[DataFrame, DataFrame, int]:
    import math

    from pyspark.sql import Window

    k = cents.count()
    n_cells = n_cells or max(1, math.isqrt(max(1, k - 1)) + 1)
    assigned, coarse = ivf_assignments_frames(
        cents.select(
            F.col("list_id").alias("vec_id"),
            F.col("centroid").alias("embedding"),
        ),
        n_lists=n_cells,
        dim=dim,
        lloyd_iters=lloyd_iters,
    )
    # <= n_cells rows: the one-partition window is metadata-sized
    remap = (
        assigned.select(F.col("list_id").alias("old_cell"))
        .distinct()
        .withColumn(
            "cell_id",
            F.row_number().over(Window.orderBy("old_cell")) - 1,
        )
    )
    coarse_rows = coarse.join(
        remap, coarse["list_id"] == remap["old_cell"]
    ).select("cell_id", "centroid")
    cells = (
        assigned.join(
            remap, assigned["list_id"] == remap["old_cell"]
        )
        .select(
            "cell_id",
            F.col("vid").alias("fid"),
            F.col("v").alias("fc"),
        )
        .groupBy("cell_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("fid"), F.col("fc")))
            ).alias("_s")
        )
        .select(
            "cell_id",
            F.transform(F.col("_s"), lambda s: s.getField("fid")).alias(
                "fids"
            ),
            F.transform(F.col("_s"), lambda s: s.getField("fc")).alias(
                "fmat"
            ),
        )
        .localCheckpoint(eager=True)
    )
    return coarse_rows, cells, n_cells


def _best_fine_arrow(
    ex: DataFrame, cells: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Per (row, probed cell): the best ``(dot, neg_id)`` over the
    cell's fine centroids — the Arrow-vectorized twin of
    ``array_max(_cell_dots_expr(...))``. Catalyst higher-order
    functions evaluate per element with no whole-stage codegen, so
    an assignment pass pays ~µs per 64-dim dot; handing each
    (cell, vector-batch) cogroup to NumPy computes the same floats
    ~50x faster (optimization guide §4.2). BIT-IDENTICAL by
    construction: products are the same elementwise IEEE doubles and
    the reduction is a strict left fold in dimension order (one
    vectorized ``+=`` per dimension — exactly the add sequence
    ``_fold_sum`` evaluates), and ``np.argmax``'s first-hit tie rule
    equals the struct max's greatest ``neg_id`` (smallest fid)
    because fids are sorted ascending. Cogrouping (not a join)
    moves each cell's fine matrix across the Python boundary ONCE
    per task, not once per row; groups empty on either side return
    nothing, matching the original inner join.

    NULL vectors emit ``(dot=-inf, neg_id=0)``: the cross-cell max
    then lands them on list 0, exactly like the flat kernels
    (``ivf_assign_lit_kernel`` / ``ivf_assign_with_frame``), so
    ``two_level_assign`` keeps its row set — and its bit-equality to
    the flat path — even for null-vec inputs (r14 ADVICE #2; in-repo
    IVF callers filter nulls in ``_prep`` before ever reaching
    here)."""
    import numpy as np
    import pandas as pd

    fields = [
        T.StructField(f.name, f.dataType, f.nullable)
        for f in ex.schema.fields
    ]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("dot", T.DoubleType(), False),
            T.StructField("neg_id", T.IntegerType(), False),
        ]
    )
    cols = [f.name for f in ex.schema.fields]

    def best(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(columns=cols + ["dot", "neg_id"])
        fids = np.asarray(right["fids"].iloc[0], dtype=np.int64)
        fmat = np.stack(
            [np.asarray(r, dtype=np.float64) for r in right["fmat"].iloc[0]]
        )
        out = left.copy()
        # NULL vectors -> (-inf, 0): the cross-cell max lands them on
        # list 0 like the flat kernels. (An ALL-null batch arrives as
        # a float64-NaN column — normalize to object so Arrow can
        # emit list<double> nulls, same as the assign kernels.)
        ok = np.array(
            [isinstance(x, (list, np.ndarray)) for x in left[vec_col]]
        )
        if out[vec_col].dtype != object:
            out[vec_col] = pd.Series(
                [None] * len(out), dtype=object, index=out.index
            )
        dot = np.full(len(left), -np.inf, dtype=np.float64)
        neg = np.zeros(len(left), dtype=np.int32)
        if ok.any():
            vecs = np.stack(
                [np.asarray(r, dtype=np.float64) for r in left[vec_col][ok]]
            )
            # strict left fold over dimensions: acc_d = acc_{d-1} +
            # x_d*w_d, one IEEE add per step in index order ==
            # _fold_sum's sequence
            acc = np.zeros((vecs.shape[0], fmat.shape[0]), dtype=np.float64)
            for d in range(vecs.shape[1]):
                acc += vecs[:, d : d + 1] * fmat[None, :, d]
            pick = np.argmax(acc, axis=1)  # first max == smallest fid on ties
            dot[ok] = acc[np.arange(len(pick)), pick]
            neg[ok] = (-fids[pick]).astype(np.int32)
        out["dot"] = dot
        out["neg_id"] = neg
        return out

    return (
        ex.groupBy("cell_id")
        .cogroup(
            cells.select("cell_id", "fids", "fmat").groupBy("cell_id")
        )
        .applyInPandas(best, schema=out_schema)
    )


def _cell_dots_expr(fmat: Column, fids: Column, v: Column) -> Column:
    """(dot, neg_id) structs for a vector against ONE cell's fine
    centroids — the same fold/zip arithmetic as
    :func:`_ivf_assign_expr`, with the cell's REAL list ids riding
    along, so a max over the union of every cell's structs is the
    flat argmax bit for bit."""
    return F.transform(
        fmat,
        lambda c, i: F.struct(
            _fold_sum(F.zip_with(v, c, lambda x, w: x * w)).alias("dot"),
            (-F.element_at(fids, i + 1)).alias("neg_id"),
        ),
    )


def two_level_assign(
    df: DataFrame,
    frames: dict,
    n_probe_cells: int = 1,
    vec_col: str = "v",
    id_col: str = "vid",
) -> DataFrame:
    """Assign each vector to its nearest FINE centroid, two-level:
    probe the ``n_probe_cells`` nearest coarse cells (map-only,
    O(sqrt(k) x dim) broadcast), then argmax over only those cells'
    fine centroids (equi-join on cell_id — the fine matrices arrive
    partitioned, never broadcast whole). Approximate for
    n_probe_cells < n_cells (the true nearest fine centroid can sit
    in an unprobed cell — the standard IMI trade); at n_probe_cells
    = n_cells the union of probed cells is the full matrix and the
    result is BIT-IDENTICAL to the flat path
    (test_two_level_full_probe_equals_flat). Returns (id_col,
    vec_col, list_id)."""
    if n_probe_cells >= frames["n_cells"]:
        # full-cell probe (every build/add/sync assignment): probing
        # ALL cells makes the coarse dot-and-sort pass pure overhead —
        # the downstream per-cell argmax + cross-cell max is order-
        # independent, so pairing each vector with every cell id
        # directly is bit-identical and skips O(rows x sqrt(k) x dim)
        # interpreted work
        # pair every vector with every LIVE cell id (aliased so the
        # cogroup below doesn't see a self-join of the cells frame;
        # live-only, because a cogroup group with rows on the left and
        # an EMPTY right side segfaults this pyspark's arrow loader —
        # and only live cells exist in the coarse matrix anyway)
        live = frames["cells"].select(
            F.col("cell_id").alias("__live_cell")
        )
        ex = (
            df.select(id_col, vec_col)
            .crossJoin(F.broadcast(live))
            .withColumnRenamed("__live_cell", "cell_id")
        )
    else:
        probed = ivf_probe_with_frame(
            df.select(id_col, vec_col),
            frames["coarse"],
            n_probe_cells,
            vec_col,
            "cells",
        )
        ex = probed.select(
            id_col, vec_col, F.explode("cells").alias("cell_id")
        )
    # Arrow-vectorized per-cell argmax (bit-identical to
    # array_max(_cell_dots_expr(...)) over the inner join — see
    # _best_fine_arrow): the fine dots are the dominant interpreted
    # cost of every two-level assignment pass
    per_cell = _best_fine_arrow(ex, frames["cells"], vec_col, id_col).select(
        id_col,
        vec_col,
        F.struct(
            F.col("dot").alias("dot"), F.col("neg_id").alias("neg_id")
        ).alias("best"),
    )
    if n_probe_cells == 1:
        return per_cell.select(
            id_col, vec_col, (-F.col("best.neg_id")).alias("list_id")
        )
    return (
        per_cell.groupBy(id_col)
        .agg(
            F.max("best").alias("best"),
            F.first(vec_col).alias(vec_col),  # replicas are identical
        )
        .select(id_col, vec_col, (-F.col("best.neg_id")).alias("list_id"))
    )


def two_level_probe(
    queries: DataFrame,
    frames: dict,
    n_probe: int,
    n_probe_cells: int = 1,
    vec_col: str = "qv",
    id_col: str = "qid",
) -> DataFrame:
    """Query-side complement: the ``n_probe`` nearest FINE list ids
    (largest id on ties, matching :func:`_ivf_probe_expr`) found
    inside the ``n_probe_cells`` nearest coarse cells. Per (query,
    cell) only the cell's top ``n_probe`` structs survive, so the
    cross-cell merge handles <= n_probe_cells x n_probe rows per
    query. Returns (id_col, probe_lists array<int>)."""
    probed = ivf_probe_with_frame(
        queries.select(id_col, vec_col),
        frames["coarse"],
        n_probe_cells,
        vec_col,
        "cells",
    )
    ex = probed.select(
        id_col, vec_col, F.explode("cells").alias("cell_id")
    )
    per_cell = ex.join(frames["cells"], "cell_id").select(
        id_col,
        F.slice(
            F.reverse(
                F.array_sort(
                    F.transform(
                        _cell_dots_expr(
                            F.col("fmat"), F.col("fids"), F.col(vec_col)
                        ),
                        lambda s: F.struct(
                            s.getField("dot").alias("dot"),
                            (-s.getField("neg_id")).alias("list_id"),
                        ),
                    )
                )
            ),
            1,
            n_probe,
        ).alias("tops"),
    )
    return (
        per_cell.select(id_col, F.explode("tops").alias("s"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(F.collect_list("s"))),
                    1,
                    n_probe,
                ),
                lambda s: s.getField("list_id"),
            ).alias("probe_lists")
        )
    )


def ivf_assignments_two_level(
    corpus: DataFrame,
    n_lists: int = 16384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    lloyd_iters: int = 1,
    n_probe_cells: int | None = None,
) -> tuple[DataFrame, DataFrame, dict]:
    """Two-level IVF quantization: the ``ivf_assignments_frames``
    contract at n_lists >= ~10^4, where even the matrix-as-data
    path's one-row broadcast (O(n_lists x dim)) stops scaling. Each
    Lloyd pass rebuilds the coarse structure over the moving fine
    centroids and assigns through the probed cells;
    ``n_probe_cells=None`` (the default) probes EVERY cell per pass,
    making each assignment BIT-EQUAL to the flat argmax — same
    fold/zip arithmetic, distributed through a partitioned cell join
    instead of one giant broadcast row — so the persistent index's
    audit contract (assignment == flat argmax) holds. A small
    ``n_probe_cells`` is the IMI approximation trade, used by
    :func:`ivf_topk_two_level` for one-shot analytics.

    Returns (assigned (vid, v, list_id), cents (list_id, centroid),
    frames — the FINAL :func:`two_level_centroid_frames` dict, so
    callers probe without recomputing the cell structure)."""
    import math

    staged = ensure_min_partitions(
        corpus.select(
            F.col(id_col).alias("vid"), _as_double(vec_col).alias("v")
        )
    ).persist()
    cents = seed_centroid_frame(corpus.sparkSession, n_lists, dim)
    # the default cell count two_level_centroid_frames would derive
    # from cents.count() — passed explicitly so the frames builder
    # never has to evaluate the centroid lineage just to count it
    k_cells = max(1, math.isqrt(max(1, n_lists - 1)) + 1)
    for _ in range(lloyd_iters):
        frames = two_level_centroid_frames(cents, dim=dim, n_cells=k_cells)
        npc = n_probe_cells or frames["n_cells"]
        assigned = two_level_assign(staged, frames, npc)
        moved = _lloyd_means_arrow(assigned, dim)
        kept = cents.join(moved, "list_id", "left_anti")
        cents = moved.unionByName(kept).localCheckpoint(eager=True)
    frames = two_level_centroid_frames(cents, dim=dim, n_cells=k_cells)
    assigned = two_level_assign(
        staged, frames, n_probe_cells or frames["n_cells"]
    )
    return assigned, cents, frames


def ivf_topk_two_level(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16384,
    n_probe: int = 64,
    n_probe_cells: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    dim: int = 64,
    lloyd_iters: int = 1,
) -> DataFrame:
    """IVF cosine top-k at two-level scale (the r12 verdict's #6):
    train the fine centroids with Lloyd passes whose ASSIGNMENT step
    runs two-level (coarse structure rebuilt over the moving fine
    centroids each pass), assign the corpus two-level, probe
    queries two-level, score exact cosine inside the probed lists.
    No plan node, literal, or broadcast scales with ``n_lists`` —
    the coarse matrix broadcast is O(sqrt(n_lists) x dim) and the
    fine matrices travel as a partitioned (cell_id, fmat) frame.
    Recall contract: at ``n_probe_cells = n_cells`` and ``n_probe =
    n_lists`` the serve is exact (bit-equal assignment to the flat
    path plus a full probe — recall 1.0, pinned in tests); below
    that, recall degrades with both knobs exactly like the flat
    path's n_probe knob, the documented IVF trade."""
    assigned, _cents, frames = ivf_assignments_two_level(
        corpus, n_lists=n_lists, id_col=id_col, vec_col=vec_col,
        dim=dim, lloyd_iters=lloyd_iters, n_probe_cells=n_probe_cells,
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        _as_double(query_vec_col).alias("qv"),
    )
    probes = two_level_probe(q, frames, n_probe, n_probe_cells)
    cand = (
        q.join(probes, "qid")
        .select("qid", "qv", F.explode("probe_lists").alias("list_id"))
        .join(assigned, "list_id")
        .where(F.col("qid") != F.col("vid"))  # self excluded, like cosine_topk
        .select(
            "qid",
            F.col("vid").alias("cid"),
            cosine_similarity_col(F.col("qv"), F.col("v")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("cid")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    lloyd_iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors whose
    inverted list is among the query's ``n_probe`` nearest centroids.

    The corpus is quantized once (see :func:`ivf_assignments`);
    queries explode to n_probe (qid, list_id) rows and equi-join the
    inverted lists — candidate volume ~ corpus * n_probe / n_lists.
    Raising n_probe trades work for recall; n_probe = n_lists is
    exact. The standard middle ground between brute force and LSH
    when the corpus has cluster structure.

    Above 512 lists the quantization and the query probe run through
    the matrix-as-data path (no k x dim literal in any plan, fully
    distributed Lloyd) — same selection rule as the persistent
    ``IVFIndex``, bit-identical results either way.
    """
    if n_lists >= 512:
        assigned, cents_df = ivf_assignments_frames(
            corpus, n_lists, id_col, vec_col, dim, lloyd_iters
        )
        mat = centroid_matrix_frame(cents_df)
        q = ivf_probe_with_frame(
            queries.select(
                F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
            ).withColumn("qn", _l2_norm(F.col("qv"))),
            mat,
            n_probe,
            "qv",
        ).select(
            "qid", "qv", "qn",
            F.explode_outer("probe_lists").alias("list_id"),
        )
        scored = (
            assigned.withColumn("vn", _l2_norm(F.col("v")))
            .hint("shuffle_hash")
            .join(F.broadcast(q), "list_id")
            .where(F.col("qid") != F.col("vid"))
            .select(
                "qid",
                F.col("vid").alias("cid"),
                cosine_with_norms(
                    F.col("qv"), F.col("v"), F.col("qn"), F.col("vn")
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("qid").orderBy(
            F.desc("cosine"), F.asc("cid")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "cid", "cosine", "rank")
        )
    assigned, centroids = ivf_assignments(
        corpus, n_lists, id_col, vec_col, dim, lloyd_iters
    )

    def probe_lists(cents: list[list[float]]) -> Column:
        return ivf_probe_col(cents, n_probe, "qv")

    q = (
        queries.select(F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv"))
        .withColumn("qn", _l2_norm(F.col("qv")))
        .select(
            "qid", "qv", "qn", F.explode_outer(probe_lists(centroids)).alias("list_id")
        )
    )
    scored = (
        assigned.withColumn("vn", _l2_norm(F.col("v")))
        .hint("shuffle_hash")
        .join(F.broadcast(q), "list_id")
        .where(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            F.col("vid").alias("cid"),
            cosine_with_norms(
                F.col("qv"), F.col("v"), F.col("qn"), F.col("vn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    dim: int = 64,
    center: bool = False,
    n_bands: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine)
    with id_a < id_b and cosine >= threshold.

    Two modes:

    - ``n_planes=None`` — exact all-pairs (nested-loop on id_a <
      id_b). Quadratic: the ground-truth/validation path, also the
      oracle's formulation.
    - ``n_planes=k`` — LSH-blocked: only pairs sharing a
      hyperplane-sign bucket are scored (equi-join on bucket, then
      the id ordering). The scale path: candidate count is
      O(collisions), recall is tunable via k exactly like
      :func:`lsh_bucketed_topk`.

    ``center=True`` subtracts the per-dimension corpus mean BEFORE
    bucketing (cosine is still scored on the raw vectors): correlated
    corpora (bag-of-words counts share the stopword direction) pile
    into one sign bucket and the candidate join goes quadratic;
    centering removes the shared component so buckets balance at the
    same plane count. Near-identical duplicates keep colliding — their
    residuals coincide, so centering cannot separate them — while the
    non-duplicate mass spreads out; pairs that are merely
    direction-similar (residuals uncorrelated) DO lose recall, the
    same trade as adding planes (measured on the synthetic sf0.1
    corpus: 4 planes centered = 2836 pairs/5.4s vs uncentered
    5175/13.3s at threshold 0.9375). One extra corpus pass for the
    mean, composed lazily as a one-row broadcast (keyless broadcast =
    O(n) BroadcastNestedLoopJoin by design).

    ``n_bands > 1`` is OR-amplification (the MinHash banding scheme
    applied to sign LSH): each band hashes on its OWN ``n_planes``
    disjoint planes and a pair becomes a candidate when ANY band
    matches — per-band match probability p = (1 - θ/π)^n_planes
    amplifies to 1 - (1 - p)^n_bands, so recall rises without
    fattening any single bucket. Candidates dedupe on (id_a, id_b)
    BEFORE scoring (a pair colliding in 3 bands is scored once), then
    vectors re-join by id — three narrow shuffles instead of shipping
    vectors through the band join.
    """
    if n_planes is None and (n_bands > 1 or center):
        # banding/centering only shape the LSH bucketing; without
        # planes the call would silently fall back to the quadratic
        # all-pairs path — fail loudly instead (semantic_dedup callers
        # inherit this guard too)
        raise ValueError(
            "n_bands > 1 / center=True require n_planes (they configure "
            "LSH bucketing); without n_planes this is the exact all-pairs "
            "path and they would be silently ignored"
        )
    c = ensure_min_partitions(
        corpus.select(F.col(id_col).alias("id_a"), _as_double(vec_col).alias("va"))
    ).withColumn("na", _l2_norm(F.col("va")))
    if n_planes is not None and n_bands > 1:
        bucket_src = F.col("va")
        if center:
            c = c.crossJoin(F.broadcast(dimension_means(c, "va")))
            bucket_src = F.zip_with(
                F.col("va"), F.col("_mean"), lambda x, m: x - m
            )
        bands = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hyperplane_bucket(
                            bucket_src, n_planes, dim, plane_offset=b * n_planes
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        )
        keyed = c.select("id_a", bands.alias("bk")).select(
            "id_a", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )
        otherk = keyed.select(
            F.col("id_a").alias("id_b"), "band", "key"
        ).hint("shuffle_hash")
        cand = (
            keyed.hint("shuffle_hash")
            .join(otherk, ["band", "key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        vecs = c.select("id_a", "va", "na")
        paired = cand.join(vecs.hint("shuffle_hash"), "id_a").join(
            vecs.select(
                F.col("id_a").alias("id_b"),
                F.col("va").alias("vb"),
                F.col("na").alias("nb"),
            ).hint("shuffle_hash"),
            "id_b",
        )
    elif n_planes is not None:
        bucket_src = F.col("va")
        if center:
            c = c.crossJoin(F.broadcast(dimension_means(c, "va")))
            bucket_src = F.zip_with(
                F.col("va"), F.col("_mean"), lambda x, m: x - m
            )
        c = c.select(
            "id_a",
            "va",
            "na",
            hyperplane_bucket(bucket_src, n_planes, dim).alias("bucket"),
        )
        other = c.select(
            F.col("id_a").alias("id_b"),
            F.col("va").alias("vb"),
            F.col("na").alias("nb"),
            "bucket",
        ).hint("shuffle_hash")
        paired = c.hint("shuffle_hash").join(other, "bucket").where(
            F.col("id_a") < F.col("id_b")
        )
    else:
        other = c.select(
            F.col("id_a").alias("id_b"),
            F.col("va").alias("vb"),
            F.col("na").alias("nb"),
        )
        paired = c.join(other, F.col("id_a") < F.col("id_b"))
    # pair scoring runs in the map-only Arrow kernel (bit-identical to
    # cosine_with_norms — see pair_cosine_arrow); the explicit select
    # keeps column pruning alive under the opaque mapInArrow (guide §4)
    return pair_cosine_arrow(
        paired.select("id_a", "id_b", "va", "vb", "na", "nb")
    ).where(F.col("cosine") >= threshold)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_flip: int = 0,
    center: bool = False,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket(s). Bucket assignment is a narrow projection;
    the join is an equi-join on bucket (shuffle on bucket id,
    ~n/2^planes candidates per query). Recall is tunable via n_planes
    (fewer planes = bigger buckets = higher recall, more work) and —
    without touching corpus-side selectivity — via ``n_flip``
    multi-probe: each query additionally probes the buckets reached
    by flipping its lowest-|margin| planes, multiplying candidates by
    ~(1 + n_flip)/1 for the query side only.

    ``center=True`` subtracts the CORPUS per-dimension mean before
    bucketing on BOTH sides (cosine still scores raw vectors) — the
    same skew fix as the near-dup pairing: correlated corpora put
    most vectors in one sign bucket, and centering spreads them. The
    query side must center with the corpus mean, never its own: the
    two sides have to hash into the same space."""
    # Double-cast vectors materialize as attributes before the
    # n_planes dot-product lambdas read them (avoids per-plane
    # re-evaluation of the cast).
    corpus_v = ensure_min_partitions(
        corpus.select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv"))
    )
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
    )
    q_src: Column = F.col("qv")
    c_src: Column = F.col("cv")
    if center:
        means = dimension_means(corpus_v, "cv")
        corpus_v = corpus_v.crossJoin(F.broadcast(means))
        q = q.crossJoin(F.broadcast(means))
        q_src = F.zip_with(F.col("qv"), F.col("_mean"), lambda x, m: x - m)
        c_src = F.zip_with(F.col("cv"), F.col("_mean"), lambda x, m: x - m)
    q = q.select(
        "qid",
        "qv",
        F.explode(
            hyperplane_probe_buckets(q_src, n_planes, dim, n_flip)
        ).alias("bucket"),
    )
    c = corpus_v.select(
        "cid",
        "cv",
        _l2_norm(F.col("cv")).alias("cn"),
        hyperplane_bucket(c_src, n_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q.withColumn("qn", _l2_norm(F.col("qv")))), "bucket")
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    out_col: str = "pooled",
) -> DataFrame:
    """Mean-pool vectors per group — the chunk->document embedding
    aggregation (average of chunk embeddings as the doc embedding).

    posexplode -> groupBy(group, dim) -> mean -> re-assemble via the
    ordered-collect operator: two shuffles, both with map-side partial
    aggregation, rows never wider than (group, dim, value).

    Determinism: the mean is a strict left fold over the VALUE-SORTED
    per-group values (collect -> array_sort -> fold), one IEEE
    operation sequence any engine reproduces bit-for-bit. A plain
    ``avg(double)`` is summation-order-dependent, and the
    decimal-quantization trick fails on exact ties — float32 values
    are dyadic rationals, so double->DECIMAL(.,10) ties DO occur and
    Spark (HALF_UP) and DuckDB round them differently.
    """
    from datalake_toolkit_spark.operators import collect_sorted_array

    exploded = df.select(
        F.col(group_col), F.posexplode(vec_col).alias("_d", "_x")
    )
    lists = exploded.groupBy(group_col, "_d").agg(
        F.array_sort(F.collect_list(F.col("_x").cast("double"))).alias("_xs")
    )
    means = lists.select(
        group_col,
        "_d",
        (
            F.aggregate("_xs", F.lit(0.0), lambda acc, x: acc + x)
            / F.size("_xs")
        ).alias("_m"),
    )
    return collect_sorted_array(means, group_col, "_d", "_m", out_col=out_col)
