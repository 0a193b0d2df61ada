"""spark-submit-able CLI: the reference's per-job entry scripts
(artifacts/spark_programs/spark_submit_*.py run() + click options,
lambda job submitters) as ONE argparse front door over the engine.

    python -m datalake_toolkit_spark ingest --input raw/*.csv --output out/ \
        --schema "id long, name string, dt string" --partition-source dt
    python -m datalake_toolkit_spark query --name q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --show 10
    python -m datalake_toolkit_spark profile --table orders --sf-dir ...
    python -m datalake_toolkit_spark compact --path tbl/ --target-partitions 8

Parameters resolve CLI > JSON config > env (config.resolve_params),
matching the reference's precedence chain. Each command builds the
shared tuned session (session.get_spark) — under spark-submit the
master/conf come from the launcher and getOrCreate adopts them.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections.abc import Sequence

from datalake_toolkit_spark.config import resolve_params
from datalake_toolkit_spark.session import get_spark



def _parse_ids(raw: str) -> list:
    """--ids parser: strip each comma token; homogeneous INT list only
    when every token is an integer, else every token stays a string —
    a mixed list would crash the typed key frame, and an unstripped
    ' 2' would silently match nothing."""
    import re

    toks = [t.strip() for t in raw.split(",") if t.strip()]
    if not toks:
        raise SystemExit("--ids is empty")
    # re.fullmatch, not lstrip+isdigit: '--5' survives the lstrip but
    # int('--5') would raise a raw ValueError traceback
    if all(re.fullmatch(r"-?\d+", t) for t in toks):
        return [int(t) for t in toks]
    return toks


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="datalake_toolkit_spark")
    sub = p.add_subparsers(dest="command", required=True)

    ing = sub.add_parser("ingest", help="delimited files -> partitioned parquet")
    ing.add_argument("--input", required=True, nargs="+")
    ing.add_argument("--output", required=True)
    ing.add_argument("--schema", default=None, help="DDL string; omit to infer")
    ing.add_argument("--sep", default=",")
    ing.add_argument("--header", action="store_true")
    ing.add_argument("--partition-source", default=None)
    ing.add_argument("--partition-col", default="dt")
    ing.add_argument("--target-file-partitions", type=int, default=None)
    ing.add_argument("--config-file", default=None, help="JSON param file")

    q = sub.add_parser("query", help="run a named engine query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", required=True)
    q.add_argument("--show", type=int, default=0, help="print first N rows as JSON")
    q.add_argument("--output", default=None, help="write result parquet here")
    q.add_argument("--explain", action="store_true")
    q.add_argument("--list", action="store_true", help="ignore --name, list queries")

    pr = sub.add_parser("profile", help="single-pass column profile of a table")
    pr.add_argument("--table", required=True)
    pr.add_argument("--sf-dir", required=True)
    pr.add_argument("--exact-distinct", action="store_true")

    c = sub.add_parser("compact", help="rewrite a parquet dir to N files")
    c.add_argument("--path", required=True)
    c.add_argument("--target-partitions", type=int, required=True)
    c.add_argument("--output", default=None)

    tb = sub.add_parser("table", help="lakehouse table maintenance")
    tb.add_argument("--path", required=True)
    tb.add_argument(
        "action",
        choices=[
            "history", "restore", "optimize", "vacuum", "show",
            "plan-scan", "delete", "clone", "write", "upsert",
        ],
    )
    tb.add_argument("--input", default=None,
                help="write/upsert: source parquet path")
    tb.add_argument("--merge-keys", nargs="+", default=None,
                help="upsert: merge key columns")
    tb.add_argument("--partition-scoped", action="store_true",
                help="upsert: declare matched rows share the source row's "
                     "partition (skips the full-table match probe)")
    tb.add_argument("--bloom-columns", nargs="*", default=None,
                help="columns to write parquet bloom filters for, as COL "
                     "or COL:NDV; pass with NO values to retire the "
                     "table's bloom hint; omit to adopt the committed "
                     "config")
    tb.add_argument("--auto-compact-merges", type=int, default=None,
                help="drain pending MoR appends once this many merge "
                     "entries accumulate (scoped optimize at commit time)")
    tb.add_argument("--auto-compact-deletes", type=int, default=None,
                help="full optimize once this many MoR delete entries "
                     "accumulate")
    tb.add_argument("--auto-compact-append-ratio", type=float, default=None,
                help="drain pending MoR appends once appended/base file "
                     "ratio crosses this value")
    tb.add_argument("--version", type=int, default=None, help="restore/show target")
    tb.add_argument("--partitions", nargs="*", default=None, help="optimize scope")
    tb.add_argument("--sort-by", nargs="*", default=(), help="optimize clustering")
    tb.add_argument("--keep-last", type=int, default=None, help="vacuum retention")
    tb.add_argument("--quarantine-max-age", type=float, default=None,
                help="vacuum: also reap quarantine dirs older than N seconds")
    tb.add_argument("--partition-by", nargs="*", default=None,
                help="table partition columns (omit to adopt the committed scheme)")
    tb.add_argument("--where", default=None,
                help="plan-scan/delete predicate (simple AND-of-comparisons prune)")
    tb.add_argument("--mode", choices=["cow", "mor"], default="cow",
                help="delete mode: rewrite (cow) or predicate entry (mor)")
    tb.add_argument("--keys", default=None,
                help="delete: comma-separated key VALUES to tombstone "
                     "(merge-on-read key delete; needs --key-col)")
    tb.add_argument("--key-col", default=None,
                help="delete --keys: the merge key column name")
    tb.add_argument("--target", default=None, help="clone target path")
    tb.add_argument("--deep", action="store_true",
                help="clone materializes instead of zero-copy pointers")

    cu = sub.add_parser(
        "curate", help="run the pretraining curation pipeline over documents"
    )
    cu.add_argument("--sf-dir", required=True)
    cu.add_argument("--output", required=True, help="packed corpus parquet dir")
    cu.add_argument("--window-tokens", type=int, default=2048)
    cu.add_argument("--min-quality", type=float, default=0.5)
    cu.add_argument(
        "--eval-mod", type=int, default=None,
        help="decontaminate against docs where doc_id %% MOD == 0",
    )

    dd = sub.add_parser(
        "dedup", help="annotate documents with duplicate clusters"
    )
    dd.add_argument("--sf-dir", required=True)
    dd.add_argument("--output", required=True, help="annotated parquet dir")
    dd.add_argument(
        "--method", choices=["exact", "minhash", "semantic"], default="exact"
    )
    dd.add_argument("--threshold", type=float, default=0.8, help="minhash/semantic")
    dd.add_argument("--dim", type=int, default=64, help="semantic: hashed-vector width")
    dd.add_argument("--n-planes", type=int, default=16, help="semantic: LSH planes")
    dd.add_argument("--center", action="store_true", help="semantic: mean-center buckets")
    dd.add_argument(
        "--keep-canonical", action="store_true",
        help="write only one survivor per cluster instead of annotations",
    )

    se = sub.add_parser(
        "search", help="lexical retrieval (batch or persistent index)"
    )
    se.add_argument(
        "action",
        choices=["query", "index-add", "index-query", "index-probe",
                 "index-maintain", "index-remove", "index-rebucket",
                 "index-sync", "index-audit", "index-refresh-stats",
                 "index-prune-report", "index-skip-report", "plane-sync",
                 "hybrid"],
        help="query: one-shot over --docs; index-add: build/extend the "
             "persistent index at --index from --docs; index-query: "
             "serve from --index; index-probe: report what a query "
             "would open (no search); index-maintain: drain pending "
             "MoR state + vacuum; index-rebucket: re-hash to "
             "--prefix-len buckets (answers unchanged, probe cost "
             "re-sized); hybrid: RRF-fuse --index (lexical) with "
             "--ann-path (vector) over --queries",
    )
    se.add_argument("--docs", default=None,
                help="documents parquet (doc_id, text)")
    se.add_argument("--index", default=None, help="PostingsIndex root")
    se.add_argument("--query", default=None, help="whitespace-separated terms")
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--method", choices=["keyword", "bm25", "phrase"],
                default="keyword")
    se.add_argument("--slop", type=int, default=0,
                help="phrase: ordered-proximity budget (extra tokens "
                     "interleaved across the whole phrase; 0 = exact)")
    se.add_argument("--mode", choices=["cow", "mor"], default="mor",
                help="index-add commit mode")
    se.add_argument("--keep-last", type=int, default=5,
                help="index-maintain vacuum retention")
    se.add_argument("--replace", action="store_true",
                help="index-add: delete-then-add (changed re-adds)")
    se.add_argument("--ids", default=None,
                help="index-remove: comma-separated doc ids")
    se.add_argument("--prefix-len", type=int, default=None,
                help="index-rebucket: new bucket width in hex chars "
                     "(1 -> 16 buckets, 2 -> 256)")
    se.add_argument("--table", default=None,
                help="index-sync: LakeTable root holding (doc_id, text) "
                     "rows; the index follows its change feed")
    se.add_argument("--from-version", type=int, default=None,
                help="index-sync: override the persisted cursor "
                     "(omit: resume from cursor, bootstrap if none)")
    se.add_argument("--ann-path", default=None,
                help="IVFIndex root for action=hybrid")
    se.add_argument("--queries", default=None,
                help="hybrid query parquet (query_id, query_text, "
                     "query_vec)")
    se.add_argument("--k-each", type=int, default=20,
                help="hybrid per-modality depth before fusion")
    se.add_argument("--n-probe", type=int, default=4,
                help="hybrid IVF probe width")
    se.add_argument("--pinned", action="store_true",
                help="hybrid: serve at the latest combined pin "
                     "plane-sync persisted (needs --table) instead of "
                     "live index state")
    se.add_argument("--verify-term-stats", action="store_true",
                help="index-audit: also compare the committed term "
                     "stats against a full scan recompute — the "
                     "detector for mis-used removed_docs / "
                     "replaced_old before-image hints (O(postings))")

    an = sub.add_parser("ann", help="persistent IVF vector index")
    an.add_argument(
        "action",
        choices=["build", "add", "search", "sizes", "probe",
                 "probe-report", "maintain", "remove", "sync", "recall",
                 "audit"],
    )
    an.add_argument("--path", required=True, help="IVFIndex root")
    an.add_argument("--input", default=None,
                help="embeddings parquet (vec_id, embedding)")
    an.add_argument("--n-lists", type=int, default=16)
    an.add_argument("--lloyd-iters", type=int, default=2)
    an.add_argument("--dim", type=int, default=64)
    an.add_argument("--k", type=int, default=10)
    an.add_argument("--n-probe", type=int, default=4)
    an.add_argument("--mode", choices=["cow", "mor"], default="mor",
                help="add commit mode")
    an.add_argument("--keep-last", type=int, default=5,
                help="maintain vacuum retention")
    an.add_argument("--quantized", action="store_true",
                help="search: int8 candidate phase + exact rescore; "
                     "probe: report the code-vs-vector byte split")
    an.add_argument("--rescore-factor", type=int, default=4,
                help="quantized search: candidates kept per result")
    an.add_argument("--ids", default=None,
                help="remove: comma-separated vector ids")
    an.add_argument("--table", default=None,
                help="sync: LakeTable root holding (vec_id, embedding) "
                     "rows; the index follows its change feed")
    an.add_argument("--from-version", type=int, default=None,
                help="sync: override the persisted cursor "
                     "(omit: resume from cursor, bootstrap if none)")
    an.add_argument("--n-probe-cells", type=int, default=None,
                help="two-level indexes: coarse cells probed per "
                     "query (default: auto — every cell when the "
                     "list probe is exact)")
    an.add_argument("--two-level-from", type=int, default=None,
                help="build: persist the two-level layout at or above "
                     "this many lists (default 10000)")
    an.add_argument("--deep", action="store_true",
                help="audit: also re-argmax every assignment against "
                     "the stored centroids (O(index x n_lists) — "
                     "schedule it, don't serve it)")
    return p


def _cmd_ingest(args: argparse.Namespace) -> int:
    from datalake_toolkit_spark.sources.ingest import ingest_delimited

    params = resolve_params(
        cli={
            "sep": args.sep,
            "partition_source": args.partition_source,
            "partition_col": args.partition_col,
            "target_file_partitions": args.target_file_partitions,
        },
        config_file=args.config_file,
        defaults={
            "sep": ",",
            "partition_source": None,
            "partition_col": "dt",
            "target_file_partitions": None,
        },
    )
    spark = get_spark(app_name="dts-ingest")
    out = ingest_delimited(
        spark,
        args.input,
        args.output,
        schema=args.schema,
        sep=params["sep"],
        header=args.header,
        partition_source=params["partition_source"],
        partition_col=params["partition_col"],
        target_file_partitions=params["target_file_partitions"],
    )
    print(json.dumps({"rows_written": out.count(), "output": args.output}))
    return 0


def _cmd_query(args: argparse.Namespace) -> int:
    from datalake_toolkit_spark.plans import QUERIES

    if args.list:
        for name in QUERIES:
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"dts-query-{args.name}")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"rows_written": spark.read.parquet(args.output).count()}))
    elif args.show:
        for row in df.limit(args.show).collect():
            print(json.dumps(row.asDict(), default=str))
    else:
        print(json.dumps({"rows": df.count()}))
    return 0


def _cmd_profile(args: argparse.Namespace) -> int:
    from datalake_toolkit_spark.quality import profile_table
    from datalake_toolkit_spark.sources import load_table

    spark = get_spark(app_name="dts-profile")
    df = load_table(spark, args.sf_dir, args.table)
    for row in profile_table(df, exact_distinct=args.exact_distinct).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def _cmd_compact(args: argparse.Namespace) -> int:
    from datalake_toolkit_spark.sources.ingest import compact

    spark = get_spark(app_name="dts-compact")
    compact(spark, args.path, args.target_partitions, output_path=args.output)
    out_path = args.output or args.path + "_compacted"
    print(
        json.dumps(
            {"rows": spark.read.parquet(out_path).count(), "output": out_path}
        )
    )
    return 0


def _cmd_table(args: argparse.Namespace) -> int:
    from datalake_toolkit_spark.lakehouse import LakeTable

    spark = get_spark(app_name="dts-table")
    bloom = None
    if args.bloom_columns is not None:
        # COL or COL:NDV specs; an empty list is an EXPLICIT empty
        # config, which retires the table's bloom hint on commit
        bloom = {}
        for spec in args.bloom_columns:
            col, _, ndv = spec.partition(":")
            bloom[col] = int(ndv) if ndv else None
    policy = {}
    if args.auto_compact_merges is not None:
        policy["merges"] = args.auto_compact_merges
    if args.auto_compact_deletes is not None:
        policy["deletes"] = args.auto_compact_deletes
    if args.auto_compact_append_ratio is not None:
        policy["append_ratio"] = args.auto_compact_append_ratio
    t = LakeTable(
        spark,
        args.path,
        partition_by=None if args.partition_by is None else tuple(args.partition_by),
        bloom_filter_columns=bloom,
        auto_compact_after=policy or None,
    )
    if args.action == "write":
        if args.input is None:
            print("write requires --input", file=sys.stderr)
            return 2
        v = t.write(spark.read.parquet(args.input))
        print(json.dumps({"written_version": v,
                          "bloom_columns": t._manifest()["bloom_columns"]}))
    elif args.action == "upsert":
        if args.input is None or not args.merge_keys:
            print("upsert requires --input and --merge-keys", file=sys.stderr)
            return 2
        v = t.upsert(
            spark.read.parquet(args.input),
            keys=args.merge_keys,
            mode=args.mode,
            partition_scoped=args.partition_scoped,
        )
        man = t._manifest()
        print(json.dumps({"upserted_version": v, "mode": args.mode,
                          "current_version": t.current_version(),
                          "pending_merges": len(man.get("merges") or [])}))
    elif args.action == "history":
        for h in t.history():
            print(json.dumps(h))
    elif args.action == "show":
        print(json.dumps({"rows": t.read(version=args.version).count(),
                          "version": args.version if args.version is not None
                          else t.current_version()}))
    elif args.action == "restore":
        if args.version is None:
            print("restore requires --version", file=sys.stderr)
            return 2
        print(json.dumps({"restored_to": args.version,
                          "new_version": t.restore(args.version)}))
    elif args.action == "optimize":
        v = t.optimize(sort_by=args.sort_by, partitions=args.partitions)
        print(json.dumps({"optimized_version": v}))
    elif args.action == "vacuum":
        if args.keep_last is None and args.quarantine_max_age is None:
            print("vacuum requires --keep-last and/or --quarantine-max-age",
                  file=sys.stderr)
            return 2
        t.vacuum(keep_last=args.keep_last,
                 quarantine_max_age_sec=args.quarantine_max_age)
        print(json.dumps({"kept_last": args.keep_last,
                          "quarantine_max_age": args.quarantine_max_age,
                          "current_version": t.current_version()}))
    elif args.action == "plan-scan":
        print(json.dumps(t.plan_scan(where=args.where, version=args.version)))
    elif args.action == "delete":
        if args.keys is not None:
            # merge-on-read key tombstones: O(keys), no predicate string
            if args.key_col is None:
                print("delete --keys requires --key-col", file=sys.stderr)
                return 2
            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            key_vals = args.keys.split(",")
            key_df = spark.createDataFrame(
                [(k,) for k in key_vals],
                f"{args.key_col} string",
            )
            # validate the cast against the table's key type up front:
            # an uncastable value (e.g. 'abc' vs a bigint key) becomes
            # a NULL tombstone that matches nothing, and the command
            # would report success while deleting zero rows
            schema = T.StructType.fromJson(json.loads(t._manifest()["schema"]))
            field = next(
                (f for f in schema.fields if f.name == args.key_col), None
            )
            if field is None:
                print(
                    f"delete --key-col {args.key_col!r} is not a column "
                    "of the table",
                    file=sys.stderr,
                )
                return 2
            bad = [
                r[0]
                for r in key_df.where(
                    F.col(args.key_col)
                    .try_cast(field.dataType)
                    .isNull()
                ).collect()
            ]
            if bad:
                print(
                    f"delete --keys: {bad} do not cast to the key type "
                    f"{field.dataType.simpleString()}",
                    file=sys.stderr,
                )
                return 2
            v = t.upsert(
                key_df, keys=[args.key_col], mode="mor",
                when_matched="delete",
            )
            print(json.dumps({"deleted_version": v, "mode": "mor",
                              "tombstoned": len(key_vals)}))
        elif args.where is None:
            print("delete requires --where or --keys", file=sys.stderr)
            return 2
        else:
            v = t.delete_where(args.where, mode=args.mode)
            print(json.dumps({"deleted_version": v, "mode": args.mode}))
    elif args.action == "clone":
        if args.target is None:
            print("clone requires --target", file=sys.stderr)
            return 2
        c = t.clone(args.target, version=args.version, shallow=not args.deep)
        print(json.dumps({"cloned_to": args.target,
                          "shallow": not args.deep,
                          "source_version": args.version
                          if args.version is not None
                          else t.current_version()}))
    return 0


def _cmd_curate(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from datalake_toolkit_spark.llm import curate_corpus
    from datalake_toolkit_spark.sources import load_table

    spark = get_spark(app_name="dts-curate")
    docs = load_table(spark, args.sf_dir, "documents")
    eval_df = (
        docs.where(F.col("doc_id") % args.eval_mod == 0)
        if args.eval_mod
        else None
    )
    out = curate_corpus(
        docs if eval_df is None else docs.where(F.col("doc_id") % args.eval_mod != 0),
        eval_df=eval_df,
        window_tokens=args.window_tokens,
        min_quality=args.min_quality,
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    print(
        json.dumps(
            {
                "rows": written.count(),
                "windows": written.agg(F.max("window_end")).collect()[0][0],
                "output": args.output,
            }
        )
    )
    return 0


def _cmd_dedup(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from datalake_toolkit_spark.llm import (
        dedup_clusters,
        dedup_keep_canonical,
        exact_dedup_groups,
        hashed_embeddings,
        minhash_near_dup_pairs,
        semantic_dedup,
    )
    from datalake_toolkit_spark.sources import load_table

    spark = get_spark(app_name=f"dts-dedup-{args.method}")
    docs = load_table(spark, args.sf_dir, "documents")
    if args.method == "exact":
        keep = exact_dedup_groups(docs, "doc_id").select(
            F.col("keep_id").alias("doc_id"), F.lit(True).alias("is_canonical")
        )
        out = docs.join(keep, ["doc_id"], "left").withColumn(
            "is_canonical", F.coalesce("is_canonical", F.lit(False))
        )
        if args.keep_canonical:
            out = out.where("is_canonical").drop("is_canonical")
    else:
        if args.method == "minhash":
            pairs = minhash_near_dup_pairs(
                docs, "doc_id", "text", threshold=args.threshold
            ).select("doc_a", "doc_b")
        else:
            emb = hashed_embeddings(docs, dim=args.dim)
            out_sem = semantic_dedup(
                emb,
                threshold=args.threshold,
                n_planes=args.n_planes,
                dim=args.dim,
                center=args.center,
                universe=docs,
            )
            pairs = (
                out_sem.where(~F.col("is_canonical"))
                .select(
                    F.col("cluster_id").alias("doc_a"),
                    F.col("doc_id").alias("doc_b"),
                )
            )
        out = (
            dedup_keep_canonical(docs, pairs, "doc_id")
            if args.keep_canonical
            else dedup_clusters(docs, pairs, "doc_id")
        )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    print(json.dumps({"rows": written.count(), "output": args.output}))
    return 0


def _cmd_search(args: argparse.Namespace) -> int:
    from datalake_toolkit_spark.llm import (
        PostingsIndex,
        bm25_topk,
        keyword_search_topk,
        phrase_search,
    )

    spark = get_spark(app_name="dts-search")
    if args.action == "hybrid":
        from datalake_toolkit_spark.llm import (
            IVFIndex,
            hybrid_search_indexed,
        )

        if not (args.index and args.ann_path and args.queries):
            raise SystemExit("hybrid needs --index, --ann-path, --queries")
        if args.method not in ("keyword", "bm25"):
            raise SystemExit(
                "hybrid fuses a RANKED lexical list; --method must be "
                "keyword or bm25 (phrase matching has no ranking to fuse)"
            )
        pidx = PostingsIndex(spark, args.index)
        ivf = IVFIndex(spark, args.ann_path)
        at = None
        if args.pinned:
            from datalake_toolkit_spark.lakehouse import LakeTable
            from datalake_toolkit_spark.llm import latest_plane_pin

            if not args.table:
                raise SystemExit("--pinned needs --table (the pin is "
                                 "keyed per synced table)")
            stored = latest_plane_pin(
                pidx, ivf, LakeTable(spark, args.table)
            )
            if stored is None:
                raise SystemExit(
                    "no combined pin persisted yet — run plane-sync first"
                )
            at = stored["pin"]
        out = hybrid_search_indexed(
            pidx,
            ivf,
            spark.read.parquet(args.queries),
            k=args.k,
            k_each=args.k_each,
            n_probe=args.n_probe,
            lexical="bm25" if args.method == "bm25" else "keyword",
            at=at,
        )
        for r in out.orderBy("query_id", "rank").collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.action == "index-add":
        if not (args.index and args.docs):
            raise SystemExit("index-add needs --index and --docs")
        idx = PostingsIndex(spark, args.index)
        v = idx.add(
            spark.read.parquet(args.docs), mode=args.mode,
            replace=args.replace,
        )
        print(json.dumps({"version": v, "index": args.index}))
        return 0
    if args.action == "index-remove":
        if not (args.index and args.ids):
            raise SystemExit("index-remove needs --index and --ids")
        ids = _parse_ids(args.ids)
        PostingsIndex(spark, args.index).remove(ids)
        print(json.dumps({"removed": len(ids), "index": args.index}))
        return 0
    if args.action == "index-maintain":
        if not args.index:
            raise SystemExit("index-maintain needs --index")
        PostingsIndex(spark, args.index).maintain(keep_last=args.keep_last)
        print(json.dumps({"maintained": args.index}))
        return 0
    if args.action == "index-rebucket":
        if not (args.index and args.prefix_len):
            raise SystemExit("index-rebucket needs --index and --prefix-len")
        idx = PostingsIndex(spark, args.index)
        # the library no-op (set the creation width on an in-process
        # instance) persists NOTHING from a CLI process — refuse
        # instead of printing a success for a table that doesn't exist
        if idx.postings_t.current_version() is None:
            raise SystemExit(
                f"index at {args.index} has never been created — the "
                "bucket width of a new index is set by the first "
                "index-add (PostingsIndex(prefix_len=...)), not by "
                "rebucket"
            )
        idx.rebucket(args.prefix_len)
        print(json.dumps(
            {"rebucketed": args.index, "prefix_len": args.prefix_len}
        ))
        return 0
    if args.action == "index-audit":
        if not args.index:
            raise SystemExit("index-audit needs --index")
        for r in PostingsIndex(spark, args.index).audit(
            verify_term_stats=args.verify_term_stats
        ).collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.action == "index-sync":
        from datalake_toolkit_spark.lakehouse import LakeTable
        from datalake_toolkit_spark.llm import sync_postings_from_table

        if not (args.index and args.table):
            raise SystemExit("index-sync needs --index and --table")
        rep = sync_postings_from_table(
            PostingsIndex(spark, args.index),
            LakeTable(spark, args.table),
            from_version=args.from_version,
            mode=args.mode,
        )
        print(json.dumps({"index": args.index, "table": args.table, **rep}))
        return 0
    if args.action == "index-refresh-stats":
        if not args.index:
            raise SystemExit("index-refresh-stats needs --index")
        PostingsIndex(spark, args.index).refresh_term_stats()
        print(json.dumps({"refreshed_term_stats": args.index}))
        return 0
    if args.action == "plane-sync":
        from datalake_toolkit_spark.lakehouse import LakeTable
        from datalake_toolkit_spark.llm import IVFIndex, sync_search_plane

        if not (args.index and args.ann_path and args.table):
            raise SystemExit(
                "plane-sync needs --index, --ann-path and --table"
            )
        rep = sync_search_plane(
            PostingsIndex(spark, args.index),
            IVFIndex(spark, args.ann_path),
            LakeTable(spark, args.table),
            from_version=args.from_version,
            mode=args.mode,
        )
        print(json.dumps(rep))
        return 0
    if args.action in ("index-prune-report", "index-skip-report"):
        if not (args.index and args.query):
            raise SystemExit(f"{args.action} needs --index and --query")
        idx = PostingsIndex(spark, args.index)
        method = (
            idx.bm25_prune_report
            if args.action == "index-prune-report"
            else idx.skip_report  # per-layer files-total vs kept
        )
        rep_df = method(
            spark.createDataFrame(
                [(0, args.query)], "query_id bigint, query_text string"
            ),
            k=args.k,
        )
        for r in rep_df.collect():
            print(json.dumps(r.asDict()))
        return 0
    if not args.query:
        raise SystemExit(f"{args.action} needs --query")
    if args.action == "query" and args.slop:
        raise SystemExit(
            "--slop is served from the positional index only; use "
            "index-add then index-query --method phrase --slop N"
        )
    queries = spark.createDataFrame(
        [(0, args.query)], "query_id bigint, query_text string"
    )
    if args.action == "index-probe":
        if not args.index:
            raise SystemExit("index-probe needs --index")
        queries_df = spark.createDataFrame(
            [(0, args.query)], "query_id bigint, query_text string"
        )
        print(json.dumps(PostingsIndex(spark, args.index)
                         .plan_probe(queries_df)))
        return 0
    if args.action == "index-query":
        if not args.index:
            raise SystemExit("index-query needs --index")
        idx = PostingsIndex(spark, args.index)
        if args.method == "keyword":
            out = idx.search(queries, k=args.k)
        elif args.method == "phrase":
            out = idx.search_phrase(queries, k=args.k, slop=args.slop)
        else:
            out = idx.search_bm25(queries, k=args.k)
    else:
        if not args.docs:
            raise SystemExit("query needs --docs")
        docs = spark.read.parquet(args.docs)
        if args.method == "keyword":
            out = keyword_search_topk(docs, queries, k=args.k)
        elif args.method == "phrase":
            out = phrase_search(docs, queries, k=args.k)
        else:
            out = bm25_topk(docs, queries, k=args.k)
    for r in out.orderBy("rank").collect():
        print(json.dumps(r.asDict()))
    return 0


def _cmd_ann(args: argparse.Namespace) -> int:
    from datalake_toolkit_spark.llm import IVFIndex

    spark = get_spark(app_name="dts-ann")
    kw = (
        {"two_level_from": args.two_level_from}
        if args.two_level_from is not None
        else {}
    )
    idx = IVFIndex(spark, args.path, **kw)
    if args.action == "build":
        if not args.input:
            raise SystemExit("build needs --input")
        idx.build(
            spark.read.parquet(args.input),
            n_lists=args.n_lists,
            lloyd_iters=args.lloyd_iters,
            dim=args.dim,
        )
        print(json.dumps({"built": args.path, "n_lists": args.n_lists}))
        return 0
    if args.action == "add":
        if not args.input:
            raise SystemExit("add needs --input")
        v = idx.add(spark.read.parquet(args.input), mode=args.mode)
        print(json.dumps({"version": v, "index": args.path}))
        return 0
    if args.action == "sizes":
        for r in idx.list_sizes().orderBy("list_id").collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.action == "maintain":
        idx.maintain(keep_last=args.keep_last)
        print(json.dumps({"maintained": args.path}))
        return 0
    if args.action == "remove":
        if not args.ids:
            raise SystemExit("remove needs --ids")
        ids = _parse_ids(args.ids)
        idx.remove(ids)
        print(json.dumps({"removed": len(ids), "index": args.path}))
        return 0
    if args.action == "probe":
        if not args.input:
            raise SystemExit("probe needs --input (query vectors parquet)")
        print(json.dumps(idx.plan_probe(
            spark.read.parquet(args.input), n_probe=args.n_probe,
            quantized=args.quantized,
            n_probe_cells=args.n_probe_cells)))
        return 0
    if args.action == "probe-report":
        if not args.input:
            raise SystemExit(
                "probe-report needs --input (query vectors parquet)"
            )
        out = idx.probe_report(
            spark.read.parquet(args.input), n_probe=args.n_probe,
            n_probe_cells=args.n_probe_cells,
        )
        for r in out.orderBy("qid").collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.action == "audit":
        for r in idx.audit(deep=args.deep).collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.action == "recall":
        if not args.input:
            raise SystemExit("recall needs --input (query vectors parquet)")
        out = idx.recall(
            spark.read.parquet(args.input), k=args.k, n_probe=args.n_probe
        )
        for r in out.orderBy("qid").collect():
            print(json.dumps(r.asDict()))
        return 0
    if args.action == "sync":
        from datalake_toolkit_spark.lakehouse import LakeTable
        from datalake_toolkit_spark.llm import sync_ivf_from_table

        if not args.table:
            raise SystemExit("sync needs --table")
        rep = sync_ivf_from_table(
            idx,
            LakeTable(spark, args.table),
            from_version=args.from_version,
            mode=args.mode,
        )
        print(json.dumps({"index": args.path, "table": args.table, **rep}))
        return 0
    if not args.input:
        raise SystemExit("search needs --input (query vectors parquet)")
    if args.quantized:
        out = idx.search_quantized(
            spark.read.parquet(args.input), k=args.k,
            n_probe=args.n_probe, rescore_factor=args.rescore_factor,
            n_probe_cells=args.n_probe_cells,
        )
    else:
        out = idx.search(
            spark.read.parquet(args.input), k=args.k, n_probe=args.n_probe,
            n_probe_cells=args.n_probe_cells,
        )
    for r in out.orderBy("qid", "rank").collect():
        print(json.dumps(r.asDict()))
    return 0


_COMMANDS = {
    "ingest": _cmd_ingest,
    "search": _cmd_search,
    "ann": _cmd_ann,
    "dedup": _cmd_dedup,
    "query": _cmd_query,
    "profile": _cmd_profile,
    "compact": _cmd_compact,
    "curate": _cmd_curate,
    "table": _cmd_table,
}


def main(argv: Sequence[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    return _COMMANDS[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
