"""Scalar functions (SURVEY.md §2.7) as native Column expressions.

The reference implemented all of these as row-at-a-time Python 2 UDFs
(hive_metastore_migration.py, spark_submit_*.py). Every one is
re-expressed here as a built-in Catalyst expression: JVM-side,
whole-stage-codegen'd, NULL-propagating — the 100 TB-safe path. No
function in this module crosses the Python boundary at execution time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_date(col: Column | str, fmt: str) -> Column:
    """Parse a string to timestamp with a Java datetime pattern,
    yielding NULL on failure.

    Parity: F1 ``parse_date`` UDFs — strptime with a bare except
    returning None (spark_submit_tb_iba_laminacao_parquet.py:123-129,
    spark_submit_gametrics.py:45-52). ``try_to_timestamp`` reproduces
    the NULL-on-garbage contract exactly.

    Python->Java format translation is the caller's job; the formats the
    reference uses map as:
      '%d.%m.%Y %H:%M:%S.%f' -> 'dd.MM.yyyy HH:mm:ss.SSSSSS'
      '%Y.%m.%d'             -> 'yyyy.MM.dd'
      '%Y/%m/%d'             -> 'yyyy/MM/dd'
      '%d/%m/%Y %H:%M:%S'    -> 'dd/MM/yyyy HH:mm:ss'
    """
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col, F.lit(fmt))


def escape_special_chars(col: Column | str) -> Column:
    r"""Backslash-escape ``\ | " { : }`` for the reference's downstream
    partition-name parser.

    Parity: F4 (hive_metastore_migration.py:456-465). Implemented as a
    single regexp_replace with a character class + capture-group
    backreference.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r'([\\|"{:}])', r'\\$1')


def skewed_values_to_str(array_col: Column | str) -> Column:
    """Fold a string array into the reference's per-element
    ``'<len(v)>%<v>'`` encoding, joined with NO separator; None
    elements contribute the empty string — parity: F5
    (hive_metastore_migration.py:467-471):
    ``''.join('%d%%%s' % (len(v), v) for v in values)``.

    ``["ab", "c"] -> "2%ab1%c"``; ``["ab", None] -> "2%ab"``.
    Pure Catalyst: transform + array_join (null_replacement='')."""
    c = F.col(array_col) if isinstance(array_col, str) else array_col
    return F.array_join(
        F.transform(
            c, lambda v: F.concat(F.length(v).cast("string"), F.lit("%"), v)
        ),
        "",
        "",
    )


def skewed_str_to_values(col: Column | str) -> Column:
    """Inverse of :func:`skewed_values_to_str`: parse the
    length-prefixed ``'<len(v)>%<v>'`` concatenation back into the
    string array. The encoding is NOT regex-splittable — values may
    end in digits (``"8%NATION_011%NATION_0_v1"``), so boundaries are
    found by CONSUMING each declared length, as a Catalyst
    ``aggregate`` fold over enough steps to drain the string (each
    element eats >= 2 chars; extra steps no-op on the empty
    remainder). Malformed remainders stop the parse and keep what was
    read. O(len^2) worst case from the substring copies — fine for
    metastore-sized metadata strings, and still expression-only."""
    c = F.col(col) if isinstance(col, str) else col

    def step(acc, _):
        rest = acc.getField("rest")
        d = F.regexp_extract(rest, r"^([0-9]+)%", 1)
        n = d.cast("int")
        val = F.substr(rest, F.length(d) + F.lit(2), n)
        new_rest = F.substr(
            rest, F.length(d) + F.lit(2) + n, F.length(rest)
        )
        return F.when(
            (d != "") & (F.length(rest) >= F.length(d) + 1 + n),
            F.struct(
                new_rest.alias("rest"),
                F.array_append(acc.getField("vals"), val).alias("vals"),
            ),
        ).otherwise(
            F.struct(F.lit("").alias("rest"), acc.getField("vals").alias("vals"))
        )

    init = F.struct(
        F.coalesce(c, F.lit("")).alias("rest"),
        F.array().cast("array<string>").alias("vals"),
    )
    steps = F.sequence(
        F.lit(1),
        F.greatest(
            (F.length(F.coalesce(c, F.lit(""))) / 2 + 1).cast("int"), F.lit(1)
        ),
    )
    return F.aggregate(steps, init, step, lambda acc: acc.getField("vals"))


def normalize_s3_uri(col: Column | str) -> Column:
    """``s3a://`` / ``s3n://`` -> ``s3://`` (null-safe).

    Parity: F6 (hive_metastore_migration.py:489-501)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^s3[an]://", "s3://")


def with_prefix(prefix: str, col: Column | str) -> Column:
    """Constant-prefix concat — parity: F7
    (hive_metastore_migration.py:503-508)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(prefix), c)


def unix_seconds_to_gson(col: Column | str) -> Column:
    """Unix seconds -> ``'MMM dd, yyyy hh:mm:ss a'`` string (Gson
    default format), null-safe.

    Parity: F8 (hive_metastore_migration.py:510-530)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.from_unixtime(c), "MMM dd, yyyy hh:mm:ss a")


def millis_str_to_seconds(col: Column | str) -> Column:
    """Millisecond-string -> seconds (long), NULL -> 0.

    Parity: F9 (hive_metastore_migration.py:825-827,872-879) —
    ``long(s)/1000`` truncating division, None -> 0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        (c.cast("long") / 1000).cast("long"), F.lit(0).cast("long")
    )


def fill_none_with_empty_array(col: Column | str) -> Column:
    """NULL array -> empty array — parity: F10
    (hive_metastore_migration.py:545-562; na.fill can't target arrays)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.array())


def fill_none_with_empty_string(col: Column | str) -> Column:
    """NULL string -> '' — parity: F11
    (hive_metastore_migration.py:848-852)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(""))


def partition_name(keys_col: Column | str, types_col: Column | str, vals_col: Column | str) -> Column:
    """Build ``'k1(t1),k2(t2)=v1,v2'`` partition names from parallel
    arrays — parity: F13 (hive_metastore_migration.py:809-823)."""
    k = F.col(keys_col) if isinstance(keys_col, str) else keys_col
    t = F.col(types_col) if isinstance(types_col, str) else types_col
    v = F.col(vals_col) if isinstance(vals_col, str) else vals_col
    kt = F.zip_with(k, t, lambda a, b: F.concat(a, F.lit("("), b, F.lit(")")))
    return F.concat(F.concat_ws(",", kt), F.lit("="), F.concat_ws(",", v))


def sanitize_csv_header(col: Column | str) -> Column:
    """Strip every character outside ``[-_ .&',$a-zA-Z0-9]`` from a
    CSV header line.

    Parity: F16 — the reference downloads the first line of each raw
    file and filters it char-by-char in driver Python
    (lambda/common.py:238-247); here one JVM-side regexp_replace so it
    can run over millions of header rows."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^-_ .&',$a-zA-Z0-9]", "")


def plain_map_to_ddb_json(map_col: Column | str, numeric_keys: Column | str) -> Column:
    """Render a string->string map as a DynamoDB-typed JSON document:
    values whose key is in ``numeric_keys`` become ``{"N": v}``,
    others ``{"S": v}``.

    Parity: F17 — the reference converts between DynamoDB's typed
    item JSON and plain JSON with a recursive Python codec
    (lambda/odl_ddb_update_es/json_util.py:11-45). The engine's
    ledger is a Spark table, so only the serialization shape is kept:
    a deterministic JSON string (keys sorted) built with expressions.
    """
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    nk = F.col(numeric_keys) if isinstance(numeric_keys, str) else numeric_keys
    entries = F.array_sort(
        F.transform(
            F.map_entries(m),
            lambda e: F.concat(
                F.lit('"'),
                e.getField("key"),
                F.lit('":{"'),
                F.when(F.array_contains(nk, e.getField("key")), "N").otherwise("S"),
                F.lit('":"'),
                e.getField("value"),
                F.lit('"}'),
            ),
        )
    )
    return F.concat(F.lit("{"), F.concat_ws(",", entries), F.lit("}"))


def ddb_json_to_plain_map(col: Column | str) -> Column:
    """Parse a flat DynamoDB-typed JSON document (string/number
    attributes) back to a string->string map — the inverse of
    :func:`plain_map_to_ddb_json` for flat documents (F17)."""
    c = F.col(col) if isinstance(col, str) else col
    typed = F.from_json(c, "map<string, struct<S string, N string>>")
    return F.transform_values(
        typed, lambda k, v: F.coalesce(v.getField("S"), v.getField("N"))
    )


def string_list_str_to_array(col: Column | str) -> Column:
    """Parse the reference's skewed-string-list rendering
    ``"<n>%['a', 'b']"`` back into an array — parity: F14
    ``udf_string_list_str_to_list``
    (hive_metastore_migration.py:829-842), including its quirks:

    - the guard regex is a *prefix* match of ``\\d%\\[('\\w+',?\\s?)+\\]``
      — a single leading digit only (multi-digit lengths fail the
      guard and yield ``[]``), trailing junk tolerated;
    - each comma token is trimmed then stripped of its first and last
      character (the quotes), with no validation beyond the guard.
    """
    c = F.col(col) if isinstance(col, str) else col
    guard = c.rlike(r"^\d%\[('\w+',?\s?)+\]")
    after_pct = F.split(c, "%")[1]
    body = after_pct.substr(F.lit(2), F.length(after_pct) - 2)
    # regexp strip, not F.trim: Python's str.strip() removes all
    # whitespace (tabs, newlines), Spark's trim only spaces
    toks = F.transform(
        F.split(body, ","),
        lambda t: F.regexp_replace(t, r"^\s+|\s+$", ""),
    )
    parsed = F.transform(toks, lambda t: t.substr(F.lit(2), F.length(t) - 2))
    return F.when(guard, parsed).otherwise(F.array())
