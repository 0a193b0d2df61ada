"""Property-based checks (hypothesis): expression-side operators must
agree with their reference Python semantics on arbitrary inputs, not
just the fixture corpus. One Spark job per example batch."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake_toolkit_spark.functions import (
    sanitize_csv_header,
    string_list_str_to_array,
)


_PY2_WHITESPACE = " \t\n\x0b\x0c\r"


def _ref_string_list_parse(s: str) -> list[str]:
    """Verbatim reference semantics
    (hive_metastore_migration.py:829-842). The reference is Python 2:
    ``str.strip()`` there strips exactly string.whitespace
    (= Java's \\s), not Python 3's wider Unicode set (\\x1c-\\x1f
    etc.), so the strip set is pinned explicitly."""
    try:
        r = re.compile(r"\d%\[('\w+',?\s?)+\]")
        if r.match(s) is None:
            return []
        return [
            t.strip(_PY2_WHITESPACE)[1:-1]
            for t in s.split("%")[1][1:-1].split(",")
        ]
    except (IndexError, AssertionError):
        return []


def _ref_sanitize(line: str) -> str:
    """Verbatim reference semantics (lambda/common.py:238-247)."""
    return "".join(
        c
        for c in line
        if c in "-_ .&',$" or c.isdigit() or ("a" <= c <= "z") or ("A" <= c <= "Z")
    )


_WORD = st.from_regex(r"[A-Za-z0-9_]{1,8}", fullmatch=True)
_VALID_LIST = st.builds(
    lambda n, words, sep: f"{n}%[" + sep.join(f"'{w}'" for w in words) + "]",
    st.integers(0, 9),
    st.lists(_WORD, min_size=1, max_size=4),
    st.sampled_from([",", ", "]),
)
_JUNK = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    max_size=20,
)
_LIST_INPUT = st.one_of(_VALID_LIST, _JUNK, st.builds(lambda a, b: a + b, _VALID_LIST, _JUNK))


@settings(max_examples=8, deadline=None)
@given(st.lists(_LIST_INPUT, min_size=1, max_size=40))
def test_string_list_parse_matches_reference(spark, cases):
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [
        r.v
        for r in df.select(string_list_str_to_array("s").alias("v"))
        .collect()
    ]
    expected = [_ref_string_list_parse(s) for s in cases]
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            max_size=30,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sanitize_header_matches_reference(spark, cases):
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [r.v for r in df.select(sanitize_csv_header("s").alias("v")).collect()]
    expected = [_ref_sanitize(s) for s in cases]
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), _WORD, st.integers(0, 99)),
        min_size=1,
        max_size=50,
    )
)
def test_kv_pairs_to_map_last_wins(spark, rows):
    """A1 duplicate-key policy: for each (id, key), SOME value from
    that key's rows wins and every key is present — the dict.update
    merge of the reference, which had no cross-partition order
    guarantee either."""
    from datalake_toolkit_spark.operators import kv_pairs_to_map

    df = spark.createDataFrame(rows, "id int, k string, v int")
    out = {
        r.id: r.m
        for r in kv_pairs_to_map(df, "id", "k", "v", "m").collect()
    }
    by_id: dict[int, dict[str, set[int]]] = {}
    for i, k, v in rows:
        by_id.setdefault(i, {}).setdefault(k, set()).add(v)
    assert set(out) == set(by_id)
    for i, keys in by_id.items():
        assert set(out[i]) == set(keys)
        for k, candidates in keys.items():
            assert out[i][k] in candidates


_KEYS = st.integers(0, 5)
_PAIR_ROWS = st.lists(
    st.tuples(_KEYS, st.integers(-1000, 1000)), min_size=0, max_size=30
)


@settings(max_examples=6, deadline=None)
@given(left=_PAIR_ROWS, right=_PAIR_ROWS, salt=st.sampled_from([2, 4, 8]))
def test_salted_join_equals_plain_join(spark, left, right, salt):
    """salted_join must be result-identical to the plain inner
    equi-join for ANY key distribution and salt factor — skew handling
    is a physical rewrite, never a semantic one."""
    from datalake_toolkit_spark.operators import salted_join

    ldf = spark.createDataFrame(
        [(k, v) for k, v in left] or [(None, None)], "k bigint, lv bigint"
    ).where(F.col("k").isNotNull())
    rdf = spark.createDataFrame(
        [(k, v) for k, v in right] or [(None, None)], "k bigint, rv bigint"
    ).where(F.col("k").isNotNull())
    plain = sorted(
        (r.k, r.lv, r.rv) for r in ldf.join(rdf, "k").collect()
    )
    salted = sorted(
        (r.k, r.lv, r.rv) for r in salted_join(ldf, rdf, "k", salt=salt).collect()
    )
    assert salted == plain


_TS_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
)


@settings(max_examples=6, deadline=None)
@given(left=_TS_ROWS, right=_TS_ROWS)
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join (backward, inclusive) must pick, per left row, the
    right row with the greatest ts <= left ts for the same key —
    checked against a direct per-row scan on arbitrary inputs."""
    from datalake_toolkit_spark.operators import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k bigint, ts bigint, lid bigint",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    # dedupe right on (k, ts): keep max marker (asof emits one match)
    rbest: dict[tuple[int, int], int] = {}
    for k, t in right:
        rbest[(k, t)] = max(rbest.get((k, t), -1), t)
    rrows = [(k, t, k * 1000 + t) for (k, t) in rbest]
    rdf = spark.createDataFrame(
        rrows, "k bigint, ts bigint, rval bigint"
    ).withColumn("ts", F.timestamp_seconds("ts"))

    got = {
        r.lid: r.rval_r
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts").collect()
    }
    for i, (k, t) in enumerate(left):
        candidates = [(rt, rv) for (rk, rt, rv) in rrows if rk == k and rt <= t]
        expected = max(candidates)[1] if candidates else None
        assert got.get(i) == expected, (i, k, t)


@settings(max_examples=6, deadline=None)
@given(
    n_words=st.integers(1, 120),
    chunk=st.integers(2, 40),
    overlap=st.integers(0, 10),
)
def test_chunk_documents_covers_every_word_exactly(spark, n_words, chunk, overlap):
    """Every word appears in >= 1 chunk, consecutive chunks share
    exactly `overlap` words (when both are full-length), and no chunk
    is fully contained in its predecessor."""
    from hypothesis import assume

    from datalake_toolkit_spark.llm import chunk_documents

    assume(overlap < chunk)
    text = " ".join(f"w{i}" for i in range(n_words))
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(
        (r.chunk_idx, r.chunk_text.split(" "))
        for r in chunk_documents(docs, chunk_words=chunk, overlap=overlap).collect()
    )
    covered = [w for _, ws in rows for w in ws]
    assert set(covered) == {f"w{i}" for i in range(n_words)}
    step = chunk - overlap
    for (i1, ws1), (i2, ws2) in zip(rows, rows[1:]):
        assert i2 == i1 + 1
        assert not set(ws2) <= set(ws1)  # no fully-duplicated chunk
        if len(ws1) == chunk and len(ws2) == chunk:
            assert ws1[step:] == ws2[:overlap]
