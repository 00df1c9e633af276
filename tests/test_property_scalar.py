"""Property-based cross-engine drift tests (SURVEY.md §5.2.4).

Hypothesis generates random literal rows; the same scalar expression
runs in Spark (DataFrame on a createDataFrame literal) and DuckDB
(VALUES clause). Catches ANSI/edge-case drift in string, math, date,
and null semantics that the fixed test corpus never exercises —
empty strings, negative numbers, boundary timestamps.

Sessions: one Spark round-trip per example is slow (~0.1 s), so
examples are batched — hypothesis builds a LIST of rows and the whole
list crosses each engine once per property.
"""

import datetime

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ASCII-only: hypothesis FOUND a real cross-engine divergence outside
# ASCII — upper('ß') is 'SS' in Spark (Java full case mapping) but 'ẞ'
# in DuckDB (single-char uppercase). The engine therefore only
# *contracts* ASCII case semantics; oracle-checked queries must not
# depend on non-ASCII case folding (the test corpus is ASCII).
TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=40,
)
ROWS = st.lists(TEXT, min_size=1, max_size=25)
NUMS = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
    ),
    min_size=1,
    max_size=25,
)
INTS = st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=25)
DATES = st.lists(
    st.datetimes(
        min_value=datetime.datetime(1980, 1, 2), max_value=datetime.datetime(2099, 12, 30)
    ),
    min_size=1,
    max_size=25,
)


def _duck(sql: str, params=None):
    con = duckdb.connect()
    try:
        return con.execute(sql, params).fetchall()
    finally:
        con.close()


@SETTINGS
@given(ROWS)
def test_string_funcs_match(spark, rows):
    """upper/lower/trim/length/reverse/substr agree on arbitrary text."""
    sdf = spark.createDataFrame([(s,) for s in rows], "t string").select(
        F.upper("t"), F.lower("t"), F.trim("t"), F.length("t").cast("long"),
        F.reverse("t"), F.substring("t", 2, 3),
    )
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(
        _duck(
            "SELECT upper(t), lower(t), trim(t), length(t), reverse(t), substr(t,2,3)"
            " FROM (SELECT unnest(?) AS t)",
            [rows],
        )
    )
    assert got == want


@SETTINGS
@given(NUMS)
def test_math_funcs_match(spark, xs):
    """abs/floor/ceil/round/sign agree on arbitrary float32 values.

    round() intentionally excluded at .5 boundaries? No — Spark
    HALF_UP and DuckDB round() are both half-away-from-zero for
    doubles; hypothesis will find it if that ever drifts.
    """
    sdf = spark.createDataFrame([(float(x),) for x in xs], "x double").select(
        F.abs("x"), F.floor("x").cast("long"), F.ceil("x").cast("long"),
        F.round("x", 2), F.signum("x"),
    )
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(
        _duck(
            "SELECT abs(x), CAST(floor(x) AS BIGINT), CAST(ceil(x) AS BIGINT),"
            " round(x, 2), sign(x)::DOUBLE FROM (SELECT unnest(?) AS x)",
            [xs],
        )
    )
    assert got == want


@SETTINGS
@given(INTS)
def test_int_arithmetic_match(spark, xs):
    """Integer %, //, * widening semantics agree (ANSI both sides)."""
    sdf = spark.createDataFrame([(x,) for x in xs], "x long").select(
        (F.col("x") % 97).alias("m"),
        F.floor(F.col("x") / 7).cast("long").alias("d"),
        (F.col("x") * 2).alias("t"),
    )
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(
        _duck(
            "SELECT x % 97, CAST(floor(x / 7.0) AS BIGINT), x * 2"
            " FROM (SELECT CAST(unnest(?) AS BIGINT) AS x)",
            [xs],
        )
    )
    assert got == want


@SETTINGS
@given(DATES)
def test_date_funcs_match(spark, ts):
    """year/month/day/hour + date_trunc agree across the full range
    (UTC-pinned Spark session vs naive DuckDB timestamps)."""
    ts = [t.replace(microsecond=0) for t in ts]
    sdf = spark.createDataFrame([(t,) for t in ts], "ts timestamp").select(
        F.year("ts").cast("long"), F.month("ts").cast("long"),
        F.dayofmonth("ts").cast("long"), F.hour("ts").cast("long"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss"),
    )
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(
        _duck(
            "SELECT year(ts), month(ts), day(ts), hour(ts),"
            " strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')"
            " FROM (SELECT unnest(?) AS ts)",
            [ts],
        )
    )
    assert got == want


@SETTINGS
@given(ROWS)
def test_hash_portability(spark, rows):
    """The h60 portable hash (operators/common.py) matches DuckDB on
    arbitrary strings — the foundation under SimHash and winnowing."""
    from data_pipeline_standalone_scripts_spark.operators.common import h60, o_h60

    sdf = spark.createDataFrame([(s,) for s in rows], "t string").select(h60("t"))
    got = sorted(r[0] for r in sdf.collect())
    want = sorted(r[0] for r in _duck(
        f"SELECT {o_h60('t')} FROM (SELECT unnest(?) AS t)", [rows]
    ))
    assert got == want


@pytest.mark.parametrize("x,y", [(1.0, 0.0), (-5.5, 0.0), (0.0, 0.0)])
def test_division_by_zero_guards(spark, x, y):
    """ANSI mode: raw x/0 throws in Spark; try_divide + nullif guards
    return NULL — matching DuckDB's x / nullif(y, 0)."""
    row = spark.createDataFrame([(x, y)], "x double, y double")
    got = row.select(F.try_divide("x", "y")).collect()[0][0]
    want = _duck("SELECT ? / nullif(?, 0.0)", [x, y])[0][0]
    assert got == want


FLOAT_LISTS = st.lists(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    ),
    min_size=1,
    max_size=10,
)


@SETTINGS
@given(FLOAT_LISTS)
def test_array_funcs_match(spark, arrays):
    """size/array_max/array_min/sequential-sum HOF agree with DuckDB
    list functions on arbitrary float arrays — the foundation under
    every embedding operator (L9/L11/L13, X5, X10)."""
    arrays = [[float(x) for x in a] for a in arrays]
    sdf = spark.createDataFrame([(a,) for a in arrays], "a array<double>").select(
        F.size("a").cast("long"),
        F.array_max("a"),
        F.array_min("a"),
        F.round(F.aggregate("a", F.lit(0.0), lambda s, x: s + x), 6),
    )
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(
        _duck(
            "SELECT len(a), list_max(a), list_min(a),"
            " round(list_aggregate(a, 'sum'), 6)"
            " FROM (SELECT unnest(?) AS a)",
            [arrays],
        )
    )
    assert got == want


@SETTINGS
@given(FLOAT_LISTS)
def test_array_dot_products_match(spark, arrays):
    """zip_with dot product (the cosine kernel) agrees with DuckDB's
    list_dot_product fold on self-dot (same element order ⇒ identical
    doubles before rounding)."""
    arrays = [[float(x) for x in a] for a in arrays]
    sdf = spark.createDataFrame([(a,) for a in arrays], "a array<double>").select(
        F.round(
            F.aggregate(
                F.zip_with("a", "a", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
            ),
            6,
        )
    )
    got = sorted(r[0] for r in sdf.collect())
    want = sorted(
        r[0]
        for r in _duck(
            "SELECT round(list_sum(list_transform(a, x -> x * x)), 6)"
            " FROM (SELECT unnest(?) AS a)",
            [arrays],
        )
    )
    assert got == want


# ---- interval algebra properties (round 6) --------------------------------

INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),       # user
        st.integers(min_value=0, max_value=500),     # start
        # zero and negative widths included: the sweep clamps
        # degenerate intervals to the zero-width point [s, s]
        st.integers(min_value=-60, max_value=120),   # width
    ),
    min_size=1,
    max_size=30,
)


def _brute_union(rows):
    """Python reference: merged-union length / island count per user.
    Degenerate widths clamp to [s, s], mirroring the operator."""
    from collections import defaultdict

    per = defaultdict(list)
    for u, s, w in rows:
        per[u].append((s, max(s, s + w)))
    out = {}
    for u, ivs in per.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e))
            else:
                islands.append((s, e))
        out[u] = (
            len(islands),
            sum(e - s for s, e in islands),
            max(e - s for s, e in islands),
        )
    return out


@SETTINGS
@given(INTERVALS)
def test_interval_coverage_core_matches_brute_force(spark, rows):
    """FIN4's windowed sweep must equal the brute-force interval-union
    reference for arbitrary interval sets — including contained,
    touching, and duplicate intervals hypothesis will find."""
    from data_pipeline_standalone_scripts_spark.operators.finance import (
        interval_coverage_core,
    )

    iv = spark.createDataFrame(
        [(u, i, s, s + w) for i, (u, s, w) in enumerate(rows)],
        "user_id long, event_id long, s long, e long",
    )
    got = {
        r["user_id"]: (r["n_islands"], r["covered_seconds"], r["longest_island"])
        for r in interval_coverage_core(iv).collect()
    }
    assert got == _brute_union(rows)


TWO_SIDED = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300), st.integers(1, 90)),
        min_size=1, max_size=15,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300), st.integers(1, 90)),
        min_size=1, max_size=15,
    ),
)


@SETTINGS
@given(TWO_SIDED)
def test_overlap_join_core_matches_brute_force(spark, sides):
    """J18's witness-bin emission must produce EXACTLY the brute-force
    overlap pairs (no drop, no duplicate) for arbitrary interval sets
    and a deliberately tiny bin size that forces many shared bins."""
    from collections import defaultdict

    from data_pipeline_standalone_scripts_spark.operators.joins import (
        overlap_join_core,
    )

    a_rows, b_rows = sides
    a = spark.createDataFrame(
        [(u, i, s, s + w) for i, (u, s, w) in enumerate(a_rows)],
        "user_id long, a_id long, a_s long, a_e long",
    )
    b = spark.createDataFrame(
        [(u, i, s, s + w) for i, (u, s, w) in enumerate(b_rows)],
        "user_id long, b_id long, b_s long, b_e long",
    )
    got = {
        r["user_id"]: (r["n_overlaps"], r["overlap_seconds"])
        for r in overlap_join_core(a, b, 16).collect()
    }
    want = defaultdict(lambda: [0, 0])
    for u1, s1, w1 in a_rows:
        for u2, s2, w2 in b_rows:
            if u1 == u2 and s1 < s2 + w2 and s2 < s1 + w1:
                ov = min(s1 + w1, s2 + w2) - max(s1, s2)
                want[u1][0] += 1
                want[u1][1] += ov
    assert got == {u: tuple(v) for u, v in want.items()}


TOKEN_STREAMS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12),
    min_size=1,
    max_size=6,
)


def _brute_bpe(docs):
    """Python reference for one BPE merge step (w1 != w2 pair,
    ties (count desc, pair asc); sequential left-to-right fusion)."""
    from collections import Counter

    pairs = Counter()
    for toks in docs:
        for x, y in zip(toks, toks[1:]):
            if x != y:
                pairs[(x, y)] += 1
    if not pairs:
        merged_docs = docs
    else:
        (w1, w2), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged_docs = []
        for toks in docs:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == w1 and toks[i + 1] == w2:
                    out.append(f"{w1} {w2}")
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            merged_docs.append(out)
    counts = Counter()
    for toks in merged_docs:
        counts.update(toks)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    return {(tok, cnt, i + 1) for i, (tok, cnt) in enumerate(ranked)}


@SETTINGS
@given(TOKEN_STREAMS)
def test_bpe_merge_core_matches_sequential_reference(spark, docs):
    """C7's relational one-step BPE (independent per-position fusion,
    valid because w1 != w2) must equal the SEQUENTIAL left-to-right
    reference on arbitrary token streams — the core correctness claim
    of the operator."""
    from data_pipeline_standalone_scripts_spark.operators.corpus import (
        bpe_merge_core,
    )

    rows = [
        (d, p + 1, tok)
        for d, toks in enumerate(docs)
        for p, tok in enumerate(toks)
    ]
    stream = spark.createDataFrame(rows, "doc_id long, pos long, tok string")
    got = {
        (r["token"], r["cnt"], r["rank"])
        for r in bpe_merge_core(stream).collect()
    }
    assert got == _brute_bpe(docs)


INT_MULTISETS = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=60
)


@SETTINGS
@given(INT_MULTISETS)
def test_exact_median_core_matches_sorted_reference(spark, values):
    """A19's two-pass bin-refine must return the exact k-th order
    statistic (k = (N+1)//2) for arbitrary integer multisets —
    including all-equal, negative, and heavily-duplicated inputs."""
    from data_pipeline_standalone_scripts_spark.operators.aggregates import (
        exact_median_core,
    )

    li = spark.createDataFrame([(v,) for v in values], "cents long")
    row = exact_median_core(li).collect()
    assert len(row) == 1
    got = row[0]
    k = (len(values) + 1) // 2
    want = sorted(values)[k - 1]
    assert got["n"] == len(values)
    assert got["median_cents"] == want


EVENT_TIMES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # user
        st.integers(min_value=0, max_value=2000),  # epoch second
    ),
    min_size=1,
    max_size=40,
)

_GAP_SEC = 100


def _brute_sessions(rows):
    """Spark's MEASURED session semantics (round 7): the merge is
    inclusive at the boundary — an event at exactly last+gap JOINS
    the session; only a strictly greater gap starts a new one. This
    is the rule T13's oracle hardcodes (events.py)."""
    from collections import defaultdict

    per = defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    out = {}
    for u, ts in per.items():
        ts.sort()
        n, last = 0, None
        for t in ts:
            if last is None or t - last > _GAP_SEC:
                n += 1
            last = t
        out[u] = n
    return out


@SETTINGS
@given(EVENT_TIMES)
def test_native_session_window_boundary_semantics(spark, rows):
    """Pin Spark's session_window boundary semantics: the merge is
    INCLUSIVE at exactly last+gap (new session only for strictly
    greater gaps) — the rule T13's oracle (> break) encodes.
    Hypothesis feeds exact-boundary gaps the fixed corpus never
    contains; it is the instrument that CAUGHT the half-open
    assumption being wrong in round 7 (falsifying example
    [(0, 0), (0, 100)] at gap 100: Spark returns ONE session)."""
    import datetime

    df = spark.createDataFrame(
        [
            (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=t))
            for u, t in rows
        ],
        "user_id long, ts timestamp",
    )
    got = (
        df.groupBy(F.session_window("ts", f"{_GAP_SEC} seconds"), "user_id")
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    assert {r["user_id"]: r["count"] for r in got} == _brute_sessions(rows)


PIT_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # user
        st.integers(min_value=0, max_value=9),    # day offset
        st.integers(min_value=0, max_value=86_399),  # second of day
        st.sampled_from(["click", "purchase"]),
        st.integers(min_value=0, max_value=300),  # value (whole units)
    ),
    min_size=1,
    max_size=30,
)


def _brute_pit(rows):
    """Python reference: per purchase, the cumulative (events, cents)
    through the latest FULL day strictly before the purchase's day."""
    from collections import defaultdict

    daily = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for u, d, _sec, _ty, v in rows:
        daily[u][d][0] += 1
        daily[u][d][1] += v * 100
    out = {}
    for eid, (u, d, _sec, ty, _v) in enumerate(rows):
        if ty != "purchase":
            continue
        days = sorted(x for x in daily[u] if x < d)
        if not days:
            out[eid] = ("none", 0, 0)
        else:
            snap = days[-1]
            cum_e = sum(daily[u][x][0] for x in days)
            cum_c = sum(daily[u][x][1] for x in days)
            out[eid] = (f"2024-01-{snap + 1:02d}", cum_e, cum_c)
    return out


@SETTINGS
@given(PIT_EVENTS)
def test_pit_join_core_is_strictly_before(spark, rows):
    """ML6's point-in-time pick must equal the reference on arbitrary
    event streams — including same-day purchases (which must NOT see
    same-day activity: the leakage case) and cold starts."""
    import datetime

    from data_pipeline_standalone_scripts_spark.operators.mlfit import (
        pit_join_core,
    )

    df = spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime(2024, 1, 1 + d)
                + datetime.timedelta(seconds=sec),
                u,
                ty,
                float(v),
                "{}",
            )
            for eid, (u, d, sec, ty, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r["event_id"]: (r["snap_day"], r["cum_events"], r["cum_cents"])
        for r in pit_join_core(df).collect()
    }
    assert got == _brute_pit(rows)
