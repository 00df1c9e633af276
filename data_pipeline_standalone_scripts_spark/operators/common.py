"""Shared expression helpers enforcing the determinism contract.

Cross-engine float discipline (SURVEY.md §1.3, §7 hard-part 2):

- ``dsum``/``davg`` accumulate doubles as DECIMAL(24,6) so the sum is
  EXACT (int128 under the hood in both Spark and DuckDB) and therefore
  bit-identical regardless of partition/merge order, then cast back to
  DOUBLE. The matching oracle fragments are ``o_dsum``/``o_davg``.
  This beats round(6) because it removes the nondeterminism instead of
  papering over it — a 1e9-magnitude double sum reordered across 32
  partitions can move by ~1e-6, exactly the rounding boundary.
  Scale 6 matters: the test data quantizes prices/discount/tax to 2
  decimals, so 3-factor products are EXACT 6-decimal values; a coarser
  decimal cast would land on half-boundaries where Spark (HALF_UP) and
  DuckDB (HALF_EVEN) disagree — measured: 0.0046 drift on TPC-H Q1's
  sum_charge at scale 4. At scale 6 the cast is rounding-free.
- For aggregates that are inherently float-path-dependent (stddev,
  corr, cosine), round to 6 on both sides (boundary-flip probability
  is negligible at those magnitudes).

Scale note: DECIMAL sums are still map-side-combinable hash aggregates
in Spark (partial_sum(decimal) merges exactly), so this costs nothing
at 100 TB — the shuffle still carries one partial row per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(24,6)"

# --- persist tracking (ADVICE r03 #1) ---------------------------------------
# Operators persist() intermediates whose results are returned LAZILY,
# so the operator itself can never unpersist (the cache is consumed
# when the caller finally acts on the frame). Without a ledger those
# blocks live for the whole session and accumulate across a
# registry-wide sweep. Every operator-held persist goes through
# tracked_persist(); harnesses (bench.py, tools/check_parity,
# __spark_entry__ consumers) call release_persists() after each
# query's action. spark.catalog.clearCache() also works — this is the
# targeted version that doesn't evict unrelated user caches.
_LIVE_PERSISTS: list[DataFrame] = []


def tracked_persist(df: DataFrame, level=None) -> DataFrame:
    """persist() + register in the module ledger for later release."""
    out = df.persist(level) if level is not None else df.persist()
    _LIVE_PERSISTS.append(out)
    return out


def release_persists() -> int:
    """Unpersist every ledgered frame (blocking=False); returns count."""
    n = len(_LIVE_PERSISTS)
    while _LIVE_PERSISTS:
        try:
            _LIVE_PERSISTS.pop().unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n


def table_disk_bytes(sf_dir: str, table: str) -> int:
    """On-disk parquet bytes of a table (0 = unknown/non-local) — the
    zero-job size probe broadcast-vs-shuffle dispatches use. Raw
    parquet bytes are a LOWER bound on in-memory row size (encoding +
    compression), so thresholds derived from it must keep a wide
    margin under the 8 GB broadcast cap."""
    import os

    from ..tables import table_path

    path = table_path(sf_dir, table)
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
        return os.path.getsize(path)
    except OSError:
        return 0


def scan_splits_hint(spark, sf_dir: str, table: str) -> int:
    """Estimate the native scan partition count Spark's file-source
    packer will give a table — the cheap stand-in for the
    ``rdd.getNumPartitions()`` probe (which compiles the physical plan,
    ~50 ms per call). Mirrors FilePartition's sizing: maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, (bytes + nFiles·open)/
    defaultParallelism)), files split at that boundary, then splits
    (each weighted +openCost) first-fit-packed descending.

    Returns 0 when the layout can't be inspected (non-local URI,
    missing path) — callers must treat 0 as "unknown" and take their
    scale-safe branch. Used by the parallelism-crutch repartitions
    (q_bpe_merge, q_boilerplate_ngrams) so the crutch fires only when
    the scan genuinely cannot spread the work (single small file), not
    on the multi-file layouts a real table always has.
    """
    import math

    sizes = _parquet_sizes(sf_dir, table)
    if not sizes:
        return 0
    open_cost = 4 * 1024 * 1024
    max_pb = 128 * 1024 * 1024
    par = spark.sparkContext.defaultParallelism
    total = sum(sizes) + len(sizes) * open_cost
    split = min(max_pb, max(open_cost, total // par + 1))
    weights: list[int] = []
    for s in sizes:
        n = max(1, math.ceil(s / split))
        for j in range(n):
            weights.append(min(split, s - j * split) + open_cost)
    weights.sort(reverse=True)
    bins, cur = 0, 0
    for w in weights:
        if cur > 0 and cur + w > split:
            bins += 1
            cur = 0
        cur += w
    return bins + (1 if cur else 0)


def _parquet_sizes(sf_dir: str, table: str) -> "list[int]":
    """Per-file on-disk parquet bytes of a test table; [] when the
    layout can't be inspected (non-local URI, missing path). The ONE
    directory walk + "empty = unknown" contract shared by
    scan_splits_hint and table_bytes, so the two probes can't drift."""
    import os

    from ..tables import table_path

    path = table_path(sf_dir, table)
    try:
        if os.path.isdir(path):
            return [
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            ]
        return [os.path.getsize(path)]
    except OSError:
        return []


def table_bytes(sf_dir: str, table: str) -> int:
    """On-disk parquet bytes of a test table, or 0 when the layout
    can't be inspected — callers must treat 0 as "unknown" and take
    their scale-safe branch (the same contract as scan_splits_hint).
    Used by the size-conditional broadcast/coalesce guards (VERDICT
    r09 #5): prose fallbacks like "at scale this becomes two hash
    joins" are only real if a branch actually switches on the size."""
    return sum(_parquet_sizes(sf_dir, table))


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact sum of a double column, as double.

    Mechanism: per-row scale to micro-units and round half-away-from-
    zero, sum as BIGINT (exact, order-free, plain long arithmetic),
    unscale once at the end. Identical values to the DECIMAL(24,6)
    formulation on this data (the cast is rounding-free at scale 6,
    see module docstring).

    The half-away rounding is spelled ``trunc(v ± 0.5)`` rather than
    ``round(v)`` because Spark's round() routes every row through
    BigDecimal — measured 0.57 s vs 0.30 s for 4 such aggregates over
    600 k rows; the truncating double→long cast stays inside codegen.
    DuckDB's round() is already a cheap libm half-away round, so the
    oracle keeps round() — same mathematical function on both sides.

    Domain: |x|·1e6 < 2^53 per row and Σ < 2^63 — holds with ~100×
    headroom at sf0.1 magnitudes; at true 100 TB row counts switch the
    accumulator back to DECIMAL (the scale story trades a constant
    factor for unbounded headroom; ANSI mode turns overflow into a
    loud error either way, never silent wrap).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_half_away_micros(c)) / 1_000_000.0).alias(alias)


def _half_away_micros(c: Column) -> Column:
    """round(c·1e6) half-away-from-zero as a codegen-friendly long."""
    v = c * 1_000_000
    return (v + F.when(v >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long")


def davg(col: Column | str, alias: str) -> Column:
    """Exact-numerator average: scaled-long sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_half_away_micros(c)) / 1_000_000.0 / F.count(c)).alias(alias)


def o_dsum(expr: str, alias: str) -> str:
    """DuckDB fragment matching ``dsum``."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 AS {alias}"
    )


def o_davg(expr: str, alias: str) -> str:
    """DuckDB fragment matching ``davg``."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 / COUNT({expr}) AS {alias}"
    )


def h60(col: Column | str) -> Column:
    """Portable 60-bit content hash: first 15 hex chars of md5 as a
    non-negative BIGINT. Identical in DuckDB via ``o_h60`` (verified:
    h60('hello') == 419982666956583591 in both engines). Used wherever
    a hash value itself crosses the oracle boundary (SimHash,
    winnowing fingerprints) — Spark's xxhash64 has no DuckDB twin."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def o_h60(expr: str) -> str:
    """DuckDB fragment matching ``h60``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def r6(col: Column, alias: str) -> Column:
    """round(x, 6) for genuinely float-path-dependent aggregates."""
    return F.round(col, 6).alias(alias)


def ts_str(col: Column | str, alias: str) -> Column:
    """Canonical string form of a timestamp for cross-engine output.

    Arrow schemas differ (Spark timestamp carries tz=UTC, DuckDB's is
    naive), so T2 queries never emit raw timestamps — they emit this.
    Microsecond precision, fixed width.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(alias)


def o_ts_str(expr: str, alias: str) -> str:
    """DuckDB fragment matching ``ts_str`` (strftime %f = microseconds)."""
    return f"strftime(({expr}), '%Y-%m-%d %H:%M:%S.%f') AS {alias}"


def dist_ntile(
    df,
    order_by,
    out: str,
    n: int = 5,
    parts: int = 32,
):
    """Exact ``NTILE(n) OVER (ORDER BY …)`` without a single-partition
    sort — the scale-safe replacement for a global unpartitioned window
    (VERDICT r02 "What's wrong #2": a global ntile over a per-customer
    frame is 10⁸–10⁹ rows on ONE task at 100 TB).

    Mechanism (classic distributed rank):
      1. ``repartitionByRange(parts, keys)`` — Spark's sampled range
         shuffle; partition *i* holds keys strictly below partition
         *i+1* in the requested order, so global rank = per-partition
         rank + offset.
      2. per-partition ``row_number`` via a window PARTITIONED by the
         materialized partition id — every task sorts ~|df|/parts rows.
      3. offsets = prefix sum of per-partition counts, computed by a
         broadcast theta-join over the ≤``parts``-row counts table (no
         WindowExec anywhere in this helper's plan).
      4. NTILE arithmetic on the global rank with broadcast total
         count: the first ``n_total mod n`` buckets take one extra row,
         exactly Spark/DuckDB NTILE semantics.

    ``order_by`` must define a TOTAL order (add a unique-key tie-break)
    or per-partition row_number becomes nondeterministic. Requires
    every ``order_by`` entry as a plain column name + direction via
    ``(col, "asc"|"desc")`` tuples so the same keys drive the range
    shuffle and the window sort.
    """
    ranked = dist_row_number(df, order_by, out, parts=parts, keep_total="__n")
    rank = F.col(out)
    base = (F.col("__n") / n).cast("long")  # floor: __n, n ≥ 0
    rem = F.col("__n") % n
    fat = base + 1  # rows per bucket in the first `rem` buckets
    cut = rem * fat  # global rank of the last row in bucket `rem`
    bucket = (
        F.when(rank <= cut, ((rank - 1) / fat).cast("long") + 1)
        .otherwise(
            rem + ((rank - cut - 1) / F.greatest(base, F.lit(1))).cast("long") + 1
        )
        .cast("int")
    )
    return ranked.withColumn(out, bucket).drop("__n")


def dist_row_number(
    df,
    order_by,
    out: str,
    parts: int = 32,
    keep_total: str | None = None,
):
    """Exact global ``row_number() OVER (ORDER BY …)`` without a
    single-partition sort — steps 1–3 of :func:`dist_ntile`'s
    mechanism (range shuffle → per-partition row_number → broadcast
    prefix-sum offsets). ``order_by`` is ``(col, "asc"|"desc")``
    tuples forming a TOTAL order. With ``keep_total`` set, the result
    carries the global row count under that column (broadcast 1-row
    cross join) for rank-arithmetic consumers like NTILE."""
    keys = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order_by
    ]
    pid, rn = f"__{out}_pid", f"__{out}_rn"
    from pyspark.sql.window import Window  # local: keep module deps minimal

    # persist() is CORRECTNESS here, not caching: the pid column is
    # spark_partition_id() evaluated at shuffle-read time, and AQE may
    # coalesce the range exchange differently for the row branch vs
    # the counts branch (different read partitioning -> inconsistent
    # pids -> wrong offsets). Materializing once pins one assignment.
    ranged = tracked_persist(
        df.repartitionByRange(parts, *keys).withColumn(
            pid, F.spark_partition_id()
        )
    )
    local = ranged.withColumn(
        rn, F.row_number().over(Window.partitionBy(pid).orderBy(*keys))
    )
    counts = ranged.groupBy(pid).agg(F.count(F.lit(1)).alias("__cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(
            F.broadcast(b),
            F.col(f"b.{pid}") < F.col(f"a.{pid}"),
            "left",
        )
        .groupBy(F.col(f"a.{pid}").alias(pid))
        .agg(F.coalesce(F.sum("b.__cnt"), F.lit(0)).alias("__off"))
    )
    res = (
        local.join(F.broadcast(offsets), pid)
        .withColumn(out, F.col(rn) + F.col("__off"))
        .drop(pid, rn, "__off")
    )
    if keep_total:
        total = counts.agg(F.sum("__cnt").alias(keep_total))
        res = res.crossJoin(F.broadcast(total))
    return res


def dist_running(
    df,
    order_by,
    sums=None,
    parts: int = 32,
    inclusive: bool = True,
    maxs=None,
):
    """Distributed running SUMs (and running MAXes via ``maxs``) over
    a TOTAL order — the scale-safe replacement for ``SUM(x)/MAX(x)
    OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`` with no partitioning
    (ECDF walks, Lorenz curves, rank-sum statistics, watermark
    replays, skyline strict-prefix maxima), same mechanism as
    :func:`dist_row_number`: range shuffle → per-partition running
    agg → broadcast per-partition totals combined as offsets
    (sums add; maxes take ``greatest``).

    ``sums``/``maxs`` map output column name → input column name;
    ``inclusive=False`` gives the exclusive frame (… AND -1): sums
    coalesce to 0 on the first row, maxes stay NULL (SQL running-max
    semantics over an empty frame). ``order_by`` is
    ``(col, "asc"|"desc")`` tuples and must be a total order (unique
    keys) for determinism.

    NULL contract (ADVICE r03 #2): running SUMs are COALESCED TO 0 —
    an all-NULL prefix yields 0 where SQL window ``SUM`` yields NULL.
    Every current caller sums non-null measures (counts, cents,
    flags), and the property test pins the coalesced semantics; a
    caller with a genuinely nullable measure must pre-filter NULLs or
    accept the divergence from the window-SUM oracle.
    """
    from pyspark.sql.window import Window

    sums = sums or {}
    maxs = maxs or {}
    keys = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order_by
    ]
    pid = "__dr_pid"
    # persist pins ONE pid assignment across the running/totals
    # branches (see dist_row_number: AQE read-coalescing hazard)
    ranged = tracked_persist(
        df.repartitionByRange(parts, *keys).withColumn(
            pid, F.spark_partition_id()
        )
    )
    upper = 0 if inclusive else -1
    w_loc = (
        Window.partitionBy(pid)
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = ranged.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w_loc), F.lit(0)).alias(f"__loc_{o}")
            for o, c in sums.items()
        ],
        *[F.max(c).over(w_loc).alias(f"__loc_{o}") for o, c in maxs.items()],
    )
    totals = ranged.groupBy(pid).agg(
        *[F.sum(c).alias(f"__t_{o}") for o, c in sums.items()],
        *[F.max(c).alias(f"__t_{o}") for o, c in maxs.items()],
    )
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(
            F.broadcast(b), F.col(f"b.{pid}") < F.col(f"a.{pid}"), "left"
        )
        .groupBy(F.col(f"a.{pid}").alias(pid))
        .agg(
            *[
                F.coalesce(F.sum(f"b.__t_{o}"), F.lit(0)).alias(f"__off_{o}")
                for o in sums
            ],
            *[F.max(f"b.__t_{o}").alias(f"__off_{o}") for o in maxs],
        )
    )
    res = local.join(F.broadcast(offsets), pid)
    for o in sums:
        res = res.withColumn(o, F.col(f"__loc_{o}") + F.col(f"__off_{o}"))
    for o in maxs:
        # greatest() skips NULLs: partition-first rows inherit the
        # prior-partition max; stays NULL only when both are NULL
        res = res.withColumn(
            o, F.greatest(F.col(f"__loc_{o}"), F.col(f"__off_{o}"))
        )
    allo = list(sums) + list(maxs)
    return res.drop(
        pid,
        *[f"__loc_{o}" for o in allo],
        *[f"__off_{o}" for o in allo],
    )


def topk_with_rank(df, order_by, k: int, out: str = "rank"):
    """Global top-k rows + their 1-based rank, with NO window anywhere:
    ``orderBy().limit(k)`` plans as TakeOrderedAndProject (per-
    partition k-heaps, driver merge — no global sort), and the rank is
    recovered inside the ≤k-row frame by a broadcast self-theta-join
    counting strict lexicographic predecessors. ``order_by`` is
    ``(col, "asc"|"desc")`` tuples forming a TOTAL order over non-null
    keys."""
    keys = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order_by
    ]
    top = df.orderBy(*keys).limit(k)
    a, b = top.alias("a"), top.alias("b")
    before = F.lit(False)
    eqs = F.lit(True)
    for c, d in order_by:
        ac, bc = F.col(f"a.{c}"), F.col(f"b.{c}")
        cmp = (bc > ac) if d == "desc" else (bc < ac)
        before = before | (eqs & cmp)
        eqs = eqs & (bc == ac)
    first = order_by[0][0]
    cols = df.columns
    return (
        a.join(F.broadcast(b), before, "left")
        .groupBy(*[F.col(f"a.{c}").alias(c) for c in cols])
        .agg((F.count(F.col(f"b.{first}")) + 1).alias(out))
    )
