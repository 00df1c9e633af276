"""Data-reconciliation operators: order-insensitive table checksums
and snapshot diffing.

The ops a pipeline runs AROUND the analytics: verify that a copied /
migrated / replicated table is byte-equivalent without sorting it
(checksum), and explain how two snapshots differ without comparing
every column pairwise (keyed row-hash diff). Both use the portable
``h60`` row hash so the values themselves are oracle-checkable.

Scale notes (100 TB):
- The checksum is a map-side-combinable XOR fold: each partition XORs
  its row hashes locally, the shuffle carries ONE long per group.
  Verifying a 100 TB copy costs one scan and a KB of traffic — this
  is the anti-entropy pattern from replicated stores.
- The snapshot diff is one full-outer join on the primary key. On
  bucketed/co-partitioned snapshots it is shuffle-free; the row-hash
  comparison makes the equality check one long per row regardless of
  column count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .common import h60, o_h60

CAT = "reconcile"

# Canonical row rendering for orders: ints and strings render
# identically in both engines; the double price is 2-dp-quantized by
# generation, so the DECIMAL(12,2) cast is exact (rounding-free) and
# its VARCHAR form matches bit-for-bit.
_ROW_COLS_DUCK = (
    "CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus, "
    "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), "
    "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), o_orderpriority"
)


def _row_repr_spark(price_col: str = "o_totalprice") -> Column:
    return F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col(price_col).cast("decimal(12,2)").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col("o_orderpriority"),
    )


@register(
    "q_table_checksum",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_rows,
               bit_xor({o_h60(f"concat_ws('|', {_ROW_COLS_DUCK})")}) AS checksum
        FROM orders
        GROUP BY o_orderstatus
    """,
    category=CAT,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RC1: order-insensitive per-group table fingerprint — XOR of
    canonical row hashes plus row count, per order status.

    Two copies of the table match iff every (group, n_rows, checksum)
    row matches, regardless of row order or partitioning — the scan-
    and-fold anti-entropy check used to validate replication and
    migration. XOR is self-inverse, so a duplicated-row pair cancels;
    the row count catches exactly that case, which is why both are
    emitted together.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", h60(_row_repr_spark()).alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("checksum"),
        )
    )


_SNAP_B_DUCK = """
        snap_b AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 10.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 97 <> 0
            UNION ALL
            SELECT -o_orderkey - 1, o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 101 = 0
        )
"""


@register(
    "q_snapshot_diff",
    oracle=f"""
        WITH {_SNAP_B_DUCK},
        ha AS (
            SELECT o_orderkey AS k,
                   {o_h60(f"concat_ws('|', {_ROW_COLS_DUCK})")} AS h
            FROM orders
        ), hb AS (
            SELECT o_orderkey AS k,
                   {o_h60(f"concat_ws('|', {_ROW_COLS_DUCK})")} AS h
            FROM snap_b
        )
        SELECT CASE WHEN ha.k IS NULL THEN 'added'
                    WHEN hb.k IS NULL THEN 'removed'
                    WHEN ha.h <> hb.h THEN 'changed'
                    ELSE 'unchanged' END AS change_type,
               COUNT(*) AS n
        FROM ha FULL OUTER JOIN hb ON ha.k = hb.k
        GROUP BY 1
    """,
    category=CAT,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RC2: keyed snapshot diff — classify every primary key as
    added / removed / changed / unchanged between snapshot A (orders)
    and a deterministically drifted snapshot B (~1% deletes at
    key%97, ~1% price updates at key%89, ~1% inserts at key%101;
    inserted keys are the negated originals, which cannot collide
    with any real non-negative key at any scale factor).

    One full-outer join on the key; equality is a single h60 row-hash
    compare, so the diff cost is independent of column count. This is
    the table-diff / CDC-validation primitive; q_cdc_upsert (J14) is
    its write-side inverse.
    """
    o = load(spark, sf_dir, "orders")
    snap_b = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 10.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 101 == 0).withColumn(
                "o_orderkey", -F.col("o_orderkey") - 1
            )
        )
    )
    ha = o.select(
        F.col("o_orderkey").alias("k"), h60(_row_repr_spark()).alias("h")
    ).alias("ha")
    hb = snap_b.select(
        F.col("o_orderkey").alias("k"), h60(_row_repr_spark()).alias("h")
    ).alias("hb")
    return (
        ha.join(hb, F.col("ha.k") == F.col("hb.k"), "full_outer")
        .select(
            F.when(F.col("ha.k").isNull(), "added")
            .when(F.col("hb.k").isNull(), "removed")
            .when(F.col("ha.h") != F.col("hb.h"), "changed")
            .otherwise("unchanged")
            .alias("change_type")
        )
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_golden_record",
    oracle="""
        WITH members AS (
            SELECT c_custkey // 3 AS entity_id,
                   c_custkey, c_name, c_mktsegment, c_acctbal, c_nationkey
            FROM customer
        ), spend AS (
            SELECT c_custkey // 3 AS entity_id,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        )
        SELECT m.entity_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               struct_extract(MAX({'b': c_acctbal, 'k': -c_custkey,
                                   'n': c_name}), 'n') AS surviving_name,
               struct_extract(MIN({'k': c_custkey, 's': c_mktsegment}), 's')
                   AS surviving_segment,
               MAX(c_acctbal) AS best_acctbal,
               CAST(COALESCE(MAX(s.total_cents), 0) AS BIGINT)
                   AS entity_total_cents,
               CAST(COALESCE(MAX(s.n_orders), 0) AS BIGINT) AS entity_orders
        FROM members m LEFT JOIN spend s ON m.entity_id = s.entity_id
        GROUP BY m.entity_id
    """,
    category=CAT,
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RC3: golden-record survivorship (master data management): each
    entity cluster (here: the deterministic 3-customer blocking key,
    standing in for q_dedup_clusters' output) collapses to ONE
    surviving record with per-attribute survivorship rules — name
    from the member with the highest account balance (ties to lowest
    key via the negated-key struct comparator), segment from the
    lowest-key member (the "first source wins" rule), balance as the
    max, plus entity-level rollups from the fact side.

    Every pick is a lexicographic struct MIN/MAX — the same
    argmin/argmax idiom as FIN1's bars, so survivorship is one
    map-side-combinable aggregate, not a window pass.

    Scale: members aggregate on the entity key (one shuffle); the
    fact rollup collapses to entity grain BEFORE its join, so the
    join is entity×entity, never fact×fact. Plugging in real
    cluster ids from q_dedup_clusters keeps the exact same plan.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    members = c.select(
        F.expr("c_custkey div 3").alias("entity_id"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
    )
    spend = (
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey)
        .select(
            F.expr("c_custkey div 3").alias("entity_id"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("entity_id")
        .agg(
            F.sum("cents").alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    name_pick = F.struct(
        F.col("c_acctbal").alias("b"),
        (-F.col("c_custkey")).alias("k"),
        F.col("c_name").alias("n"),
    )
    seg_pick = F.struct(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("s")
    )
    golden = members.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(name_pick).getField("n").alias("surviving_name"),
        F.min(seg_pick).getField("s").alias("surviving_segment"),
        F.max("c_acctbal").alias("best_acctbal"),
    )
    return golden.join(spend, "entity_id", "left").select(
        "entity_id",
        "n_members",
        "surviving_name",
        "surviving_segment",
        "best_acctbal",
        F.coalesce("total_cents", F.lit(0)).alias("entity_total_cents"),
        F.coalesce("n_orders", F.lit(0)).alias("entity_orders"),
    )
