"""Invariant tests for the round-2 time-series / sketch /
reconciliation families — properties the oracle equality alone doesn't
state explicitly (SURVEY.md §5.2: every operator family carries its
own semantic invariants beyond parity).
"""

import pytest
from pyspark.sql import functions as F

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.registry import REGISTRY
from data_pipeline_standalone_scripts_spark.tables import load

engine.load_all_operators()


def test_simhash_triangle_equals_naive_join(spark, sf_small):
    """The triangle-decomposed band self-join must produce exactly the
    plain banded join's pair set (each pair once) — the decomposition
    is a physical rewrite, never a semantic one."""
    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        BAND_BITS,
        HAMMING_MAX,
        SIMHASH_BANDS,
        simhash_fingerprints,
    )

    fps = simhash_fingerprints(spark, sf_small).cache()
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.expr(
                        f"shiftright(simhash, {b * BAND_BITS}) "
                        f"& {(1 << BAND_BITS) - 1}"
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    x = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    naive = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.bit_count(x) <= HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fast = REGISTRY["q_simhash_neardup"].fn(spark, sf_small).select(
        "doc_a", "doc_b"
    )
    naive_set = {tuple(r) for r in naive.collect()}
    fast_rows = [tuple(r) for r in fast.collect()]
    assert len(fast_rows) == len(set(fast_rows)), "triangle join emitted a pair twice"
    assert set(fast_rows) == naive_set
    fps.unpersist()


def test_bloom_has_no_false_negatives(spark, sf_small):
    """Bloom contract: every true member row passes the filter —
    n_member summed over groups must equal the exact semi-join count."""
    res = {
        r["l_returnflag"]: r
        for r in REGISTRY["q_bloom_prefilter"].fn(spark, sf_small).collect()
    }
    sup = load(spark, sf_small, "supplier")
    nat = load(spark, sf_small, "nation")
    reg = load(spark, sf_small, "region")
    dim = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(
            reg.filter(F.col("r_name") == "EUROPE"),
            nat.n_regionkey == reg.r_regionkey,
        )
        .select("s_suppkey")
        .distinct()
    )
    exact = (
        load(spark, sf_small, "lineitem")
        .join(dim, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    for row in exact:
        assert res[row["l_returnflag"]]["n_member"] == row["count"]
    for r in res.values():
        assert r["n_pass"] == r["n_member"] + r["n_false_pos"]


def test_cms_never_underestimates(spark, sf_small):
    """Count-min guarantee: est ≥ exact for every key, and with only
    16 counters against a ~40-token vocabulary at least one token must
    actually collide (the sketch is deliberately undersized)."""
    rows = REGISTRY["q_cms_frequency"].fn(spark, sf_small).collect()
    assert rows
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
    assert any(r["overcount"] > 0 for r in rows)


def test_gap_fill_series_is_dense(spark, sf_small):
    """Every user must have exactly (max_day - min_day + 1) rows —
    that's what 'gap fill' means — and n_events must sum back to the
    raw event count."""
    out = REGISTRY["q_gap_fill_daily"].fn(spark, sf_small)
    e = load(spark, sf_small, "events")
    n_days = e.select(
        (
            F.datediff(
                F.date_trunc("day", F.max("ts")), F.date_trunc("day", F.min("ts"))
            )
            + 1
        ).alias("d")
    ).collect()[0]["d"]
    per_user = out.groupBy("user_id").count().collect()
    assert per_user and all(r["count"] == n_days for r in per_user)
    assert (
        out.agg(F.sum("n_events")).collect()[0][0] == e.count()
    ), "gap rows must not invent events"


def test_scd2_intervals_partition_each_user_history(spark, sf_small):
    """SCD2 invariants: per user, run_ids are 1..n with no gaps, each
    interval's valid_to equals the next interval's valid_from (the
    last is open/sentinel), and n_events sums to the user's raw
    count."""
    out = REGISTRY["q_scd2_intervals"].fn(spark, sf_small).collect()
    e_counts = {
        r["user_id"]: r["count"]
        for r in load(spark, sf_small, "events")
        .groupBy("user_id")
        .count()
        .collect()
    }
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(e_counts)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["run_id"])
        assert [r["run_id"] for r in rows] == list(range(1, len(rows) + 1))
        for cur, nxt in zip(rows, rows[1:]):
            assert cur["valid_to"] == nxt["valid_from"]
            assert nxt["event_type"] != cur["event_type"], "adjacent runs must differ"
        assert rows[-1]["valid_to"].startswith("9999-12-31")
        assert sum(r["n_events"] for r in rows) == e_counts[uid]


def test_rollup_grains_are_consistent(spark, sf_small):
    """Each grain of the multi-resolution rollup must independently
    total the full event count — a row lost to one grain's bucketing
    would silently skew downstream dashboards."""
    out = REGISTRY["q_rollup_multires"].fn(spark, sf_small)
    n = load(spark, sf_small, "events").count()
    per_grain = {
        r["grain"]: r["total"]
        for r in out.groupBy("grain").agg(F.sum("n").alias("total")).collect()
    }
    assert per_grain == {"minute": n, "hour": n, "day": n}


def test_snapshot_diff_accounts_for_every_key(spark, sf_small):
    """added+removed+changed+unchanged must cover |A ∪ B| exactly."""
    res = {
        r["change_type"]: r["n"]
        for r in REGISTRY["q_snapshot_diff"].fn(spark, sf_small).collect()
    }
    o = load(spark, sf_small, "orders")
    n_a = o.count()
    n_removed = o.filter(F.col("o_orderkey") % 97 == 0).count()
    n_added = o.filter(F.col("o_orderkey") % 101 == 0).count()
    assert res.get("removed", 0) == n_removed
    assert res.get("added", 0) == n_added
    assert sum(res.values()) == n_a + n_added


def test_checksum_detects_single_cell_drift(spark, sf_small):
    """The fingerprint must move when one cell changes — run the same
    checksum over a copy with one price perturbed and require a
    different checksum for exactly that group."""
    from data_pipeline_standalone_scripts_spark.operators.reconcile import (
        _row_repr_spark,
    )
    from data_pipeline_standalone_scripts_spark.operators.common import h60

    o = load(spark, sf_small, "orders")
    base = {
        r["o_orderstatus"]: r["checksum"]
        for r in REGISTRY["q_table_checksum"].fn(spark, sf_small).collect()
    }
    one_key, one_status = o.select("o_orderkey", "o_orderstatus").first()
    drifted = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == one_key, F.col("o_totalprice") + 0.01
        ).otherwise(F.col("o_totalprice")),
    )
    after = {
        r["o_orderstatus"]: r["checksum"]
        for r in drifted.select(
            "o_orderstatus", h60(_row_repr_spark()).alias("h")
        )
        .groupBy("o_orderstatus")
        .agg(F.expr("bit_xor(h)").alias("checksum"))
        .collect()
    }
    assert after[one_status] != base[one_status]
    for status, cs in base.items():
        if status != one_status:
            assert after[status] == cs


def test_fuzzy_match_pairs_are_unique_and_in_range(spark, sf_small):
    """Lowest-block emission must yield each pair once; distances must
    sit in the declared 1–2 band and keys must be ordered."""
    rows = [
        (r["key_a"], r["key_b"], r["edit_dist"])
        for r in REGISTRY["q_fuzzy_name_match"].fn(spark, sf_small).collect()
    ]
    pairs = [(a, b) for a, b, _ in rows]
    assert len(pairs) == len(set(pairs)), "pair emitted from two blocks"
    assert all(a < b for a, b in pairs)
    assert all(1 <= d <= 2 for _, _, d in rows)


def test_morton_code_interleaves_bits(spark, sf_small):
    """Spot-check the Morton key against a Python reference on the
    returned rows."""

    def morton(p: int, s: int) -> int:
        out = 0
        for i in range(16):
            out |= ((p >> i) & 1) << (2 * i)
            out |= ((s >> i) & 1) << (2 * i + 1)
        return out

    rows = REGISTRY["q_morton_cluster"].fn(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r["morton"] == morton(r["l_partkey"], r["l_suppkey"])


def test_linreg_matches_numpy(spark, sf_small):
    """The moment-based OLS solve must agree with numpy lstsq to ~1e-6
    in original units (and R² must be in (0, 1])."""
    import numpy as np

    row = REGISTRY["q_linreg_fit"].fn(spark, sf_small).collect()[0]
    li = (
        load(spark, sf_small, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(li)), li.l_quantity.values, li.l_discount.values]
    )
    y = (li.l_extendedprice * (1 - li.l_discount)).values
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert row["n_rows"] == len(li)
    assert abs(row["beta0"] - beta[0]) < 1e-4 * max(1, abs(beta[0]))
    assert abs(row["beta_qty"] - beta[1]) < 1e-4 * max(1, abs(beta[1]))
    assert abs(row["beta_disc"] - beta[2]) < 1e-4 * max(1, abs(beta[2]))
    assert 0 < row["r2"] <= 1 and abs(row["r2"] - r2) < 1e-4


def test_png_codec_roundtrips_random_rasters():
    """Codec property test (no Spark): encode→decode must be the
    identity on random rasters — random bytes stress Average/Paeth
    prediction far harder than the smooth generator pattern — and the
    decoder must reject corruption (flipped byte ⇒ CRC error)."""
    import numpy as np

    from data_pipeline_standalone_scripts_spark.sources.multimodal import (
        png_decode_pixels,
        png_encode,
    )

    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (3, 7), (16, 5), (64, 48), (127, 33)]:
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        payload = png_encode(px)
        out = png_decode_pixels(payload)
        assert out.shape == (h, w)
        assert (out == px).all()
    payload = png_encode(rng.randint(0, 256, size=(9, 9)).astype(np.uint8))
    corrupted = bytearray(payload)
    corrupted[40] ^= 0xFF  # inside IDAT data
    with pytest.raises(ValueError):
        png_decode_pixels(bytes(corrupted))
    with pytest.raises(ValueError):
        png_decode_pixels(payload[:-2])  # truncated mid-chunk
    with pytest.raises(ValueError):
        # corrupt a chunk length so it overruns the buffer
        oversized = bytearray(payload)
        oversized[8:12] = b"\xff\xff\xff\xff"
        png_decode_pixels(bytes(oversized))
