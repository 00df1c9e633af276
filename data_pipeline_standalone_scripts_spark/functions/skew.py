"""Skew-mitigation toolkit: salted joins for hot keys.

AQE's skew-join splitting (on by default, SCALE.md) handles most skew
at runtime by splitting oversized shuffle partitions. Salting is the
manual tool for the cases AQE can't fix — a *single* join key so hot
that one task would process it alone (power-law user, null-key
pileup): replicate the small side ×S, scatter the large side's hot
key across S salt buckets, join on (key, salt).

Cost model: small side grows ×S (still broadcast-sized by
assumption); large side gains one uniform random column — no extra
shuffle beyond the join's own. Correctness: every (key, salt) pair on
the large side finds exactly the one replica with its salt, so the
join multiplicity is unchanged (proven by tests/test_skew.py against
the plain join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` ⋈ ``small`` on ``key`` with ``n_salts``-way salt
    scatter. ``small`` must be broadcast-sized *after* ×n_salts
    replication.

    The salt on the large side is ``pmod(hash(monotonically-varying
    row identity), S)`` — NOT hash(key): hashing the key would send
    every copy of the hot key to the same salt bucket, defeating the
    point. ``rand`` is avoided for determinism of tests; partition id
    + row position give a uniform-enough scatter with zero extra
    state.
    """
    salt_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salt_large = large.withColumn(
        "__salt",
        F.pmod(F.abs(F.hash(F.spark_partition_id(), F.monotonically_increasing_id())), F.lit(n_salts)),
    )
    out = salt_large.join(F.broadcast(salt_small), [key, "__salt"], how=how)
    return out.drop("__salt")
