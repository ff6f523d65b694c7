"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handling (enabled in session.py) splits oversized
sort-merge partitions automatically; salting is the explicit fallback
for the cases AQE can't fix — e.g. a broadcast-ineligible dimension
joined on a key where one value carries half the fact table.

``salted_join`` replicates the (small) right side SALT times and
scatters the left side's hot keys across the replicas; results are
identical to the plain join, but the hot key's rows spread over SALT
reducers instead of one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left side salted and the right
    side replicated ``salt`` ways.

    Equivalent to ``left.join(right, key, how)`` for inner/left joins;
    use when one ``key`` value dominates and the join is not
    broadcastable.
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), salt)
    )
    exploded_right = right.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    )
    out = salted_left.join(exploded_right, [key, "_salt"], how)
    return out.drop("_salt")
