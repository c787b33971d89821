"""Skew mitigation: salted join for hot keys.

AQE's skew-join handles most cases at runtime (enabled in session.py);
this explicit variant is for the cases AQE cannot fix — e.g. a
broadcast-ineligible dimension joined on a key where one value carries
a double-digit percentage of the fact table, or a streaming join with
static partitioning. The classic trick: split each hot key into
`salt` sub-keys on the big side, replicate the small side once per
sub-key, join on (key, salt). The hot key's rows now spread over
`salt` tasks instead of one straggler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join `big` ⋈ `small` on `on`, spreading each join key over
    `salt` shuffle partitions.

    The big side's salt mixes the row content (xxhash64 over all
    columns) with a partition-local counter
    (monotonically_increasing_id): content alone maps fully identical
    duplicate rows — the COMMON source of hot-key skew — to one salt
    value, recreating the straggler the salt exists to kill. The
    counter is deterministic given a fixed input partitioning
    (partition_id << 33 | per-partition ordinal), so replays on the
    same layout partition identically. The small side is replicated
    `salt` times via explode — its shuffle volume grows by `salt`x,
    which is the price of de-skewing and why `small` should be the
    smaller input. Result equals the unsalted join (the salt columns
    never leave this function).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    big_s = big.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns])
            + F.monotonically_increasing_id(),
            F.lit(salt),
        ),
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [*on, _SALT], how)
    return out.drop(_SALT)
