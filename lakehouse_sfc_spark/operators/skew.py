"""Skew mitigation for joins: salting (explicit) and AQE skew-join (runtime).

Spark's AQE splits skewed shuffle partitions automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``), which
covers most cases at runtime.  Salting is the explicit, planner-independent
fallback for the pathological shape AQE cannot fix: one join key so hot that
a single task would own it — the salt spreads ONE key's rows over ``factor``
tasks by construction.

The brief's scale checklist calls this out directly ("skewed keys hurt …
salting for skew"); the reference itself never needs it because its joins
are fact⋈dim broadcasts (wlg/templates/sql.py:75-109).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    factor: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``left`` (large, skewed) with ``right`` (smaller, but too
    big to broadcast) on column ``on``, spreading each hot key over
    ``factor`` shuffle tasks.

    left rows get a uniform random salt in [0, factor); right rows are
    replicated once per salt value (cost: factor x right's size — keep
    ``factor`` modest and the right side the smaller input).  The join key
    becomes (on, salt), so rows of one hot key land in ``factor`` different
    tasks instead of one.  Output equals the unsalted join exactly; only the
    physical distribution changes.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if how not in ("inner", "left_outer", "left_semi", "left_anti"):
        # right_outer/full would need salting the OTHER side's null matches
        raise ValueError(f"unsupported how={how!r} for salted join")
    salted_left = left.withColumn(
        _SALT, F.floor(F.rand(seed) * factor).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(factor - 1))
    ).alias(_SALT)
    salted_right = right.select(F.col("*"), salts)
    joined = salted_left.join(
        salted_right,
        on=[on, _SALT],
        how=how,
    )
    return joined.drop(_SALT)
