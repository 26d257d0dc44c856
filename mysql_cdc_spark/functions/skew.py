"""Skew mitigation: deterministic salted equi-join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; this helper is the explicit form for joins AQE cannot split
(e.g. a non-shuffle-join forced elsewhere, or pre-AQE Spark) and for
making the technique testable: the big side gets a salt derived by
hashing the WHOLE row (deterministic — no rand(), so replays and
retries agree), the small side is replicated `salt` times, and the
join key becomes (key, salt) — a hot key's rows spread over `salt`
partitions instead of one.

Cost model: small side inflates salt×, so keep `salt` modest (8-32)
and the small side broadcast-or-small; the win is on the big side's
shuffle, where the hot key's partition shrinks by ~salt×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, salted against hot keys.
    Result is row-identical to the plain join (inner/left semantics
    preserved: every small row exists for every salt value)."""
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column name {_SALT!r} is reserved")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, [*on, _SALT], how).drop(_SALT)
