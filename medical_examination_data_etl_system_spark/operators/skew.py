"""Skew mitigation operators (SURVEY.md §2b; 100 TB posture).

AQE's skew-join splitting (on in ``session.get_spark``) handles most
join skew at runtime. Two cases it does NOT cover get explicit
operators here, both semantics-preserving (results identical to the
naive form, verified by full-value oracles):

- ``salted_join``: replicate the small side ``num_salts`` ways and
  scatter the fact side across the replicas, so one hot key spreads
  over ``num_salts`` tasks. For broadcast-able dims prefer
  ``F.broadcast`` (no shuffle at all); salting is for dims above the
  broadcast threshold joined on a skewed key.

- ``salted_count_distinct``: a low-cardinality ``groupBy(k).agg(
  countDistinct(v))`` funnels every row of a hot group through one
  task. Two-phase form: partial distinct count per ``(k, hash(v) %
  num_salts)`` — disjoint value partitions, so the per-salt distinct
  counts sum exactly — then a cheap final sum over ``num_salts`` rows
  per group.

Salts are DETERMINISTIC (xxhash64 of row content, not rand()): retried
or speculatively re-executed tasks must land rows in the same salt
bucket or results could double-count under recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def _deterministic_salt(cols: list[Column], num_salts: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(num_salts))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on equi-keys ``on``, spreading each key
    across ``num_salts`` partitions. ``dim`` rows are exploded once per
    salt (size × num_salts — keep the dim small); ``fact`` rows pick a
    deterministic salt from their full row content."""
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    dim_rep = dim.withColumn(_SALT, F.explode(salts))
    fact_s = fact.withColumn(
        _SALT, _deterministic_salt([F.col(c) for c in fact.columns], num_salts)
    )
    return fact_s.join(dim_rep, on + [_SALT], how).drop(_SALT)


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    num_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """``groupBy(group_cols).agg(countDistinct(distinct_col))`` in two
    shuffles, neither of which concentrates a hot group on one task.
    Values are partitioned by their own hash, so per-salt distinct sets
    are disjoint and the counts add up exactly."""
    partial = df.groupBy(
        *group_cols,
        _deterministic_salt([F.col(distinct_col)], num_salts).alias(_SALT),
    ).agg(F.count_distinct(distinct_col).alias("_partial"))
    return partial.groupBy(*group_cols).agg(
        F.sum("_partial").cast("long").alias(out_col)
    )
