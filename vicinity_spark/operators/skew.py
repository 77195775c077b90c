"""Skew-handling utilities: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (a viral document, a default label, an
empty-string token) can concentrate a shuffle partition onto one
executor. AQE's skew-join split handles the *join* case at runtime;
these operators are the *declarative* guards for the two shapes AQE
does not rewrite:

- ``salted_aggregate``: a high-cardinality-row / low-cardinality-key
  groupBy (e.g. global stats by language over billions of docs). Spark
  already does partial (map-side) aggregation, but the final combine
  still lands each key on ONE reducer; salting splits every key into
  ``num_salts`` sub-keys so the first shuffle fans out, then a second,
  tiny combine (≤ keys × num_salts rows) produces exact results.
- ``salted_join``: a fact⋈dim equi-join where the dim side is too big
  to broadcast and fact keys are skewed. The fact side gets a
  deterministic salt in [0, num_salts); the dim side is replicated
  ``num_salts`` ways via explode(sequence(...)); joining on
  (key, salt) spreads each hot key across num_salts reducers. Output
  is row-identical to the unsalted join.

Both are *exact* rewrites (same rows, same values up to float-sum
reassociation, which Spark's own partial aggregation already implies),
so they stay oracle-checkable against plain GROUP BY / JOIN SQL.

Salts are deterministic (xxhash64 of designated columns, not rand()),
so plans are replayable and retried tasks produce identical output —
a requirement for speculative execution at scale.

Reference analog: none (vicinity is single-process, vicinity/vicinity.py:1);
this is part of the 100 TB operating envelope the Spark engine adds.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Decomposable aggregates: (partial_fn, combine_fn). avg is handled
# separately as sum/count so the rewrite stays exact.
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_expr(num_salts: int, *cols: str) -> Column:
    """Deterministic salt in [0, num_salts): xxhash64 over ``cols``.

    Deterministic (vs rand()) so retried/speculative tasks emit
    identical rows and oracle comparisons are stable.
    """
    if not cols:
        raise ValueError("salt_expr needs at least one column to hash")
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(num_salts)).cast("int")


def _resolve_salt(
    df: DataFrame, keys: Sequence[str], salt_cols: Optional[Sequence[str]], num_salts: int
) -> Column:
    """Salt column that is guaranteed to vary WITHIN a key group.

    If ``salt_cols`` (explicit or defaulted) is a subset of the grouping
    keys, xxhash64 of them is constant per group — every row of a hot
    key would still land on one reducer and the guard would be a silent
    no-op (the canonical case: plain count(*) by a hot key). Fall back
    to a row-level source: xxhash64 over ALL columns plus
    spark_partition_id(), which also separates fully-identical rows
    that live in different input partitions while staying deterministic
    for a fixed input partitioning (replay/speculation-safe).
    """
    if salt_cols and not (set(salt_cols) <= set(keys)):
        return salt_expr(num_salts, *salt_cols)
    if salt_cols:  # explicitly passed, but constant per group
        import warnings

        warnings.warn(
            f"salt_cols {list(salt_cols)} is a subset of the grouping keys "
            "— the salt would be constant per group; falling back to a "
            "row-level salt (all columns + partition id)",
            stacklevel=3,
        )
    return F.pmod(
        F.xxhash64(F.spark_partition_id(), *[F.col(c) for c in df.columns]),
        F.lit(num_salts),
    ).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: "dict[str, tuple[str, str]]",
    *,
    num_salts: int = 16,
    salt_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact groupBy(keys).agg(...) via two-phase salted aggregation.

    ``aggs`` maps output name -> (fn, col) with fn in
    {sum, count, min, max, avg}. Phase 1 groups by keys+salt (the wide
    shuffle, now fanned out num_salts× per key); phase 2 combines the
    partials per key (a tiny shuffle of |keys|·num_salts rows).

    ``salt_cols`` defaults to all non-key columns referenced by the
    aggregates — any row-level column works; higher cardinality spreads
    better.
    """
    keys = list(keys)
    for name, (fn, _col) in aggs.items():
        if fn not in _DECOMPOSABLE and fn != "avg":
            raise ValueError(f"{name}: '{fn}' is not decomposable (use sum/count/min/max/avg)")
    if salt_cols is None:
        salt_cols = sorted({c for _, c in aggs.values() if c != "*"} - set(keys))

    salted = df.withColumn("__salt", _resolve_salt(df, keys, salt_cols, num_salts))

    partials: "list[Column]" = []
    finals: "list[Column]" = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__{name}_sum"))
            partials.append(F.count(col).alias(f"__{name}_cnt"))
            finals.append(
                (F.sum(f"__{name}_sum") / F.sum(f"__{name}_cnt")).alias(name)
            )
        else:
            part_fn, comb_fn = _DECOMPOSABLE[fn]
            partials.append(part_fn(col).alias(f"__{name}"))
            finals.append(comb_fn(f"__{name}").alias(name))

    phase1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    *,
    num_salts: int = 8,
    fact_salt_cols: Optional[Sequence[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: fact keys salted, dim replicated.

    Joins ``fact`` and ``dim`` on ``on`` (+ an internal salt), spreading
    each fact key across ``num_salts`` reducers. The dim side is
    replicated num_salts× (explode of a 0..n-1 sequence), so size the
    salt count to the skew, not the cluster. Row-identical to
    fact.join(dim, on, how) for 'inner' and 'left' joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins (dim side is replicated)")
    on = list(on)
    salt_src = list(fact_salt_cols) if fact_salt_cols else [c for c in fact.columns if c not in on]
    f_salted = fact.withColumn("__salt", _resolve_salt(fact, on, salt_src, num_salts))
    d_repl = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return f_salted.join(d_repl, on + ["__salt"], how).drop("__salt")
