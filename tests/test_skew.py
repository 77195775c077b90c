"""Salted aggregation / salted join are exact rewrites of their plain
forms (operators/skew.py) — verified row-for-row against the unsalted
plans on real sf0.001 tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vicinity_spark.operators.skew import salt_expr, salted_aggregate, salted_join

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _lineitem(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_matches_plain_groupby(spark):
    li = _lineitem(spark)
    plain = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("l_orderkey").alias("n_rows"),
            F.min("l_discount").alias("min_disc"),
            F.max("l_extendedprice").alias("max_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "n_rows": ("count", "l_orderkey"),
            "min_disc": ("min", "l_discount"),
            "max_price": ("max", "l_extendedprice"),
            "avg_qty": ("avg", "l_quantity"),
        },
        num_salts=16,
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n_rows",
        "min_disc",
        "max_price",
        F.round("avg_qty", 6).alias("avg_qty"),
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_aggregate_deterministic(spark):
    li = _lineitem(spark)
    spec = {"sum_qty": ("sum", "l_quantity"), "n": ("count", "l_partkey")}
    a = salted_aggregate(li, ["l_returnflag"], spec, num_salts=8)
    b = salted_aggregate(li, ["l_returnflag"], spec, num_salts=8)
    assert _sorted_rows(a.select("l_returnflag", "n")) == _sorted_rows(
        b.select("l_returnflag", "n")
    )


def test_salted_aggregate_rejects_nondecomposable(spark):
    li = _lineitem(spark)
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(li, ["l_returnflag"], {"d": ("collect_list", "l_partkey")})


def test_salted_join_matches_plain_join(spark):
    li = _lineitem(spark).select(
        F.col("l_orderkey").alias("orderkey"), "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        F.col("o_orderkey").alias("orderkey"), "o_custkey", "o_totalprice"
    )
    plain = li.join(orders, ["orderkey"])
    salted = salted_join(li, orders, ["orderkey"], num_salts=4)
    assert salted.columns == plain.columns
    assert _sorted_rows(salted) == _sorted_rows(plain)
    # the whole point: no nested-loop fallback, still an equi-join
    assert "BroadcastNestedLoopJoin" not in salted._jdf.queryExecution().executedPlan().toString()


def test_salted_join_left_keeps_unmatched(spark):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    plain = orders.join(cust, ["custkey"], "left")
    salted = salted_join(orders, cust, ["custkey"], num_salts=4, how="left")
    assert _sorted_rows(salted) == _sorted_rows(plain)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(orders, cust, ["custkey"], how="right")


def test_salt_expr_range_and_determinism(spark):
    li = _lineitem(spark).limit(200)
    s = li.select(salt_expr(16, "l_orderkey", "l_partkey").alias("s"))
    mn, mx = s.agg(F.min("s"), F.max("s")).first()
    assert 0 <= mn and mx <= 15
    assert s.distinct().count() > 1  # actually spreads


def test_salted_aggregate_key_only_salt_fans_out(spark):
    """Regression (r2 ADVICE): count(*) by a hot key — the canonical
    skew case — referenced only key columns, so the default salt hashed
    the keys and was constant per group (silent no-op). The row-level
    fallback must spread a hot key across many salts AND stay exact."""
    from vicinity_spark.operators.skew import _resolve_salt

    li = _lineitem(spark)
    # count(*)-shaped agg: aggregates reference only the key column
    salted = salted_aggregate(
        li, ["l_returnflag"], {"n_rows": ("count", "l_returnflag")}, num_salts=16
    )
    plain = li.groupBy("l_returnflag").agg(F.count("l_returnflag").alias("n_rows"))
    assert _sorted_rows(salted) == _sorted_rows(plain)

    # the resolved salt is NOT constant per key group
    spread = (
        li.withColumn("__salt", _resolve_salt(li, ["l_returnflag"], None, 16))
        .groupBy("l_returnflag")
        .agg(F.countDistinct("__salt").alias("nsalts"))
        .collect()
    )
    assert all(r["nsalts"] > 8 for r in spread), spread


def test_salted_aggregate_warns_on_key_subset_salt_cols(spark):
    import warnings

    li = _lineitem(spark)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = salted_aggregate(
            li,
            ["l_returnflag"],
            {"n_rows": ("count", "l_returnflag")},
            num_salts=8,
            salt_cols=["l_returnflag"],
        )
        rows = _sorted_rows(out)
    assert any("subset of the grouping keys" in str(x.message) for x in w)
    plain = li.groupBy("l_returnflag").agg(F.count("l_returnflag").alias("n_rows"))
    assert rows == _sorted_rows(plain)
