"""TPC-H-adapted analytic suite over the driver's TPC-H-ish tables.

The classic TPC-H query shapes, adapted to the columns the synthetic
testdata actually carries (no ``partsupp`` table; no
``l_shipmode/l_commitdate/l_receiptdate``, ``p_container``,
``c_phone/c_address`` columns — queries needing them are re-targeted to
equivalent shapes over available columns, noted per query). Q1/Q3/Q5
live in ``queries.py`` already; this module adds the rest of the suite:
Q4, Q6–Q10, Q12–Q19, Q22, plus window/set-op coverage queries
(cumulative sums, ntile quartiles, grouping sets, EXCEPT).

Every query follows the cross-engine determinism rules documented at
the top of ``queries.py`` (decimal money aggregates cast to double at
the end, bigint counts, total orders under every LIMIT).

Reference scope note: the reference engine (customerio/esdb) has no
joins/aggregations at all (SURVEY.md §2.6) — this whole module is the
"engine plan" capability layer built on Spark's optimizer: broadcast
joins for dims, partial aggregation, AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from esdb_spark.functions import epoch_us
from esdb_spark.sources.tables import load_table


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


_ONE = 'CAST(1 AS DECIMAL(18,2))'
_D = lambda c: f"CAST({c} AS DECIMAL(18,2))"
_REV = f"{_D('l_extendedprice')} * ({_ONE} - {_D('l_discount')})"


def _revenue():
    one = F.lit(1).cast("decimal(18,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount"))


# ---------------------------------------------------------------------------
# Q4 — order priority checking. Adapted: "delayed" = some lineitem
# shipped > 1 year after the order date (no l_commitdate/l_receiptdate
# in the testdata). EXISTS → left-semi join.
# ---------------------------------------------------------------------------

def q4_priority_delayed(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # the EXISTS is correlated per order, so the date window applies to
    # the delayed-set side too: filtering oo BEFORE the lineitem join
    # shrinks the join + distinct by the window's selectivity (~1/8)
    # with identical results
    in_window = (F.col("o_orderdate") >= F.lit("1996-01-01")) & (
        F.col("o_orderdate") < F.lit("1997-01-01")
    )
    oo = o.filter(in_window).select(
        F.col("o_orderkey").alias("d_ok"), "o_orderdate"
    )
    delayed = li.join(oo, li.l_orderkey == F.col("d_ok")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    ).select("d_ok").distinct()
    return (
        o.join(delayed, o.o_orderkey == F.col("d_ok"), "left_semi")
        .filter(in_window)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + single sum.
# The pushdown showcase: every predicate reaches the parquet scan.
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by ship year.
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share inside a region for one part type.
# ---------------------------------------------------------------------------

def q8_market_share(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    cust_nation = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    supp_nation = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cust_nation), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(supp_nation), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .filter((F.col("r_name") == "EUROPE") & (F.col("p_type") == "ECONOMY"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )).cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
            "total_volume",
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-line revenue by supplier nation and order year (TPC-H
# profit minus ps_supplycost — no partsupp table in the testdata).
# ---------------------------------------------------------------------------

def q9_product_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("p_name").contains("red"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("sum_revenue"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top 20 customers by returned revenue.
# ---------------------------------------------------------------------------

def q10_returned_items(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-07-01"))
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping delay by priority class (no l_shipmode: classes are
# urgent vs other priorities; "late" = shipped > 1 year after order).
# ---------------------------------------------------------------------------

def q12_late_by_priority(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(high, "high").otherwise("low").alias("priority_class")
        )
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.count("*").alias("total_count"),
        )
        .orderBy("priority_class")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (includes zero-order
# customers via left outer join).
# ---------------------------------------------------------------------------

def q13_order_distribution(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o.select("o_custkey", "o_orderkey"),
               c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue percentage for one ship-month-range.
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    vol = _revenue()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-07-01"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")),
              li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
            .cast("double").alias("promo_revenue"),
            F.sum(vol).cast("double").alias("total_revenue"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"))
            .alias("promo_pct"),
            "total_revenue",
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s): revenue per supplier over a quarter; keep the
# max (ties all kept, deterministic).
# ---------------------------------------------------------------------------

def q15_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(F.broadcast(s), rev.supplier_no == s.s_suppkey)
        .select("supplier_no", "s_name", "total_revenue")
        .orderBy("supplier_no")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part attribute bucket (partsupp replaced
# by observed lineitem supplier-part pairs).
# ---------------------------------------------------------------------------

def q16_part_supplier_variety(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: lineitems under 20% of their
# part's average quantity, for one brand; avg weekly revenue lost.
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brand_items = li.join(
        F.broadcast(p.filter(F.col("p_brand") == "Brand#3").select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    )
    avg_qty = brand_items.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty")
    )
    return (
        brand_items.join(F.broadcast(avg_qty), brand_items.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: orders whose total quantity > 250.
# ---------------------------------------------------------------------------

def q18_large_volume_customers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            epoch_us("o_orderdate").alias(
                "o_orderdate_us"
            ),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — bracketed discounted revenue: three OR'd (brand, size-range,
# quantity-range) brackets (p_container/l_shipmode replaced by size).
# ---------------------------------------------------------------------------

def q19_bracket_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b1 | b2 | b3).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q22 — idle rich customers: above-average-balance customers with no
# orders, grouped by nation (c_phone country codes replaced by nation).
# ---------------------------------------------------------------------------

def q22_idle_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select("o_custkey").distinct(),
              c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Window / set-op coverage beyond the TPC-H shapes
# ---------------------------------------------------------------------------

def running_revenue_by_month(spark, sf_dir):
    """Cumulative monthly revenue — window sum computed in exact
    decimal (order-free) and cast to double at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        epoch_us(F.date_trunc("month", "l_shipdate")).alias("month_us")
    ).agg(F.sum(_revenue()).alias("rev_dec"))
    w = Window.orderBy("month_us").rowsBetween(Window.unboundedPreceding, 0)
    return (
        monthly.select(
            "month_us",
            F.col("rev_dec").cast("double").alias("monthly_revenue"),
            F.sum("rev_dec").over(w).cast("double").alias("cumulative_revenue"),
        )
        .orderBy("month_us")
    )


def order_price_quartiles(spark, sf_dir):
    """ntile(4) over a total order; per-quartile count and exact
    min/max (raw doubles: order-free extremes).

    Scale note: an unpartitioned ntile is inherently a global sort
    through one task — fine for a dimension-sized table (orders here),
    wrong for a fact table. At 100 TB the same statistic comes from
    ``approx_percentile`` boundaries + a broadcast range join, trading
    exact tile boundaries for full parallelism."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        o.select(F.ntile(4).over(w).cast("bigint").alias("quartile"),
                 "o_totalprice")
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("quartile")
    )


def order_price_quartiles_scalable(spark, sf_dir):
    """Quartile statistics WITHOUT a global sort — the 100 TB-safe
    variant of ``order_price_quartiles``.

    Plan shape: (1) one pass computes the three quartile boundaries via
    ``percentile_approx`` (a GK sketch — map-side partials, one final
    merge of 32 sketches, never of rows); (2) the 1-row boundary frame
    is broadcast and every order is bucketed by two comparisons (a
    broadcast range join degenerated to a single-row cross join); (3) a
    partial-aggregating groupBy on 4 keys. No Window, no ntile, no
    single-task sort of the fact table anywhere in the plan (asserted
    in tests/test_plans.py).

    Determinism: with ``accuracy=1_000_000`` the sketch is exact for
    any input below a million rows per percentile bin, and Spark's
    exact-mode result equals DuckDB's ``quantile_disc`` (verified
    empirically at sf0.01) — so the oracle pins exact boundaries.
    Boundary semantics differ from ntile by design: ties at a boundary
    all land in the lower quartile instead of being split by row order,
    which is the price of not totally ordering the table."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 1000000).alias("b")
    ).select(
        F.col("b")[0].alias("b1"), F.col("b")[1].alias("b2"), F.col("b")[2].alias("b3")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("o_totalprice") <= F.col("b1"), 1)
            .when(F.col("o_totalprice") <= F.col("b2"), 2)
            .when(F.col("o_totalprice") <= F.col("b3"), 3)
            .otherwise(4)
            .cast("bigint")
            .alias("quartile"),
            "o_totalprice",
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("quartile")
    )


def grouping_sets_status_priority(spark, sf_dir):
    """GROUPING SETS ((status), (priority), ()) — the generalization of
    the rollup/cube queries, via the SQL surface."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


def nations_suppliers_no_customers(spark, sf_dir):
    """EXCEPT set-op: nations with suppliers but no customers."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    has_supp = s.select(F.col("s_nationkey").cast("bigint").alias("nationkey")).distinct()
    has_cust = c.select(F.col("c_nationkey").cast("bigint").alias("nationkey")).distinct()
    return has_supp.exceptAll(has_cust).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier. Adapted: no partsupp table, so the
# part-supplier relation is derived from lineitem, with supplycost =
# min(l_extendedprice) per (part, supplier) pair (exact double min —
# no float arithmetic, so cross-engine deterministic). The correlated
# "cost = min cost for this part" subquery becomes a window min —
# one shuffle on p_partkey instead of a self-join.
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    pp = p.filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY"))
    eur = r.filter(F.col("r_name") == "EUROPE")
    elig = (
        ps.join(F.broadcast(pp), ps.l_partkey == pp.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(eur), n.n_regionkey == eur.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        elig.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "supplycost")
        .orderBy(F.col("s_acctbal").desc(), F.col("n_name").asc(),
                 F.col("s_name").asc(), F.col("p_partkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification. Adapted: part "value" =
# sum(l_extendedprice) shipped by NATION_1 suppliers (no
# ps_supplycost*ps_availqty). The global-fraction threshold is a
# broadcast scalar — no second pass over lineitem.
# ---------------------------------------------------------------------------

def q11_important_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sup_n1 = (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_1")),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    supvalue = (
        li.join(F.broadcast(sup_n1), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    threshold = supvalue.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        supvalue.join(F.broadcast(threshold))
        .withColumn("value", F.col("value_dec").cast("double"))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "value")
        .orderBy(F.col("value").desc(), F.col("partkey").asc())
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion. Adapted: availqty ≈ quantity shipped
# in 1997 per (supplier, part); "excess" = more than 1.5× the
# per-part average across suppliers. Nested IN subqueries → semi-join
# chain; quantity sums stay in exact decimal until the final compare.
# ---------------------------------------------------------------------------

def q20_excess_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    red = p.filter(F.col("p_name").like("%red%")).select("p_partkey")
    qty97 = (
        li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"), "left_semi")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .withColumn("qty", F.col("qty_dec").cast("double"))
    )
    part_avg = qty97.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("qty_dec").cast("double") / F.count("*")).alias("avg_qty")
    )
    excess = (
        qty97.join(part_avg, qty97.l_partkey == F.col("pk"))
        .filter(F.col("qty") > F.lit(1.5) * F.col("avg_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_2")),
               s.s_nationkey == F.col("n_nationkey"))
        .join(excess, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting. Adapted: "late" =
# l_shipdate > o_orderdate + 180 days (no l_commitdate/l_receiptdate).
# The EXISTS (another supplier) / NOT EXISTS (another LATE supplier)
# pair is rewritten as per-order distinct-supplier counts:
# nsupp > 1 AND n_late_supp == 1 — two partial aggregates instead of
# two correlated scans of lineitem (the classic Spark rewrite; at
# 100 TB this is 2 shuffles on l_orderkey vs 2 full re-scans).
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    late = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    nsupp = li.groupBy(F.col("l_orderkey").alias("ns_ok")).agg(
        F.countDistinct("l_suppkey").alias("nsupp")
    )
    nlate = late.groupBy(F.col("l_orderkey").alias("nl_ok")).agg(
        F.countDistinct("l_suppkey").alias("nlate")
    )
    return (
        late.join(nsupp, late.l_orderkey == F.col("ns_ok"))
        .join(nlate, late.l_orderkey == F.col("nl_ok"))
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(
            s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
                   s.s_nationkey == F.col("n_nationkey"))
            .select("s_suppkey", "s_name")),
            late.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


TPCH_ORACLES = {
    "q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supplycost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), eligible AS (
            SELECT p_partkey, p_name, s_name, s_acctbal, n_name, supplycost
            FROM ps
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_size = 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
        FROM eligible
        WHERE supplycost = (
            SELECT min(supplycost) FROM eligible e2
            WHERE e2.p_partkey = eligible.p_partkey)
        ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        LIMIT 100
    """,
    "q11_important_parts": f"""
        WITH supvalue AS (
            SELECT l_partkey, sum({_D('l_extendedprice')}) AS value_dec
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_1'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS value
        FROM supvalue
        WHERE CAST(value_dec AS DOUBLE) > (
            SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 FROM supvalue)
        ORDER BY value DESC, partkey ASC
    """,
    "q20_excess_suppliers": f"""
        WITH qty97 AS (
            SELECT l_suppkey, l_partkey,
                   sum({_D('l_quantity')}) AS qty_dec
            FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
        ),
        part_avg AS (
            SELECT l_partkey AS pk,
                   CAST(sum(qty_dec) AS DOUBLE) / count(*) AS avg_qty
            FROM qty97 GROUP BY l_partkey
        )
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
          AND s_suppkey IN (
              SELECT l_suppkey FROM qty97 JOIN part_avg ON l_partkey = pk
              WHERE CAST(qty_dec AS DOUBLE) > 1.5 * avg_qty)
        ORDER BY s_suppkey
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 180 DAY
          AND n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 180 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC LIMIT 100
    """,
    "q4_priority_delayed": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 365 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": f"""
        SELECT CAST(sum({_D('l_extendedprice')} * {_D('l_discount')}) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(volume) AS DOUBLE) AS volume
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   {_REV} AS volume
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT o_year,
               CAST(nation_volume AS DOUBLE) / CAST(total_volume AS DOUBLE)
                   AS mkt_share,
               CAST(total_volume AS DOUBLE) AS total_volume
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   sum(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV}
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_volume,
                   sum({_REV}) AS total_volume
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
            GROUP BY o_year
        ) ORDER BY o_year
    """,
    "q9_product_revenue": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(sum({_REV}) AS DOUBLE) AS sum_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
        ORDER BY nation ASC, o_year DESC
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment, n_name,
               CAST(sum({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "q12_late_by_priority": """
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 'high' ELSE 'low' END AS priority_class,
               CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
                             THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
               count(*) AS total_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY priority_class ORDER BY priority_class
    """,
    "q13_order_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_pct,
               CAST(total AS DOUBLE) AS total_revenue
        FROM (
            SELECT sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
                   sum({_REV}) AS total
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-07-01'
        )
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum({_REV}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT supplier_no, s_name, total_revenue
        FROM rev JOIN supplier ON supplier_no = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY supplier_no
    """,
    "q16_part_supplier_variety": """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand != 'Brand#5'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """,
    "q17_small_qty_revenue": f"""
        WITH brand_items AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'
        ), avgs AS (
            SELECT l_partkey AS ak,
                   CAST(sum({_D('l_quantity')}) AS DOUBLE) / count(*) AS avg_qty
            FROM brand_items GROUP BY l_partkey
        )
        SELECT CAST(sum({_D('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly,
               count(*) AS n_small
        FROM brand_items JOIN avgs ON l_partkey = ak
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q18_large_volume_customers": f"""
        SELECT c_name, c_custkey, o_orderkey,
               epoch_us(o_orderdate) AS o_orderdate_us,
               o_totalprice, sum_qty
        FROM (
            SELECT l_orderkey,
                   CAST(sum({_D('l_quantity')}) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(sum({_D('l_quantity')}) AS DOUBLE) > 250
        )
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "q19_bracket_revenue": f"""
        SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_idle_customers": f"""
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               count(*) AS numcust,
               CAST(sum({_D('c_acctbal')}) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(sum({_D('c_acctbal')}) AS DOUBLE) / count(*)
            FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY nationkey ORDER BY nationkey
    """,
    "running_revenue_by_month": f"""
        SELECT month_us,
               CAST(rev_dec AS DOUBLE) AS monthly_revenue,
               CAST(sum(rev_dec) OVER (ORDER BY month_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS cumulative_revenue
        FROM (
            SELECT epoch_us(date_trunc('month', l_shipdate)) AS month_us,
                   sum({_REV}) AS rev_dec
            FROM lineitem GROUP BY month_us
        ) ORDER BY month_us
    """,
    "order_price_quartiles": """
        SELECT quartile, count(*) AS n_orders,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM (
            SELECT ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
                       AS quartile,
                   o_totalprice
            FROM orders
        ) GROUP BY quartile ORDER BY quartile
    """,
    "order_price_quartiles_scalable": """
        WITH b AS (
            SELECT quantile_disc(o_totalprice, 0.25) AS b1,
                   quantile_disc(o_totalprice, 0.50) AS b2,
                   quantile_disc(o_totalprice, 0.75) AS b3
            FROM orders
        )
        SELECT CAST(CASE WHEN o_totalprice <= b1 THEN 1
                         WHEN o_totalprice <= b2 THEN 2
                         WHEN o_totalprice <= b3 THEN 3
                         ELSE 4 END AS BIGINT) AS quartile,
               count(*) AS n_orders,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders, b
        GROUP BY quartile ORDER BY quartile
    """,
    "grouping_sets_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "nations_suppliers_no_customers": """
        SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
        EXCEPT
        SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        ORDER BY nationkey
    """,
}


TPCH_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_priority_delayed": q4_priority_delayed,
    "q11_important_parts": q11_important_parts,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_revenue": q9_product_revenue,
    "q10_returned_items": q10_returned_items,
    "q12_late_by_priority": q12_late_by_priority,
    "q13_order_distribution": q13_order_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_variety": q16_part_supplier_variety,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_bracket_revenue": q19_bracket_revenue,
    "q22_idle_customers": q22_idle_customers,
    "running_revenue_by_month": running_revenue_by_month,
    "order_price_quartiles": order_price_quartiles,
    "order_price_quartiles_scalable": order_price_quartiles_scalable,
    "grouping_sets_status_priority": grouping_sets_status_priority,
    "nations_suppliers_no_customers": nations_suppliers_no_customers,
}
