"""TPC-H-shaped coverage wave 2: correlated/EXISTS subquery shapes,
disjunctive pushdown, argmin-per-group, HAVING-vs-global-total.

The reference expresses only scalar-MAX subqueries (SURVEY §2.3 A1,
CheckInterface_Metadata.py:21-25) and an IN-subquery semi join (J6);
these queries generalize that surface to the full decorrelated-subquery
family a warehouse engine needs, adapted to the fixture schema (no
partsupp / commitdate / receiptdate columns — see TESTDATA.md).

Exactness: money goes through DECIMAL(18,2) before SUM (associative →
parallel Spark sums equal DuckDB's sequential sums); threshold
comparisons against averages are rewritten as cross-multiplications
(qty*5*cnt < sum) so no engine ever divides — boundary rows classify
identically in both engines.

Scale notes inline — every plan is written for the 100 TB layout, not
just the sf0.01 test pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dht11_data_pipeline_spark.sources.tables import load_table


def _money(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _one() -> Column:
    return F.lit(1).cast("decimal(3,2)")


def _revenue() -> Column:
    return _money("l_extendedprice") * (_one() - _money("l_discount"))


def q4_priority_with_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join.

    Orders placed in 1997 H1 that have at least one lineitem shipped
    more than 30 days after the order date, counted per priority.

    Scale: the EXISTS decorrelates to a left-semi join on orderkey with
    a residual non-equi predicate — Spark plans a shuffled semi join
    keyed on the equi part only, so the non-equi residual never forces
    a nested loop; both sides are pre-filtered before the shuffle, and
    the 5-group count aggregates map-side.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + double aggregation.

    Distribution of customers by how many non-urgent orders they have
    (including zero — the outer join is the point).

    Scale: first agg shuffles on custkey (high cardinality, well
    distributed); second agg input is one row per customer and the
    output is tiny (~dozens of distinct counts) so it map-side combines
    to almost nothing. count(o_orderkey) over the null-extended side
    gives the 0 bucket for order-less customers.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio over a join.

    Share (percent) of one month's revenue coming from PROMO-type
    parts. Both sums are exact decimals; the single final division is
    double-on-double (deterministic IEEE, same in both engines).

    Scale: part is tiny (p_partkey, p_type only → broadcast hash join);
    lineitem is cut to one month by a pushed-down shipdate predicate
    before the join; the aggregate is a global 2-accumulator reduce.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-03-01"))
        & (F.col("l_shipdate") < F.lit("1998-04-01"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("promo"),
            F.sum(rev).alias("total"),
        )
        .select(
            (F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double")).alias("promo_revenue_pct")
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive range predicates.

    Revenue from three alternative (brand, size-range, quantity-range)
    channels OR-ed together — the classic test that an optimizer keeps
    a disjunctive residual vectorized instead of exploding the plan.

    Scale: the common conjunct (partkey equi-join) is factored out so
    this stays ONE broadcast hash join with a residual OR filter —
    never a union of three scans. Catalyst additionally extracts
    common filters (quantity bounds) for pushdown.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disj = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 50)) & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(disj).agg(F.sum(_revenue()).cast("double").alias("revenue"))


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery, decorrelated.

    Average yearly revenue lost if small-quantity orders (below 20% of
    the part's average order quantity) for one brand were not taken.

    The correlated `l_quantity < 0.2 * avg(l_quantity where same part)`
    decorrelates into a per-part aggregate joined back. The comparison
    is cross-multiplied (qty*5*cnt < sum_qty) so both engines compare
    exact decimals — no float-average boundary flips.

    Scale: the fact is cut to the brand's parts by the broadcast dim
    BEFORE any aggregation (don't aggregate 100 TB of lineitem for
    1/25th of parts), then the per-part sums come from a WINDOW over
    l_partkey rather than a groupBy joined back — one lineage, so the
    filtered fact is scanned once and shuffled once on partkey.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#7") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).drop("p_partkey")
    w = Window.partitionBy("l_partkey")
    return (
        li.select(
            "l_quantity", "l_extendedprice",
            F.sum(_money("l_quantity")).over(w).alias("sum_qty"),
            F.count(F.lit(1)).over(w).alias("cnt"),
        )
        .filter(_money("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg((F.sum(_money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: GROUP BY + HAVING against a global-total scalar
    subquery.

    Per-part shipped value from suppliers of one nation, keeping parts
    whose value exceeds 0.1% of that nation's total. The HAVING
    threshold is cross-multiplied (value*1000 > total) in exact
    decimal.

    Scale: supplier is a broadcast dim; the per-part aggregate shuffles
    once on partkey; the global total is an empty-partition window SUM
    over the per-part frame (part-cardinality rows) — one lineage, so
    the fact is scanned once; an agg-and-crossJoin total would
    recompute the whole scan for one number.
    """
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_money("l_extendedprice")).alias("part_value"))
    )
    return (
        per_part.withColumn("total_value", F.sum("part_value").over(Window.partitionBy()))
        .filter(F.col("part_value") * F.lit(1000) > F.col("total_value"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar MAX + equality join —
    the reference's A1 argmax pattern (CheckInterface_Metadata.py:21-25,
    `load_key IN (SELECT MAX(...))`) applied to an aggregate instead of
    a raw column.

    Scale: revenue-per-supplier is one shuffle (supplier cardinality is
    tiny next to lineitem); the MAX comes from an empty-partition
    window over that supplier-grain frame — single lineage, fact
    scanned once (agg-and-crossJoin would recompute it); equality on
    exact decimal revenue is deterministic (no double ties).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_shipdate") < F.lit("1998-07-01"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("max_revenue", F.max("total_revenue").over(Window.partitionBy()))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


def q7_bination_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two dimension chains onto one fact + pair filter.

    Shipping volume between NATION_1 and NATION_2 (either direction),
    by supplier-nation / customer-nation / ship year.

    Scale: all four dims (supplier, customer, nation×2) broadcast; the
    only big shuffle is lineitem⋈orders on orderkey. The nation-pair
    filter applies to broadcast-joined columns, so the fact stream is
    cut before the orderkey shuffle on the supplier side.
    """
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust_nation = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_nation), o.o_custkey == cust_nation.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("volume"))
    )


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-correlations on the fact.

    Suppliers who were the ONLY late shipper (>60 days after order
    date) on a multi-supplier order. The two correlated subqueries
    (exists another supplier on the order; not exists another LATE
    supplier) decorrelate into one per-order aggregate — count distinct
    suppliers, count distinct late suppliers — instead of two extra
    joins of the fact against itself.

    Scale: one shuffle of lineitem⋈orders on orderkey, one agg on
    orderkey, then a semi-style join back on (orderkey) of qualifying
    orders to late rows. The naive 3×-self-join plan reads the fact
    three times; this reads it once.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast("int"),
    )
    # (orderkey, suppkey) pre-aggregate instead of two COUNT DISTINCTs:
    # a double-distinct in one agg plans an Expand that doubles the fact
    # stream. The order-grain counts then come from a WINDOW over the
    # pair frame rather than a second groupBy — one lineage, so the
    # 100 TB fact is scanned exactly once (a groupBy-and-join-back
    # shape re-reads it; Spark's exchange reuse doesn't rescue separate
    # aggregate consumers), at the cost of one pair-frame shuffle on
    # orderkey, which is orders-of-magnitude smaller than the fact.
    per_pair = j.groupBy("l_orderkey", "l_suppkey").agg(F.max("is_late").alias("late"))
    w = Window.partitionBy("l_orderkey")
    late_solo = per_pair.select(
        "l_orderkey", "l_suppkey", "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late_supp"),
    ).filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late_solo.join(F.broadcast(s), late_solo.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS anti join +
    substring grouping.

    Customers with above-average positive balance and no orders since
    2000, grouped by the last-two-digit bucket of their name. The
    average threshold is cross-multiplied (bal*cnt > sum) in exact
    decimal; NOT EXISTS is a left-anti join.

    Scale: the scalar aggregate broadcasts as one row; the anti join
    shuffles customer vs a projected orders column (or broadcasts the
    DISTINCT custkey set when it fits); substring bucketing is a
    codegen expression.
    """
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0)
    avg_row = pos.agg(
        F.sum(_money("c_acctbal")).alias("sum_bal"),
        F.count(F.lit(1)).alias("cnt_bal"),
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_row))
        .filter(_money("c_acctbal") * F.col("cnt_bal") > F.col("sum_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 17, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery → per-group min + equality.

    For each small STANDARD part, the European supplier(s) offering it
    at the minimum observed price. The correlated
    `price = (SELECT MIN(price) WHERE same part)` decorrelates into a
    window MIN over partkey with an equality filter — one shuffle, no
    second scan (vs the aggregate-and-rejoin plan which reads the
    join twice).

    Scale: supplier/nation/region broadcast; the fact is pre-cut by the
    broadcast part filter before the window shuffle on partkey. Ties
    on exact decimal min keep all tied suppliers (same in both
    engines).
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 5)
    ).select("p_partkey", "p_name")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    offers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "supp_nation",
                _money("l_extendedprice").alias("price"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_price", F.min("price").over(w))
        .filter(F.col("price") == F.col("min_price"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "supp_nation",
                F.col("price").cast("double").alias("price"))
        .distinct()
    )


def q20_heavy_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries → aggregate-then-semi-join.

    Suppliers who shipped more than 400 units of PROMO parts during
    1998 — `s_suppkey IN (SELECT ... GROUP BY ... HAVING SUM > k)`
    with the inner part-set itself an IN subquery.

    Scale: part set broadcasts (dim-sized); the per-supplier aggregate
    is one fact shuffle on suppkey; the outer IN becomes a broadcast
    left-semi join of the tiny qualifying-supplier set.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_shipdate") < F.lit("1999-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_money("l_quantity")).alias("promo_qty"))
        .filter(F.col("promo_qty") > 400)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: multi-dim join + expression agg by nation/year.

    Profit (revenue − 10% of retail-value of goods) on parts whose name
    contains 'widget', by supplier nation and ship year. Revenue and
    cost are summed as separate exact decimals, subtracted once in
    double at the end (deterministic).

    Scale: part (name-filtered) and supplier⋈nation broadcast; the
    fact never shuffles until the final small groupBy (nation×year
    cardinality). p_retailprice rides the broadcast.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget")).select(
        "p_partkey", "p_retailprice"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount", "l_quantity"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(_revenue()).alias("rev"),
            F.sum(_money("p_retailprice") * _money("l_quantity")).alias("retail"),
        )
        .select(
            "nation", "l_year",
            (F.col("rev").cast("double") - F.lit(0.1) * F.col("retail").cast("double")).alias("profit"),
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional-share ratio per group.

    NATION_3's share of ECONOMY-part revenue delivered to ASIA-region
    customers, per order year. Numerator/denominator are exact decimal
    sums; one double division per year row.

    Scale: all dims broadcast; lineitem⋈orders is the single big
    shuffle; year-grouped agg is tiny. The CASE lives inside the
    partial aggregate, so the share needs no self-join.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    cust_in_asia = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = _revenue()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_in_asia), o.o_custkey == cust_in_asia.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)).alias("nation_vol"),
            F.sum(vol).alias("total_vol"),
        )
        .select(
            "o_year",
            (F.col("nation_vol").cast("double") / F.col("total_vol").cast("double")).alias("mkt_share"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    The canonical predicate-pushdown + vectorized-scan probe: all three
    predicates reach the parquet reader as PushedFilters, the kernel is
    one whole-stage-codegen'd multiply-accumulate, and the result is a
    single row — at 100 TB this query is I/O-bound or the plan is wrong.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_money("l_extendedprice") * _money("l_discount")).cast("double").alias("revenue"))
    )


def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact⋈fact⋈dim + grouped agg + deterministic
    top-k. Customers ranked by revenue of returned ('R') items ordered
    in 1997 Q3.

    Scale: orders is cut to one quarter before the orderkey shuffle;
    customer⋈nation broadcast onto the aggregate OUTPUT (customer-
    cardinality rows), not onto the fact stream; top-20 is
    TakeOrderedAndProject (per-partition heap + merge), never a global
    sort. Exact-decimal revenue + custkey tie-break keep the limit
    deterministic.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).alias("rev"))
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("n_name").alias("nation"),
            F.col("rev").cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q12_late_ship_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional two-way count (the fixture
    has no shipmode column, so the group key is l_returnflag and
    "late" is ship > 45 days after order date during 1997).

    Scale: the date-window predicate is pushed to the lineitem scan;
    orders arrives projected to two columns for the orderkey shuffle;
    the CASE counts aggregate map-side into a 3-row result.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery (anti join) + COUNT DISTINCT
    per group. How many distinct suppliers ship each (brand, type,
    size) family, excluding one brand and excluding suppliers in debt
    (the NOT IN).

    Scale: part broadcasts; the debtor set is dim-sized → broadcast
    anti join; countDistinct shuffles once on the 3-part group key with
    partial distinct aggregation map-side.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#5").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    debtors = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(debtors), li.l_suppkey == debtors.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
