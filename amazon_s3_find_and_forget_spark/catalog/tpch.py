"""TPC-H catalog rows (q1-q22) with ANSI oracles.

Classic relational coverage: the engine's join/agg/window plans are
exercised at TPC-H shape and hash-compared against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .loader import load


def q_tpch_q1(spark, sf_dir):
    """Money sums aggregate through exact decimal and cast to double
    LAST. Cross-engine conversion note (root-caused round 8): DuckDB's
    direct decimal->double cast divides int128 by 10^scale with TWO
    roundings, so once sum * 10^scale exceeds 2^53 the last ulp can
    differ from Spark's exactly-converted BigDecimal (measured: the sf1
    R/O sum_charge). Every decimal-sum oracle therefore converts via
    CAST(CAST(sum AS VARCHAR) AS DOUBLE) — DuckDB's decimal->varchar is
    exact and varchar->double rounds once — which matches Spark
    bit-exactly at EVERY scale factor (verified at sf1)."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c, s=2: F.col(c).cast(f"decimal(18,{s})")  # noqa: E731
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.withColumn(
        "avg_qty",
        F.round(F.col("sum_qty").cast("double") / F.col("count_order"), 6),
    )


def q_tpch_q3(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark, sf_dir):
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (sup.s_nationkey == nation.n_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue"))
    )


def q_tpch_q6(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)").alias("rev")
        )
        .agg(F.sum("rev").alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
    )


def q_tpch_q4(spark, sf_dir):
    """Q4's shape (EXISTS semi-join into an order-priority count), adapted
    to the synthetic schema: no l_commitdate/l_receiptdate here, so the
    late-line predicate becomes l_shipdate > o_orderdate."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_tpch_q10(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue).alias("revenue"),
            F.max(F.col("c_acctbal").cast("decimal(18,2)")).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


def q_tpch_q13(spark, sf_dir):
    """Customer order-count distribution (left outer + double aggregate)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q14(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        rev.alias("rev"),
        F.when(F.col("p_type").startswith("PROMO"), rev)
        .otherwise(F.lit(0).cast("decimal(18,6)"))
        .alias("promo_rev"),
    )
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum("promo_rev").cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def q_tpch_q18(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(18,2)").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), F.col("o_orderkey"))
        .limit(100)
    )


def q_tpch_q19(spark, sf_dir):
    """Q19's disjunctive join predicate, adapted to the synthetic part
    schema (brand/size/quantity clauses; no container/shipmode columns)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return joined.where(b1 | b2 | b3).agg(
        F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_rows")
    )


def q_tpch_q7(spark, sf_dir):
    """Q7 volume shipping: revenue between two nations in both directions,
    grouped by (supplier nation, customer nation, ship year)."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s_n = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).where(F.col("n_name").isin(n1, n2))
    c_n = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).where(F.col("n_name").isin(n1, n2))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(s_n, sup.s_nationkey == F.col("s_nk"))
        .join(c_n, cust.c_nationkey == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(vol).alias("revenue"))
    )


def q_tpch_q8(spark, sf_dir):
    """Q8 national market share: NATION_5's share of ECONOMY-part revenue
    sold into AMERICA-region customers, by order year."""
    target = "NATION_5"
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s_n = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    joined = (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(s_n, sup.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == target, F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


def q_tpch_q9(spark, sf_dir):
    """Q9's shape (profit by supplier nation × order year over a part-name
    filter), adapted: the synthetic schema has no partsupp/ps_supplycost,
    so profit is the discounted revenue alone."""
    nation = load(spark, sf_dir, "nation")
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).alias("sum_profit"))
    )


def q_tpch_q15(spark, sf_dir):
    """Q15 top supplier: supplier(s) with the maximum 3-month revenue
    (exact-decimal revenue makes the max-equality cross-engine safe)."""
    sup = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(vol).alias("total_revenue")
    ).localCheckpoint(eager=False)  # feeds both max() and the equality join
    maxrev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(maxrev), rev.total_revenue == F.col("mx"))
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q16(spark, sf_dir):
    """Q16's shape (distinct supplier count per part attribute bucket),
    adapted: no partsupp table, so lineitem is the part↔supplier link."""
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue for one brand. The per-part 20%%
    average-quantity threshold is cross-multiplied (5·n·qty < sum_qty)
    so both engines compare exact decimals instead of a double average."""
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    li = load(spark, sf_dir, "lineitem")
    branded = part.join(li, part.p_partkey == li.l_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = branded.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    small = branded.join(
        F.broadcast(per_part), branded.l_partkey == F.col("pk")
    ).where(
        F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("n_li")
        < F.col("sum_qty")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / 7.0,
            6,
        ).alias("avg_yearly")
    )


def q_tpch_q22(spark, sf_dir):
    """Q22 global sales opportunity, adapted: no c_phone column, so the
    country code is c_nationkey mod 10, and "no orders" means no orders
    placed since 1999 (every synthetic customer has some order). The
    above-average-balance threshold is cross-multiplied (bal·n > sum) to
    stay exact-decimal."""
    codes = [0, 3, 5, 7, 9]
    cust = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("int")
    ).where(F.col("cntrycode").isin(codes))
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("sum_bal"), F.count(F.lit(1)).alias("n_bal")
    )
    rich = cust.join(F.broadcast(pos)).where(
        bal * F.col("n_bal") > F.col("sum_bal")
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(bal).alias("totacctbal"),
    )


def q_tpch_q2(spark, sf_dir):
    """Q2's shape (min-cost supplier per part within a region), adapted:
    no partsupp table in the synthetic schema, so the supply cost is the
    minimum lineitem unit price per (part, supplier). The correlated
    min-subquery becomes a partition window — the idiomatic Spark
    translation. min over doubles is exact (no summation order), so the
    cost equality is cross-engine safe."""
    from pyspark.sql.window import Window

    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation")
    sup = load(spark, sf_dir, "supplier")
    euro = (
        sup.join(nation, sup.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    # prune lineitem to the filtered parts BEFORE the aggregation: the
    # broadcast semi-join shrinks the shuffle input ~20x (at 100 TB the
    # difference between aggregating the whole fact table and a sliver)
    costs = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
        )
    )
    j = part.join(costs, part.p_partkey == costs.l_partkey).join(
        F.broadcast(euro), costs.l_suppkey == euro.s_suppkey
    )
    ranked = j.withColumn(
        "min_cost", F.min("cost").over(Window.partitionBy("p_partkey"))
    )
    return (
        ranked.where(F.col("cost") == F.col("min_cost"))
        .select(
            F.round(F.col("s_acctbal").cast("double"), 6).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("cost", 6).alias("supply_cost"),
        )
        .orderBy(F.desc("acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q11(spark, sf_dir):
    """Q11's shape (parts whose shipped value within one nation exceeds a
    global-total fraction, via a scalar subquery), adapted: lineitem value
    stands in for partsupp stock value. The fraction threshold is
    cross-multiplied (value·640 > total, i.e. share > 0.15625%%) so both
    engines compare exact decimals."""
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    sup = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    vals = (
        li.join(
            F.broadcast(
                sup.join(nation, sup.s_nationkey == nation.n_nationkey)
            ),
            li.l_suppkey == sup.s_suppkey,
        )
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value"))
        # feeds both the scalar total and the threshold filter; checkpoint
        # the small aggregate instead of running the scan+join twice
        .localCheckpoint(eager=False)
    )
    total = vals.agg(F.sum("value").alias("total"))
    return (
        vals.join(F.broadcast(total))
        .where(F.col("value") * 640 > F.col("total"))
        .select("l_partkey", "value")
    )


def q_tpch_q12(spark, sf_dir):
    """Q12's shape (late lines bucketed, priority split via conditional
    aggregates), adapted: no l_shipmode/commitdate/receiptdate, so the
    bucket is l_returnflag and "late" is l_shipdate > o_orderdate (as in
    the Q4 adaptation)."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q20(spark, sf_dir):
    """Q20's shape (suppliers who shipped excess volume of a part family,
    via a nested semi-join chain), adapted: no partsupp availqty, so
    "excess" is a fixed total-quantity threshold over the year."""
    part_small = load(spark, sf_dir, "part").where(
        F.col("p_name").startswith("small")
    )
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty")
    )
    excess = (
        qty.join(
            F.broadcast(part_small), qty.l_partkey == part_small.p_partkey
        )
        .where(F.col("total_qty") > 50)
        .select("l_suppkey")
    )
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        # the excess-supplier key set is tiny (bounded by |supplier|) —
        # broadcast it so the semi-join never shuffles the supplier table
        sup.join(
            F.broadcast(excess), sup.s_suppkey == excess.l_suppkey, "left_semi"
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


def q_tpch_q21(spark, sf_dir):
    """Q21's shape (the sole late supplier on multi-supplier finished
    orders: EXISTS another supplier, NOT EXISTS another LATE supplier),
    adapted: "late" is l_shipdate > o_orderdate. The EXISTS pair becomes
    a left-semi + left-anti join chain — Spark's native translation."""
    orders_f = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    li = load(spark, sf_dir, "lineitem")
    l1 = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
        # l1 feeds three plan branches (itself, the semi probe, the anti
        # build); Catalyst does not reuse the subplan, so checkpoint the
        # narrow two-column relation once instead of running the
        # lineitem-orders join three times
        .localCheckpoint(eager=False)
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2")
    )
    with_other = l1.join(
        others,
        (l1.l_orderkey == F.col("o2_key")) & (l1.l_suppkey != F.col("s2")),
        "left_semi",
    )
    late_others = l1.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3")
    )
    sole_late = with_other.join(
        late_others,
        (with_other.l_orderkey == F.col("o3_key"))
        & (with_other.l_suppkey != F.col("s3")),
        "left_anti",
    )
    sup = load(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(sup), sole_late.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


QUERIES = {
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q22": q_tpch_q22,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q2": q_tpch_q2,
    "tpch_q12": q_tpch_q12,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q11": q_tpch_q11,
}

ORACLES = {
    "tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "tpch_q5": """
        SELECT n_name,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM region
        JOIN nation ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "tpch_q6": """
        SELECT CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "tpch_q7": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "tpch_q8": """
        SELECT year(o_orderdate) AS o_year,
               round(
                 CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE),
               6) AS mkt_share
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    "tpch_q9": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_profit
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name, n_name,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
               CAST(max(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q14": """
        SELECT round(
                 100.0
                 * CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE),
               6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "tpch_q15": """
        WITH revenue AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(CAST(total_revenue AS VARCHAR) AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#3'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q17": """
        WITH branded AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM part JOIN lineitem ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#3'
        ), per_part AS (
          SELECT l_partkey AS pk,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                 count(*) AS n_li
          FROM branded GROUP BY 1
        )
        SELECT round(
                 CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / 7.0,
               6) AS avg_yearly
        FROM branded JOIN per_part ON l_partkey = pk
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty
    """,
    "tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
               CAST(CAST(sum_qty AS VARCHAR) AS DOUBLE) AS sum_qty
        FROM (
          SELECT l_orderkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
        ) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "tpch_q19": """
        SELECT CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22": """
        WITH cust AS (
          SELECT c_custkey, c_acctbal,
                 CAST(c_nationkey % 10 AS INT) AS cntrycode
          FROM customer
          WHERE c_nationkey % 10 IN (0, 3, 5, 7, 9)
        ), pos AS (
          SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
                 count(*) AS n_bal
          FROM cust WHERE c_acctbal > 0
        )
        SELECT cntrycode, count(*) AS numcust,
               CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
        FROM cust CROSS JOIN pos
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_bal > sum_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY cntrycode
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               count(*) AS count_order,
               round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3": """
        SELECT o_orderkey, o_orderdate,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "tpch_q2": """
        WITH euro AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ), costs AS (
          SELECT l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) AS cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ), ranked AS (
          SELECT p_partkey, p_name, s_name, s_acctbal, n_name, cost,
                 min(cost) OVER (PARTITION BY p_partkey) AS min_cost
          FROM part
          JOIN costs ON p_partkey = l_partkey
          JOIN euro ON l_suppkey = s_suppkey
          WHERE p_size <= 15 AND p_type = 'STANDARD'
        )
        SELECT round(CAST(s_acctbal AS DOUBLE), 6) AS acctbal, s_name,
               n_name, p_partkey, p_name, round(cost, 6) AS supply_cost
        FROM ranked WHERE cost = min_cost
        ORDER BY acctbal DESC, s_name, p_partkey LIMIT 100
    """,
    "tpch_q12": """
        SELECT l_returnflag,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
    """,
    "tpch_q20": """
        WITH qty AS (
          SELECT l_suppkey, l_partkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
        )
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM qty JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%' AND total_qty > 50
        )
    """,
    "tpch_q21": """
        WITH l1 AS (
          SELECT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate
        )
        SELECT s_name, count(*) AS numwait
        FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
        ) AND NOT EXISTS (
          SELECT 1 FROM l1 l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
        )
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
    "tpch_q11": """
        WITH vals AS (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_7'
          GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value
        FROM vals
        WHERE value * 640 > (SELECT sum(value) FROM vals)
    """,
}
