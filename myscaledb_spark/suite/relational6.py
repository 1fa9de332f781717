"""TPC-H classics q2/q8/q9/q11/q15/q16/q19/q21/q22 adapted to the reduced
synthetic schema (no partsupp — supplier↔part relationships derive from
lineitem; no l_commitdate/l_receiptdate — lateness = shipdate > orderdate+N;
no c_phone — q22's country code = the 2 digits after 'Customer#0000').

Same gate discipline as relational5: DECIMAL money math both sides, final
DOUBLE+ROUND, INT-cast years, keyed tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myscaledb_spark.catalog import load_table
from myscaledb_spark.suite import register

_ONE = "CAST(1 AS DECIMAL(18,2))"
_REV = f"CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(18,2)))"


def _dec2(c: str):
    return F.col(c).cast("decimal(18,2)")


def _one():
    return F.lit(1).cast("decimal(18,2)")


def _rev():
    return _dec2("l_extendedprice") * (_one() - _dec2("l_discount"))


@register(
    "q2_min_acctbal_supplier",
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM (
      SELECT DISTINCT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey
      FROM lineitem
    ) ps
    JOIN part     ON p_partkey = sp_partkey
    JOIN supplier ON s_suppkey = sp_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM (SELECT DISTINCT l_partkey AS sp2_partkey, l_suppkey AS sp2_suppkey
              FROM lineitem) ps2
        JOIN supplier s2 ON s2.s_suppkey = sp2_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE sp2_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q2_min_acctbal_supplier(spark, sf_dir):
    """TPC-H q2 (minimum-cost supplier); with no partsupp/ps_supplycost the
    'cost' is the supplier's acctbal and the part↔supplier catalog is the
    DISTINCT (l_partkey, l_suppkey) projection of lineitem. The correlated
    MIN subquery becomes a per-part min + self-join — two shuffles over the
    distinct pairs, dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("sp_partkey"), F.col("l_suppkey").alias("sp_suppkey")
    ).distinct()
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe = (
        ps.join(F.broadcast(s), F.col("sp_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    min_bal = europe.groupBy(F.col("sp_partkey").alias("mb_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        europe.join(F.broadcast(p), F.col("p_partkey") == F.col("sp_partkey"))
        .join(
            min_bal,
            (F.col("mb_partkey") == F.col("p_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year, {_REV} AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H q8: one nation's share of a region's market by year. The share
    is a ratio of two exact DECIMAL sums, divided once as DOUBLE at output —
    both engines agree without association-order hazards."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _rev()
    return (
        j.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_type_profit",
    f"""
    SELECT n_name AS nation, o_year, ROUND(CAST(SUM(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n_name, EXTRACT(year FROM o_orderdate)::INT AS o_year,
             {_REV} - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(4,2))
             AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H q9 (product-type profit); supply cost proxied as 10% of
    p_retailprice per unit (no ps_supplycost in the synthetic schema).
    All money math exact DECIMAL; one agg exchange after broadcast joins."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    cost = (
        _dec2("p_retailprice") * _dec2("l_quantity") * F.lit(0.1).cast("decimal(4,2)")
    )
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (_rev() - cost).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount").cast("double"), 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q11_important_part_value",
    """
    SELECT l_partkey AS ps_partkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS part_value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
           > (
      SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
             * CAST(0.001 AS DECIMAL(6,4))
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7')
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11_important_part_value(spark, sf_dir):
    """TPC-H q11 (important stock): parts whose value within one nation
    exceeds a fraction of the national total. Value = extendedprice*quantity
    from lineitem (no partsupp). The scalar total is a 1-row broadcast
    crossJoin — no driver collect; HAVING compares exact DECIMALs."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    base = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    val = _dec2("l_extendedprice") * _dec2("l_quantity")
    per_part = base.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum(val).alias("_value")
    )
    total = base.agg(
        (F.sum(val) * F.lit(0.001).cast("decimal(6,4)")).alias("_threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_value") > F.col("_threshold"))
        .select(
            "ps_partkey", F.round(F.col("_value").cast("double"), 2).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H q15: supplier(s) with the quarter's maximum revenue. The MAX
    scalar is a 1-row broadcast joined back against the per-supplier agg —
    the revenue CTE is computed once and reused (cached plan subtree)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("_rev_total")
    )
    mx = revenue.agg(F.max("_rev_total").alias("_mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev_total") == F.col("_mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev_total").cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_part_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS sp_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = sp_partkey
    WHERE p_brand <> 'Brand#25'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark, sf_dir):
    """TPC-H q16: distinct supplier counts per part attribute triple,
    excluding flagged suppliers ('complaints' proxied as negative acctbal).
    NOT IN compiles to a broadcast left-anti join; COUNT(DISTINCT) is a
    two-phase expand+agg Catalyst handles natively."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("sp_partkey"), F.col("l_suppkey")
    ).distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#25")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(9, 14, 19, 23, 36, 45, 49, 3))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("sp_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q19_or_predicate_revenue",
    f"""
    SELECT ROUND(CAST(SUM({_REV}) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_or_predicate_revenue(spark, sf_dir):
    """TPC-H q19: disjunctive multi-branch predicate over a join. Written as
    one OR expression so Catalyst can derive the common join key and push
    the p_brand/p_size disjunction to the part scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(F.round(F.sum(_rev()).cast("double"), 2).alias("revenue"))
    )


@register(
    "q20_part_promotion",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
                       AND l_shipdate <  DATE '1997-01-01'
                      THEN l_quantity ELSE 0 END) AS qty_1996,
             SUM(l_quantity) AS qty_all
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, ROUND(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7')
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%' AND 5 * qty_1996 > qty_all
      )
    ORDER BY s_name, s_suppkey
    """,
)
def q20_part_promotion(spark, sf_dir):
    """TPC-H q20 (potential part promotion) adapted to the reduced schema:
    no partsupp availqty, so 'excess stock' becomes a shipment-concentration
    predicate — suppliers of 'small%' parts where 1996 shipments exceed 20%
    of that (part, supplier)'s lifetime quantity, integer-exact as
    5*qty_1996 > qty_all. Shape preserved: nation-filtered suppliers
    semi-joined to a part-restricted aggregate subquery. Plan: one lineitem
    shuffle for the (part,supp) aggregate; part and nation filters broadcast;
    the supplier membership check is a left-semi broadcast join."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem")
    in_1996 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("date")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(F.lit(0))).alias("qty_1996"),
        F.sum("l_quantity").alias("qty_all"),
    )
    qualifying = (
        shipped.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.lit(5) * F.col("qty_1996") > F.col("qty_all"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "semi")
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal").cast("double"), 2).alias("s_acctbal"),
        )
        .orderBy("s_name", "s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_11'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H q21 (suppliers who kept orders waiting): the only late-shipping
    supplier on a multi-supplier finished order. Late = shipped >90 days
    after order date (no receipt/commit dates in the synthetic schema).
    EXISTS / NOT EXISTS become left-semi / left-anti joins on l_orderkey;
    the o_orderdate correlation rides along in the join condition."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_11")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late90 = F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    l1 = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > late90)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    with_other = l1.join(
        l2,
        (F.col("l2_orderkey") == F.col("l_orderkey"))
        & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    sole_late = with_other.join(
        l3,
        (F.col("l3_orderkey") == F.col("l_orderkey"))
        & (F.col("l3_suppkey") != F.col("l_suppkey"))
        & (F.col("l3_shipdate") > late90),
        "left_anti",
    )
    return (
        sole_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q22_acctbal_opportunity",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
    FROM (
      SELECT SUBSTRING(c_name, 16, 2) AS cntrycode, c_acctbal
      FROM customer
      CROSS JOIN (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
                         COUNT(*) AS bal_cnt
                  FROM customer WHERE c_acctbal > 0.0) t
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_cnt > bal_sum
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_acctbal_opportunity(spark, sf_dir):
    """TPC-H q22 (global sales opportunity): above-average-balance customers
    with no RECENT orders (the synthetic data gives every customer at least
    one historical order), grouped by a 'country code' — 2 digits of the
    customer id embedded in c_name (no c_phone). The average comparison is
    cross-multiplied (bal * cnt > sum) so it stays in exact DECIMAL/BIGINT
    arithmetic on both engines; NOT EXISTS is a left-anti join with the date
    predicate pushed into the orders scan."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec2("c_acctbal")).alias("bal_sum"), F.count(F.lit(1)).alias("bal_cnt")
    )
    rich = (
        c.crossJoin(F.broadcast(bal))
        .filter(_dec2("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    )
    return (
        rich.select(F.substring("c_name", 16, 2).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec2("c_acctbal")).cast("double"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
