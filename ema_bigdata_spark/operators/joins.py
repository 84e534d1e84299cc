"""Part B — join surface: inner/broadcast/outer/semi/anti/range
(SURVEY.md §2.4).  The reference contains no joins of any kind
(verified, SURVEY.md §2.1); these are the driver-mandated extension.

Scale strategy per join:
- fact⋈fact equi joins shuffle on the key; AQE converts to broadcast
  or splits skewed partitions at runtime;
- dim tables (region/nation/customer at low sf, region/nation always)
  get explicit ``F.broadcast`` hints — at 100 TB the dims stay MBs
  while facts grow, so the hint removes the big-side shuffle entirely;
- the range join bounds its band predicate with an equi key
  (user_id) so Spark plans a hash join with the band as a post-filter
  instead of a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ema_bigdata_spark.functions.parity import sql_sum_fixed, sum_fixed
from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table


# -- q_join_inner: orders ⋈ customer, aggregate by segment ----------------


@query(
    "q_join_inner",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_sum_fixed('o.o_totalprice', 10000)} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_inner(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            sum_fixed("o_totalprice", 10000).alias("revenue"),
        )
    )


# -- q_join_broadcast: star-schema dim chain ------------------------------


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           {sql_sum_fixed('c.c_acctbal')} AS acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_broadcast(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    # Two BroadcastHashJoins → the customer scan never shuffles; only
    # the final tiny (r_name, n_name) aggregate exchanges data.
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            sum_fixed("c_acctbal").alias("acctbal"),
        )
    )


# -- q_join_left: customers with zero orders included ---------------------


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(CAST(round(o.o_totalprice * 10000) AS BIGINT)), 0)
                AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 10000, 0).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").cast("long").alias("n_orders"),
            (
                F.coalesce(F.sum(cents), F.lit(0)).cast("double")
                / F.lit(10000.0)
            ).alias("revenue"),
        )
    )


# -- q_join_semi / q_join_anti --------------------------------------------


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # left_semi: probe side streams, no fact-side row duplication.
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# -- q_join_range: banded self-join (equi key + time-range predicate) -----


@query(
    "q_join_range",
    oracle="""
    SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id > a.event_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.user_id
    """,
)
def q_join_range(spark, sf_dir):
    # The equi conjunct (user_id) drives a hash join; the band predicate
    # filters inside each hash bucket — never a cartesian product.  At
    # 100 TB this shuffles each side once on user_id (AQE handles skewed
    # power users).
    ev = load_table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.event_id") > F.col("a.event_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTE"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
