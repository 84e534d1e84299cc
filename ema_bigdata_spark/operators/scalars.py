"""Part B — scalar function surface: string/date/math/conditional/JSON
(SURVEY.md §2.4).  The reference's only scalar ops are double
arithmetic inside closures (SURVEY.md §1.2).

All expressions are built-in Column functions → whole-stage codegen,
no Python in the row path.  Parity conventions: integer-ish outputs
cast to BIGINT on both sides; libm-backed outputs (sqrt/ln/exp)
rounded to 6; date_trunc goes through DATE (Spark's timestamp
date_trunc is session-timezone-dependent — verified gotcha).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ema_bigdata_spark.functions.parity import floor_long
from ema_bigdata_spark.registry import query
from ema_bigdata_spark.sources.tables import load_table


# -- q_string_funcs -------------------------------------------------------


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           substr(p_name, 1, 5) AS pfx,
           CAST(length(p_name) AS BIGINT) AS name_len,
           (p_name LIKE '%gre%') AS has_gre,
           CAST(length(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           -- || not concat(): Spark's concat NULL-propagates while
           -- DuckDB's concat() SKIPS NULLs (r7 adversarial find); the
           -- ANSI || operator propagates on both engines
           p_brand || '#' || p_type AS brand_type,
           replace(p_type, ' ', '_') AS type_slug
    FROM part
    """,
)
def q_string_funcs(spark, sf_dir):
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.col("p_name").like("%gre%").alias("has_gre"),
        F.size(F.split("p_name", " ", -1)).cast("long").alias("n_words"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
    )


# -- q_date_funcs ---------------------------------------------------------


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS days_since_95
    FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")  # NTZ→DATE is timezone-free
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("o_year"),
        F.month(d).cast("long").alias("o_month"),
        F.dayofmonth(d).cast("long").alias("o_day"),
        F.trunc(d, "month").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


# -- q_math_funcs ---------------------------------------------------------


@query(
    "q_math_funcs",
    # sqrt/ln carry explicit domain guards on BOTH engines (r7, found
    # by the adversarial relational suite): outside the domain Spark
    # returns NaN/NULL while DuckDB THROWS OutOfRange — the CASE makes
    # both engines emit NULL for a negative quantity or a non-positive
    # price, the same contract shape as the similarity vector gates.
    # price_bucket snaps through the floor_long/sql_floor_long pair
    # (r8): NULL for NaN/±Inf/beyond-2^63 prices on both engines —
    # before r8 DuckDB hard-errored and Spark's builtin floor(DOUBLE)
    # silently emitted 0 / Long.MAX (JVM d2l), found by the poisoned
    # TPC-H non-finite sweep
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CASE WHEN l_quantity >= 0
                THEN round(sqrt(l_quantity), 6) END AS sqrt_qty,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 6) END AS ln_price,
           round(exp(l_discount), 6) AS exp_disc,
           abs(l_quantity - 25.0) AS abs_dev,
           TRY_CAST(floor(l_extendedprice / 1000) AS BIGINT)
             AS price_bucket,
           (CAST(l_orderkey AS BIGINT) % 7) AS key_mod
    FROM lineitem
    """,
)
def q_math_funcs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.when(
            F.col("l_quantity") >= 0, F.round(F.sqrt("l_quantity"), 6)
        ).alias("sqrt_qty"),
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log(F.col("l_extendedprice")), 6),
        ).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.abs(F.col("l_quantity") - F.lit(25.0)).alias("abs_dev"),
        floor_long("l_extendedprice / 1000").alias("price_bucket"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# -- q_case_null ----------------------------------------------------------


@query(
    "q_case_null",
    oracle="""
    SELECT status_word, priority_class, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT CASE o_orderstatus WHEN 'F' THEN 'finished'
                                WHEN 'O' THEN 'open'
                                ELSE 'partial' END AS status_word,
             coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!')
               AS priority_class
      FROM orders
    )
    GROUP BY status_word, priority_class
    """,
)
def q_case_null(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word")
    )
    prio = F.coalesce(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")
    ).alias("priority_class")
    return (
        o.select(status, prio)
        .groupBy("status_word", "priority_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# -- q_json_extract -------------------------------------------------------


#: shared integer-literal pattern for the q_json_extract cast guard
#: (r8, ADVICE): an UNGUARDED CAST(kstr AS BIGINT) hard-errors on BOTH
#: engines for valid JSON whose $.k is non-numeric ('{"k":"abc"}') or
#: fractional ('{"k": 20.5}').  ≤18 digits also keeps the accepted
#: literal inside BIGINT range, so the guarded cast can never
#: overflow-throw.  The guard is a capturing regexp_extract +
#: NULLIF('') + cast rather than CASE WHEN rlike(...): a conditional
#: blocks Spark's whole-stage-codegen common-subexpression
#: elimination, so the CASE form re-parsed the JSON 2-4× per row —
#: measured 0.73 s vs 0.36 s at sf0.1 (min-of-3, warm).  Anchors are
#: required on Spark (search semantics) and harmless on DuckDB
#: (full-match semantics); both engines return '' on no match, which
#: NULLIF turns into the declared NULL.
_JSON_INT_PAT = r"^(-?[0-9]{1,18})$"


@query(
    "q_json_extract",
    # json_valid() guard (r7, found by the adversarial events suite):
    # Spark's get_json_object returns NULL on malformed JSON — the
    # declared engine semantics — while DuckDB's json_extract_string
    # THROWS "Malformed JSON"; the guard makes the oracle match.
    # Integer-pattern cast guard (r8): $.k values that are valid JSON
    # but not integer literals ('abc', 20.5, 1e20) become NULL on both
    # engines instead of a CAST hard-error; declared semantics — k is
    # the integer value of $.k when $.k IS an integer literal, else
    # NULL.  Exercised by the '{"k":"abc"}' / '{"k": 20.5}' rows in
    # tests/test_adversarial_events.py.
    # DECLARED BOUNDARY (r7 review): props must be a SINGLE JSON
    # document.  On prefix-valid input with trailing garbage
    # ('{"k":1}garbage', '{"k":1}{"k":2}') the engines legitimately
    # differ — Spark's streaming parser extracts from the valid
    # prefix, DuckDB's whole-document validator rejects — and no
    # shared expression reproduces either side exactly
    # (try_parse_json accepts concatenated docs too, measured).
    # Pinned by test_properties.TestJsonBoundary; same
    # accepted-boundary posture as SURVEY §2.4's empty-input list.
    oracle=f"""
    SELECT event_id,
           CAST(NULLIF(regexp_extract(kstr, '{_JSON_INT_PAT}', 1), '')
                AS BIGINT) AS k,
           (CAST(NULLIF(regexp_extract(kstr, '{_JSON_INT_PAT}', 1), '')
                 AS BIGINT) % 10 = 0) AS k_round
    FROM (
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS kstr
      FROM events
    )
    """,
)
def q_json_extract(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ks = F.get_json_object("props", "$.k")
    k = F.nullif(F.regexp_extract(ks, _JSON_INT_PAT, 1), F.lit("")).cast(
        "long"
    )
    return ev.select(
        "event_id",
        k.alias("k"),
        ((k % 10) == 0).alias("k_round"),
    )
