"""Cross-engine parity on ADVERSARIAL relational fixtures (r7).

The fourth adversarial suite (after value domains, documents, and
embeddings — r6): the relational/join/TPC-H family runs the driver's
benign TPC-H-ish testdata, which never exercises foreign-key
violations, NULL join keys, all-tied sort keys, NULL group keys, or
boundary discounts.  This suite re-runs that family on a tiny
synthetic database that forces those paths and bit-compares against
the same DuckDB oracles the driver uses.

Fixture hostility checklist:
- orders → customer FK violation (an order whose customer is missing)
  and a customer with no orders: outer/semi/anti joins must agree;
- NULL join keys (c_nationkey, s_nationkey): NULL never equi-joins on
  either engine, but outer-join padding must still carry the rows;
- ALL-TIED o_totalprice across orders: every ranking/top-k query
  lives or dies by its declared tie-break keys;
- NULL group keys (o_orderpriority, l_returnflag): GROUP BY must
  bucket NULLs identically;
- boundary numerics: l_discount ∈ {0.0, 1.0}, a negative
  l_extendedprice, a zero l_quantity;
- LIKE-hostile strings: names containing %, _, and quotes;
- an empty-side group: a region with no nations.
"""

from __future__ import annotations

import datetime

import pytest

from ema_bigdata_spark import registry

registry.load_all()

_D = datetime.datetime

_SCHEMAS = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": (
        "s_suppkey BIGINT, s_name STRING, s_nationkey INT,"
        " s_acctbal DOUBLE"
    ),
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING,"
        " p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ,"
        " o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"
    ),
    # benign minima so multi-table plans that touch them still run
    "events": (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING"
    ),
}

_REGION = [(0, "EUROPE"), (1, "ASIA"), (2, "EMPTYREGION")]
# nation 9 points at a MISSING region; EMPTYREGION has no nations
_NATION = [(0, "FRANCE", 0), (1, "GERMANY", 0), (2, "CHINA", 1),
           (9, "ORPHANLAND", 7)]
# NULL nationkey; LIKE-hostile names; tied acctbals; one customer (5)
# never orders
_CUSTOMER = [
    (1, "Customer#100%_special", 0, 100.0, "BUILDING"),
    (2, "Customer#O'Brien", 1, 100.0, "AUTOMOBILE"),
    (3, "Cust_under", None, -50.0, "BUILDING"),
    (4, "plain", 2, 100.0, None),
    (5, "neverorders", 9, 0.0, "MACHINERY"),
]
_SUPPLIER = [(1, "Supp%one", 0, 10.0), (2, "Supp_two", None, 10.0),
             (3, "Supp'three", 2, -5.0)]
_PART = [
    (1, "green shiny widget", "Brand#1", "SMALL ANODIZED", 5, 100.0),
    (2, "rusty gear", "Brand#2", "LARGE BRUSHED", 50, 200.0),
    (3, "green gear", None, "SMALL ANODIZED", 5, 0.0),
    # skyline hostility: an EXACT (price, size) duplicate pair — both
    # non-dominated or both dominated, the engines must agree — and a
    # one-dimension tie against part 1
    (4, "twin alpha", "Brand#3", "TINY POLISHED", 7, 50.0),
    (5, "twin beta", "Brand#3", "TINY POLISHED", 7, 50.0),
    (6, "price tie", "Brand#1", "MEDIUM PLATED", 9, 100.0),
]
# ALL o_totalprice tied at 1000.0; order 99 belongs to a MISSING
# customer (42); NULL priority and status
_ORDERS = [
    (10, 1, "O", 1000.0, _D(1995, 3, 1), "1-URGENT"),
    (11, 1, "F", 1000.0, _D(1995, 6, 2), "2-HIGH"),
    (12, 2, "O", 1000.0, _D(1996, 1, 3), None),
    (13, 3, "F", 1000.0, _D(1994, 12, 31), "1-URGENT"),
    (14, 4, "P", 1000.0, _D(1995, 3, 15), "5-LOW"),
    (99, 42, "O", 1000.0, _D(1997, 7, 7), "3-MEDIUM"),
    # r8 hostile-keys sweep: a NULL custkey — COUNT(DISTINCT) and the
    # HLL sketch both ignore it, but q_approx_distinct's pre-aggregate
    # carried it as a group and its bare row count silently inflated
    # exact_custs by one
    (98, None, "O", 1000.0, _D(1997, 8, 8), "3-MEDIUM"),
]
# orphan l_orderkey 777; discounts at 0.0 and 1.0; a negative
# extendedprice; zero quantity; NULL returnflag/shipdate
_LINEITEM = [
    (10, 1, 1, 1, 17.0, 1000.0, 0.0, 0.02, "N", "O", _D(1995, 3, 10)),
    (10, 2, 2, 2, 36.0, 2000.0, 1.0, 0.06, "N", "O", _D(1995, 4, 10)),
    (11, 1, 1, 1, 2.0, -500.0, 0.05, 0.0, "R", "F", _D(1995, 7, 1)),
    (12, 3, 3, 1, 0.0, 0.0, 0.10, 0.04, "A", "F", _D(1996, 2, 1)),
    (13, 2, 1, 1, 30.0, 1500.0, 0.06, 0.02, None, "F", None),
    (13, 3, 2, 2, 28.0, 1500.0, 0.07, 0.02, "R", "F", _D(1995, 1, 15)),
    (99, 1, 3, 1, 45.0, 4500.0, 0.04, 0.01, "N", "O", _D(1997, 7, 20)),
    (777, 2, 1, 1, 1.0, 10.0, 0.01, 0.0, "N", "O", _D(1995, 5, 5)),
]
_EVENTS = [
    (1, _D(2024, 1, 1, 0, 0), 1, "click", 10.0, "{}"),
    (2, _D(2024, 1, 1, 0, 5), 1, "view", 20.0, "{}"),
    (3, _D(2024, 1, 1, 1, 0), 2, "purchase", 30.0, "{}"),
]

_ROWS = {
    "region": _REGION, "nation": _NATION, "customer": _CUSTOMER,
    "supplier": _SUPPLIER, "part": _PART, "orders": _ORDERS,
    "lineitem": _LINEITEM, "events": _EVENTS,
}

#: the family under test: every registered query whose input closure
#: is within the fixture tables above (documents/embeddings families
#: have their own adversarial suites)
_QUERIES = (
    # scans / aggregates
    "q_filter_project", "q_pricing_summary", "q_agg_distinct",
    "q_rollup", "q_cube", "q_grouping_sets", "q_having",
    "q_percentiles", "q_corr_stats", "q_sort_limit", "q_union",
    "q_intersect", "q_except", "q_unpivot", "q_pivot",
    "q_approx_distinct",
    # scalars
    "q_string_funcs", "q_date_funcs", "q_math_funcs", "q_case_null",
    # joins
    "q_join_inner", "q_join_left", "q_join_full", "q_join_semi",
    "q_join_anti", "q_join_broadcast", "q_join_cross",
    "q_sql_exists", "q_sql_scalar_subquery",
    # TPC-H shapes
    "q_sql_tpch_q3", "q_sql_tpch_q5", "q_sql_tpch_q6",
    "q_sql_tpch_q10", "q_sql_tpch_q13", "q_sql_tpch_q14",
    "q_sql_tpch_q17", "q_sql_tpch_q18", "q_sql_tpch_q19",
    "q_sql_tpch_q2", "q_sql_tpch_q7", "q_sql_tpch_q8",
    "q_sql_tpch_q9", "q_sql_tpch_q15", "q_sql_tpch_q16",
    "q_sql_tpch_q21", "q_sql_tpch_q22",
    # r7 coverage-gap close: skyline on the tie-rich parts (exact
    # duplicate points and one-dimension ties), collect_agg over the
    # orphaned nation, pagerank on the FK-violating purchase graph
    "q_skyline", "q_collect_agg", "q_pagerank",
    # OLS over the hostile lineitem (NULL quantities, zero and
    # negative prices) — the r6 zero-variance gate's home turf
    "q_linreg",
)


@pytest.fixture(scope="module")
def adv_rel_dir(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("adv_rel")
    for table, schema in _SCHEMAS.items():
        spark.createDataFrame(_ROWS[table], schema).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{root}/{table}.parquet")
    return str(root)


@pytest.fixture(scope="module")
def adv_rel_duck(adv_rel_dir):
    import duckdb

    duck = duckdb.connect()
    for table in _SCHEMAS:
        duck.execute(
            f"CREATE VIEW {table} AS SELECT * FROM"
            f" read_parquet('{adv_rel_dir}/{table}.parquet/*.parquet')"
        )
    return duck


class TestAdversarialRelational:
    @pytest.mark.parametrize("name", _QUERIES)
    def test_parity(self, spark, adv_rel_duck, adv_rel_dir, name):
        from tests.oracle import rowset

        sdf = registry.QUERIES[name](spark, adv_rel_dir)
        srows = [tuple(r) for r in sdf.collect()]
        ores = adv_rel_duck.execute(registry.ORACLES[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        assert len(srows) == len(orows), (name, len(srows), len(orows))
        sn, sset = rowset(sdf.columns, srows)
        on, oset = rowset(ocols, orows)
        assert sn == on, (name, sn, on)
        assert sset == oset, (
            name,
            [(a, b) for a, b in zip(sset, oset) if a != b][:3],
        )
