"""Designed empty-corpus refusals (r7, VERDICT r6 item 4).

The r6 empty-table probe found that with every input empty, gmm_fit /
q_gmm_bic crashed in ``init_fold`` (``float(None)``), q_bm25 crashed
folding ``None`` scoring literals, and q_pagerank hit an ANSI
DIVIDE_BY_ZERO on the folded 1/|V| teleport scalar.  An empty corpus is
outside every declared operator contract, but the failure must be the
same DESIGNED loud ``ValueError`` the similarity family's probe guards
raise — a user pointing the engine at an empty prefix should read
"empty corpus", not a Py4J traceback.  These tests pin that contract.
"""

from __future__ import annotations

import pytest

from ema_bigdata_spark import registry

registry.load_all()

_SCHEMAS = {
    "events": (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING"
    ),
    "documents": (
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT"
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
}


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory) -> str:
    """A testdata directory whose tables exist but hold zero rows."""
    root = tmp_path_factory.mktemp("empty_sf")
    for table, schema in _SCHEMAS.items():
        spark.createDataFrame([], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{table}.parquet")
    return str(root)


class TestEmptyCorpusRefusals:
    def test_gmm_fit_refuses(self, spark, empty_dir):
        with pytest.raises(ValueError, match="empty corpus"):
            registry.QUERIES["gmm_fit"](spark, empty_dir).collect()

    def test_gmm_bic_refuses(self, spark, empty_dir):
        with pytest.raises(ValueError, match="empty corpus"):
            registry.QUERIES["q_gmm_bic"](spark, empty_dir).collect()

    def test_bm25_refuses(self, spark, empty_dir):
        with pytest.raises(ValueError, match="empty corpus"):
            registry.QUERIES["q_bm25"](spark, empty_dir).collect()

    def test_pagerank_refuses(self, spark, empty_dir):
        with pytest.raises(ValueError, match="empty graph"):
            registry.QUERIES["q_pagerank"](spark, empty_dir).collect()

    def test_bm25_whitespace_only_refuses(self, spark, empty_dir, tmp_path):
        """Documents exist but tokenize to nothing — same refusal."""
        spark.createDataFrame(
            [(1, "   ", "en", "web", 3), (2, None, "en", "web", 0)],
            _SCHEMAS["documents"],
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        for t in ("events", "orders", "lineitem"):
            spark.createDataFrame([], _SCHEMAS[t]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{tmp_path}/{t}.parquet")
        with pytest.raises(ValueError, match="empty corpus"):
            registry.QUERIES["q_bm25"](spark, str(tmp_path)).collect()
