"""NULL-entity-key identity battery (r9, hostile-nulls sweep).

The seventh sweep mode (`tools/hostile_sweep.py hostile-nulls`) plants
ONE row per column per table with exactly that column NULL and benign
in-window values elsewhere — systematic file-level NULL coverage for
all 51 columns.  Its first run found 17 latent failures in four
classes, all fixed with ONE declared rule mirrored on both engines:

  **a row with a NULL entity key is excluded from ops keyed, paired,
  ranked, or tie-ordered by that key** (SURVEY §2.4, r9)

- CRASHES: the mm codecs int()'d a NULL doc_id for width modulation
  (Python worker death ×3); s_stream_anomaly int()'d a NULL event_id
  in the state fn (stream death).
- NULL-tiebreak windows: Spark sorts an ASC NULL FIRST, DuckDB LAST —
  any window tie-ordered by a nullable key shifts (q_window_lag/
  _running/_frames, q_event_transitions, q_init_means,
  q_source_interleave).
- Join-back asymmetry: oracles re-attach per-entity results through
  equi-joins that drop a NULL key while the Spark projection/window
  shape keeps it (q_lang_id 'und', q_retention row count,
  q_pagerank |V|, q_embed_covariance self-join, q_ann_ivf codebook).
- Aggregate semantics: DuckDB's list() INCLUDES NULL elements where
  Spark's collect_list skips them (q_collect_agg n_nations); a NULL
  measure is un-dominatable in NOT EXISTS dominance (q_skyline).

These tests pin every fixed query on the sweep's own fixture; the
sweep tool stays the fleet-level regression armor.

Also here: the hostile-EXTREMES battery (r9, eighth mode — INT64/INT32
boundary values in every integer key column), which found three ANSI
overflow job kills on key arithmetic, a Python-vs-SQL signed-modulo
divergence, and an IVF seed/recall fragility — see _EXTREMES_FIXED.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ema_bigdata_spark import registry
from tests.oracle import compare_query

registry.load_all()

#: every query the first hostile-nulls run broke, by failure class
_FIXED = (
    # worker/stream crashes (int(None) on the entity key)
    "q_mm_features", "q_mm_png", "q_mm_histogram", "s_stream_anomaly",
    # NULL-tiebreak window shifts
    "q_window_lag", "q_window_running", "q_window_frames",
    "q_event_transitions", "q_init_means", "q_source_interleave",
    # oracle join-back asymmetry
    "q_lang_id", "q_retention", "q_pagerank", "q_embed_covariance",
    "q_ann_ivf",
    # aggregate NULL-element semantics
    "q_collect_agg", "q_skyline",
)

#: unfixed neighbors that share the touched seams — they passed the
#: sweep, but pin them here so a future gate edit can't silently
#: un-fix them (same rationale as the fold-text sharers)
_NEIGHBORS = (
    "q_mm_frames", "q_similarity_topk", "q_embed_centroid",
    "q_window_rank", "q_sessionize",
)


@pytest.fixture(scope="module")
def nulls_fixture(spark, tmp_path_factory):
    """The sweep's own fixture, built once for the module."""
    from ema_bigdata_spark.sources.tables import TABLES
    from tools.hostile_sweep import _build_hostile_nulls

    root = str(tmp_path_factory.mktemp("hostile_nulls"))
    _build_hostile_nulls(spark, TABLES, root)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{root}/{t}.parquet')"
        )
    yield root, con
    con.close()


class TestNullIdentity:
    @pytest.mark.parametrize("name", _FIXED + _NEIGHBORS)
    def test_parity_on_null_planted_tables(self, spark, nulls_fixture, name):
        root, con = nulls_fixture
        compare_query(spark, con, root, name)

    def test_fixture_covers_every_column(self, spark, nulls_fixture):
        """One NULL row per column per table — the mode's contract."""
        root, _ = nulls_fixture
        from ema_bigdata_spark.sources.tables import TABLES

        for t in TABLES:
            df = spark.read.parquet(f"{root}/{t}.parquet")
            cols = df.columns
            base = spark.read.parquet(
                f"{os.environ.get('SPARK_GRAFT_SWEEP_SF', '/root/testdata/sf0.001')}"
                f"/{t}.parquet"
            ).count()
            assert df.count() == base + len(cols), t
            for c in cols:
                n_null = df.where(df[c].isNull()).count()
                assert n_null >= 1, f"{t}.{c} has no NULL row"


#: every query the first hostile-extremes run broke (r9, eighth sweep
#: mode: INT64/INT32 boundary values in every integer key column)
_EXTREMES_FIXED = (
    # ANSI int64-overflow job kills on key arithmetic
    "q_init_means",        # event_id * 2654435761 → mod-first
    "q_stratified_sample",  # doc_id * C → mod-first
    "q_pagerank",          # key * 2 node encode → declared key domain
    # Python floored % vs SQL truncated % on a negative doc_id
    "q_mm_features", "q_mm_png", "q_mm_histogram",
    # duplicate-vector seeds collapsed IVF lists + recall margin
    "q_ann_ivf",
    # ANSI negate(-2^63) in the hottest-key trick → bitwise NOT
    "q_skew_metrics",
)


@pytest.fixture(scope="module")
def extremes_fixture(spark, tmp_path_factory):
    from ema_bigdata_spark.sources.tables import TABLES
    from tools.hostile_sweep import _build_hostile_extremes

    root = str(tmp_path_factory.mktemp("hostile_extremes"))
    _build_hostile_extremes(spark, TABLES, root)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{root}/{t}.parquet')"
        )
    yield root, con
    con.close()


class TestExtremeKeys:
    @pytest.mark.parametrize("name", _EXTREMES_FIXED)
    def test_parity_on_extreme_keys(self, spark, extremes_fixture, name):
        root, con = extremes_fixture
        compare_query(spark, con, root, name)

    def test_pagerank_encode_at_in_domain_boundary(self, spark, tmp_path):
        """ADVICE r9: the sweep's out-of-domain extremes only prove the
        key gate EXCLUDES them; this fixture plants a JOINING trading
        pair at the declared domain edge [-2^62, 2^62-1], so the
        2k/2k+1 node encode itself runs at its i64 limits
        (2·(-2^62) = -2^63, 2·(2^62-1)+1 = 2^63-1) on both engines —
        plus an in-domain NEGATIVE supplier, pinning the sign-robust
        `% 2 != 0` is_supplier label (truncated % yields -1 there)."""
        lo, hi = -(2**62), 2**62 - 1
        orders = spark.createDataFrame(
            [(1, lo), (2, 7), (3, None)],
            "o_orderkey BIGINT, o_custkey BIGINT",
        )
        lineitem = spark.createDataFrame(
            [(1, hi), (1, 5), (2, 5), (2, -3), (3, None)],
            "l_orderkey BIGINT, l_suppkey BIGINT",
        )
        for name, df in (("orders", orders), ("lineitem", lineitem)):
            df.coalesce(1).write.mode("overwrite").parquet(
                str(tmp_path / f"{name}.parquet")
            )
        con = duckdb.connect()
        try:
            for t in ("orders", "lineitem"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
                )
            compare_query(spark, con, str(tmp_path), "q_pagerank")
            out = {
                r.node: r.is_supplier
                for r in registry.QUERIES["q_pagerank"](
                    spark, str(tmp_path)
                ).collect()
            }
            assert out[2 * lo] is False          # -2^63 customer node
            assert out[2 * hi + 1] is True       # 2^63-1 supplier node
            assert out[2 * -3 + 1] is True       # negative supplier: odd
        finally:
            con.close()

    def test_ivf_recall_holds_on_duplicate_heavy_corpus(
        self, spark, extremes_fixture
    ):
        """The planted identical-vector cluster must not push IVF
        recall below the declared floor (the distinct-seed rule +
        nprobe=3 margin — similarity.py's _IVF_NPROBE note)."""
        from ema_bigdata_spark.operators import similarity as sim
        from ema_bigdata_spark.sources.tables import load_table

        root, _ = extremes_fixture
        probe = sim._probe_vector(spark, root)
        ivf = {r.vec_id for r in sim.ann_ivf_topk(spark, root).collect()}
        ex = {
            r.vec_id
            for r in sim.cosine_topk(
                load_table(spark, root, "embeddings"), probe
            ).select("vec_id").collect()
        }
        assert len(ivf & ex) >= sim._IVF_RECALL_FLOOR


class TestCollectAggNullSemantics:
    def test_all_null_group_is_empty_list(self, spark, tmp_path):
        """An ALL-NULL group collects to an EMPTY list (size 0, '') on
        both engines, not a NULL aggregate — the coalesce([]) leg of
        the r9 oracle (the sweep fixture only exercises the mixed
        NULL-element leg, since its NULL n_name shares region 0)."""
        rows = [(0, None, 7), (1, "A", 7), (2, "B", 7), (3, None, 8)]
        df = spark.createDataFrame(
            rows, "n_nationkey INT, n_name STRING, n_regionkey INT"
        )
        path = str(tmp_path / "nation.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW nation AS SELECT * FROM"
            f" read_parquet('{path}/*.parquet')"
        )
        try:
            compare_query(spark, con, str(tmp_path), "q_collect_agg")
            out = {
                tuple(r)
                for r in registry.QUERIES["q_collect_agg"](
                    spark, str(tmp_path)
                ).collect()
            }
            # region 8's only name is NULL → empty list, size 0
            assert (8, "", 0) in out
        finally:
            con.close()
