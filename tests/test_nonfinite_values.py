"""Seventh adversarial suite (r8): NaN/±Infinity measures.

Parquet DOUBLE carries non-finite values, and at 100 TB a corrupt
upstream computation WILL produce some.  Before r8 they hard-errored
the fixed-point snap (ANSI ``CAST(NaN AS BIGINT)`` → CAST_OVERFLOW on
Spark, conversion error on DuckDB): a measured sweep found 12 of 142
batch queries crashing outright on a fixture with three non-finite
rows — one bad double killed the whole job mid-stage.

Declared semantics (parity.py module docstring): **measures whose
fixed-point snap falls outside BIGINT — non-finite, or beyond the
scale's headroom — are ignored by the statistic**: ``cents`` /
``sql_cents`` snap through TRY_CAST (engine-identical NULL on NaN,
±Inf, and overflow; no per-row branch), and the row-filter family
(profiling, the gmm histograms, the streaming anomaly core) extends
its ``IS NOT NULL`` filter to each pipeline's snap-safe domain
(per-pipeline arithmetic headroom since r9 — see profiling.py's
module comment and the anomaly core's ``_ANOM_DOMAIN``; ``1e6`` for
the EM's documented headroom) —
a row filter, because an in-pipeline NULL snap would make count(*)
disagree with the sums that skip it.
Denominators count the SNAP (q_ab_ttest / q_variance_pop /
avg_fixed), so an ignored row neither crashes the cast nor inflates
the sample size the sums skipped.  Identity on in-domain input — no
result changes on well-formed data (full driver sim re-verified).

This suite pins (a) Spark↔DuckDB parity on a hostile fixture for every
formerly-crashing query plus pass-through controls, (b) the ignored
semantics as EXACT values, and (c) the streaming anomaly core
surviving a NaN through the state store.
"""

from __future__ import annotations

import datetime
import math

import pytest

from ema_bigdata_spark import registry

registry.load_all()

_D = datetime.datetime
_T0 = _D(2024, 3, 1, 12, 0, 0)
_MIN = datetime.timedelta(minutes=1)

NAN = float("nan")
INF = float("inf")

# user 1: clean 10/20 pair + the full non-finite battery on 'view';
# user 2: NaN/Inf inside 'click'/'purchase' (exercises the gapfill /
# ttest arm filters); user 3: NULL value alongside a NaN (the count
# gate must treat both identically).  Finite values are 2-decimal
# fixed point like the driver testdata.
_EVENTS = [
    (1, _T0, 1, "view", 10.0, "{}"),
    (2, _T0 + 1 * _MIN, 1, "view", 20.0, "{}"),
    (3, _T0 + 2 * _MIN, 1, "view", NAN, "{}"),
    (4, _T0 + 3 * _MIN, 1, "view", INF, "{}"),
    (5, _T0 + 4 * _MIN, 1, "view", -INF, "{}"),
    (10, _T0, 2, "click", 5.0, "{}"),
    (11, _T0 + 1 * _MIN, 2, "click", NAN, "{}"),
    (12, _T0 + 2 * _MIN, 2, "click", 7.0, "{}"),
    (13, _T0 + 3 * _MIN, 2, "purchase", INF, "{}"),
    (14, _T0 + 4 * _MIN, 2, "purchase", 40.0, "{}"),
    (15, _T0 + 5 * _MIN, 2, "purchase", 44.0, "{}"),
    (20, _T0, 3, "view", None, "{}"),
    (21, _T0 + 1 * _MIN, 3, "view", NAN, "{}"),
    (22, _T0 + 2 * _MIN, 3, "view", 31.0, "{}"),
    (23, _T0 + 3 * _MIN, 3, "click", 32.5, "{}"),
    (24, _T0 + 4 * _MIN, 3, "scroll", 33.25, "{}"),
    # finite but beyond the snap headroom (1e17 × 100 > 2^63): the
    # TRY_CAST form ignores it deterministically on both engines
    # instead of an ANSI overflow throw
    (25, _T0 + 5 * _MIN, 3, "scroll", 1e17, "{}"),
]
_CUSTOMER = [
    (1, "alice", 0, 10.0, "BUILDING"),
    (2, "bob", 1, 20.0, "AUTOMOBILE"),
    (3, "carol", 0, 30.0, "BUILDING"),
]
_SCHEMAS = {
    "events": (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING"
    ),
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment STRING"
    ),
}

#: the 12 queries the r8 sweep measured CRASHING on non-finite input,
#: plus pass-through controls that must keep their (already-OK)
#: cross-engine behavior
_FORMER_CRASHERS = (
    "gmm_fit", "q_gmm_bic", "q_mean", "q_variance_pop", "q_kmeans",
    "q_ab_ttest", "q_join_salted", "q_window_running",
    "q_window_range_frame", "q_value_outliers", "q_outlier_mad",
    "q_winsorize",
)
_CONTROLS = ("q_skew_metrics", "q_events_hourly", "q_gapfill")


@pytest.fixture(scope="module")
def nf_dir(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("nonfinite")
    for table, rows in (("events", _EVENTS), ("customer", _CUSTOMER)):
        spark.createDataFrame(rows, _SCHEMAS[table]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/_{table}")
    # the streaming source requires events.parquet to be a single FILE
    # (pathGlobFilter contract — tools/streaming_evidence.py); batch
    # load_table reads the same file fine
    import glob
    import shutil

    for table in _SCHEMAS:
        part = glob.glob(f"{root}/_{table}/part-*.parquet")
        assert len(part) == 1
        shutil.move(part[0], f"{root}/{table}.parquet")
        shutil.rmtree(f"{root}/_{table}")
    return str(root)


@pytest.fixture(scope="module")
def nf_duck(nf_dir):
    import duckdb

    duck = duckdb.connect()
    for table in _SCHEMAS:
        duck.execute(
            f"CREATE VIEW {table} AS SELECT * FROM"
            f" read_parquet('{nf_dir}/{table}.parquet')"
        )
    return duck


class TestNonFiniteParity:
    @pytest.mark.parametrize("name", _FORMER_CRASHERS + _CONTROLS)
    def test_parity(self, spark, nf_duck, nf_dir, name):
        from tests.oracle import compare_query

        compare_query(spark, nf_duck, nf_dir, name)

    def test_stream_anomaly_parity(self, spark, nf_duck, nf_dir):
        """The stateful streaming core must survive NaN through the
        state store AND still equal its batch oracle."""
        from tests.oracle import compare_query

        compare_query(spark, nf_duck, nf_dir, "s_stream_anomaly")


#: the embedding family's hostile battery: NaN / +Inf / 3e38 elements
#: (3e38 is finite in DOUBLE — only the r8 norm² ≤ _NORM2_MAX bound
#: catches it; its centroid snap would otherwise ANSI-overflow).
#: Before the bound, a measured sweep found q_embed_centroid /
#: q_embed_covariance / q_semdedup CRASHING and q_ann_ivf silently
#: DIVERGING (a NaN vector in the codebook training sample poisons a
#: numpy centroid mean).
_EMB_QUERIES = (
    "q_embed_centroid", "q_embed_covariance", "q_semdedup", "q_ann_ivf",
    "q_embed_norm", "q_similarity_topk", "q_embed_dup",
    "q_embed_quantize",
)


@pytest.fixture(scope="module")
def emb_dir(spark, nf_dir, tmp_path_factory) -> str:
    """nf_dir plus a poisoned embeddings table: 40 unit-ish vectors and
    three hostile ones (NaN / +Inf / 3e38 element)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("nonfinite_emb")
    for t in ("events", "customer"):
        shutil.copy(f"{nf_dir}/{t}.parquet", f"{root}/{t}.parquet")
    d = 64
    good = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {d}), i -> CAST("
            "  CASE WHEN i = CAST(id % 64 + 1 AS INT) THEN 0.8"
            "       ELSE 0.075 END AS FLOAT))"
        ).alias("embedding"),
        (F.col("id") % 3).cast("int").alias("label"),
    )
    bad = spark.createDataFrame(
        # the fourth row is IN-domain with a NULL label: both engines
        # group NULL labels together (probed r8 — parity holds; this
        # row pins it)
        [(100, "nan", 0), (101, "inf", 1), (102, "huge", 2),
         (103, "ok", None)],
        "vec_id BIGINT, kind STRING, label INT",
    ).select(
        "vec_id",
        F.expr(
            f"transform(sequence(1, {d}), i -> CASE WHEN i = 3 THEN"
            " CASE kind WHEN 'nan' THEN float('NaN')"
            " WHEN 'inf' THEN float('Infinity')"
            " WHEN 'ok' THEN CAST(0.1 AS FLOAT)"
            " ELSE CAST(3e38 AS FLOAT) END"
            " ELSE CAST(0.1 AS FLOAT) END)"
        ).alias("embedding"),
        "label",
    )
    good.unionByName(bad).coalesce(1).write.mode("overwrite").parquet(
        f"{root}/_emb"
    )
    part = glob.glob(f"{root}/_emb/part-*.parquet")
    assert len(part) == 1
    shutil.move(part[0], f"{root}/embeddings.parquet")
    shutil.rmtree(f"{root}/_emb")
    return str(root)


@pytest.fixture(scope="module")
def emb_duck(emb_dir):
    import duckdb

    duck = duckdb.connect()
    for table in ("events", "customer", "embeddings"):
        duck.execute(
            f"CREATE VIEW {table} AS SELECT * FROM"
            f" read_parquet('{emb_dir}/{table}.parquet')"
        )
    return duck


class TestEmbeddingDomain:
    @pytest.mark.parametrize("name", _EMB_QUERIES)
    def test_parity(self, spark, emb_duck, emb_dir, name):
        from tests.oracle import compare_query

        compare_query(spark, emb_duck, emb_dir, name)

    def test_centroid_excludes_out_of_domain_vectors(self, spark, emb_dir):
        rows = registry.QUERIES["q_embed_centroid"](
            spark, emb_dir
        ).collect()
        # 40 good vectors over 3 labels plus the in-domain NULL-label
        # vector (its own group, counted); the three hostile vectors
        # (labels 0/1/2) are excluded from both n_vecs and the means
        assert sum(r.n_vecs for r in rows) == 41
        assert {r.label for r in rows} == {0, 1, 2, None}


#: the second r8 sweep (poisoned TPC-H measure columns, one hostile
#: column per row, IN-WINDOW dates so the date predicates can't mask
#: the row) found these 10 crashing — every one a raw
#: CAST(round(...) AS BIGINT) snap predating the TRY_CAST rule.  The
#: battery pins their hostile-input parity plus controls whose snaps
#: were already TRY_CAST (q_pricing_summary, q_sql_tpch_q6/q14/q3)
#: and q_events_hourly, whose crash the §15 events fixture missed
#: because its timestamps fell outside the query's window.
_TPCH_QUERIES = (
    "q_percentiles", "q_approx_quantiles", "q_math_funcs", "q_skyline",
    "q_join_left", "q_linreg", "q_sql_tpch_q18", "q_sql_tpch_q2",
    "q_sql_tpch_q9", "q_sql_tpch_q22",
    "q_pricing_summary", "q_sql_tpch_q6", "q_sql_tpch_q14",
    "q_sql_tpch_q3", "q_events_hourly",
)

_TPCH_POISON = {
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
}


@pytest.fixture(scope="module")
def tpch_dir(spark, tmp_path_factory) -> str:
    """sf0.001 plus hostile rows: each poisoned in ONE measure column
    (NaN / +Inf / -Inf / beyond-headroom 1e17) with benign in-filter
    values in the others and IN-WINDOW dates (1994-1996 for the TPC-H
    predicates; 2024-01-02 for q_events_hourly) — a hostile row a date
    filter silently excludes proves nothing."""
    import glob
    import shutil

    root = tmp_path_factory.mktemp("nonfinite_tpch")
    src = "/root/testdata/sf0.001"
    hostile = [NAN, INF, -INF, 1e17]
    dates = [
        _D(1994, 6, 15), _D(1995, 3, 10), _D(1995, 9, 15), _D(1996, 6, 15)
    ]
    benign = {
        "l_quantity": 10.0, "l_extendedprice": 1000.0,
        "l_discount": 0.06, "l_tax": 0.04,
    }
    from ema_bigdata_spark.sources.tables import TABLES

    for t in TABLES:
        if t not in _TPCH_POISON and t != "events":
            shutil.copy(f"{src}/{t}.parquet", f"{root}/{t}.parquet")
            continue
        df = spark.read.parquet(f"{src}/{t}.parquet")
        base = df.limit(1).collect()[0].asDict()
        rows = []
        if t == "events":
            for i, h in enumerate(hostile):
                d = dict(base)
                d["event_id"] = 10_000_000 + i
                d["ts"] = _D(2024, 1, 2, 6, i)
                d["value"] = h
                rows.append(tuple(d[f.name] for f in df.schema.fields))
        else:
            for ci, c in enumerate(_TPCH_POISON[t]):
                for hi, h in enumerate(hostile):
                    d = dict(base)
                    for b, v in benign.items():
                        if b in d:
                            d[b] = v
                    d[c] = h
                    for dc in ("l_shipdate", "o_orderdate"):
                        if dc in d:
                            d[dc] = dates[(ci + hi) % 4]
                    rows.append(
                        tuple(d[f.name] for f in df.schema.fields)
                    )
        out = df.unionByName(spark.createDataFrame(rows, df.schema))
        tmp = f"{root}/_{t}"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")
        assert len(part) == 1
        shutil.move(part[0], f"{root}/{t}.parquet")
        shutil.rmtree(tmp)
    return str(root)


@pytest.fixture(scope="module")
def tpch_duck(tpch_dir):
    import duckdb

    from ema_bigdata_spark.sources.tables import TABLES

    duck = duckdb.connect()
    for table in TABLES:
        duck.execute(
            f"CREATE VIEW {table} AS SELECT * FROM"
            f" read_parquet('{tpch_dir}/{table}.parquet')"
        )
    return duck


class TestTpchNonFinite:
    @pytest.mark.parametrize("name", _TPCH_QUERIES)
    def test_parity(self, spark, tpch_duck, tpch_dir, name):
        from tests.oracle import compare_query

        compare_query(spark, tpch_duck, tpch_dir, name)

    def test_price_bucket_nulls_not_garbage(self, spark, tpch_dir):
        """Spark's builtin floor(DOUBLE) would emit 0 for NaN and
        Long.MAX for +Inf (JVM d2l) — the floor_long form must emit
        NULL, never a silently-wrong bucket."""
        rows = registry.QUERIES["q_math_funcs"](spark, tpch_dir).collect()
        buckets = [r.price_bucket for r in rows if r.price_bucket is not None]
        assert 9223372036854775807 not in buckets
        # the 1e17 price row is a VALID bucket (floor fits BIGINT)
        assert 100000000000000 in buckets
        n_null = sum(1 for r in rows if r.price_bucket is None)
        # exactly the NaN/+Inf/-Inf extendedprice rows (sf0.001 has
        # no NULL prices)
        assert n_null == 3


class TestIgnoredSemantics:
    """The declared behavior as exact values, not just parity."""

    def test_mean_ignores_nonfinite(self, spark, nf_dir):
        row = registry.QUERIES["q_mean"](spark, nf_dir).first()
        # in-domain values: 10,20 | 5,7 | 40,44 | 31,32.5,33.25 →
        # 222.75/9 — the NaN/±Inf rows AND the 1e17 beyond-headroom
        # row are all ignored
        assert row.mean_value == round(222.75 / 9, 6)

    def test_variance_denominator_counts_only_finite(self, spark, nf_dir):
        row = registry.QUERIES["q_variance_pop"](spark, nf_dir).first()
        vals = [10.0, 20.0, 5.0, 7.0, 40.0, 44.0, 31.0, 32.5, 33.25]
        m = sum(vals) / len(vals)
        expected = sum((v - m) ** 2 for v in vals) / len(vals)
        assert math.isclose(row.var_pop_value, expected, abs_tol=1e-6)

    def test_running_sum_skips_nonfinite_rows(self, spark, nf_dir):
        rows = {
            r.event_id: r.running_value
            for r in registry.QUERIES["q_window_running"](
                spark, nf_dir
            ).collect()
        }
        # user 1: the NaN/±Inf rows contribute nothing; the running
        # sum carries 30.0 through events 3-5 (rows still emitted)
        assert rows[2] == 30.0 and rows[3] == 30.0 and rows[5] == 30.0

    def test_ttest_arm_size_excludes_nonfinite(self, spark, nf_dir):
        row = registry.QUERIES["q_ab_ttest"](spark, nf_dir).first()
        # click arm: finite 5, 7, 32.5 → n1=3, mean 14.833333; view
        # arm: finite 10, 20, 31 → n2=3, mean 20.333333 (the NaN/Inf
        # rows and user 3's NULL-value row are excluded from n, s,
        # and q alike)
        assert (row.n1, row.n2) == (3, 3)
        assert row.mean1 == 14.833333 and row.mean2 == 20.333333

    def test_profiling_drops_out_of_domain_rows(self, spark, nf_dir):
        out = registry.QUERIES["q_winsorize"](spark, nf_dir).collect()
        ids = {r.event_id for r in out}
        # NaN/±Inf rows AND the 1e17 beyond-snap-domain row excluded
        assert ids.isdisjoint({3, 4, 13, 25})
        assert {1, 2, 10, 12, 14, 15, 22, 23, 24} <= ids


class TestFloorLongBoundaries:
    """floor_long ↔ sql_floor_long parity on the double-domain edges.

    The r8 form broke on tiny negatives (ADVICE r8): for
    y ∈ (-2^-54, 0) its ``y % 1 + 1`` rounded to exactly 1.0 and the
    cast truncated to 0 where floor is -1 — a cross-engine break on
    price_bucket.  This battery pins the corrected negative-fraction
    CASE form on every boundary class; a 60k-sample fuzz (random bit
    patterns included) ran clean at fix time (ROUND9_NOTES).
    """

    #: tiny negatives (the r8 bug), signed zeros, halves, exact-double
    #: edges at 2^52/2^53, BIGINT overflow edges, non-finites
    _BATTERY = [
        -1e-17, -(2.0 ** -54), -(2.0 ** -53), -(2.0 ** -52),
        -0.5, -2.5, 2.5, 0.0, -0.0, 1e-17,
        -1.0 - 2.0 ** -52, 1.0 - 2.0 ** -53, -(1.0 - 2.0 ** -53),
        2.0 ** 52, -(2.0 ** 52), 2.0 ** 52 - 0.5, -(2.0 ** 52) - 0.5,
        -(2.0 ** 52) + 0.5, 2.0 ** 53, -(2.0 ** 53),
        9.223372036854775e18, -9.223372036854776e18, 1e22, -1e22,
        NAN, INF, -INF,
    ]

    def test_boundary_battery_matches_duckdb(self, spark):
        import duckdb

        from ema_bigdata_spark.functions.parity import (
            floor_long,
            sql_floor_long,
        )

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self._BATTERY)],
            "i long, y double",
        )
        got = {
            r.i: r.f
            for r in df.select("i", floor_long("y").alias("f")).collect()
        }
        duck = duckdb.connect()
        try:
            for i, v in enumerate(self._BATTERY):
                want = duck.execute(
                    f"SELECT {sql_floor_long('CAST(? AS DOUBLE)')}", [v]
                ).fetchone()[0]
                assert got[i] == want or (got[i] is None and want is None), (
                    f"y={v!r}: spark={got[i]!r} duck={want!r}"
                )
        finally:
            duck.close()
        # the r8 regression, pinned by value: floor(-1e-17) is -1
        assert got[0] == -1 and got[1] == -1
