"""Sources and sinks: the reference's native text format
(Main.scala:40-41) and the engine's durable writers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ema_bigdata_spark.sources.sinks import (
    write_csv,
    write_json,
    write_parquet,
)
from ema_bigdata_spark.sources.textfile import read_doubles_text


@pytest.fixture
def doubles_file(tmp_path):
    p = tmp_path / "dataset-mini.txt"
    p.write_text("1.5\n-2.25\n3.0\n0.125\n")
    return str(p)


def test_read_doubles_text(spark, doubles_file):
    df = read_doubles_text(spark, doubles_file)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["double"]
    vals = sorted(r.value for r in df.collect())
    assert vals == [-2.25, 0.125, 1.5, 3.0]


def test_read_doubles_text_lenient(spark, tmp_path):
    p = tmp_path / "dirty.txt"
    p.write_text("1.0\nnot-a-number\n2.0\n\n")
    df = read_doubles_text(spark, str(p), strict=False)
    assert sorted(r.value for r in df.collect()) == [1.0, 2.0]


def test_gmm_on_reference_format(spark, tmp_path):
    """End-to-end parity with the reference's entry path: text file of
    doubles → EM fit (Main.scala:40-45), on a tiny two-mode sample."""
    from ema_bigdata_spark.gmm import gmm_fit

    vals = [0.0, 0.1, -0.1, 0.05, 10.0, 10.1, 9.9, 10.05]
    p = tmp_path / "sample.txt"
    p.write_text("\n".join(str(v) for v in vals) + "\n")
    model = gmm_fit(read_doubles_text(spark, str(p)), k=2, max_iter=25)
    assert abs(min(model.means) - 0.0) < 0.5
    assert abs(max(model.means) - 10.0) < 0.5


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    from ema_bigdata_spark.sources.tables import load_table

    out = str(tmp_path / "nation_by_region")
    src = load_table(spark, sf_dir, "nation")
    write_parquet(src, out, partition_by=("n_regionkey",))
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    # partition pruning: reading one key touches only that directory
    pruned = back.where(F.col("n_regionkey") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == src.where("n_regionkey = 0").count()
    assert "PartitionFilters: [isnotnull(n_regionkey" in plan


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    from ema_bigdata_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "region")
    write_csv(src, str(tmp_path / "r_csv"))
    write_json(src, str(tmp_path / "r_json"))
    assert (
        spark.read.option("header", "true").csv(str(tmp_path / "r_csv")).count()
        == src.count()
    )
    assert spark.read.json(str(tmp_path / "r_json")).count() == src.count()


def test_orc_roundtrip_pushes_filters(spark, sf_dir, tmp_path):
    """ORC writes re-read losslessly AND keep predicate pushdown: the
    point of a columnar sink is that the filter reaches the scan."""
    from ema_bigdata_spark.sources.sinks import write_orc
    from ema_bigdata_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "orders")
    write_orc(src, str(tmp_path / "o_orc"))
    back = spark.read.orc(str(tmp_path / "o_orc"))
    assert back.count() == src.count()
    filt = back.where(F.col("o_orderpriority") == "1-URGENT")
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority," in plan
    assert filt.count() == src.where("o_orderpriority = '1-URGENT'").count()


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables joined on the bucket key need no exchange: the
    files are already hash-partitioned, so the sort-merge join reads
    them bucket-by-bucket (the 100 TB co-located-join strategy)."""
    from ema_bigdata_spark.sources.sinks import write_bucketed_table
    from ema_bigdata_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed_table(cust, "b_cust", "c_custkey", buckets=4)
    write_bucketed_table(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "b_orders", "c_custkey", buckets=4,
    )
    joined = (
        spark.table("b_cust").join(spark.table("b_orders"), "c_custkey")
        .groupBy("c_mktsegment").count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # broadcast threshold may still pick BHJ; force the check only on
    # the merge-join path by disabling broadcast for this plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table("b_cust").join(spark.table("b_orders"), "c_custkey")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_cust")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_sorted_write_clusters_row_groups(spark, sf_dir, tmp_path):
    """Rows sorted within files → parquet column chunk min/max ranges
    are narrow, the precondition for row-group skipping on range
    filters."""
    import pyarrow.parquet as pq

    from ema_bigdata_spark.sources.sinks import write_sorted_parquet
    from ema_bigdata_spark.sources.tables import load_table

    out = str(tmp_path / "orders_sorted")
    src = load_table(spark, sf_dir, "orders").repartition(4)
    write_sorted_parquet(src, out, ("o_totalprice",))
    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 2
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_totalprice"
            )
            stats = col.statistics
            assert stats.has_min_max and stats.min <= stats.max
    back = spark.read.parquet(out)
    assert back.count() == src.count()


def test_ivf_partitioned_index_prunes_unprobed_lists(spark, sf_dir, tmp_path):
    """Substantiates the q_ann_ivf docstring's scale claim: writing the
    corpus partitioned by ivf_list turns the nprobe filter into
    PARTITION PRUNING — the plan reads only the probed lists'
    directories, zero I/O for the rest."""
    from pyspark.sql import functions as F

    from ema_bigdata_spark.operators.similarity import (
        _IVF_LISTS,
        _ivf_centroids,
        _with_assignment,
    )
    from ema_bigdata_spark.plans import executed_plan
    from ema_bigdata_spark.sources.tables import load_table

    out = str(tmp_path / "ivf_index")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    _with_assignment(spark, emb, cents).write.partitionBy("ivf_list").parquet(
        out
    )
    indexed = spark.read.parquet(out)
    probe_lists = [1, 2]
    plan = executed_plan(
        indexed.where(F.col("ivf_list").isin(probe_lists)).select("vec_id")
    )
    # pruning happened at PLAN time: the partition filter is present and
    # the file index selected only the probed directories
    assert "PartitionFilters: [ivf_list" in plan
    import glob

    n_dirs = len(glob.glob(f"{out}/ivf_list=*"))
    assert n_dirs >= _IVF_LISTS // 2  # the index actually fanned out
    # count files the scan selected: Spark reports selected partitions
    # in the FileIndex; cheapest check is the row count equivalence
    got = indexed.where(F.col("ivf_list").isin(probe_lists)).count()
    want = (
        _with_assignment(spark, emb, cents)
        .where(F.col("ivf_list").isin(probe_lists))
        .count()
    )
    assert got == want > 0


def test_spread_fallback_and_memoization(spark, sf_dir, tmp_path):
    """The r2-advice spread() guard: few-file inputs consult the real
    split count (and widen when narrow), many-file inputs take the
    fast path untouched, and the fallback verdict is memoized per
    (files, n) so repeated spreads don't re-pay the RDD translation."""
    from ema_bigdata_spark.sources import tables as T
    from ema_bigdata_spark.sources.tables import load_table

    # few files, narrow splits -> widened to n
    src = load_table(spark, sf_dir, "nation")
    src.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
    df = spark.read.parquet(str(tmp_path / "one"))
    assert T.spread(df, 4).rdd.getNumPartitions() == 4
    key = (tuple(sorted(df.inputFiles())), 4)
    assert T._SPREAD_CACHE.get(key) is False  # verdict memoized
    # many tiny files (>= n) -> fast path, NO repartition exchange
    src.repartition(6).write.mode("overwrite").parquet(str(tmp_path / "many"))
    many = spark.read.parquet(str(tmp_path / "many"))
    assert len(many.inputFiles()) >= 4
    plan = many._jdf.queryExecution().executedPlan().toString()
    spread_plan = (
        T.spread(many, 4)._jdf.queryExecution().executedPlan().toString()
    )
    assert "RoundRobinPartitioning" not in spread_plan
    assert plan.splitlines()[0] == spread_plan.splitlines()[0]


class TestStreamSourceSeam:
    """The Kafka seam (stream_queries.stream_source): queries are
    source-agnostic; a config flips the SAME code from the local file
    source to a Kafka subscription.  No broker in this container, so
    the kafka branch is verified at its two contract points — the
    reader configuration and the wire-format decode — plus the default
    dispatch."""

    def test_default_is_file_stream(self, spark, sf_dir):
        from ema_bigdata_spark.streaming.stream_queries import stream_source

        df = stream_source(spark, sf_dir)
        assert df.isStreaming
        assert "user_id" in df.columns and "event_id" in df.columns

    def test_wire_schema_matches_testdata(self, spark, sf_dir):
        """The DECLARED Kafka wire schema (no local files needed on a
        broker deploy — review-r4 fix) must not drift from the actual
        events table shape the file source reads."""
        from pyspark.sql.types import StructType

        from ema_bigdata_spark.sources.tables import load_raw
        from ema_bigdata_spark.streaming.stream_queries import (
            _WIRE_SCHEMAS,
        )

        declared = StructType.fromDDL(_WIRE_SCHEMAS["events"])
        actual = load_raw(spark, sf_dir, "events").schema
        assert [f.name for f in declared] == [f.name for f in actual]
        # dtypes match too on modern testdata (a legacy raw-nanos LONG
        # ts file would differ — that variant is file-source-only)
        assert declared == actual

    def test_kafka_reader_configuration(self, monkeypatch):
        from ema_bigdata_spark.streaming.stream_queries import (
            _configure_kafka,
        )

        class FakeReader:
            def __init__(self):
                self.fmt = None
                self.opts = {}

            def format(self, f):
                self.fmt = f
                return self

            def option(self, k, v):
                self.opts[k] = v
                return self

        monkeypatch.setenv("SPARK_GRAFT_KAFKA_BOOTSTRAP", "k1:9092,k2:9092")
        monkeypatch.setenv("SPARK_GRAFT_KAFKA_TOPIC_EVENTS", "prod.events.v2")
        r = _configure_kafka(FakeReader(), "events")
        assert r.fmt == "kafka"
        assert r.opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
        assert r.opts["subscribe"] == "prod.events.v2"
        assert r.opts["startingOffsets"] == "earliest"
        # topic defaults to the table name without the env override
        monkeypatch.delenv("SPARK_GRAFT_KAFKA_TOPIC_EVENTS")
        r2 = _configure_kafka(FakeReader(), "events")
        assert r2.opts["subscribe"] == "events"

    def test_kafka_payload_decode_roundtrip(self, spark, sf_dir):
        """The value-bytes→typed-columns decode must invert to_json on
        real event rows (same expression batch vs stream, so a batch
        round-trip IS the contract check)."""
        from pyspark.sql import functions as F

        from ema_bigdata_spark.sources.tables import load_raw
        from ema_bigdata_spark.streaming.stream_queries import _kafka_parse

        from ema_bigdata_spark.streaming.stream_queries import (
            _KAFKA_JSON_OPTS,
        )

        batch = load_raw(spark, sf_dir, "events").limit(50)
        wire = batch.select(
            F.encode(
                F.to_json(F.struct(*batch.columns), _KAFKA_JSON_OPTS),
                "utf-8",
            ).alias("value")
        )
        back = _kafka_parse(wire, batch.schema)
        assert back.schema == batch.schema
        a = sorted(map(repr, batch.collect()))
        b = sorted(map(repr, back.collect()))
        assert a == b

    def test_kafka_undeclared_table_is_a_clean_error(
        self, spark, sf_dir, monkeypatch
    ):
        """ADVICE r4: a table with no declared wire schema must fail
        with a descriptive ValueError naming the table and the
        declared set — not a bare KeyError from _WIRE_SCHEMAS."""
        import pytest

        from ema_bigdata_spark.streaming.stream_queries import (
            stream_source,
        )

        monkeypatch.setenv("SPARK_GRAFT_STREAM_SOURCE", "kafka")
        with pytest.raises(ValueError, match="wire schema.*lineitem"):
            stream_source(spark, sf_dir, table="lineitem")
