#!/usr/bin/env python
"""Scaling probe: does per-row cost stay flat as data grows?

Replicates ``events`` in memory by ``--factor`` (default 32, with
shifted event_ids) and times representative operators at 1× and N× on
the same cores, printing one JSON line.  A plan that is actually
O(rows) shows time growth ≪ N at bench scale (fixed overhead
amortizes); a plan hiding an O(n²) or a driver-side loop shows
superlinear growth here long before it kills a 100 TB run.

The range join's time is expected to track its OUTPUT (candidate
pairs): replication multiplies per-user density, so pairs grow ~N²
while time should grow far slower — that gap is the evidence the equi
conjunct is doing its job.

Usage: python bench_scaling.py [--factor N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(thunk) -> float:
    best = float("inf")
    for _ in range(2):  # min-of-2: drop one-time codegen (see bench.py)
        t0 = time.monotonic()
        thunk()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


#: dedup/similarity queries probed across sf0.01 → sf0.1 (10× docs):
#: the banded self-joins are the only places superlinear behavior
#: could hide (VERDICT r2 stretch item).  The reported exponent is
#: log10(t_big/t_small) for a 10× input — ≤ ~1.2 means the candidate
#: generation is tracking rows, not pairs.  Sub-second fixed overhead
#: (session, codegen) deflates the exponent at this scale, so treat it
#: as a superlinearity ALARM (exponent ≫ 1), not a precise slope.
_FAMILY_QUERIES = (
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_ngram_jaccard",
    "q_minhash_jaccard_est",
    "q_embed_dup",
    "q_similarity_topk",
    # r3 additions with corpus-wide self-reference (checkpointed
    # vocab/grid/band-index) — the two-pass structure must also track
    # rows
    "q_unigram_lm",
    "q_dup_spans",
    "q_dedup_incremental_near",
    # r4 additions: semdedup's (label, sig)-blocked self-join and the
    # n-gram pre-aggregate are the two new places a pair blow-up could
    # hide; pii_scrub pins the zero-shuffle projection's linearity
    "q_semdedup",
    "q_topk_ngrams",
    "q_pii_scrub",
    # r5 additions over documents: bm25's tokenize-twice structure and
    # char_entropy's per-char explode must track rows; rag_chunk and
    # source_interleave pin the projection/window paths; mm_histogram
    # prices the real decode per row (linear by construction, but a
    # per-batch pathology would show here)
    "q_bm25",
    "q_char_entropy",
    "q_rag_chunk",
    "q_source_interleave",
    "q_mm_histogram",
    # r5 second batch: pagerank's edge volume and ann_pq's encode
    # projection are the two places cost could outgrow rows; skyline
    # pins the bucket-prescreen (an O(n²) regression would explode)
    "q_pagerank",
    "q_ann_pq",
    "q_skyline",
    # r5 third batch: bigram_lm's pair explode + cost join must track
    # token count (a vocab² blow-up would show); bpe_pairs must stay
    # vocab-bound (near-flat); cdc_merge/gapfill/event_transitions pin
    # the window+join paths; embed_covariance is linear-by-construction
    # with a heavy d²/2 constant — superlinearity here means the
    # map-side combine stopped combining; weighted_sample pins the
    # projection+rank-window path
    "q_bigram_lm",
    "q_bpe_pairs",
    "q_cdc_merge",
    "q_gapfill",
    "q_event_transitions",
    "q_embed_covariance",
    "q_weighted_sample",
)


def family_scaling(spark, repeats: int = 2) -> dict:
    """sf0.01 → sf0.1 exponents for the broad family list.  Min-of-N
    per scale with the repeat spread recorded (r8, ADVICE — same
    discipline as :func:`_probe_10x`)."""
    import math

    from ema_bigdata_spark import registry

    registry.load_all()

    def _min_of(fn, sf_dir):
        ts = [_timed(lambda: _noop(fn(spark, sf_dir)))
              for _ in range(repeats)]
        return min(ts), round(max(ts) - min(ts), 3)

    out = {}
    for name in _FAMILY_QUERIES:
        fn = registry.QUERIES[name]
        t_small, spread_small = _min_of(fn, "/root/testdata/sf0.01")
        t_big, spread_big = _min_of(fn, "/root/testdata/sf0.1")
        out[name] = {
            "sec_sf0.01": t_small,
            "sec_sf0.1": t_big,
            "spread_sf0.01": spread_small,
            "spread_sf0.1": spread_big,
            "exponent_10x": round(math.log10(max(t_big, 1e-3) /
                                             max(t_small, 1e-3)), 2),
        }
    return out


#: VERDICT r4 §Next-3: the two highest measured 10× exponents
#: (q_topk_ngrams 0.39, q_pii_scrub 0.38) get TWO MORE DECADES of data
#: to show they flatten toward I/O-linear — both read only
#: ``documents``, so the probe replicates sf0.1 documents 10× and 100×
#: (shifted doc_ids, a per-replica marker token so the vocabulary
#: grows a little instead of being a pure count multiplier) into real
#: parquet directories and times sf0.1 → sf1 → sf10.  At sf0.1 the
#: whole table is ~7 MB and fixed overhead owns the time (that's what
#: the 0.38-0.39 "exponents" were); by sf10 (~0.7 GB, 500 k docs) the
#: per-row CPU finally dominates, so the LAST decade's exponent is the
#: honest slope.
#: r5 late additions: the two highest family-probe exponents of the
#: new surface — q_char_entropy 0.67-0.68 (per-char explode CPU) and
#: q_bigram_lm 0.23 (pair explode + cost join) — get the same
#: two-extra-decades treatment; both read only ``documents``.
_DECADE_QUERIES = (
    "q_topk_ngrams", "q_pii_scrub", "q_char_entropy", "q_bigram_lm"
)


def _make_big_documents(spark, out_dir: str, factor: int) -> int:
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    mx = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    big = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * mx))
            .withColumn(
                "text", F.concat("text", F.lit(f" replica{i}"))
            )
            for i in range(factor)
        ],
    )
    (
        big.repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    return spark.read.parquet(f"{out_dir}/documents.parquet").count()


def decade_scaling(spark, work_dir: str) -> dict:
    import math

    from ema_bigdata_spark import registry

    registry.load_all()
    n1 = _make_big_documents(spark, f"{work_dir}/sf1", 10)
    n10 = _make_big_documents(spark, f"{work_dir}/sf10", 100)
    out = {"sf1_rows": n1, "sf10_rows": n10}

    def expo(big, small):
        return round(
            math.log10(max(big, 1e-3) / max(small, 1e-3)), 2
        )

    for name in _DECADE_QUERIES:
        fn = registry.QUERIES[name]
        t_01 = _timed(lambda: _noop(fn(spark, "/root/testdata/sf0.1")))
        t_1 = _timed(lambda: _noop(fn(spark, f"{work_dir}/sf1")))
        t_10 = _timed(lambda: _noop(fn(spark, f"{work_dir}/sf10")))
        out[name] = {
            "sec_sf0.1": t_01,
            "sec_sf1": t_1,
            "sec_sf10": t_10,
            "exponent_sf0.1_to_sf1": expo(t_1, t_01),
            "exponent_sf1_to_sf10": expo(t_10, t_1),
        }
    return out


#: r6 probes (VERDICT r5 §Next-7): the two heaviest remaining unprobed
#: ops.  q_pagerank's per-iteration cost is edges⋈ranks — a 10× graph
#: (orders+lineitem replicated with shifted keys → 10× nodes AND 10×
#: edges) must show ~linear growth or the checkpointed-invariant
#: design is leaking; q_embed_covariance is d²/2 multiplies per row
#: with a ≤2 080-key exchange — 10× embeddings rows must be ~linear
#: (its r5 exponent 0.47 was measured once, under load).
def _make_big_graph(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    mo = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    mc = o.agg(F.max("o_custkey")).collect()[0][0] + 1
    ms = li.agg(F.max("l_suppkey")).collect()[0][0] + 1
    big_o = reduce(
        lambda a, b: a.unionByName(b),
        [
            o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * mo))
            .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * mc))
            for i in range(factor)
        ],
    )
    big_li = reduce(
        lambda a, b: a.unionByName(b),
        [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * mo))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * ms))
            for i in range(factor)
        ],
    )
    big_o.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )
    big_li.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )


def _make_big_embeddings(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    mx = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    big = reduce(
        lambda a, b: a.unionByName(b),
        [
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * mx))
            for i in range(factor)
        ],
    )
    big.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def _probe_10x(spark, names, big_dir: str, repeats: int = 2,
               small_dir: str = "/root/testdata/sf0.1") -> dict:
    """ONE copy of the sf0.1 → 10×-fixture timing/exponent loop (the
    r7 review caught r6_scaling/r7_scaling carrying verbatim copies —
    a methodology fix like the 1e-3 clamp must not need three edits).

    Min-of-``repeats`` per scale (r8, ADVICE): a single one-shot
    timing lets one GC pause or co-tenant blip move the recorded
    exponent directly; min-of-N is bench.py's own discipline.  The
    per-scale repeat spread is recorded alongside so a reader can see
    how noisy the floor was."""
    import math

    from ema_bigdata_spark import registry

    registry.load_all()

    def _min_of(fn, sf_dir):
        ts = [_timed(lambda: _noop(fn(spark, sf_dir)))
              for _ in range(repeats)]
        return min(ts), round(max(ts) - min(ts), 3)

    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        t_01, spread_01 = _min_of(fn, small_dir)
        t_1, spread_1 = _min_of(fn, big_dir)
        out[name] = {
            "sec_sf0.1": t_01,
            "sec_sf1_10x": t_1,
            "spread_sf0.1": spread_01,
            "spread_sf1_10x": spread_1,
            "exponent_10x": round(
                math.log10(max(t_1, 1e-3) / max(t_01, 1e-3)), 2
            ),
        }
    return out


def r6_scaling(spark, work_dir: str) -> dict:
    _make_big_graph(spark, f"{work_dir}/sf1", 10)
    _make_big_embeddings(spark, f"{work_dir}/sf1", 10)
    return _probe_10x(
        spark, ("q_pagerank", "q_embed_covariance"), f"{work_dir}/sf1"
    )


#: r7 probes (VERDICT r6 item 5): the four largest bench entries still
#: without a measured exponent.  q_mm_png prices the pure-Python PNG
#: codec per row (embarrassingly parallel — must be ~linear);
#: s_stream_join's state volume tracks per-user event density, so the
#: 10× fixture shifts user_ids too (10× users at constant density —
#: the honest linear scale-up; replicating user_ids verbatim would
#: 10× the density and grow OUTPUT pairs ~100× by construction);
#: q_dedup_fuzzy / q_ngram_jaccard get a 10× corpus whose replicas are
#: NOT near-duplicates of each other (below) so candidate volume, not
#: just row count, scales linearly.
def _make_big_documents_disjoint(spark, out_dir: str, factor: int) -> None:
    """10× documents with cross-replica shingle Jaccard ≈ 0: each
    replica maps lowercase letters through a rotated alphabet
    (length-preserving ``translate``, so per-row tokenize/decode cost
    is bit-for-bit the original's), preserving WITHIN-replica
    duplicate density while keeping replicas out of each other's
    shingle buckets.  The verbatim-replication fixture
    (:func:`_make_big_documents`) is wrong for dedup probes: it makes
    every original a factor-way near-dup family, growing true pairs
    ~factor²/2 — an output-volume artifact, not a plan property."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    mx = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    alpha = "abcdefghijklmnopqrstuvwxyz"
    big = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * mx))
            .withColumn(
                "text",
                F.translate("text", alpha, alpha[i:] + alpha[:i]),
            )
            for i in range(factor)
        ],
    )
    big.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def _make_big_events(spark, out_dir: str, factor: int) -> None:
    """10× events as a single FILE named events.parquet: the streaming
    source seam (stream_queries.stream_source) selects its input with
    ``pathGlobFilter=events.parquet``, which matches testdata's
    one-file-per-table layout but NOT a part-file directory — a
    directory fixture makes the stream read ZERO rows and the probe
    time nothing (how the first r7 probe run failed).  One file = one
    micro-batch, the same shape the sf0.1 baseline runs."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    me, mu = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
    me, mu = me + 1, mu + 1
    big = reduce(
        lambda a, b: a.unionByName(b),
        [
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * me))
            .withColumn("user_id", F.col("user_id") + F.lit(i * mu))
            for i in range(factor)
        ],
    )
    tmp = f"{out_dir}/_events_build"
    big.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    # clear any pre-existing target first (r7 review): a stale
    # events.parquet DIRECTORY from an earlier run would swallow the
    # move (file lands INSIDE it) and reproduce the zero-row stream
    target = f"{out_dir}/events.parquet"
    if os.path.isdir(target):
        shutil.rmtree(target)
    elif os.path.exists(target):
        os.remove(target)
    shutil.move(part, target)
    shutil.rmtree(tmp)


#: r7 extra: the TPC-H join family at 10× FACTS.  Replication shifts
#: only the ORDER keys and keeps cust/supp/part keys unchanged (dims
#: stay 1×), so per-dim-key fact density grows 10× — the realistic
#: warehouse growth shape: join/aggregate output grows linearly while
#: group-by cardinality stays constant.  Shifting the dim FKs instead
#: (the graph fixture's approach, right for PageRank's node count)
#: would orphan every replica row at the dim joins.
def _make_big_tpch(spark, out_dir: str, factor: int) -> None:
    import shutil

    from pyspark.sql import functions as F

    src = "/root/testdata/sf0.1"
    o = spark.read.parquet(f"{src}/orders.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    mo = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    big_o = reduce(
        lambda a, b: a.unionByName(b),
        [o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * mo))
         for i in range(factor)],
    )
    big_li = reduce(
        lambda a, b: a.unionByName(b),
        [li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * mo))
         for i in range(factor)],
    )
    os.makedirs(out_dir, exist_ok=True)
    big_o.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )
    big_li.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )
    for dim in ("customer", "supplier", "part", "region", "nation"):
        shutil.copyfile(
            f"{src}/{dim}.parquet", f"{out_dir}/{dim}.parquet"
        )


def tpch_scaling(spark, work_dir: str) -> dict:
    _make_big_tpch(spark, f"{work_dir}/sf1t", 10)
    return _probe_10x(
        spark,
        ("q_pricing_summary", "q_sql_tpch_q3", "q_sql_tpch_q5",
         "q_sql_tpch_q9", "q_sql_tpch_q21"),
        f"{work_dir}/sf1t",
    )


def r7_scaling(spark, work_dir: str) -> dict:
    _make_big_documents_disjoint(spark, f"{work_dir}/sf1d", 10)
    _make_big_events(spark, f"{work_dir}/sf1d", 10)
    return _probe_10x(
        spark,
        ("q_mm_png", "s_stream_join", "q_dedup_fuzzy", "q_ngram_jaccard"),
        f"{work_dir}/sf1d",
    )


def sf1_heavy_scaling(spark, work_dir: str) -> dict:
    """r10 (VERDICT r9 item 5): the heavy families at sf1 — one
    decade past the per-round bench scale (10× sf0.1 = 100× sf0.01) —
    probing CAP behavior, not just time: dedup LSH on the disjoint
    10× corpus, dedup clustering, pagerank on a 10× graph, covariance
    on 10× embeddings, and the global-vs-day-bucket sessionizer.
    Alongside the exponents, the minhash band-cap drop volumes
    (``lsh_band_stats``) are recorded at BOTH scales so the
    bounded-quadratic claim is measured, not asserted: the published
    number is how many band buckets the ``_BAND_CAP`` stop-shingle
    rule removed from the self-join at each scale."""
    import math

    from pyspark.sql import functions as F

    from ema_bigdata_spark.operators import dedup as dd
    from ema_bigdata_spark.operators.windows import sessionize

    big = f"{work_dir}/sf1h"
    _make_big_documents_disjoint(spark, big, 10)
    _make_big_graph(spark, big, 10)
    _make_big_embeddings(spark, big, 10)
    out: dict = {
        "probes": _probe_10x(
            spark,
            ("q_dedup_minhash", "q_ngram_jaccard", "q_dedup_cluster",
             "q_pagerank", "q_embed_covariance"),
            big,
        )
    }

    # band-cap drop volumes at both scales (the scale path's safety
    # valve — a growing corpus must show the cap ENGAGING, or staying
    # honestly idle, never silently exploding the self-join)
    def band_stats(sf_dir: str) -> dict:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bands = dd._banded(
            dd._minhash_signatures(
                docs.withColumn("shingles", dd._shingles())
            ),
            [],
        )
        return dd.lsh_band_stats(bands, ("band", "bsig"))

    out["lsh_band_stats"] = {
        "sf0.1": band_stats("/root/testdata/sf0.1"),
        "sf1": band_stats(big),
    }

    # sessionizer: global single-window form vs the day-bucket
    # hot-key mitigation, both at sf0.1 and 10× (library callables,
    # not registry queries — probed directly)
    ev_big = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet("/root/testdata/sf0.1/events.parquet")
            .select("user_id", "ts", "event_id")
            .withColumn("event_id", F.col("event_id") + F.lit(i * 10**9))
            .withColumn("user_id", F.col("user_id") + F.lit(i * 10**6))
            for i in range(10)
        ],
    )
    ev_big.repartition(32).write.mode("overwrite").parquet(
        f"{big}/events_batch.parquet"
    )
    sess = {}
    for mode, flag in (("global", False), ("day_bucket", True)):
        t_small = _timed(lambda: _noop(sessionize(
            spark.read.parquet("/root/testdata/sf0.1/events.parquet")
            .select("user_id", "ts", "event_id"),
            day_bucket=flag,
        )))
        t_big = _timed(lambda: _noop(sessionize(
            spark.read.parquet(f"{big}/events_batch.parquet"),
            day_bucket=flag,
        )))
        sess[mode] = {
            "sec_sf0.1": t_small,
            "sec_sf1_10x": t_big,
            "exponent_10x": round(
                math.log10(max(t_big, 1e-3) / max(t_small, 1e-3)), 2
            ),
        }
    out["sessionize"] = sess
    return out


#: r8 skew probes (VERDICT r7 item 7): all previous probes grow
#: VOLUME uniformly; none grow SKEW.  This fixture gives events and
#: orders a zipfian key map — the hot tenant owns 10% of all rows,
#: nine warm keys 2% each, the rest uniform — at 1× (sf0.1 volumes)
#: and 10×, so the exponent measures how each plan absorbs a hot key
#: growing 10×: q_join_inner (dim join — broadcast, skew-immune by
#: plan shape), q_join_salted (explicit salt spreads the hot key),
#: q_sessionize (window partitionBy(user_id): the hot key's
#: sort-within-partition is the honest linear floor), and
#: q_compact_latest (ranking window, same shape).  Key assignment is
#: a pure hash of the row id — deterministic, no Date.now/rand.
def _make_skew_fixture(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    def zipf_key(n_tail: int):
        u = F.pmod(F.xxhash64(F.col("id")), F.lit(10_000))
        return (
            F.when(u < 1_000, F.lit(0))                      # 10% hot
            .when(u < 2_800, (u % 9) + 1)                    # 9 × 2%
            .otherwise((u % n_tail) + 10)                    # uniform tail
            .cast("long")
        )

    types = F.array(*[F.lit(t) for t in
                      ("click", "view", "purchase", "scroll", "login")])
    ev = spark.range(0, 100_000 * factor, 1, 32).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(SECOND, CAST(id % 2592000 AS INT),"
            " TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        zipf_key(1_490).alias("user_id"),
        F.element_at(
            types, (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(5)) + 1)
            .cast("int")
        ).alias("event_type"),
        (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(100_000))
         .cast("double") / 100.0).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(F.xxhash64(F.col("id") + 3), F.lit(1000))
        ).alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    orders = spark.range(0, 150_000 * factor, 1, 32).select(
        F.col("id").alias("o_orderkey"),
        zipf_key(14_990).alias("o_custkey"),
        F.when(F.pmod(F.xxhash64(F.col("id") + 4), F.lit(2)) == 0, "F")
        .otherwise("O").alias("o_orderstatus"),
        (F.pmod(F.xxhash64(F.col("id") + 5), F.lit(10_000_000))
         .cast("double") / 100.0).alias("o_totalprice"),
        F.expr(
            "timestampadd(DAY, CAST(id % 365 AS INT),"
            " TIMESTAMP_NTZ '2023-01-01 00:00:00')"
        ).alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    )
    orders.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    spark.read.parquet("/root/testdata/sf0.1/customer.parquet").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/customer.parquet")


def skew_scaling(spark, work_dir: str) -> dict:
    """Two decades: 1×→10× and 10×→100× (the second is the honest
    slope — at 1× the sub-second timings are fixed-overhead-bound and
    a flat exponent proves little; at 100× the hot tenant owns 1 M
    event rows / 1.5 M order rows and any single-task bottleneck has
    to show)."""
    names = ("q_join_inner", "q_join_salted", "q_sessionize",
             "q_compact_latest")
    _make_skew_fixture(spark, f"{work_dir}/skew1", 1)
    _make_skew_fixture(spark, f"{work_dir}/skew10", 10)
    _make_skew_fixture(spark, f"{work_dir}/skew100", 100)
    return {
        "skew_1x_to_10x": _probe_10x(
            spark, names, f"{work_dir}/skew10",
            small_dir=f"{work_dir}/skew1",
        ),
        "skew_10x_to_100x": _probe_10x(
            spark, names, f"{work_dir}/skew100",
            small_dir=f"{work_dir}/skew10",
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=32)
    ap.add_argument(
        "--families",
        action="store_true",
        help="also probe the dedup/similarity family across sf0.01->sf0.1",
    )
    ap.add_argument(
        "--decade",
        action="store_true",
        help="generate an sf1-scale documents table and probe the two"
        " highest-exponent queries across sf0.1->sf1",
    )
    ap.add_argument(
        "--decade-dir",
        default="/tmp/spark_graft_sf1",
        help="scratch dir for the generated sf1 documents parquet",
    )
    ap.add_argument(
        "--skip-base",
        action="store_true",
        help="skip the events-replication base ops (for a fast"
        " --families/--decade-only run)",
    )
    ap.add_argument(
        "--r6-probes",
        action="store_true",
        help="probe q_pagerank (10x graph) and q_embed_covariance"
        " (10x embeddings) — VERDICT r5 Next-7",
    )
    ap.add_argument(
        "--r7-probes",
        action="store_true",
        help="probe q_mm_png, s_stream_join, q_dedup_fuzzy and"
        " q_ngram_jaccard at 10x — VERDICT r6 item 5",
    )
    ap.add_argument(
        "--tpch-probes",
        action="store_true",
        help="probe the TPC-H join family at 10x facts"
        " (dims constant) — r7 extra",
    )
    ap.add_argument(
        "--sf1-heavy",
        action="store_true",
        help="probe the heavy families (dedup LSH + clustering,"
        " pagerank, covariance, sessionize modes) at sf1 with"
        " band-cap drop volumes — VERDICT r9 item 5",
    )
    ap.add_argument(
        "--skew-probes",
        action="store_true",
        help="probe the join/window family on a zipfian-key fixture"
        " (hot key = 10%% of rows) at 1x and 10x — VERDICT r7 item 7",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ema_bigdata_spark.session import get_spark

    spark = get_spark(app_name="ema-bigdata-scaling")
    out = {"factor": args.factor, "ops": {}}
    if args.skip_base:
        if args.families:
            out["families_sf001_to_sf01"] = family_scaling(spark)
        if args.decade:
            out["decade_sf01_to_sf1"] = decade_scaling(
                spark, args.decade_dir
            )
        if args.r6_probes:
            out["r6_probes"] = r6_scaling(spark, args.decade_dir)
        if args.r7_probes:
            out["r7_probes"] = r7_scaling(spark, args.decade_dir)
        if args.tpch_probes:
            out["tpch_probes"] = tpch_scaling(spark, args.decade_dir)
        if args.skew_probes:
            out["skew_probes"] = skew_scaling(spark, args.decade_dir)
        if args.sf1_heavy:
            out["sf1_heavy"] = sf1_heavy_scaling(spark, args.decade_dir)
        print(json.dumps(out))
        spark.stop()
        return

    ev1 = spark.read.parquet(f"{SF_DIR}/events.parquet")
    mx = ev1.agg(F.max("event_id")).collect()[0][0] + 1
    evn = reduce(
        lambda a, b: a.unionByName(b),
        [
            ev1.withColumn("event_id", F.col("event_id") + F.lit(i * mx))
            for i in range(args.factor)
        ],
    ).repartition(spark.sparkContext.defaultParallelism).cache()
    n_rows = evn.count()  # materialize the cache outside the timings

    def hist(df):
        return lambda: _noop(df.groupBy("value").count())

    def hourly(df):
        return lambda: _noop(
            df.groupBy(F.date_trunc("hour", "ts"), "event_type").count()
        )

    def rangejoin(df):
        a, b = df.alias("a"), df.alias("b")
        cond = (
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.event_id") > F.col("a.event_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTE"))
        )
        return lambda: _noop(
            a.join(b, cond).groupBy(F.col("a.user_id")).count()
        )

    out["rows_1x"] = n_rows // args.factor
    out["rows_nx"] = n_rows
    for name, mk in (("hist", hist), ("hourly", hourly),
                     ("range_join", rangejoin)):
        t1 = _timed(mk(ev1))
        tn = _timed(mk(evn))
        out["ops"][name] = {
            "sec_1x": t1,
            "sec_nx": tn,
            "time_growth": round(tn / t1, 2) if t1 > 0 else None,
        }
    if args.families:
        out["families_sf001_to_sf01"] = family_scaling(spark)
    if args.decade:
        out["decade_sf01_to_sf1"] = decade_scaling(spark, args.decade_dir)
    if args.r6_probes:
        out["r6_probes"] = r6_scaling(spark, args.decade_dir)
    if args.r7_probes:
        out["r7_probes"] = r7_scaling(spark, args.decade_dir)
    if args.tpch_probes:
        out["tpch_probes"] = tpch_scaling(spark, args.decade_dir)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
