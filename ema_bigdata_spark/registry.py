"""Query registry: the single source of truth for the tested contract.

Every operator from ``SURVEY.md §2`` registers here with its Spark
implementation and (when SQL-expressible) its DuckDB oracle SQL.
``__spark_entry__.py`` simply re-exports the two dicts.

Convention (driver hash-compare requirements):
- every computed column is aliased identically in Spark and oracle SQL;
- every float output is ``round(x, N)`` on BOTH sides (default N=6);
- integer-ish computed outputs are cast to BIGINT on both sides;
- no unseeded randomness anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Round-4 verification priority.  The external driver records a
#: CORRECTNESS row for only the FIRST 50 names in ``queries()`` order.
#: After r3, every one of the 113 queries has at least one official
#: green row (r1∪r2∪r3), so the rotation goal shifts from
#: "never-green first" to "stalest-official-row first" (VERDICT r3
#: §Next-1) plus "changed-this-round first" (a refactored query's old
#: green row no longer certifies today's code).  Head = the 16 queries
#: whose newest green row is still r1 (joins + SQL subqueries +
#: profile + exact-dedup trio + ngram_jaccard), then the 4 queries
#: materially changed in r4 (real BMP/WAV decode in the mm pair,
#: shifted-variance value_outliers, re-planned minhash_jaccard_est),
#: then the oldest r2 rows (reference Part A, relational families).
#: The remaining r2-green scalar/text/window queries rotate in r5;
#: after that every official row is ≤2 rounds old in steady state.
#: The four r4 ADDITIONS (pii_scrub / topk_ngrams / semdedup /
#: winsorize) lead: never-green beats green-once, same rule r3 applied.
_CHECK_WINDOW: tuple[str, ...] = (
    # — new in r4, never checked (4) —
    "q_pii_scrub", "q_topk_ngrams", "q_semdedup", "q_winsorize",
    # — newest official green row is r1 (16) —
    "q_join_inner", "q_join_broadcast", "q_join_left", "q_join_semi",
    "q_join_anti", "q_join_full", "q_join_cross",
    "q_sql_exists", "q_sql_scalar_subquery",
    "q_sql_tpch_q3", "q_sql_tpch_q5",
    "q_profile_table",
    "q_dedup_exact", "q_dedup_exact_hash", "q_dedup_incremental",
    "q_ngram_jaccard",
    # — code materially changed in r4; re-certify on new code (4) —
    "q_mm_features", "q_mm_frames", "q_value_outliers",
    "q_minhash_jaccard_est",
    # — oldest r2 rows: reference Part A (9) —
    "q_scan_count", "q_mean", "q_variance_pop", "q_init_means",
    "q_loglik_fixed", "q_gamma_fixed", "q_mstep_weight_fixed",
    "q_mstep_mean_fixed", "q_mstep_var_fixed",
    # — oldest r2 rows: relational family (16) —
    "q_filter_project", "q_pricing_summary", "q_agg_distinct",
    "q_rollup", "q_cube", "q_sort_limit", "q_union", "q_intersect",
    "q_except", "q_corr_stats", "q_percentiles", "q_pivot",
    "q_grouping_sets", "q_events_hourly", "q_unpivot", "q_having",
    # — oldest r2 rows: scalar functions (1 of 5; rest r5) —
    "q_string_funcs",
)

#: kept as an alias for external docs that referenced the r3 name
_R3_CHECK_WINDOW = _CHECK_WINDOW


def load_all() -> None:
    """Import every operator module so registrations run, then reorder
    ``QUERIES`` so the driver's 50-row check window
    (``_CHECK_WINDOW``) comes first — see that constant's docstring.
    Idempotent: imports are cached and the reorder is deterministic.
    """
    from ema_bigdata_spark.operators import reference  # noqa: F401
    from ema_bigdata_spark.operators import (  # noqa: F401
        relational,
        scalars,
        text,
        windows,
    )
    from ema_bigdata_spark.operators import (  # noqa: F401
        analytics,
        joins,
        profiling,
        similarity,
    )
    from ema_bigdata_spark.operators import multimodal  # noqa: F401
    from ema_bigdata_spark.operators import dedup  # noqa: F401
    from ema_bigdata_spark import gmm  # noqa: F401
    from ema_bigdata_spark.streaming import stream_queries  # noqa: F401

    missing = [n for n in _CHECK_WINDOW if n not in QUERIES]
    if missing:  # typo guard: a misspelled window entry must fail loudly
        raise RuntimeError(f"_CHECK_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _CHECK_WINDOW}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
