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


#: Round-11 verification priority.  The external driver records a
#: CORRECTNESS row for only the FIRST 50 names in ``queries()`` order.
#: Rotation rule (steady state since r3): never-checked first, then
#: red rows / changed-this-round, then stalest-official-row (an old
#: green row doesn't certify refactored code).  Freshness invariant
#: (VERDICT r9 item 7, enforced by ``tools/check_freshness.py``): at
#: round close, no query's latest official row may predate N-3.
#:
#: This window (r11) is pure ledger rotation — the surface is
#: feature-complete (VERDICT r10: 151/151, 50/50 green) and r11 made
#: no behavior changes to these names except dropping the no-op
#: global orderBy from the four q_mm_* decode queries (VERDICT r10
#: item 3; the driver hash is order-insensitive, and q_mm_frames /
#: q_multimodal_join are in this window to certify it officially;
#: the other three q_mm_* rows are r10-fresh and hit the r13 edge):
#:
#: (1) the SIXTEEN owed r7-era rows the r10 registry docstring
#:     enumerated — they hit the N-3 edge this round, so they head
#:     the window: q_join_inner, q_join_semi, q_mm_frames,
#:     q_mstep_var_fixed, q_multimodal_join, q_ngram_jaccard,
#:     q_pii_scrub, q_pricing_summary, q_rollup, q_sql_exists,
#:     q_sql_scalar_subquery, q_sql_tpch_q3, q_sql_tpch_q5,
#:     q_string_funcs, q_topk_ngrams, q_weighted_sample.
#:
#: (2) THIRTY-FOUR of the 35 remaining r8 rows (alphabetical) —
#:     they hit the N-3 edge at r12, so refreshing them now leaves
#:     r12 owing only one name.
#:
#: OWED r12 (the single r8 row that did not fit; it hits the N-3
#: edge next round, so it MUST head the r12 window):
#: s_stream_tumbling.  Unchanged since r8; green in every full
#: driver sim since.
#:
#: (The full r9/r10 window rationales live in git history and
#: ROUND9_NOTES.md / ROUND10_NOTES.md.)
_CHECK_WINDOW: tuple[str, ...] = (
    # — (1) the 16 owed r7-era rows (N-3 edge this round) —
    "q_join_inner", "q_join_semi", "q_mm_frames", "q_mstep_var_fixed",
    "q_multimodal_join", "q_ngram_jaccard", "q_pii_scrub",
    "q_pricing_summary", "q_rollup", "q_sql_exists",
    "q_sql_scalar_subquery", "q_sql_tpch_q3", "q_sql_tpch_q5",
    "q_string_funcs", "q_topk_ngrams", "q_weighted_sample",
    # — (2) 34 of the 35 r8 rows (alphabetical; r12 edge) —
    "q_ab_ttest", "q_dedup_cluster", "q_dedup_keep_best",
    "q_dedup_minhash", "q_dedup_simhash", "q_embed_norm",
    "q_events_hourly", "q_filter_project", "q_gamma_fixed",
    "q_intersect", "q_join_cross", "q_join_left", "q_join_salted",
    "q_json_extract", "q_loglik_fixed", "q_mean",
    "q_minhash_jaccard_est", "q_mstep_mean_fixed",
    "q_mstep_weight_fixed", "q_percentiles", "q_pivot",
    "q_scan_count", "q_sessionize", "q_sort_limit",
    "q_sql_tpch_q18", "q_sql_tpch_q2", "q_union", "q_unpivot",
    "q_variance_pop", "q_window_range_frame", "q_winsorize",
    "s_stream_session", "s_stream_sliding", "s_stream_topk",
)

#: The round whose window is staged above.  ``tools/check_freshness.py``
#: (and its CI test) read this instead of inferring the round from the
#: recorded CORRECTNESS files, so committing round N's artifact does not
#: flip the tripwire before the N+1 window is actually staged
#: (ADVICE r10, tools/check_freshness.py:54).
_CHECK_WINDOW_ROUND = 11

#: legacy name for the pre-r4 round-scoped constant — ROUND3_NOTES.md
#: still directs readers here; keep it resolving
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
    from ema_bigdata_spark.operators import ml, multimodal  # noqa: F401
    from ema_bigdata_spark.operators import dedup  # noqa: F401
    from ema_bigdata_spark import gmm, gmm_parity  # noqa: F401
    from ema_bigdata_spark.streaming import stream_queries  # noqa: F401

    missing = [n for n in _CHECK_WINDOW if n not in QUERIES]
    if missing:  # typo guard: a misspelled window entry must fail loudly
        raise RuntimeError(f"_CHECK_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in _CHECK_WINDOW}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
