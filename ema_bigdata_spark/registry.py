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


#: Round-8 verification priority.  The external driver records a
#: CORRECTNESS row for only the FIRST 50 names in ``queries()`` order.
#: Rotation rule (steady state since r3): never-checked first, then
#: red rows / changed-this-round, then stalest-official-row (an old
#: green row doesn't certify refactored code).  This window:
#: (1) the SIXTEEN r4-era official rows r7 deferred (VERDICT r7
#:     item 1 — after this no ledger row is older than r6): the nine
#:     reference ``_fixed``-family constants + q_scan_count, four
#:     trivial relational ops, and the four one-liners late-r7
#:     displaced;
#: (2) the EIGHT queries whose code changed THIS round:
#:     q_json_extract (integer-pattern cast guard on both engines —
#:     ADVICE r7), the five LSH queries that gained the band-bucket
#:     cap (q_dedup_minhash, q_dedup_simhash, q_minhash_jaccard_est,
#:     and the downstream q_dedup_cluster / q_dedup_keep_best whose
#:     pair source is now capped — VERDICT item 3), and gmm_fit /
#:     q_gmm_bic (per-call temp-view naming in prepare_hist and the
#:     chunked path — ADVICE r7);
#: (2b) the SEVEN additional queries whose hostile-input BEHAVIOR
#:     changed late in r8 (the non-finite measure gate,
#:     functions/parity.py + tests/test_nonfinite_values.py):
#:     q_ab_ttest / q_join_salted / q_kmeans / q_value_outliers /
#:     q_window_range_frame / q_window_running / q_winsorize — the
#:     other five gated crashers (gmm_fit, q_gmm_bic, q_mean,
#:     q_variance_pop, q_outlier_mad) were already in the window.
#:     NOTE the gate also rewrites the sql_cents text inside MANY
#:     other registered oracles; those queries' semantics are
#:     untouched (the gate is identity on finite input — re-proven by
#:     the 151/151 bit-faithful driver sim on gated code), so window
#:     priority goes to behavior changes, not text changes.
#: (2c) FIVE of the ten embedding-family queries whose vector domain
#:     widened late in r8 (Σx² ∈ (0, 1e4], ``similarity._NORM2_MAX`` —
#:     the non-finite posture of (2b) applied to embeddings):
#:     q_embed_norm (the family anchor), and the four whose code
#:     changed beyond the shared gate expression (q_embed_centroid /
#:     q_embed_covariance / q_semdedup gained the gated aggregation
#:     paths; q_ann_ivf's codebook trainer changed).  The other five
#:     (q_similarity_topk, q_similarity_batch, q_embed_dup, q_ann_lsh,
#:     q_ann_pq) defer to r9: their only change is the SAME
#:     `_norm_gated`/`_sql_norm_gate` expression the five in-window
#:     rows certify, and all ten are hostile-pinned by
#:     TestEmbeddingDomain.
#: (2d) SEVEN of the ten queries the poisoned-TPC-H non-finite sweep
#:     found CRASHING (raw CAST snaps predating the TRY_CAST rule,
#:     now converted; tests/test_nonfinite_values.py TestTpchNonFinite
#:     pins the hostile parity): q_percentiles, q_math_funcs,
#:     q_skyline, q_join_left, q_linreg, q_sql_tpch_q18,
#:     q_sql_tpch_q2.  The other three changed crashers defer to r9
#:     with rationale: q_approx_quantiles (its snap is the IDENTICAL
#:     expression q_percentiles carries — one official row certifies
#:     the text), q_sql_tpch_q9 / q_sql_tpch_q22 (mechanical
#:     inner-snap conversion of the exact pattern q18/q2 certify;
#:     both hostile-pinned and sweep-proven).  q_events_hourly also
#:     changed (oracle TRY_CAST) and is already in group (1).
#: (2e) the event-time-domain changes (r8 hostile-ts sweep,
#:     tests/test_ts_domain.py): q_sessionize (NULL-ts exclusion) and
#:     the four streaming queries the sweep saw DIVERGE OR DIE
#:     (s_stream_sliding's year-0 window start, s_stream_session's
#:     state-core crash, s_stream_tumbling / s_stream_topk window-end
#:     mismatches).  The other four streaming queries changed only by
#:     inheriting the SAME `stream_source` seam gate + `sql_ts_domain`
#:     oracle predicate and defer to r9 (hostile-pinned);
#:     q_window_running was already in (2b); q_profile_table's change
#:     (per-column round flags) is output-identity on every value the
#:     driver's clean data produces and defers with the suite pin.
#:     Same identity-plus-suite-pin deferral for the two hostile-DOCS
#:     sweep fixes (late r8): q_doc_fingerprint (BIGINT casts in the
#:     word hash — values unchanged wherever the old INT32 multiply
#:     didn't overflow, i.e. on all driver data) and
#:     q_source_interleave (slots dimension excludes NULL sources —
#:     none exist in driver data); both pinned on the extended
#:     adversarial documents corpus (rows 11-13).  The dedup-family
#:     oracle shingle CTE rewrite (linear zip form) is
#:     output-IDENTICAL by construction, proven on a hostile text
#:     battery — text change only, no window claim.  q_approx_distinct
#:     (hostile-KEYS sweep: exact_custs now counts non-NULL custkey
#:     groups, matching COUNT(DISTINCT)/HLL NULL semantics) also
#:     defers on identity-plus-pin: no NULL custkeys in driver data,
#:     pinned by the adversarial relational fixture's new row.
#: (3) the two r5 rows that carry r8 behavior changes of their own:
#:     s_stream_anomaly (the (2b) snap-domain filter in its core) and
#:     q_outlier_mad (a (2b) gated crasher).  THIRTY-FIVE r5-era rows
#:     now defer to r9 with rationale: the eleven trivial one-liners
#:     below, seven evicted for the (2b) changes (q_bpe_pairs,
#:     q_quality_score, q_rag_chunk, q_stratified_sample, q_cdc_merge,
#:     q_event_transitions, q_skyline — q_skyline re-entered via (2d)
#:     when its snap changed), the full r5 TPC-H block for (2c)/(2d)
#:     priority (q2 re-entered via (2d); q7/q8/q13/q15/q16/q19/q21
#:     and the deferred q9/q22 are owed to r9), and the seven
#:     text/analytics/streaming rows the (2d) crashers displaced
#:     (q_tfidf, q_bigram_lm, q_filter_report, q_repetition_score,
#:     q_gapfill, q_zorder_layout, s_stream_topk — all UNCHANGED
#:     since r5 with standing adversarial coverage).  The eleven:
#:     trivial single-scan scalar/window one-liners unchanged since
#:     r5 with standing adversarial coverage (q_case_null,
#:     q_date_funcs in the relational suite; q_window_lag /
#:     q_window_rank in the events suite's tie-break battery;
#:     q_text_tokens, q_token_count, q_token_histogram,
#:     q_doc_fingerprint, q_normalize_text, q_source_mix in the
#:     document suites) — q_window_running left this list when the r8
#:     gate changed it.  All deferrals are green in this round's full
#:     local driver-sims at sf0.01 AND sf0.1; r9 owes them the head
#:     of its window.
_CHECK_WINDOW: tuple[str, ...] = (
    # — (1) the 16 r4-era rows: reference `_fixed` family + scan (10) —
    "q_scan_count", "q_mean", "q_variance_pop", "q_init_means",
    "q_loglik_fixed", "q_gamma_fixed", "q_mstep_weight_fixed",
    "q_mstep_mean_fixed", "q_join_cross", "q_filter_project",
    # — (1) trivial relational ops + late-r7 displaced one-liners (6) —
    "q_union", "q_intersect", "q_sort_limit", "q_events_hourly",
    "q_unpivot", "q_pivot",
    # — (2) changed this round: cast guard + LSH band caps + gmm views —
    "q_json_extract", "q_dedup_minhash", "q_dedup_simhash",
    "q_minhash_jaccard_est", "q_dedup_cluster", "q_dedup_keep_best",
    "gmm_fit", "q_gmm_bic",
    # — (2b) non-finite gate behavior changes (late r8) —
    "q_ab_ttest", "q_join_salted", "q_kmeans", "q_value_outliers",
    "q_window_range_frame", "q_window_running", "q_winsorize",
    # — (2c) embedding vector-domain changes (late r8, _NORM2_MAX) —
    "q_embed_norm", "q_ann_ivf",
    "q_embed_centroid", "q_embed_covariance", "q_semdedup",
    # — (2d) poisoned-TPC-H sweep crashers, snaps now TRY_CAST (7) —
    "q_percentiles", "q_math_funcs", "q_skyline", "q_join_left",
    "q_linreg", "q_sql_tpch_q18", "q_sql_tpch_q2",
    # — (2e) event-time-domain changes (r8 hostile-ts sweep) —
    "q_sessionize", "s_stream_sliding", "s_stream_session",
    "s_stream_tumbling", "s_stream_topk",
    # — (3) r5 rows carrying r8 behavior changes of their own (2) —
    "q_outlier_mad", "s_stream_anomaly",
)

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
