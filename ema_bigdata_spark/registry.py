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


#: Round-9 verification priority.  The external driver records a
#: CORRECTNESS row for only the FIRST 50 names in ``queries()`` order.
#: Rotation rule (steady state since r3): never-checked first, then
#: red rows / changed-this-round, then stalest-official-row (an old
#: green row doesn't certify refactored code).  This window:
#:
#: (1) SEVEN queries whose BEHAVIOR changed in r9 (ADVICE r8 +
#:     hostile-unicode sweep; all identity on driver data, all
#:     hostile-pinned):
#:     - q_math_funcs: floor_long's tiny-negative parity fix
#:       (functions/parity.py; probed -1e-17 → 0 vs -1);
#:     - q_value_outliers (domain 1e9) / q_outlier_mad (1e8): the
#:       quadratic-arithmetic headroom gates replacing the
#:       cast-safety-only 9.2e12 (profiling.py module comment);
#:     - s_stream_anomaly: DECIMAL(38,0) sx/sxx state + HUGEINT
#:       oracle sums + |value| ≤ 1e9 gate (stream_queries.py
#:       _ANOM_DOMAIN — in-domain Σvu² overflow killed the stream);
#:     - q_embed_covariance: the Arrow/HOF producer auto-switch
#:       selects Arrow at sf0.01's 500 rows, so the official row must
#:       certify the NEW physical path (values proven bit-identical);
#:     - q_dedup_exact: the fold_lower dedup key (textfold.py —
#:       İ/final-sigma simple folds, the r9 unicode sweep);
#:     - q_dedup_fuzzy: edit distance re-declared in UTF-8 BYTES
#:       (Spark counted code points, DuckDB bytes; textfold.lev_bytes).
#:
#: (2) TWELVE of the sixteen r8 identity-change deferrals owed this
#:     round (VERDICT r8 item 2; rationales in the r8 window notes,
#:     ROUND8_NOTES §15-§22): q_approx_quantiles, the four seam-gate
#:     streaming rows (s_stream_dedup/join/static_join/upsert), the
#:     five gate-only embedding rows (q_similarity_topk,
#:     q_similarity_batch, q_embed_dup, q_ann_lsh, q_ann_pq),
#:     q_profile_table, q_approx_distinct.  (q_sql_tpch_q9/q22 and
#:     q_doc_fingerprint from that list are r5-era and enter via (3).)
#:
#: (3) the THIRTY-ONE r5-era official rows (VERDICT r9 headline:
#:     after this round no query's latest official row predates r6) —
#:     the full r5 TPC-H block, the window/text/analytics one-liners,
#:     and q_normalize_text, whose r9 fold_lower change makes its row
#:     doubly owed.
#:
#: LATE-r9 ADDENDUM (hostile-nulls sweep, after this window was set):
#: the seventh sweep mode's NULL-entity-key rule (SURVEY §2.4 r9)
#: changed 17 query texts.  Seven of them have in-window rows that
#: certify the new text (s_stream_anomaly, q_embed_covariance,
#: q_window_lag, q_event_transitions, and the gate-sharing
#: q_similarity_topk/q_similarity_batch/q_embed_dup/q_ann_lsh/
#: q_ann_pq rows certify the id-extended _sql_norm_gate).  The other
#: changed names are OWED r10 rows: q_init_means, q_lang_id,
#: q_retention, q_pagerank, q_skyline, q_ann_ivf, q_collect_agg,
#: q_window_running, q_window_frames, q_mm_features/_png/_histogram,
#: q_embed_centroid, q_semdedup, q_source_interleave, q_skew_metrics
#: (~key hottest-key trick, hostile-extremes).  q_stratified_sample's
#: mod-first hash is certified by its own in-window (3) row.
#: All are identity on driver data (every added gate
#: is a no-op on benign input; the mod-first rewrites are congruent;
#: the IVF distinct-seed rule is a no-op on distinct-vector corpora)
#: EXCEPT q_ann_ivf's nprobe 2→3, which changes the IVF candidate
#: set by design (recall margin — similarity._IVF_NPROBE note) while
#: the hashed columns (exact_topk, recall_ok) stay identical.
#: Pinned by tests/test_null_identity.py (24 nulls checks + 9
#: extremes checks — incl. q_skew_metrics's overflow-free ~key
#: hottest-key trick — on the sweeps' own fixtures) and the
#: eight-mode 151/151 sweep.
#:
#: NINE names defer to r10 with rationale (the window is exactly 50):
#: - gmm_fit / q_gmm_bic / q_kmeans / q_linreg (r8 rows): r9 changed
#:   only dead-branch removal (chunked EM) and temp-view drops after
#:   analysis — output identity pinned by the lockstep bit-identity
#:   tests and test_gmm_views_do_not_accumulate;
#: - q_dedup_exact_hash / q_corpus_clean / q_dedup_incremental /
#:   q_train_val_split: their r9 change is the IDENTICAL fold_lower
#:   expression q_dedup_exact's in-window row certifies (the r8 (2d)
#:   one-row-certifies-the-text precedent), pinned by
#:   TestTextFoldParity + the 151/151 hostile-unicode sweep;
#: - q_source_interleave (r7 row, deferred once in r8): unchanged in
#:   r9; its r8 change remains output-identity on driver data, pinned
#:   by the adversarial documents suite.
#: All nine are green in this round's full driver sims (sf0.01).
_CHECK_WINDOW: tuple[str, ...] = (
    # — (1) r9 behavior changes (7) —
    "q_math_funcs", "q_value_outliers", "q_outlier_mad",
    "s_stream_anomaly", "q_embed_covariance", "q_dedup_exact",
    "q_dedup_fuzzy",
    # — (2) r8 deferrals owed (12) —
    "q_approx_quantiles", "s_stream_dedup", "s_stream_join",
    "s_stream_static_join", "s_stream_upsert", "q_similarity_topk",
    "q_similarity_batch", "q_embed_dup", "q_ann_lsh", "q_ann_pq",
    "q_profile_table", "q_approx_distinct",
    # — (3) the r5-era rows, retired (31) —
    "q_bigram_lm", "q_bpe_pairs", "q_case_null", "q_cdc_merge",
    "q_date_funcs", "q_doc_fingerprint", "q_event_transitions",
    "q_filter_report", "q_gapfill", "q_normalize_text",
    "q_quality_score", "q_rag_chunk", "q_repetition_score",
    "q_source_mix", "q_sql_tpch_q7", "q_sql_tpch_q8", "q_sql_tpch_q9",
    "q_sql_tpch_q13", "q_sql_tpch_q15", "q_sql_tpch_q16",
    "q_sql_tpch_q19", "q_sql_tpch_q21", "q_sql_tpch_q22",
    "q_stratified_sample", "q_text_tokens", "q_tfidf", "q_token_count",
    "q_token_histogram", "q_window_lag", "q_window_rank",
    "q_zorder_layout",
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
