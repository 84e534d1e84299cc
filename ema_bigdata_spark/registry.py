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


#: Round-10 verification priority.  The external driver records a
#: CORRECTNESS row for only the FIRST 50 names in ``queries()`` order.
#: Rotation rule (steady state since r3): never-checked first, then
#: red rows / changed-this-round, then stalest-official-row (an old
#: green row doesn't certify refactored code).  Freshness invariant
#: (VERDICT r9 item 7, enforced by ``tools/check_freshness.py``): at
#: round close, no query's latest official row may predate N-3.
#:
#: This window (r10) = the 25 owed names the r9 registry docstring
#: enumerated, then the full r6-era remainder, then the 11 stalest
#: r7 rows (alphabetical tiebreak):
#:
#: (1) TWO r10 behavior changes (ADVICE r9), both identity on driver
#:     data: q_pagerank's sign-robust ``% 2 != 0`` is_supplier label
#:     (negative supplier nodes — analytics.py) — q_pagerank heads
#:     the window; and _norm_gated's column-existence vec_id gate
#:     (similarity.py), which is identity for every REGISTERED
#:     operand (all carry vec_id) and certified by the in-window
#:     embedding rows.
#:
#: (2) the SIXTEEN late-r9 hostile-nulls/extremes text changes owed
#:     from the r9 addendum (NULL-entity-key rule, mod-first hashes,
#:     IVF distinct-seed + nprobe=3, ~key hottest-key trick):
#:     q_init_means, q_lang_id, q_retention, q_pagerank, q_skyline,
#:     q_ann_ivf, q_collect_agg, q_window_running, q_window_frames,
#:     q_mm_features/_png/_histogram, q_embed_centroid, q_semdedup,
#:     q_source_interleave, q_skew_metrics.  All identity on driver
#:     data except q_ann_ivf's nprobe 2→3 (deliberate recall margin;
#:     hashed columns identical).
#:
#: (3) the NINE r9 deferrals (rationales: ROUND9_NOTES / the r9
#:     docstring): gmm_fit, q_gmm_bic, q_kmeans, q_linreg (r9 touched
#:     only dead-branch removal + temp-view drops; lockstep
#:     bit-identity pinned), q_dedup_exact_hash, q_corpus_clean,
#:     q_dedup_incremental, q_train_val_split (their r9 change is the
#:     identical fold_lower expression q_dedup_exact's r9 row
#:     certifies), q_source_interleave (already in (2)).
#:
#: (4) the FIFTEEN remaining r6-era official rows — after this round
#:     no row predates r7: q_compact_latest, q_contamination,
#:     q_dedup_incremental_near, q_dup_spans, q_embed_quantize,
#:     q_funnel, q_join_asof, q_join_range, q_mix_weights,
#:     q_pack_sequences, q_sql_tpch_q10/q14/q17/q6, q_unigram_lm.
#:
#: (5) ELEVEN stalest-r7 fillers (alphabetical): q_agg_distinct,
#:     q_bm25, q_char_entropy, q_corr_stats, q_cube, q_except,
#:     q_grouping_sets, q_having, q_join_anti, q_join_broadcast,
#:     q_join_full.
#:
#: OWED r11 (the 16 r7 rows that did not fit; they hit the N-3 edge
#: next round, so they MUST head the r11 window): q_join_inner,
#: q_join_semi, q_mm_frames, q_mstep_var_fixed, q_multimodal_join,
#: q_ngram_jaccard, q_pii_scrub, q_pricing_summary, q_rollup,
#: q_sql_exists, q_sql_scalar_subquery, q_sql_tpch_q3, q_sql_tpch_q5,
#: q_string_funcs, q_topk_ngrams, q_weighted_sample.  None changed
#: in r10; all green in this round's full driver sims.
#:
#: (The full r9 window rationale lives in git history and
#: ROUND9_NOTES.md.)
_CHECK_WINDOW: tuple[str, ...] = (
    # — (1)+(2) r10 behavior changes + late-r9 owed texts (16) —
    "q_pagerank", "q_init_means", "q_lang_id", "q_retention",
    "q_skyline", "q_ann_ivf", "q_collect_agg", "q_window_running",
    "q_window_frames", "q_mm_features", "q_mm_png", "q_mm_histogram",
    "q_embed_centroid", "q_semdedup", "q_source_interleave",
    "q_skew_metrics",
    # — (3) r9 deferrals owed (8 more) —
    "gmm_fit", "q_gmm_bic", "q_kmeans", "q_linreg",
    "q_dedup_exact_hash", "q_corpus_clean", "q_dedup_incremental",
    "q_train_val_split",
    # — (4) the r6-era rows, retired (15) —
    "q_compact_latest", "q_contamination", "q_dedup_incremental_near",
    "q_dup_spans", "q_embed_quantize", "q_funnel", "q_join_asof",
    "q_join_range", "q_mix_weights", "q_pack_sequences",
    "q_sql_tpch_q10", "q_sql_tpch_q14", "q_sql_tpch_q17",
    "q_sql_tpch_q6", "q_unigram_lm",
    # — (5) stalest-r7 fillers (11) —
    "q_agg_distinct", "q_bm25", "q_char_entropy", "q_corr_stats",
    "q_cube", "q_except", "q_grouping_sets", "q_having",
    "q_join_anti", "q_join_broadcast", "q_join_full",
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
