"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's canonical migrate
flow) on sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle; the registry lives in
``node_mongo2influx_spark/plans/``.

ROWS-ONLY TIER (the ``no_oracle`` rows in CORRECTNESS_r*.json): these 11
queries are approximate BY DESIGN — their outputs depend on trained model
state (k-means cells, PQ codebooks, LSH hyperplanes, a corpus-trained BPE
merge list), so no deterministic cross-engine oracle can exist. A
``rows_match: null`` row for them is NOT a missing check: each one is
(a) recall/accuracy-gated in pytest against its exact tier, and (b)
paired with an ORACLE-EXACT companion query that hash-checks the same
algebra with frozen/deterministic state. The mapping:

  =========================  ===========================================
  rows-only query            oracle-exact companion (hash-green) + gate
  =========================  ===========================================
  knn_cosine_lsh             lsh_recall_probe; recall>=0.7 vs brute
  knn_cosine_ivf             ann_recall_probe; recall>=0.7 vs brute
  knn_cosine_pq              pq_recall_probe; recall gate + ADC pins
  knn_cosine_ivfpq           pq_recall_probe + ann_recall_probe; recall
                             gate, unified-ADC equality pins
  knn_cosine_ivfpq_batch     same; pinned row-equal to the gated path
  dedup_minhash_lsh          minhash_band_agreement; pair recall 1.0 gate
  dedup_clusters_lsh         dedup_clusters (recursive-CTE components
                             oracle); LSH tier recall-gated
  embedding_neardup_lsh      embedding_neardup_pairs (exact all-pairs
                             oracle tier); recall gate
  embedding_neardup_ivf      embedding_neardup_pairs; recall gate
  semantic_dedup_ivf         dedup_modality_agreement(+_sampled) exact
                             tiers; precision-1/recall gates
  bpe_tokenize_corpus        bpe_tokenize_fixed (frozen merge list, full
                             oracle); pinned equivalence of the two faces
  =========================  ===========================================

(embedding_pca_project left this tier in round 8 — it now carries a full
frozen-direction oracle; pca_power_probe remains the iteration witness.)
"""

from __future__ import annotations

import glob
import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _registry():
    from node_mongo2influx_spark.plans import load_registry

    return load_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg["migrate_events"].fn(spark, "/root/testdata/sf0.001")


#: Queries whose IMPLEMENTATION or oracle changed after their most recent
#: driver-green row — the per-round maintenance hook the automatic
#: ordering below cannot infer. Each entry is ``(name, round_changed)``
#: where ``round_changed`` is the round of the NEXT driver run (a change
#: made mid-round-N is only witnessed by round N's END-of-round snapshot,
#: so an entry numbered with an already-recorded round would expire
#: against a green row that PRECEDED the change); the entry self-expires
#: once a green driver row lands in a round >= ``round_changed``.
#:
#: ORACLE-BEARING queries only: a rows-only query's driver row is always
#: ``rows_match: null`` (``no_oracle``), so it can NEVER satisfy the
#: expiry rule — listing one here pins a window slot forever on evidence
#: that cannot land (rounds 5–8 burned 8 slots per round this way). A
#: rows-only query's re-witness after a code change is its pytest
#: recall/accuracy gate plus its oracle-exact companion (the docstring
#: table above), so list the COMPANION here instead.
_CHANGED_SINCE_GREEN: tuple[tuple[str, int], ...] = (
    # round-4 session 3 (witness lands in the r5 snapshot): the
    # components rewrite touches every clusters query; the cosine_pairs
    # repartition touches the exact embedding tier.
    ("dedup_clusters", 5),
    ("dedup_filtered_corpus", 5),
    ("embedding_neardup_pairs", 5),
    # round 5: ADVICE fix — sparse (user,type) combos now emit 0 on both
    # engines instead of being NULL-filtered on the Spark side only.
    ("unpivot_event_matrix", 5),
    # round 5: pairs subtree persisted (was recomputed 5x — 77 MB spill).
    ("dup_transitivity_audit", 5),
    # round 6 session 4 (empty-input robustness wave): skip_accounting
    # gained a nullif divisor (0/0 → NULL like the oracle on empty
    # input — sf0.01 values unchanged, re-verified); pq_recall_probe
    # gained an empty-corpus early return before the codebook collect.
    ("skip_accounting", 6),
    ("pq_recall_probe", 6),
    # round 6 session 4 (1-row sweep class): MAD z-score and the two
    # CUSUM sd formulas gained nullif divisors (MAD=0 / n=1 now NULL
    # like the oracle instead of an ANSI crash — sf0.01 values
    # unchanged, re-verified).
    ("mad_robust_outliers", 6),
    ("cusum_drift_alarms", 6),
    ("cusum_drift_chunked", 6),
    # round 6 session 4: fingerprint/split expressions extracted into
    # shared helpers used by BOTH incremental-dedup faces (values
    # identical — re-verified at all SFs — but the code changed).
    ("dedup_incremental_delta", 6),
    # round 6 session 4: fp consumed 3× — localCheckpoint added (values
    # identical, lineage only).
    ("source_overlap_matrix", 6),
    # round 7 (VERDICT r6 #1): Bloom geometry is now DATA-SIZED (m =
    # 16·|base fps| instead of static 2^17) — position VALUES change, so
    # the r6 green row no longer witnesses this code. Re-verified green
    # vs the (also re-derived) oracle at all three SFs this session.
    ("dedup_incremental_bloom", 7),
    # round 7 (VERDICT r6 #3): the three approx_* queries converted from
    # rows-only to bounded-witness FULL oracles — output shapes changed
    # (exacts + guarantee booleans; the sketch values stay Spark-side).
    ("approx_distinct_users", 7),
    ("approx_percentiles_by_type", 7),
    ("approx_top_words", 7),
    # round 7 (VERDICT r6 #2): the same-session A/B adjudicated
    # knn_cosine_pq's 1.22x as REAL — pq_encode's kernel spread is now
    # size-gated (values identical: per-row encode is partitioning-
    # independent; re-verified recall gates + probes green); the
    # oracle-exact witness for every query traversing pq_encode.
    ("pq_recall_probe", 7),
    # round 7 (VERDICT r6 #4): the power iteration moved to the driver
    # (model-sized; the corpus-sized Gram stays an exact-integer Spark
    # aggregate) — values bit-identical (re-verified at all three SFs),
    # but the code changed; steady-state wall 3.0 s -> 0.9 s.
    ("pca_power_probe", 7),
    # round 8 (VERDICT r7 #2): embedding_pca_project converted from
    # rows-only to a FULL oracle — frozen integer-micro direction from
    # the probe's bit-identical power iteration, exact nano-unit integer
    # dot products (output column changed to pc1_nano). Verified green
    # at all three SFs this session; numpy alignment gate retained.
    ("embedding_pca_project", 8),
    # round 8 (ADVICE r7): null-safe join keys — NULL event_type groups
    # now survive (values unchanged on the dense fixtures, re-verified;
    # the NULL-injected sweep is the witness for the changed class).
    ("approx_percentiles_by_type", 8),
    ("approx_distinct_users", 8),
    # round 8 (nullify sweep): NULLS LAST explicit in window order, the
    # na.fill subset, max_by NULL-value mask, eqNullSafe IVM merge, and
    # the two oracle-semantics fixes (stratified default_fraction,
    # line-protocol NULL-field omission).
    ("window_rank_family", 8),
    ("window_cume_ntile", 8),
    ("pivot_event_matrix", 8),
    ("unpivot_event_matrix", 8),
    ("hypertable_rollup_5min", 8),
    ("rollup_incremental_refresh", 8),
    ("stratified_sample_hash", 8),
    ("influx_line_protocol", 8),
    # round 8 (ADVICE r7): Bloom store layout changed (persisted distinct
    # hash set; replay-idempotent appends; per-fingerprint classify).
    ("dedup_incremental_bloom", 8),
    # round 8 (VERDICT r7 #1): bm25_multi_topk gained the DataFrame
    # query-stream face with size-gated hints (dict face values
    # unchanged, re-verified).
    ("bm25_multi_query_topk", 8),
    # round 8: pca_power_probe refactored onto shared helpers (values
    # bit-identical, re-verified at all SFs).
    ("pca_power_probe", 8),
    # round 8 (nullify sweep, ts class): time-series queries now load
    # events through the explicit time-validity rule (ts IS NOT NULL on
    # BOTH sides — the reference's F1 filter; Spark's window() silently
    # drops NULL ts while SQL GROUP BY keeps a NULL bucket, and window
    # NULL-ordering defaults differ per engine). Dense-fixture values
    # unchanged, re-verified; ohlc additionally moved vwap to
    # stable_round (a .xxxx5 boundary the new value mix exposed).
    ("hypertable_rollup_5min", 8),
    ("rollup_incremental_refresh", 8),
    ("window_lead_lag_delta", 8),
    ("sessionize_events", 8),
    ("batch_session_windows", 8),
    ("sliding_distinct_users", 8),
    ("ohlc_vwap_hourly", 8),
    ("recursive_event_chains", 8),
    ("rolling_median_value", 8),
    ("cusum_drift_alarms", 8),
    ("cusum_drift_chunked", 8),
    ("window_running_total", 8),
    # round 8 (nullify sweep, text class): a NULL-text document is not
    # corpus input (the minhash omission rule, now explicit on both
    # sides for these four — a no-text doc has no fingerprint, render,
    # payload, or word multiset). Dense-fixture values unchanged.
    ("dedup_incremental_bloom", 8),
    ("sft_pack_plan", 8),
    ("multimodal_features", 8),
    ("doc_repetition_ratio", 8),
    # round 8 (nullify sweep, embedding class): a row without an
    # embedding is not index input (lsh_recall_probe — DuckDB's
    # list_dot_product raises on NULL lists where Spark yields NULL);
    # embedding_norm_qa now REPORTS missing vectors (new n_missing
    # column) instead of letting DuckDB's list_prepend(0.0, NULL) mint
    # a phantom zero norm. Dense values unchanged except the new column.
    ("lsh_recall_probe", 8),
    ("embedding_norm_qa", 8),
    # round 8 (degenerate-cardinality sweep, tools/degenerate_fixtures):
    # hypertable_rollup_5min's last_value is now a TOTAL order
    # ((ts, event_id) as a fixed-width digit string — tied timestamps
    # let each engine keep a different row); stratified_sample_hash's
    # oracle guards its numeric-suffix reconstruction with
    # LIKE + TRY_CAST (a non-'srcN' stratum crashed DuckDB's CAST
    # where the fractions map just drops it). Dense values unchanged.
    ("hypertable_rollup_5min", 8),
    ("stratified_sample_hash", 8),
    # round 8 (unicode sweep, tools/unicode_fixtures): corpus case
    # folding is now ASCII-only (functions/fold — JVM and DuckDB
    # genuinely disagree on lower('İ')/upper('ß'), so every
    # tokenization path that case-folds arbitrary text diverged on
    # non-ASCII corpora), and oracle byte paths use encode()/hex-slicing
    # (CAST(text AS BLOB) crashes DuckDB on non-ASCII; VARCHAR char
    # slices drift off byte offsets). Dense-ASCII values unchanged —
    # translate == lower and char == byte there.
    ("approx_top_words", 8),
    ("bm25_keyword_topk", 8),
    ("bm25_multi_query_topk", 8),
    ("bpe_merge_pair_stats", 8),
    ("bpe_tokenize_fixed", 8),
    ("cooccurrence_pmi", 8),
    ("cooccurrence_topk", 8),
    ("cross_source_contamination", 8),
    ("dedup_clusters", 8),
    ("dedup_containment_pairs", 8),
    ("dedup_filtered_corpus", 8),
    ("dedup_keep_best_quality", 8),
    ("dedup_modality_agreement", 8),
    ("dedup_modality_agreement_sampled", 8),
    ("dedup_ngram_jaccard", 8),
    ("dedup_simhash", 8),
    ("dedup_url_canonical", 8),
    ("doc_fingerprint", 8),
    ("doc_perplexity_bigram", 8),
    ("dup_transitivity_audit", 8),
    ("feature_hashing_vectors", 8),
    ("gopher_quality_flags", 8),
    ("hybrid_retrieval_rrf", 8),
    ("lang_id", 8),
    ("leakage_safe_split", 8),
    ("minhash_band_agreement", 8),
    ("multimodal_features", 8),
    ("multimodal_frame_sample", 8),
    ("multimodal_meta", 8),
    ("quality_filter_pipeline", 8),
    ("quality_lang_matrix", 8),
    ("sft_pack_plan", 8),
    ("sft_render_truncate", 8),
    ("text_quality", 8),
    ("tfidf_top_terms", 8),
    ("url_domain_stats", 8),
    ("word_subsample_weights", 8),
    # round 8 (non-finite sweep, tools/nonfinite_fixtures): the
    # finite-measure rule — a NaN/±Inf value is an INVALID READING and
    # becomes NULL at the query's input on both engine sides
    # (load_events_measured / EVENTS_MEASURED_DUCKDB); the Influx sink
    # renders non-finite floats as ABSENT fields (line protocol cannot
    # represent them). Dense values unchanged (fixtures are finite).
    # hypertable/ohlc/rolling/cusum entries above already cover those.
    ("rollup_incremental_refresh", 8),
    ("influx_line_protocol", 8),
    ("udaf_geomean_value", 8),
    ("grouped_zscore", 8),
    ("winsorize_by_type", 8),
    ("table_diff_checksum", 8),
    ("seasonal_baseline_residual", 8),
    ("histogram_quantile_sketch", 8),
    ("mad_robust_outliers", 8),
    ("window_range_moving_avg", 8),
    ("cube_type_by_weekday", 8),
    ("percentiles_by_type", 8),
    # round 8 (json sweep, tools/json_fixtures): adversarial props
    # documents (deep nesting, >BIGINT numbers, duplicate keys, array/
    # malformed roots, typed mismatches). JSON extraction is TOLERANT
    # on both sides now (try_cast + json_valid guards); the map-explode
    # faces moved to key-occurrence/first-wins semantics (strict
    # from_json map had no DuckDB twin on such documents); VARIANT uses
    # try_parse_json (duplicate-key docs are invalid per spec, guard
    # mirrored). Dense values unchanged (fixture props are flat valid
    # int objects).
    ("json_props_map", 8),
    ("udtf_explode_props", 8),
    ("variant_json_typed", 8),
    ("scalar_date_json", 8),
    # round 9 (ADVICE r8 + VERDICT r8 #3 — the jsonpath contract,
    # functions/jsonpath.py): quoted-path extraction with the SAFE_KEY
    # guard (dotted/spaced keys now extract; keys in either engine's
    # path-parser hazard set yield NULL on both sides), and the
    # INT_SHAPE rule (integer-shaped values only — DuckDB's bare
    # TRY_CAST rounds '3.7' to 4 where Spark's is NULL) at every $.k
    # extraction site incl. ohlc's volume weight; variant oracle gains
    # the DOUBLE-trunc dispatch + portable pmod. Dense values unchanged
    # (re-verified at sf0.01); the extended json sweep (slots 8-16) is
    # the witness for the changed classes.
    ("json_props_map", 9),
    ("udtf_explode_props", 9),
    ("variant_json_typed", 9),
    ("scalar_date_json", 9),
    ("ohlc_vwap_hourly", 9),
    # round 9 (longdoc sweep, tools/longdoc_fixtures): the FNV fold is
    # now length-capped (FNV_MAX_CHARS=4096 + length fold past it) —
    # an uncapped per-char substring fold is O(len²) in one task, and a
    # single 2 M-char token wedged an executor core for 10+ minutes.
    # Dense values BIT-IDENTICAL (the cap is ~7× the longest fixture
    # string; verified cross-engine incl. the boundary 4096/4097 and
    # re-verified green on dense sf0.01); every query whose oracle
    # embeds the fold gets a re-witness row.
    ("countmin_word_frequency", 9),
    ("curriculum_training_order", 9),
    ("dedup_incremental_bloom", 9),
    ("dedup_modality_agreement_sampled", 9),
    ("dedup_simhash", 9),
    ("embedding_neardup_sampled", 9),
    ("feature_hashing_vectors", 9),
    ("hll_portable_distinct", 9),
    ("leakage_safe_split", 9),
    ("minhash_band_agreement", 9),
    ("quota_sample_per_source", 9),
    ("sliding_distinct_hll", 9),
    ("source_overlap_hll", 9),
    ("split_contamination_audit", 9),
    ("stratified_sample_hash", 9),
    ("train_val_test_split", 9),
    ("training_order_shuffle", 9),
    ("weighted_sample_aes", 9),
    # round 9 (longdoc sweep): bpe_merge_pair_stats' in-word pairs now
    # come from zipping the char array against its shifted slice on
    # BOTH sides — the per-position substring/substr spelling is
    # O(len²) per word and wedged on a 2 M-char token. Same pairs,
    # dense values identical (re-verified).
    ("bpe_merge_pair_stats", 9),
    # round 9 (longdoc sweep, the three divergences it caught): the FNV
    # fold's EMPTY-string branch (Spark sequence(1,0) is descending
    # [1,0] -> two zero folds where DuckDB folds none; slice guard,
    # non-empty inputs bit-identical); sft oracle's array_to_string([])
    # is NULL in DuckDB where Spark array_join([]) is '' (a 1-word doc
    # has an empty truncated response); split_contamination's oracle
    # re-evaluated the O(len) split per shingle position (O(len²),
    # 42 GB — words CTE'd once). Dense values identical (re-verified).
    ("sft_render_truncate", 9),
    # round 9 (longdoc sweep): doc_chunk_overlap made linear on BOTH
    # sides — Spark's split now materializes in its own projection (an
    # inlined split re-evaluates O(len) per chunk start inside the HOF
    # lambda); the oracle went fully row-based (zipped unnest + window
    # membership + ordered string_agg; DuckDB copies the outer list
    # per lambda element). Dense values identical (re-verified).
    ("doc_chunk_overlap", 9),
    # round 9 (longdoc sweep): corpus_segment_dedup linearized the same
    # two ways (own-projection split / row-based segment oracle);
    # doc_char_entropy's oracle moved from per-position substr (O(len²)
    # on multibyte text — DuckDB walks from the string start) to the
    # split-by-empty unnest. Dense values identical (re-verified).
    ("corpus_segment_dedup", 9),
    ("doc_char_entropy", 9),
    # round 9 (longdoc sweep): the email pattern's Spark side gained a
    # negative lookbehind — Java's backtracking find() rescans an alnum
    # run at every start position (O(len²), wedged on the 2 M-char
    # token); match set identical, RE2 oracle unchanged (linear by
    # construction, no lookbehind support). Dense values identical
    # (re-verified).
    ("pii_redaction_stats", 9),
    # round 10 (embed sweep, tools/embedding_fixtures — the vector-
    # validity contract, functions/vec): every cosine-family operator
    # and its oracle now exclude UNUSABLE vectors (NULL vector, NULL/
    # NaN/Inf element, zero norm — 0/0 cosine raised DIVIDE_BY_ZERO
    # under ANSI and float(None) crashed Arrow kernels); the exact-
    # quantization statistics family (Gram/PCA/JL) further requires the
    # BOUNDED domain |x| <= 100 (a 3e38 component cannot land on a
    # milli-unit int64 lattice: CAST overflow, and Spark's floor()
    # saturates LONG where DuckDB's stays DOUBLE). Dense fixtures carry
    # no such vectors — values identical, re-verified at sf0.001/sf0.01.
    ("knn_cosine_bruteforce", 10),
    ("embedding_neardup_pairs", 10),
    ("embedding_neardup_sampled", 10),
    ("dedup_modality_agreement", 10),
    ("dedup_modality_agreement_sampled", 10),
    ("label_centroid_cosine", 10),
    ("ann_recall_probe", 10),
    ("lsh_recall_probe", 10),
    ("pq_recall_probe", 10),
    ("embedding_gram_matrix", 10),
    ("random_projection_jl", 10),
    ("embedding_pca_project", 10),
    ("pca_power_probe", 10),
    ("hybrid_retrieval_rrf", 10),
    # round 10 (embed sweep): embedding_norm_qa now reports the full
    # class census (n_invalid/n_zero/n_outlier joined n_missing; norm
    # stats over the quantizable class only — the QA face SURFACES what
    # the operator faces exclude); array_functions aligned three
    # engine-edge semantics (NULL-element fold vs list_sum skip, left-
    # fold vs list_sum order at 1e78, DuckDB round() ulp loss past 2^53
    # + IEEE -0.0) — schema/values on dense fixtures unchanged except
    # norm_qa's three new columns.
    ("embedding_norm_qa", 10),
    ("array_functions", 10),
    # round 11 (witness lands in the r11 end-of-round snapshot): the
    # vector-validity contract respelled as ONE max-abs fold with the
    # extended usable range [1e-160, 1e150] — closes a reproduced ANSI
    # DIVIDE_BY_ZERO on norm²-underflowing DOUBLE vectors and the
    # NaN-cosine norm²-overflow class (float32 fixture values
    # unchanged; re-verified green at sf0.01 + the embed, embed_double,
    # tiestorm, and label sweeps this session). Oracle vector CTEs also
    # build emb through the NULL-safe double cast (DuckDB eager
    # pre-filter projection evaluation, found by embed_double). The two
    # URL queries additionally moved their source-uppercasing through
    # functions/fold.ascii_upper (label sweep finding).
    ("knn_cosine_bruteforce", 11),
    ("embedding_neardup_pairs", 11),
    ("embedding_neardup_sampled", 11),
    ("dedup_modality_agreement", 11),
    ("dedup_modality_agreement_sampled", 11),
    ("label_centroid_cosine", 11),
    ("ann_recall_probe", 11),
    ("lsh_recall_probe", 11),
    ("pq_recall_probe", 11),
    ("embedding_gram_matrix", 11),
    ("random_projection_jl", 11),
    ("embedding_pca_project", 11),
    ("pca_power_probe", 11),
    ("hybrid_retrieval_rrf", 11),
    ("embedding_norm_qa", 11),
    ("url_domain_stats", 11),
    ("dedup_url_canonical", 11),
    # round 11 OPTIMIZATION sessions (values verified identical vs the
    # oracle at sf0.001/0.01/0.1 after every change — OPTIMIZATION_r11.md
    # carries the per-change evidence — but the implementations changed
    # after their last green row, so the r11 snapshot should re-witness):
    # q3/q5 fact-fact join pinned to sort-merge; heavy per-row corpus
    # chains spread off single-split scans; doc_char_entropy respelled
    # as a run-length fold; shingle self-join probe side spread + both
    # edge directions built in one pass (+ dropped first-round edge
    # distinct) touching every components consumer; vocabulary-sized
    # count tables persisted (pmi, bm25 tf/postings, bigram LM,
    # subsample/domain weights); the ANN scoring projections respelled
    # as single selectExpr texts (the touched lsh/pq tiers are
    # rows-only — their oracle-exact companions knn_cosine_bruteforce /
    # lsh_recall_probe / pq_recall_probe are already listed above);
    # hll_registers' fmix finalizer inlined into one projection.
    ("q3_top_unshipped_revenue", 11),
    ("q5_revenue_by_nation", 11),
    ("bpe_tokenize_fixed", 11),
    ("doc_char_entropy", 11),
    ("cooccurrence_topk", 11),
    ("cooccurrence_pmi", 11),
    ("bm25_keyword_topk", 11),
    ("bm25_multi_query_topk", 11),
    ("cdc_chunking", 11),
    ("split_contamination_audit", 11),
    ("doc_perplexity_bigram", 11),
    ("word_subsample_weights", 11),
    ("domain_mixture_weights", 11),
    ("dedup_containment_pairs", 11),
    ("dedup_ngram_jaccard", 11),
    ("dedup_clusters", 11),
    ("dedup_filtered_corpus", 11),
    ("dedup_keep_best_quality", 11),
    ("dup_transitivity_audit", 11),
    ("leakage_safe_split", 11),
    # session 3: edit distance moved to the suffixes past the block
    # prefix (values identical by the common-prefix invariance;
    # hash-green at all three SFs; 0.227x A/B).
    ("entity_resolution_pairs", 11),
    # session 3: simhash votes + packing fused into one aggregate
    # expression text and the token explode spread (integer sums,
    # identical fold; hash-green at all three SFs; 0.312x A/B).
    ("dedup_simhash", 11),
    # session 3: grouped-map kernel body moved to numpy (bit-identical
    # moments; hash-green at all three SFs + nonfinite/nulls/ties
    # hostile fixtures; 0.76x interleaved).
    ("grouped_zscore", 11),
    # session 3: euro_supply checkpointed (consumed-2x rule; values
    # identical, hash-green at all three SFs).
    ("q2_min_cost_supplier", 11),
    ("hll_portable_distinct", 11),
    ("sliding_distinct_hll", 11),
    ("source_overlap_hll", 11),
    # optimization round session 4: the WAV synthesis + parse respelled
    # as SQL text (values identical — outputs compared row-for-row at
    # sf0.1 and hash-green at all three SFs — but the code changed).
    ("multimodal_audio_meta", 11),
    # optimization round session 4: VWAP numerator respelled as the
    # order-canonical sorted-terms fold on both sides (fixes the
    # run-order flap oracle_flap_check witnessed on multi-split input;
    # hash-green at all three SFs and every hostile fixture re-run).
    ("ohlc_vwap_hourly", 11),
    # round 12 (VERDICT r11 #4): VWAP numerator moved from the
    # sorted-terms collect_list fold to the exact-integer 1e-6-lattice
    # sum on both sides — O(1) aggregation state, deterministic in any
    # combine order; re-verified hash-green at all three SFs, flap-audit
    # 1 hash in 8 reps, hostile sweeps re-run.
    ("ohlc_vwap_hourly", 12),
)

#: Pinned prefix: highest-evidence-value driver rows this round. Kept
#: SHORT — everything else is ordered automatically from the
#: CORRECTNESS_r*.json history. Empty for round 9: the round's goal is
#: draining the re-witness backlog, and the backlog tier already
#: self-orders; both former pins (the r6 recall probes) are green as of
#: r8, so a pin would only displace a backlog witness.
_PIN_FIRST: tuple[str, ...] = ()

#: Max previously-green ROWS-ONLY queries admitted into the driver's
#: 50-slot window per round (VERDICT r10 #5): a rows>0 re-witness can
#: never upgrade to hash evidence, so beyond a small liveness sample
#: the slots are worth more refreshing the stalest ORACLE greens (14 of
#: which still dated to round 4 in the r10 audit).
_ROWS_ONLY_REWITNESS_CAP = 3


def _green_history() -> dict[str, int]:
    """name -> latest round with a driver-green row (hash match, or a
    rows-only match for queries without an oracle)."""
    best: dict[str, int] = {}
    for f in sorted(glob.glob(str(_REPO / "CORRECTNESS_r*.json"))):
        try:
            rnd = int(Path(f).stem.split("_r")[-1])
            rows = json.loads(Path(f).read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = bool(row.get("hash_match")) or (
                row.get("hash_match") is None and bool(row.get("rows_match"))
            )
            # A no_oracle witness records rows_match: None (the driver
            # compares nothing) — count spark_rows > 0 as its rows-only
            # green, or these queries re-enter the "never witnessed"
            # tier EVERY round (the actual mechanics behind VERDICT r10
            # #5's 11 wasted slots).
            if not green and row.get("err") == "no_oracle":
                green = (row.get("spark_rows") or 0) > 0
            if green:
                best[name] = max(best.get(name, 0), rnd)
    return best


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver checks a fixed-size prefix, so ordering IS evidence
    policy. Rank by what a green row would prove, computed from the
    CORRECTNESS_r*.json history on disk (self-maintaining across
    rounds):

    1. the pinned prefix (``_PIN_FIRST``),
    2. full-oracle queries with no green row in ANY round (a hash match
       is the strongest new evidence),
    3. queries whose code changed after their last green row
       (``_CHANGED_SINCE_GREEN`` — manual, the history can't see code),
    4. rows-only queries with no green row (a row only proves rows>0;
       their real gates are pytest recall/accuracy checks),
    5. at most ``_ROWS_ONLY_REWITNESS_CAP`` previously-green rows-only
       queries, stalest first (VERDICT r10 #5: a rows-only re-witness
       can never produce hash evidence, so the 11 of them must not
       consume 22% of the window every idle round),
    6. every previously-green oracle-backed query, oldest green round
       first (stalest hash witness re-freshened first),
    7. the remaining rows-only queries (outside the window by
       construction; the sweeps still run them registry-wide).
    """
    reg = _registry()
    greens = _green_history()
    seen: set[str] = set()

    def take(names):
        out = []
        for n in names:
            if n in reg and n not in seen:
                seen.add(n)
                out.append(n)
        return out

    ordered = take(_PIN_FIRST)
    never = [n for n in reg if n not in greens]
    ordered += take([n for n in never if reg[n].oracle is not None])
    ordered += take(
        n
        for n, rnd in _CHANGED_SINCE_GREEN
        # Oracle-bearing only — a rows-only row is always no_oracle and
        # can never expire the entry, so a slot here would be wasted
        # every round (guard; the list itself should not contain any).
        if greens.get(n, 0) < rnd and n in reg and reg[n].oracle is not None
    )
    ordered += take([n for n in never if reg[n].oracle is None])
    rest = [n for n in reg if n not in seen]
    by_staleness = sorted(rest, key=lambda n: greens.get(n, 0))
    rows_only = [n for n in by_staleness if reg[n].oracle is None]
    ordered += take(rows_only[:_ROWS_ONLY_REWITNESS_CAP])
    ordered += take(n for n in by_staleness if reg[n].oracle is not None)
    ordered += take(rows_only[_ROWS_ONLY_REWITNESS_CAP:])
    return {name: reg[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: qd.oracle for name, qd in _registry().items() if qd.oracle is not None
    }
