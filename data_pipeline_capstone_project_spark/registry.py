"""Query registry: one entry per implemented SURVEY §2 operator.

``QUERIES[name]`` is a ``(spark, sf_dir) -> DataFrame`` callable;
``ORACLES[name]`` is the equivalent ANSI SQL DuckDB runs over the same
parquet tables. Names are shared - the driver hash-compares the two at
sf0.01. Queries with no SQL-expressible oracle (streaming, KMeans) are
registered without an oracle and carry their own pytest property checks.

SURVEY §2 coverage map (reference operators):
  q1_history          J1 J2 A5 A6 W1 W2 K5 (flagship, entry())
  rolling_engagement  A1 A2 A3 A4 A12 (+ sentinel faithful/clean)
  latest_wins         W4 ST2 K1 (batch form of the streaming merge)
  top_k_per_group     W3 A8
  recent_n_per_user   W5 ST6
  asof_enrichment     J4
  posts_flatten       F3 F4 F5 F6 F10 F14 F16 (+ S1-S3 readers)
  anti_join           J3 S9 O4
  scalar_suite        F5 F6 F7 F8 F15 F17 (+ F18 arithmetic)
  quality_gates       A10 A11 (incl. the reference's latent bug)
  pricing_summary     bench headline (scan-heavy agg)
  keyword_search      ES keyword search (README.md:154): contains /
                      token / rlike predicates
  color_palette       S4 A7 A8 A9 U1 U2 (applyInPandas KMeans, U3 bug
                      fixed; exact-JSON oracle since r8 via the
                      provable-optimum fixture family)
  streaming_upsert    ST1 ST2 O1 (readStream + foreachBatch merge,
                      two-epoch incremental pickup)
  streaming_window_agg ST5 extension: watermarked tumbling event-time
                      windows, availableNow trigger (ST3)
  streaming_stateful  ST1/ST2 generalization: explicit per-key
                      GroupState via applyInPandasWithState
  streaming_dedup     ST2 dual: dropDuplicatesWithinWatermark absorbs
                      at-least-once re-delivery in-stream
  json_lake_ingest    S1 S2 S3 F3 F4 F5 F10 W4 end-to-end (the whole
                      Lambda path §3.1 as one declarative pipeline)
  streaming_join      §2.9 extension: stream-stream interval join,
                      dual watermarks bounding both sides' state
  streaming_session   §2.9 extension: native session_window merging
                      windows; sentinel advances the final watermark
  semi_join           J3's positive twin (EXISTS without fan-out)
  set_ops / _fused    §2.7: UNION/INTERSECT/EXCEPT as real plans +
                      the single-scan flag-agg rewrite (1 scan vs 6)
  skew_salted_join    hot-key mitigation: salted fact x 16-replicated
                      dim over forced SMJ (where AQE can't reach)
  pricing_grouping_sets  arbitrary GROUPING SETS (3x Expand vs CUBE 4x)
  user_rank_suite     rank/dense_rank/percent_rank/cume_dist/ntile,
                      one Window node, deterministic ntile tiebreak
  (sinks K2 K3 K5 K6  sources/writers.py + tests/test_writers.py;
   bucketed layout    tests/test_bucketing.py zero-Exchange joins;
   clustered layout   writers.write_clustered row-group/file skipping,
                      footer-stats proof in tests/test_writers.py;
   z-order layout     writers.write_zordered Morton-curve interleave,
                      either-dimension skipping proof in same file;
   image source S4    tests/test_image_source.py, stdlib-built PNGs)

Training-data-pipeline extensions (BASELINE.json north star):
  text analysis       text_stats lang_id token_count doc_fingerprint
                      vocab_top_terms tfidf_top_terms
  deduplication       dedup_exact dedup_ngram_jaccard dedup_minhash_lsh
                      dedup_simhash dedup_embedding_cosine
                      dedup_clusters (min-label propagation CC)
                      dedup_clusters_star (large/small-star CC,
                      diameter-independent O(log^2 n) rounds)
                      streaming_lsh_dedup (incremental LSH index:
                      per-batch work ~ batch size, not corpus)
  sampling            train_test_split (hash-mod + exact-stratified)
  similarity search   similarity_topk (exact) similarity_lsh_ann
                      similarity_ivf_ann label_centroids
                      similarity_quantized (int8 + exact-int scoring +
                      full-precision rerank, recall-gated)
  inference           doc_score_inference (Arrow-batched mapInPandas
                      scoring; JVM-side featurization)
  sketches            approx_distinct (HLL++ vs exact, property-gated)
                      value_percentiles (nearest-rank exact + GK approx)
                      heavy_hitters (Misra-Gries sketch-then-verify,
                      bounded memory, exact output)
  range join          interval_join (equi key + range residual;
                      A4/ST5-adjacent window attribution)
  frame windows       user_timeseries (lag/moving-sum/running-count,
                      single Window-node plan; §2.6 extension)
  multimodal          multimodal_meta (mapInPandas decode plumbing)
                      frame_sample (strided binary frame extraction)
  perceptual dedup    image_phash_dedup (dHash over real PNG/BMP
                      decode) audio_fingerprint_dedup (AFP64 over the
                      WAV surface) video_phash_dedup (last-frame
                      dHash through the bit-level H.264 I+P decoder)
                      - one shared banded-Hamming-LSH pair join,
                      scalar-twin oracles (r11)
  video temporal      video_scene_cuts (shot-boundary census:
                      consecutive-frame dHash over decoded I/P
                      streams, r11)
  data prep           doc_chunking (overlapping token windows, pure
                      generate - no shuffle)
                      pii_redaction (URL/email/phone regexp chain,
                      engine-portable patterns)
  multiway joins      tpch_shipping_priority (Q3 shape: 3-way join +
                      TakeOrderedAndProject top-k)
                      tpch_regional_volume (Q5 shape: 6-table star,
                      broadcast dim chain, co-nation residual)
  scd2                scd2_history (W4 generalization: every version
                      kept with [valid_from, valid_to) + current flag)
  stats               stats_suite (corr/covar/stddev/regression from
                      one pass of exact sufficient statistics -
                      deterministic where Welford-merge aggs are not)
  range frames        time_range_window (7-day trailing RANGE frame
                      over irregular event times)
  histogram           price_histogram (fixed-bin, map-side combinable,
                      deterministic full-data distribution sketch)
  having/enrich       tpch_big_spenders (Q18 shape: aggregate-HAVING
                      before joins)
  subquery            above_customer_avg (correlated scalar subquery
                      decorrelated into one window: 1 scan, 1 exchange)
  null semantics      null_semantics (null group keys, count(*) vs
                      count(col), null-safe join keeps NULL group)
  temporal scalars    datetime_suite (portable extraction/trunc/
                      calendar-arithmetic/epoch/format surface)
  graph (iterative)   pagerank (fixed-point integer ranks; DataFrame
                      loop bit-identical to unrolled-CTE oracle)
  behavioral          rolling_distinct (sliding distinct via
                      dedupe-then-fan-out) funnel (ordered stages)
                      cohort_retention (weekly cohort triangle)
  features            feature_hashing (md5 hashing trick, 0 shuffles)
                      fuzzy_match (blocked levenshtein, never
                      cartesian) random_projection (JL 64->8,
                      constant md5 planes, map-side)
  incremental aggs    incremental_agg (mergeable partial states,
                      O(keys) maintenance == full recompute)
  reshaping           event_unpivot (melt via Expand - one scan)
                      gap_fill (date spine + forward fill without
                      IGNORE NULLS)
                      global_row_ids (distributed zipWithIndex:
                      bucket ranks + broadcast prefix offsets)

Round-2 additions:
  cdc_merge           three-verb MERGE INTO (delete/update/insert)
                      as one anti-join + union - completes the W4/
                      scd2 upsert family
  array_functions_suite  full higher-order-function algebra
                      (transform/filter/aggregate/zip_with/exists/
                      slice) over per-order arrays, integer-exact
  feature_scaling     z-score + min-max from exact decimal sufficient
                      stats, broadcast-joined back (no full-table
                      window)
  feature_binning     equi-depth ntile buckets + one-hot bitmask,
                      total-order-deterministic tiebreaks
  asof_nearest        bidirectional nearest as-of (J4 generalized):
                      two frames over ONE sort, ties to backward
  winnowing_fingerprint  MOSS winnowing (SIGMOD'03) fingerprints as
                      pure array expressions - zero shuffle, no
                      explode
  time_rollup         hypertable-style month/day/hour continuous
                      aggregate: one scan, one Expand, one agg
  join_types_suite    inner/left/right/full/semi/anti/cross/theta
                      join matrix with count evidence per mode
  tpch_market_share   Q8 shape: conditional-agg market share over the
                      full star, one aggregate for num+den
  tpch_promo_revenue  Q14 shape: broadcast part dim, promo share per
                      ship month, zero pre-agg shuffles
  tpch_parts_supplier Q16 shape: two-phase COUNT(DISTINCT) over the
                      fact-derived part-supplier relation
  grouped_median      exact per-group median/quartiles via rank
                      selection (parallel per group, no global sort)
  ewma_smoothing      true per-key recurrence (integer EWMA) as a
                      JVM-side F.aggregate fold over per-key sorted
                      arrays (the applyInPandas loop remains the
                      long-key scale path), exact against a
                      recursive-CTE oracle
  map_functions_suite MapType algebra (from_entries/transform_values/
                      map_filter/map_concat/element_at), canonical
                      string at the output edge
  triangle_count      triangle enumeration on the frequent
                      co-occurrence graph; support threshold prunes
                      the quadratic pair fan-out first
  json_functions_suite  get_json_object / from_json / to_json over
                      the props JSON column, canonical compact output
  string_functions_suite  pad/reverse/translate/replace/position/
                      left/right/substring_index/concat_ws (the
                      engine-portable subset, deliberately excluding
                      soundex/initcap/format_number)
  sketch_rollup       per-day DataSketches HLL unioned to month via
                      hll_union_agg - rollups never rescan the fact;
                      merged estimate property-gated at 5%
  data_quality_suite  A10/A11 generalized: uniqueness, FK integrity,
                      null rate, domain range, volume - one report
                      row per constraint
  retention_prune     ST6 retention policy as a partition-level
                      dry-run report (expired flag per day)
  tpch_revenue_filter Q6 shape: pure filter-sum, every predicate
                      pushed to the scan
  tpch_shipmode_priority  Q12 shape: CASE aggregation after a
                      fact-fact join, one pass for both classes
  tpch_discounted_revenue Q19 shape: OR-of-ANDs band predicate as a
                      join residual, never a union of joins
  safe_arithmetic_suite  try_cast/try_divide/nullif error-safe scalar
                      semantics (NULL, never error or Inf)
  window_navigation_suite  first/last/nth_value IGNORE NULLS + lead
                      default, one Window node

Round-3 additions (full table with scale notes: SURVEY.md §8):
  upsert_audit image_decode color_palette_png    reference-fidelity
                      closures (ES _version audit, real PNG decode)
  decontamination gopher_quality repetition_filter sequence_packing
  dedup_resolution source_mixture corpus_dup_ngrams lm_rarity
  curation_funnel importance_resampling          published-paper
                      corpus-curation family (GPT-3 App C, Gopher
                      A1.1, Lee et al. 2021, CCNet, Conneau & Lample
                      2019, DSIR Xie et al. 2023)
  kmeans_lloyd semantic_dedup                    distributed Lloyd's
                      + SemDeDup (Abbas et al. 2023), integer-exact
  keyword_search_ranked ann_recall               retrieval ranking +
                      recall@k evaluation
  tpch_customer_distribution .. tpch_part_promotion  the remaining
                      TPC-H shapes - all 22 now covered (Q2/Q11/Q20
                      via the lineitem-derived partsupp proxy)
  api_ingest streaming_api_ingest                S10 HTTP ingest as
                      Spark 4 Python Data Source (batch + stream)
  streaming_transform_state                      Spark 4
                      transformWithState, runtime-gated with an
                      applyInPandasWithState twin
  bloom_dedup                                    Bloom membership
                      gate: one bit_or pass -> 32 KB broadcast filter
  substring_dedup                                exact duplicated-span
                      removal (Lee et al. 2022 ExactSubstr re-shaped
                      as two linear shuffles: by gram hash, by doc)
  dedup_eval                                     banding-scheme
                      precision/recall vs exact inverted-index ground
                      truth (the dedup twin of ann_recall)
  similarity_join_exact                          AllPairs/PPJoin
                      prefix-filtered exact similarity self-join,
                      hash-checked pair-identical to the naive plan
  variant_json_suite                             Spark 4 VARIANT:
                      parse_json once -> typed variant_get paths,
                      try_variant_get error-safe missing-path reads
  balanced_sample                                class-balanced
                      downsampling to the minority stratum size,
                      deterministic md5 pick order
  leakage_safe_split                             train/val/test split
                      hashing the near-dup CLUSTER id, so duplicate
                      groups never straddle splits (Lee et al. 2022)
  adaptive_quality_filter                        per-language quality
                      decile threshold (ROOTS calibration) via one
                      lang-keyed percent_rank window
  quantile_rollup                                mergeable fixed-bin
                      histogram quantiles: coarse grains are bin-count
                      SUMS, never a fact rescan (sketch_rollup twin)
  anomaly_mad                                    Hampel outlier filter
                      (median/MAD), two exact-median aggs + broadcast
  bigram_lm_score                                CCNet-style fluency
                      filter: bigram stupid-backoff LM trained on the
                      90% slice, held-out docs scored in exact
                      fixed-point surprise
  cross_corpus_overlap                           exact source-pair
                      n-gram Jaccard matrix; gram-keyed self-join
                      with fanout bounded by source cardinality
  lang_id_eval                                   confusion matrix +
                      per-label recall for lang_id (eval-twin pattern)
  bpe_train                                      BPE tokenizer
                      training: one corpus-sized shuffle to the word-
                      frequency table, then K merge rounds on the
                      Zipf-bounded vocab (greedy fold, exact oracle)
  bpe_encode                                     tokenize under the
                      learned merges, once per DISTINCT word; per-doc
                      subword counts via broadcastable vocab join
  vocab_growth                                   Heaps'-law gram-
                      vocabulary growth curve; first-occurrence as an
                      associative min aggregate, no ordered scan
  streaming_quantile                             incremental mergeable
                      histogram store; per-batch fold, bit-identical
                      to the batch rollup (same oracle)
  k_anonymity                                    privacy release gate:
                      QI combos smaller than k flagged for
                      suppression, one map-combinable groupBy
  line_dedup                                     CCNet paragraph-hash
                      boilerplate removal that REWRITES docs: first
                      corpus-order occurrence survives, cleaned text
                      reconstructed; one segment-keyed window + one
                      doc-keyed groupBy, both linear
  gif_decode                                     from-scratch GIF
                      codec: variable-width LZW, animation (GCE
                      delays/transparency), interlace, local color
                      tables; per-frame RGB hash vs source arrays
  audio_features                                 windowed audio QC
                      (silence/clipping/zero-crossing/energy) over
                      the exact WAV decode, all-integer folds,
                      zero-exchange mapInPandas scan
  zorder_layout                                  Morton-curve layout
                      planner (Delta OPTIMIZE ZORDER shape): bucket
                      ranks -> bit interleave -> range partition ->
                      per-file zone map for two-dimension skipping
  flac_decode                                    from-scratch FLAC
                      decode (RFC 9639): Rice residuals, fixed+LPC
                      predictors, stereo decorrelation, CRC-8/16 +
                      STREAMINFO MD5 verified end-to-end
  audio_resample                                 2:1 rate normalization:
                      integer half-band FIR decimation, bit-exact
                      int64 convolution per channel, decode ->
                      transform -> fold in one mapInPandas scan
  mp3_meta                                       MP3 frame-header walk:
                      CBR+VBR bitrates, MPEG-1/2, ID3v2/v1 skip,
                      exact duration from samples-per-frame; decode
                      stays an honest seam like H.264
  streaming_media_ingest                         incremental binaryFile
                      stream -> per-batch codec dispatch; corrupt
                      payloads become logged error rows, never a
                      stream crash; exact oracle incl. error rows
  bm25_search                                    Lucene-family BM25
                      (the reference's ES scoring): integer-argument
                      idf lns via a deterministic range-reduced
                      series, bit-identical across engines; corpus
                      constants from one stats pass (r8)
  h264_frames                                    from-scratch H.264
                      baseline I-frame luma decode: I_PCM +
                      zero-residual Intra_16x16 V/H/DC/Plane, CAVLC
                      coeff_token, nC neighbour rules; oracle pins
                      plane CRCs from an independent spec simulator
                      (r8; P/B/residuals stay honest seams)
  streaming_topk                                 EDBT'20 incremental
                      top-k maintenance: per-batch scoring + k-row
                      monotone merge in foreachBatch; the standing
                      result equals the batch answer exactly (r8)
  fused_sql_inference                            ICDE'25 operator
                      fusion: the linear quality model as pure int64
                      column arithmetic inside one codegen span -
                      zero Python, zero exchange, exact margins (r8)
  binary_put_sink                                K4 closed (r8): the
                      reference's idempotent keyed blob put as a real
                      mapInPandas sink - computed original/children/
                      thumbnail keysets, write-if-absent, two passes
                      hash-checked (pass 2 writes nothing)
"""

from __future__ import annotations

from .operators.analytics import (
    ANOMALY_MAD_ORACLE_SQL,
    QUANTILE_ROLLUP_ORACLE_SQL,
    anomaly_mad_query,
    quantile_rollup_query,
    EVENT_PIVOT_ORACLE_SQL,
    PRICING_GROUPING_SETS_ORACLE_SQL,
    PRICING_ROLLUP_ORACLE_SQL,
    SESSIONIZE_ORACLE_SQL,
    SKEW_SALTED_AGG_ORACLE_SQL,
    SKEW_SALTED_JOIN_ORACLE_SQL,
    USER_RANK_SUITE_ORACLE_SQL,
    event_pivot_query,
    pricing_grouping_sets_query,
    pricing_rollup_query,
    sessionize_query,
    skew_salted_agg_query,
    skew_salted_join_query,
    user_rank_suite_query,
)
from .operators.asof import ASOF_ORACLE_SQL, asof_query
from .operators.inference import (
    DOC_SCORE_ORACLE_SQL,
    FUSED_SQL_INFERENCE_ORACLE_SQL,
    doc_score_inference_query,
    fused_sql_inference_query,
)
from .operators.dedup import (
    DEDUP_THRESHOLD_SWEEP_ORACLE_SQL,
    DEDUP_THRESHOLD_SWEEP_PAIRS_ORACLE_SQL,
    dedup_threshold_sweep_query,
    dedup_threshold_sweep_pairs_query,
    BLOOM_DEDUP_ORACLE_SQL,
    DEDUP_EMBEDDING_ORACLE_SQL,
    DEDUP_EVAL_ORACLE_SQL,
    DEDUP_EXACT_ORACLE_SQL,
    DEDUP_MINHASH_ORACLE_SQL,
    DEDUP_NGRAM_ORACLE_SQL,
    DEDUP_SIMHASH_ORACLE_SQL,
    SUBSTRING_DEDUP_ORACLE_SQL,
    bloom_dedup_query,
    dedup_embedding_query,
    dedup_eval_query,
    dedup_exact_query,
    dedup_minhash_query,
    dedup_ngram_query,
    dedup_simhash_query,
    similarity_join_exact_query,
    substring_dedup_query,
)
from .operators.colors import (
    COLOR_PALETTE_ORACLE_SQL,
    COLOR_PALETTE_PROPS_ORACLE_SQL,
    color_palette_props_query,
    color_palette_query,
)
from .operators.flatten import POSTS_FLATTEN_ORACLE_SQL, posts_flatten_query
from .operators.multimodal import (
    FRAME_SAMPLE_ORACLE_SQL,
    MULTIMODAL_META_ORACLE_SQL,
    frame_sample_query,
    multimodal_meta_query,
)
from .operators.quality import (
    DATA_QUALITY_SUITE_ORACLE_SQL,
    K_ANONYMITY_ORACLE_SQL,
    QUALITY_GATES_ORACLE_SQL,
    RETENTION_PRUNE_ORACLE_SQL,
    data_quality_suite_query,
    k_anonymity_query,
    quality_gates_query,
    retention_prune_query,
)
from .operators.relational import (
    ABOVE_CUSTOMER_AVG_ORACLE_SQL,
    ANTI_JOIN_ORACLE_SQL,
    DATETIME_SUITE_ORACLE_SQL,
    NULL_SEMANTICS_ORACLE_SQL,
    PRICING_SUMMARY_ORACLE_SQL,
    SCALAR_SUITE_ORACLE_SQL,
    SEMI_JOIN_ORACLE_SQL,
    SET_OPS_ORACLE_SQL,
    above_customer_avg_query,
    anti_join_query,
    datetime_suite_query,
    null_semantics_query,
    pricing_summary_query,
    scalar_suite_query,
    semi_join_query,
    set_ops_fused_query,
    set_ops_query,
)
from .operators.topk import (
    RECENT_N_ORACLE_SQL,
    TOP_K_ORACLE_SQL,
    recent_n_query,
    top_k_query,
)
from .operators.search import (
    KEYWORD_SEARCH_ORACLE_SQL,
    KEYWORD_SEARCH_RANKED_ORACLE_SQL,
    keyword_search_query,
    keyword_search_ranked_query,
)
from .operators.similarity import (
    EMBEDDING_QUALITY_ORACLE_SQL,
    embedding_quality_query,
    SIMILARITY_IVF_ORACLE_SQL,
    SIMILARITY_LSH_ORACLE_SQL,
    SIMILARITY_QUANTIZED_ORACLE_SQL,
    SIMILARITY_TOPK_ORACLE_SQL,
    _ann_recall_oracle,
    ann_recall_query,
    similarity_ivf_query,
    similarity_lsh_query,
    similarity_quantized_query,
    similarity_topk_query,
)
from .operators.text import (
    SOURCE_VOCAB_DRIFT_ORACLE_SQL,
    source_vocab_drift_query,
    FINGERPRINT_ORACLE_SQL,
    HEAVY_HITTERS_ORACLE_SQL,
    LANG_ID_ORACLE_SQL,
    LANG_ID_EVAL_ORACLE_SQL,
    VOCAB_GROWTH_ORACLE_SQL,
    lang_id_eval_query,
    vocab_growth_query,
    TEXT_STATS_ORACLE_SQL,
    TFIDF_ORACLE_SQL,
    TOKEN_COUNT_ORACLE_SQL,
    VOCAB_ORACLE_SQL,
    fingerprint_query,
    heavy_hitters_query,
    lang_id_query,
    text_stats_query,
    tfidf_query,
    token_count_query,
    vocab_top_terms_query,
)
from .operators.curation import (
    ADAPTIVE_QUALITY_ORACLE_SQL,
    BIGRAM_LM_ORACLE_SQL,
    CROSS_CORPUS_OVERLAP_ORACLE_SQL,
    adaptive_quality_filter_query,
    bigram_lm_score_query,
    cross_corpus_overlap_query,
    DECONTAMINATION_ORACLE_SQL,
    DEDUP_RESOLUTION_ORACLE_SQL,
    GOPHER_QUALITY_ORACLE_SQL,
    SEQUENCE_PACKING_ORACLE_SQL,
    PACKING_EFFICIENCY_ORACLE_SQL,
    REPETITION_FILTER_ORACLE_SQL,
    SOURCE_MIXTURE_ORACLE_SQL,
    CORPUS_DUP_NGRAMS_ORACLE_SQL,
    CURATION_FUNNEL_ORACLE_SQL,
    IMPORTANCE_RESAMPLING_ORACLE_SQL,
    LM_RARITY_ORACLE_SQL,
    corpus_dup_ngrams_query,
    curation_funnel_query,
    importance_resampling_query,
    decontamination_query,
    dedup_resolution_query,
    gopher_quality_query,
    lm_rarity_query,
    repetition_filter_query,
    sequence_packing_query,
    packing_efficiency_query,
    source_mixture_query,
)
from .operators.images import (
    COLOR_PALETTE_PNG_ORACLE_SQL,
    IMAGE_DECODE_ORACLE_SQL,
    color_palette_png_query,
    image_decode_query,
)
from .operators.ebml import (
    WEBM_BLOCK_CENSUS_ORACLE_SQL,
    WEBM_META_ORACLE_SQL,
    webm_block_census_query,
    webm_meta_query,
)
from .operators.afp import (
    audio_fingerprint_dedup_query,
    audio_fingerprint_oracle,
    audio_transcode_qa_oracle,
    audio_transcode_qa_query,
)
from .operators.phash import image_phash_dedup_query, image_phash_oracle
from .operators.vphash import (
    video_phash_dedup_query,
    video_phash_oracle,
    video_scene_cuts_query,
    video_scene_cuts_oracle,
)
from .operators.exif import EXIF_META_ORACLE_SQL, exif_meta_query
from .operators.ogg import OGG_META_ORACLE_SQL, ogg_meta_query
from .operators.search import (
    BM25_SEARCH_ORACLE_SQL,
    HYBRID_SEARCH_RRF_ORACLE_SQL,
    bm25_search_query,
    hybrid_search_rrf_query,
)  # the rest of operators.search is imported with the r3 block below
from .streaming.topk_stream import (
    STREAMING_TOPK_ORACLE_SQL,
    streaming_topk_query,
)
from .operators.binary_sink import (
    BINARY_PUT_SINK_ORACLE_SQL,
    binary_put_sink_query,
)
from .operators.h264_decode import (
    h264_frames_oracle_sql,
    h264_frames_query,
)
from .operators.webdataset import (
    WEBDATASET_PACK_ORACLE_SQL,
    webdataset_pack_query,
)
from .operators.subtitles import (
    CAPTION_FRAME_ALIGN_ORACLE_SQL,
    SUBTITLE_PARSE_ORACLE_SQL,
    caption_frame_align_query,
    subtitle_parse_query,
)
from .operators.h264 import (
    H264_META_ORACLE_SQL,
    H264_NAL_CENSUS_ORACLE_SQL,
    h264_meta_query,
    h264_nal_census_query,
)
from .operators.jpeg import JPEG_DECODE_ORACLE_SQL, jpeg_decode_query
from .operators.mp4 import (
    MP4_AUDIO_META_ORACLE_SQL,
    MP4_META_ORACLE_SQL,
    VIDEO_FRAMES_ORACLE_SQL,
    mp4_audio_meta_query,
    mp4_meta_query,
    video_frames_query,
)
from .operators.audio import (
    AUDIO_FEATURES_ORACLE_SQL,
    AUDIO_RESAMPLE_ORACLE_SQL,
    WAV_STATS_ORACLE_SQL,
    audio_features_query,
    audio_resample_query,
    wav_stats_query,
)
from .operators.multimodal import (
    MEDIA_DISPATCH_ORACLE_SQL,
    media_dispatch_query,
)
from .operators.upsert import (
    LATEST_WINS_ORACLE_SQL,
    UPSERT_AUDIT_ORACLE_SQL,
    latest_wins_query,
    upsert_audit_query,
)
from .streaming.upsert_stream import (
    STREAMING_UPSERT_ORACLE_SQL,
    streaming_upsert_query,
)
from .streaming.windowed import (
    STREAMING_WINDOW_ORACLE_SQL,
    streaming_window_query,
)
from .streaming.stateful import (
    STREAMING_STATEFUL_ORACLE_SQL,
    streaming_stateful_query,
)
from .streaming.transform_state import (
    STREAMING_TRANSFORM_STATE_ORACLE_SQL,
    streaming_transform_state_query,
)
from .streaming.late_data import (
    STREAMING_LATE_DATA_ORACLE_SQL,
    streaming_late_data_query,
)
from .streaming.dedup_stream import (
    STREAMING_DEDUP_ORACLE_SQL,
    streaming_dedup_query,
)
from .streaming.api_stream import streaming_api_ingest_query
from .streaming.lsh_dedup_stream import streaming_lsh_dedup_query
from .streaming.join_stream import (
    STREAMING_JOIN_ORACLE_SQL,
    streaming_join_query,
)
from .streaming.session_stream import (
    STREAMING_SESSION_ORACLE_SQL,
    streaming_session_query,
)
from .streaming.multi_sink import (
    STREAMING_MULTI_SINK_ORACLE_SQL,
    streaming_multi_sink_query,
)
from .sources.ingest_lake import (
    JSON_LAKE_INGEST_ORACLE_SQL,
    json_lake_ingest_query,
)
from .operators.sampling import (
    BALANCED_SAMPLE_ORACLE_SQL,
    balanced_sample_query,
    TRAIN_TEST_SPLIT_ORACLE_SQL,
    WEIGHTED_SAMPLE_ORACLE_SQL,
    train_test_split_query,
    weighted_sample_query,
)
from .streaming.quantile_stream import streaming_quantile_query
from .operators.bpe import (
    BPE_ENCODE_ORACLE_SQL,
    BPE_TRAIN_ORACLE_SQL,
    bpe_encode_query,
    bpe_train_query,
)
from .operators.clustering import (
    DEDUP_CLUSTERS_ORACLE_SQL,
    LEAKAGE_SAFE_SPLIT_ORACLE_SQL,
    dedup_clusters_query,
    dedup_clusters_star_query,
    leakage_safe_split_query,
)
from .operators.similarity import (
    LABEL_CENTROIDS_ORACLE_SQL,
    RANDOM_PROJECTION_ORACLE_SQL,
    label_centroids_query,
    random_projection_query,
)
from .operators.analytics import (
    APPROX_DISTINCT_ORACLE_SQL,
    ARGMINMAX_ORACLE_SQL,
    PRICE_HISTOGRAM_ORACLE_SQL,
    PRICING_CUBE_ORACLE_SQL,
    STATS_SUITE_ORACLE_SQL,
    TIME_RANGE_WINDOW_ORACLE_SQL,
    USER_TIMESERIES_ORACLE_SQL,
    VALUE_PERCENTILES_ORACLE_SQL,
    approx_distinct_query,
    argminmax_query,
    price_histogram_query,
    pricing_cube_query,
    stats_suite_query,
    time_range_window_query,
    user_timeseries_query,
    value_percentiles_query,
)
from .operators.asof import INTERVAL_JOIN_ORACLE_SQL, interval_join_query
from .operators.tpch import (
    BIG_SPENDERS_ORACLE_SQL,
    DISCOUNTED_REVENUE_ORACLE_SQL,
    MARKET_SHARE_ORACLE_SQL,
    PARTS_SUPPLIER_ORACLE_SQL,
    PROMO_REVENUE_ORACLE_SQL,
    REGIONAL_VOLUME_ORACLE_SQL,
    REVENUE_FILTER_ORACLE_SQL,
    SHIPMODE_PRIORITY_ORACLE_SQL,
    SHIPPING_PRIORITY_ORACLE_SQL,
    big_spenders_query,
    discounted_revenue_query,
    market_share_query,
    parts_supplier_query,
    promo_revenue_query,
    regional_volume_query,
    revenue_filter_query,
    shipmode_priority_query,
    shipping_priority_query,
    CUSTOMER_DISTRIBUTION_ORACLE_SQL,
    SALES_OPPORTUNITY_ORACLE_SQL,
    customer_distribution_query,
    sales_opportunity_query,
    WAITING_SUPPLIERS_ORACLE_SQL,
    waiting_suppliers_query,
    ORDER_PRIORITY_ORACLE_SQL,
    PRODUCT_PROFIT_ORACLE_SQL,
    RETURNED_ITEMS_ORACLE_SQL,
    SMALL_QUANTITY_REVENUE_ORACLE_SQL,
    TOP_SUPPLIER_ORACLE_SQL,
    VOLUME_SHIPPING_ORACLE_SQL,
    order_priority_query,
    product_profit_query,
    returned_items_query,
    small_quantity_revenue_query,
    top_supplier_query,
    volume_shipping_query,
)
from .operators.tpch_supply import (
    IMPORTANT_STOCK_ORACLE_SQL,
    MIN_COST_SUPPLIER_ORACLE_SQL,
    PART_PROMOTION_ORACLE_SQL,
    important_stock_query,
    min_cost_supplier_query,
    part_promotion_query,
)
from .sources.api_source import API_INGEST_ORACLE_SQL, api_ingest_query
from .operators.kmeans import (
    KMEANS_LLOYD_ORACLE_SQL,
    SEMANTIC_DEDUP_ORACLE_SQL,
    kmeans_lloyd_query,
    semantic_dedup_query,
)
from .operators.scd import SCD2_HISTORY_ORACLE_SQL, scd2_history_query
from .operators.graph import (
    BFS_DISTANCES_ORACLE_SQL,
    PAGERANK_ORACLE_SQL,
    TRIANGLE_COUNT_ORACLE_SQL,
    bfs_distances_query,
    pagerank_query,
    triangle_count_query,
)
from .operators.incremental import (
    INCREMENTAL_AGG_ORACLE_SQL,
    incremental_agg_query,
)
from .operators.behavioral import (
    COHORT_RETENTION_ORACLE_SQL,
    FUNNEL_ORACLE_SQL,
    ROLLING_DISTINCT_ORACLE_SQL,
    cohort_retention_query,
    funnel_query,
    rolling_distinct_query,
)
from .operators.features import (
    FEATURE_HASHING_ORACLE_SQL,
    FUZZY_MATCH_ORACLE_SQL,
    feature_hashing_query,
    fuzzy_match_query,
)
from .operators.prep import (
    DOC_CHUNKING_ORACLE_SQL,
    PII_REDACTION_ORACLE_SQL,
    doc_chunking_query,
    pii_redaction_query,
)
from .operators.reshape import (
    EVENT_UNPIVOT_ORACLE_SQL,
    GAP_FILL_ORACLE_SQL,
    GLOBAL_ROW_IDS_ORACLE_SQL,
    event_unpivot_query,
    gap_fill_query,
    global_row_ids_query,
)
from .operators.arrays import (
    ARRAY_FUNCTIONS_ORACLE_SQL,
    MAP_FUNCTIONS_ORACLE_SQL,
    array_functions_suite_query,
    map_functions_suite_query,
)
from .operators.smoothing import EWMA_ORACLE_SQL, ewma_smoothing_fused_query
from .operators.cdc import CDC_MERGE_ORACLE_SQL, cdc_merge_query
from .operators.features import (
    FEATURE_BINNING_ORACLE_SQL,
    FEATURE_SCALING_ORACLE_SQL,
    feature_binning_query,
    feature_scaling_query,
)
from .operators.asof import ASOF_NEAREST_ORACLE_SQL, asof_nearest_query
from .operators.text import WINNOWING_ORACLE_SQL, winnowing_fingerprint_query
from .operators.analytics import (
    GROUPED_MEDIAN_ORACLE_SQL,
    SKETCH_ROLLUP_ORACLE_SQL,
    TIME_ROLLUP_ORACLE_SQL,
    grouped_median_query,
    sketch_rollup_query,
    time_rollup_query,
)
from .operators.relational import (
    JOIN_TYPES_ORACLE_SQL,
    JSON_FUNCTIONS_ORACLE_SQL,
    VARIANT_JSON_ORACLE_SQL,
    variant_json_suite_query,
    SAFE_ARITHMETIC_ORACLE_SQL,
    STRING_FUNCTIONS_ORACLE_SQL,
    WINDOW_NAVIGATION_ORACLE_SQL,
    join_types_suite_query,
    json_functions_suite_query,
    safe_arithmetic_suite_query,
    string_functions_suite_query,
    window_navigation_suite_query,
)
from .operators.boilerplate import (
    LINE_DEDUP_ORACLE_SQL,
    line_dedup_query,
)
from .operators.flac import (
    FLAC_DECODE_ORACLE_SQL,
    flac_decode_query,
)
from .operators.mp3 import (
    MP3_META_ORACLE_SQL,
    mp3_meta_query,
)
from .streaming.media_stream import (
    MEDIA_STREAM_ORACLE_SQL,
    streaming_media_ingest_query,
)
from .operators.gif import (
    GIF_DECODE_ORACLE_SQL,
    gif_decode_query,
)
from .operators.layout import (
    ZORDER_LAYOUT_ORACLE_SQL,
    zorder_layout_query,
)
from .operators.unigram import (
    TOKENIZER_FERTILITY_ORACLE_SQL,
    tokenizer_fertility_query,
    UNIGRAM_ENCODE_ORACLE_SQL,
    UNIGRAM_TRAIN_ORACLE_SQL,
    unigram_encode_query,
    unigram_train_query,
)
from .plans.engagement import ROLLING_ENGAGEMENT_ORACLE_SQL, rolling_engagement
from .plans.history import HISTORY_ORACLE_SQL, history_fact

QUERIES = {
    # Round-7 rotation: the driver's correctness gate reads the FIRST
    # 50 entries only. Window = ALL new r7 entries (unigram pair +
    # tokenizer_fertility from the early session; line_dedup,
    # gif_decode, zorder_layout, audio_features, flac_decode,
    # audio_resample, mp3_meta from the late session), the rows-only
    # color_palette, the entries whose implementation changed in r7
    # (mp4 multi-track fix, float32 WAV, PNG-variant image_decode,
    # BMP/GIF-extended media_dispatch), the 24 entries whose newest
    # driver evidence was r2 (VERDICT r6 item 3's list), then the
    # OLDEST r3 entries alphabetically - after r7 no entry's newest
    # driver row is older than r3. Entries displaced to keep the
    # window at 50 (fuzzy_match, funnel, feature_*, event_unpivot,
    # doc_score_inference, gap_fill...) retain their r3 driver rows
    # and their two-scale OK in VERIFICATION.md. Rotation history:
    # VERDICT r3 item 1 / r4 item 1 / r6 item 3. r10 rotation
    # (VERDICT r9 item 4): dedup_threshold_sweep(+_pairs) - the last
    # never-driver-checked entry - plus similarity_join_exact and
    # dedup_ngram_jaccard (all four share the r10 PPJoin
    # positional-filter rewrite) swapped in for pagerank,
    # scd2_history, streaming_dedup, streaming_upsert (each with
    # multiple green driver rows, newest r9).
    # r11 additions lead the gate window (never driver-checked yet):
    "image_phash_dedup": image_phash_dedup_query,
    "audio_fingerprint_dedup": audio_fingerprint_dedup_query,
    "video_phash_dedup": video_phash_dedup_query,
    "video_scene_cuts": video_scene_cuts_query,
    "h264_meta": h264_meta_query,
    "h264_nal_census": h264_nal_census_query,
    "webm_meta": webm_meta_query,
    "webm_block_census": webm_block_census_query,
    "subtitle_parse": subtitle_parse_query,
    "caption_frame_align": caption_frame_align_query,
    "webdataset_pack": webdataset_pack_query,
    "hybrid_search_rrf": hybrid_search_rrf_query,
    "bm25_search": bm25_search_query,
    "h264_frames": h264_frames_query,
    "binary_put_sink": binary_put_sink_query,
    "fused_sql_inference": fused_sql_inference_query,
    "streaming_topk": streaming_topk_query,
    "ogg_meta": ogg_meta_query,
    "exif_meta": exif_meta_query,
    "line_dedup": line_dedup_query,
    "gif_decode": gif_decode_query,
    "zorder_layout": zorder_layout_query,
    "unigram_train": unigram_train_query,
    "unigram_encode": unigram_encode_query,
    "tokenizer_fertility": tokenizer_fertility_query,
    "color_palette": color_palette_query,
    "mp4_meta": mp4_meta_query,
    "mp4_audio_meta": mp4_audio_meta_query,
    "video_frames": video_frames_query,
    "wav_stats": wav_stats_query,
    "audio_features": audio_features_query,
    "flac_decode": flac_decode_query,
    "audio_resample": audio_resample_query,
    "mp3_meta": mp3_meta_query,
    "audio_transcode_qa": audio_transcode_qa_query,
    "streaming_media_ingest": streaming_media_ingest_query,
    "media_dispatch": media_dispatch_query,
    "approx_distinct": approx_distinct_query,
    "array_functions_suite": array_functions_suite_query,
    "frame_sample": frame_sample_query,
    "grouped_median": grouped_median_query,
    "heavy_hitters": heavy_hitters_query,
    "interval_join": interval_join_query,
    "json_lake_ingest": json_lake_ingest_query,
    "keyword_search": keyword_search_query,
    "multimodal_meta": multimodal_meta_query,
    "dedup_threshold_sweep": dedup_threshold_sweep_query,
    "dedup_threshold_sweep_pairs": dedup_threshold_sweep_pairs_query,
    "similarity_ivf_ann": similarity_ivf_query,
    "similarity_lsh_ann": similarity_lsh_query,
    "similarity_topk": similarity_topk_query,
    "stats_suite": stats_suite_query,
    "dedup_ngram_jaccard": dedup_ngram_query,
    "streaming_stateful": streaming_stateful_query,
    "similarity_join_exact": similarity_join_exact_query,
    "streaming_window_agg": streaming_window_query,
    "tpch_market_share": market_share_query,
    "tpch_regional_volume": regional_volume_query,
    "tpch_shipping_priority": shipping_priority_query,
    "train_test_split": train_test_split_query,
    "value_percentiles": value_percentiles_query,
    "argminmax": argminmax_query,
    "asof_nearest": asof_nearest_query,
    "cohort_retention": cohort_retention_query,
    "data_quality_suite": data_quality_suite_query,
    "datetime_suite": datetime_suite_query,
    "dedup_clusters_star": dedup_clusters_star_query,
    "dedup_simhash": dedup_simhash_query,
    "doc_chunking": doc_chunking_query,
    "image_decode": image_decode_query,
    # --- end of round-10 gate window (50) ---
    "above_customer_avg": above_customer_avg_query,
    "doc_score_inference": doc_score_inference_query,
    "event_unpivot": event_unpivot_query,
    "feature_binning": feature_binning_query,
    "feature_hashing": feature_hashing_query,
    "feature_scaling": feature_scaling_query,
    "funnel": funnel_query,
    "fuzzy_match": fuzzy_match_query,
    "gap_fill": gap_fill_query,
    "global_row_ids": global_row_ids_query,
    "tpch_volume_shipping": volume_shipping_query,
    "tpch_product_profit": product_profit_query,
    "jpeg_decode": jpeg_decode_query,
    "packing_efficiency": packing_efficiency_query,
    "pagerank": pagerank_query,
    "scd2_history": scd2_history_query,
    "embedding_quality": embedding_quality_query,
    "source_vocab_drift": source_vocab_drift_query,
    "color_palette_props": color_palette_props_query,
    "color_palette_png": color_palette_png_query,
    "ewma_smoothing": ewma_smoothing_fused_query,
    "streaming_quantile": streaming_quantile_query,
    "vocab_top_terms": vocab_top_terms_query,
    "q1_history": history_fact,
    "rolling_engagement": rolling_engagement,
    "pricing_rollup": pricing_rollup_query,
    "skew_salted_agg": skew_salted_agg_query,
    "dedup_clusters": dedup_clusters_query,
    "set_ops": set_ops_query,
    "event_pivot": event_pivot_query,
    "user_timeseries": user_timeseries_query,
    "pricing_cube": pricing_cube_query,
    "semi_join": semi_join_query,
    "set_ops_fused": set_ops_fused_query,
    "label_centroids": label_centroids_query,
    "latest_wins": latest_wins_query,
    "top_k_per_group": top_k_query,
    "recent_n_per_user": recent_n_query,
    "asof_enrichment": asof_query,
    "posts_flatten": posts_flatten_query,
    "anti_join": anti_join_query,
    "scalar_suite": scalar_suite_query,
    "quality_gates": quality_gates_query,
    "pricing_summary": pricing_summary_query,
    "cdc_merge": cdc_merge_query,
    "sessionize": sessionize_query,
    "text_stats": text_stats_query,
    "lang_id": lang_id_query,
    "token_count": token_count_query,
    "doc_fingerprint": fingerprint_query,
    "winnowing_fingerprint": winnowing_fingerprint_query,
    "tfidf_top_terms": tfidf_query,
    "dedup_exact": dedup_exact_query,
    "streaming_upsert": streaming_upsert_query,
    "dedup_minhash_lsh": dedup_minhash_query,
    "dedup_embedding_cosine": dedup_embedding_query,
    "user_rank_suite": user_rank_suite_query,
    "streaming_lsh_dedup": streaming_lsh_dedup_query,
    "skew_salted_join": skew_salted_join_query,
    "pricing_grouping_sets": pricing_grouping_sets_query,
    "streaming_join": streaming_join_query,
    "similarity_quantized": similarity_quantized_query,
    "streaming_session": streaming_session_query,
    "pii_redaction": pii_redaction_query,
    "time_range_window": time_range_window_query,
    "price_histogram": price_histogram_query,
    "rolling_distinct": rolling_distinct_query,
    "tpch_big_spenders": big_spenders_query,
    "null_semantics": null_semantics_query,
    "incremental_agg": incremental_agg_query,
    "random_projection": random_projection_query,
    "weighted_sample": weighted_sample_query,
    "streaming_multi_sink": streaming_multi_sink_query,
    "time_rollup": time_rollup_query,
    "join_types_suite": join_types_suite_query,
    "tpch_promo_revenue": promo_revenue_query,
    "tpch_parts_supplier": parts_supplier_query,
    "map_functions_suite": map_functions_suite_query,
    "triangle_count": triangle_count_query,
    "json_functions_suite": json_functions_suite_query,
    "string_functions_suite": string_functions_suite_query,
    "sketch_rollup": sketch_rollup_query,
    "retention_prune": retention_prune_query,
    "tpch_revenue_filter": revenue_filter_query,
    "tpch_shipmode_priority": shipmode_priority_query,
    "tpch_discounted_revenue": discounted_revenue_query,
    "safe_arithmetic_suite": safe_arithmetic_suite_query,
    "window_navigation_suite": window_navigation_suite_query,
    "upsert_audit": upsert_audit_query,
    "decontamination": decontamination_query,
    "gopher_quality": gopher_quality_query,
    "sequence_packing": sequence_packing_query,
    "dedup_resolution": dedup_resolution_query,
    "repetition_filter": repetition_filter_query,
    "source_mixture": source_mixture_query,
    "keyword_search_ranked": keyword_search_ranked_query,
    "ann_recall": ann_recall_query,
    "tpch_customer_distribution": customer_distribution_query,
    "tpch_sales_opportunity": sales_opportunity_query,
    "tpch_waiting_suppliers": waiting_suppliers_query,
    "tpch_order_priority": order_priority_query,
    "tpch_returned_items": returned_items_query,
    "tpch_top_supplier": top_supplier_query,
    "tpch_small_qty_revenue": small_quantity_revenue_query,
    "corpus_dup_ngrams": corpus_dup_ngrams_query,
    "lm_rarity": lm_rarity_query,
    "kmeans_lloyd": kmeans_lloyd_query,
    "semantic_dedup": semantic_dedup_query,
    "curation_funnel": curation_funnel_query,
    "api_ingest": api_ingest_query,
    "streaming_api_ingest": streaming_api_ingest_query,
    "tpch_min_cost_supplier": min_cost_supplier_query,
    "tpch_important_stock": important_stock_query,
    "tpch_part_promotion": part_promotion_query,
    "importance_resampling": importance_resampling_query,
    "streaming_transform_state": streaming_transform_state_query,
    "bloom_dedup": bloom_dedup_query,
    "bfs_distances": bfs_distances_query,
    "streaming_late_data": streaming_late_data_query,
    "substring_dedup": substring_dedup_query,
    "dedup_eval": dedup_eval_query,
    "streaming_dedup": streaming_dedup_query,
    "variant_json_suite": variant_json_suite_query,
    "balanced_sample": balanced_sample_query,
    "leakage_safe_split": leakage_safe_split_query,
    "adaptive_quality_filter": adaptive_quality_filter_query,
    "quantile_rollup": quantile_rollup_query,
    "anomaly_mad": anomaly_mad_query,
    "bigram_lm_score": bigram_lm_score_query,
    "cross_corpus_overlap": cross_corpus_overlap_query,
    "lang_id_eval": lang_id_eval_query,
    "bpe_train": bpe_train_query,
    "bpe_encode": bpe_encode_query,
    "vocab_growth": vocab_growth_query,
    "k_anonymity": k_anonymity_query,
}

# --- r12 gate-window rotation (VERDICT r11 item 8) --------------------------
#
# The driver's correctness gate reads the FIRST 50 entries. r13 leads
# with every entry whose implementation or fixtures materially changed
# this round (the CABAC-decode h264/video family, the MP3
# bit-reservoir + MS-stereo decode feeding the AFP/transcode entries,
# the parse_srt Unicode-digit contract fix, the candidate-budget
# null-group fix on the exact-pair diagnostics), then the ENTIRE
# rotation blind spot: all 12 entries whose newest CORRECTNESS row was
# still r3, followed by the 25 alphabetically-first of the 47
# r4-checked entries. The remaining 22 r4 entries (quantile_rollup
# through vocab_growth) queue for the r14 window. Entries displaced
# from the r12 window retain their r12 driver rows and their sweep
# evidence in VERIFICATION.md.

# r14 window (VERDICT r13 item 3, composition corrected per ADVICE
# r14): 8 media entries changed in r14 prep, then all 22 r4-stale
# entries (quantile_rollup through vocab_growth), then the 12 entries
# whose execution path the r14 OPTIMIZATION round changed, then the 8
# entries with the oldest remaining r5–r10 driver evidence. The
# displaced rows (r10/r9/r8/r7 evidence and the five unchanged r6
# fills) are listed in the trailing comment below; after r14 no
# entry's driver evidence is older than r6.
_R14_WINDOW = [
    # changed in r14 prep (media codec paths)
    "mp3_meta", "audio_fingerprint_dedup", "audio_transcode_qa",
    "h264_meta", "h264_frames", "video_frames", "video_phash_dedup",
    "video_scene_cuts",
    # the full r4-stale tail (rotation queue from r13)
    "quantile_rollup", "repetition_filter", "semantic_dedup",
    "sequence_packing", "source_mixture", "streaming_api_ingest",
    "streaming_late_data", "streaming_transform_state",
    "substring_dedup", "tpch_customer_distribution",
    "tpch_important_stock", "tpch_min_cost_supplier",
    "tpch_order_priority", "tpch_part_promotion",
    "tpch_returned_items", "tpch_sales_opportunity",
    "tpch_small_qty_revenue", "tpch_top_supplier",
    "tpch_waiting_suppliers", "upsert_audit", "variant_json_suite",
    "vocab_growth",
    # changed in the r14 OPTIMIZATION round (concurrent staging /
    # wave-sized triggers / persist + fixpoint-loop changes) - every
    # entry whose execution path this round touched gets driver
    # evidence; each is also locally green at sf0.01, sf0.1, and
    # local-cluster[2,16,8192] (SWEEP_r14.json @ the optimized HEAD)
    "streaming_media_ingest", "streaming_join", "streaming_lsh_dedup",
    "streaming_quantile", "streaming_topk", "streaming_session",
    "streaming_multi_sink", "dedup_threshold_sweep",
    "dedup_threshold_sweep_pairs", "similarity_join_exact",
    "dedup_clusters_star", "dedup_resolution",
    # oldest remaining driver evidence (r5-r10) incl. the three
    # r14-changed entries already queued here; displaced to make room
    # for the 12 rows above (newest-evidence-first): stats_suite /
    # dedup_ngram_jaccard (r10), pagerank / scd2_history /
    # streaming_upsert (r9), streaming_window_agg (r8),
    # value_percentiles (r7) and the five unchanged r6 fill entries -
    # none drops below the "no evidence older than r6" line.
    "dedup_embedding_cosine",
    "tpch_market_share", "tpch_regional_volume",
    "tpch_shipping_priority", "train_test_split",
    "streaming_dedup", "streaming_stateful", "dedup_clusters",
]
assert len(_R14_WINDOW) == 50 and len(set(_R14_WINDOW)) == 50

# r15 window (VERDICT r14 item 8): every entry whose execution path
# the r15 optimization round changed comes first — the gram slice-hash
# family (md5 -> xxhash64 over token slices), the staged-token text
# queries, the heavy_hitters action fold, the approx_distinct rsd
# resizing, the streaming wave-overlap/trigger-derivation entries, and
# the dedup exact-pair boundary-unpersist queries — 21 entries, each
# also locally green at sf0.01, sf0.1, and local-cluster[2,16,8192]
# on the optimized HEAD (SWEEP_r15.json). The remaining 29 slots take
# the alphabetically-first of the 38 untouched r6-evidence entries
# (the stalest tail). Nine r6 entries (source_vocab_drift,
# tfidf_top_terms, token_count, top_k_per_group, tpch_product_profit,
# tpch_volume_shipping, user_timeseries, vocab_top_terms,
# winnowing_fingerprint) plus value_percentiles (r7) and
# streaming_window_agg (r8) did not fit and queue FIRST for the r16
# window — the only entries whose driver evidence is older than r9
# after r15, each still covered by this round's full local sweeps.
_R15_WINDOW = [
    # changed in r15 (gram/text per-task-work family)
    "vocab_growth", "decontamination", "corpus_dup_ngrams",
    "curation_funnel", "cross_corpus_overlap", "bigram_lm_score",
    "lm_rarity", "repetition_filter", "gopher_quality", "lang_id",
    "lang_id_eval", "text_stats", "adaptive_quality_filter",
    # changed in r15 (job folds / sketch sizing)
    "heavy_hitters", "approx_distinct",
    # changed in r15 (streaming overlap / trigger derivation)
    "streaming_upsert", "streaming_multi_sink", "streaming_media_ingest",
    # changed in r15 (exact-pair cache lifetimes)
    "similarity_join_exact", "dedup_threshold_sweep",
    "dedup_threshold_sweep_pairs",
    # stalest untouched driver evidence (r6), alphabetical
    "anti_join", "asof_enrichment", "cdc_merge", "color_palette_png",
    "color_palette_props", "dedup_exact", "dedup_minhash_lsh",
    "doc_fingerprint", "embedding_quality", "event_pivot",
    "ewma_smoothing", "jpeg_decode", "label_centroids", "latest_wins",
    "packing_efficiency", "posts_flatten", "pricing_cube",
    "pricing_rollup", "pricing_summary", "q1_history", "quality_gates",
    "recent_n_per_user", "rolling_engagement", "scalar_suite",
    "semi_join", "sessionize", "set_ops", "set_ops_fused",
    "skew_salted_agg",
]
assert len(_R15_WINDOW) == 50 and len(set(_R15_WINDOW)) == 50

_R13_WINDOW = [
    # changed in r13
    "subtitle_parse", "caption_frame_align",
    "h264_meta", "h264_frames", "video_frames", "video_phash_dedup",
    "video_scene_cuts", "mp3_meta", "audio_fingerprint_dedup",
    "audio_transcode_qa", "dedup_threshold_sweep",
    "dedup_threshold_sweep_pairs", "similarity_join_exact",
    # the full r3-stale set (rotation blind spot, VERDICT r12 item 3)
    "data_quality_suite", "json_functions_suite", "map_functions_suite",
    "retention_prune", "safe_arithmetic_suite", "sketch_rollup",
    "string_functions_suite", "tpch_discounted_revenue",
    "tpch_revenue_filter", "tpch_shipmode_priority", "triangle_count",
    "window_navigation_suite",
    # oldest r4 driver evidence, alphabetical
    "adaptive_quality_filter", "ann_recall", "anomaly_mad", "api_ingest",
    "balanced_sample", "bfs_distances", "bigram_lm_score", "bloom_dedup",
    "bpe_encode", "bpe_train", "corpus_dup_ngrams",
    "cross_corpus_overlap", "curation_funnel", "decontamination",
    "dedup_eval", "dedup_resolution", "gopher_quality", "image_decode",
    "importance_resampling", "k_anonymity", "keyword_search_ranked",
    "kmeans_lloyd", "lang_id_eval", "leakage_safe_split", "lm_rarity",
]
assert len(_R13_WINDOW) == 50 and len(set(_R13_WINDOW)) == 50

QUERIES = {
    name: QUERIES[name]
    for name in _R15_WINDOW + [n for n in QUERIES if n not in set(_R15_WINDOW)]
}


ORACLES = {
    "image_phash_dedup": image_phash_oracle,
    "audio_fingerprint_dedup": audio_fingerprint_oracle,
    "video_phash_dedup": video_phash_oracle,
    "video_scene_cuts": video_scene_cuts_oracle,
    "audio_transcode_qa": audio_transcode_qa_oracle,
    "audio_features": AUDIO_FEATURES_ORACLE_SQL,
    "audio_resample": AUDIO_RESAMPLE_ORACLE_SQL,
    "flac_decode": FLAC_DECODE_ORACLE_SQL,
    "mp3_meta": MP3_META_ORACLE_SQL,
    "streaming_media_ingest": MEDIA_STREAM_ORACLE_SQL,
    "zorder_layout": ZORDER_LAYOUT_ORACLE_SQL,
    "gif_decode": GIF_DECODE_ORACLE_SQL,
    "line_dedup": LINE_DEDUP_ORACLE_SQL,
    "unigram_train": UNIGRAM_TRAIN_ORACLE_SQL,
    "unigram_encode": UNIGRAM_ENCODE_ORACLE_SQL,
    "tokenizer_fertility": TOKENIZER_FERTILITY_ORACLE_SQL,
    "q1_history": HISTORY_ORACLE_SQL,
    "rolling_engagement": ROLLING_ENGAGEMENT_ORACLE_SQL,
    "latest_wins": LATEST_WINS_ORACLE_SQL,
    "upsert_audit": UPSERT_AUDIT_ORACLE_SQL,
    "image_decode": IMAGE_DECODE_ORACLE_SQL,
    "jpeg_decode": JPEG_DECODE_ORACLE_SQL,
    "mp4_meta": MP4_META_ORACLE_SQL,
    "mp4_audio_meta": MP4_AUDIO_META_ORACLE_SQL,
    "h264_meta": H264_META_ORACLE_SQL,
    "h264_nal_census": H264_NAL_CENSUS_ORACLE_SQL,
    "webm_meta": WEBM_META_ORACLE_SQL,
    "webm_block_census": WEBM_BLOCK_CENSUS_ORACLE_SQL,
    "subtitle_parse": SUBTITLE_PARSE_ORACLE_SQL,
    "caption_frame_align": CAPTION_FRAME_ALIGN_ORACLE_SQL,
    "webdataset_pack": WEBDATASET_PACK_ORACLE_SQL,
    "hybrid_search_rrf": HYBRID_SEARCH_RRF_ORACLE_SQL,
    "bm25_search": BM25_SEARCH_ORACLE_SQL,
    # stored as a callable: building this oracle encodes + decodes the
    # whole fixture family, so it is resolved lazily at oracle_sql()
    # time, not at registry import (ADVICE r8)
    "h264_frames": h264_frames_oracle_sql,
    "binary_put_sink": BINARY_PUT_SINK_ORACLE_SQL,
    "fused_sql_inference": FUSED_SQL_INFERENCE_ORACLE_SQL,
    "streaming_topk": STREAMING_TOPK_ORACLE_SQL,
    "ogg_meta": OGG_META_ORACLE_SQL,
    "exif_meta": EXIF_META_ORACLE_SQL,
    "wav_stats": WAV_STATS_ORACLE_SQL,
    "media_dispatch": MEDIA_DISPATCH_ORACLE_SQL,
    "packing_efficiency": PACKING_EFFICIENCY_ORACLE_SQL,
    "dedup_threshold_sweep": DEDUP_THRESHOLD_SWEEP_ORACLE_SQL,
    "dedup_threshold_sweep_pairs": DEDUP_THRESHOLD_SWEEP_PAIRS_ORACLE_SQL,
    "embedding_quality": EMBEDDING_QUALITY_ORACLE_SQL,
    "source_vocab_drift": SOURCE_VOCAB_DRIFT_ORACLE_SQL,
    "video_frames": VIDEO_FRAMES_ORACLE_SQL,
    "color_palette_png": COLOR_PALETTE_PNG_ORACLE_SQL,
    "decontamination": DECONTAMINATION_ORACLE_SQL,
    "gopher_quality": GOPHER_QUALITY_ORACLE_SQL,
    "sequence_packing": SEQUENCE_PACKING_ORACLE_SQL,
    "dedup_resolution": DEDUP_RESOLUTION_ORACLE_SQL,
    "repetition_filter": REPETITION_FILTER_ORACLE_SQL,
    "source_mixture": SOURCE_MIXTURE_ORACLE_SQL,
    "keyword_search_ranked": KEYWORD_SEARCH_RANKED_ORACLE_SQL,
    "ann_recall": _ann_recall_oracle(),
    "tpch_customer_distribution": CUSTOMER_DISTRIBUTION_ORACLE_SQL,
    "tpch_sales_opportunity": SALES_OPPORTUNITY_ORACLE_SQL,
    "tpch_waiting_suppliers": WAITING_SUPPLIERS_ORACLE_SQL,
    "tpch_order_priority": ORDER_PRIORITY_ORACLE_SQL,
    "tpch_volume_shipping": VOLUME_SHIPPING_ORACLE_SQL,
    "tpch_product_profit": PRODUCT_PROFIT_ORACLE_SQL,
    "tpch_returned_items": RETURNED_ITEMS_ORACLE_SQL,
    "tpch_top_supplier": TOP_SUPPLIER_ORACLE_SQL,
    "tpch_small_qty_revenue": SMALL_QUANTITY_REVENUE_ORACLE_SQL,
    "corpus_dup_ngrams": CORPUS_DUP_NGRAMS_ORACLE_SQL,
    "lm_rarity": LM_RARITY_ORACLE_SQL,
    "kmeans_lloyd": KMEANS_LLOYD_ORACLE_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_ORACLE_SQL,
    "curation_funnel": CURATION_FUNNEL_ORACLE_SQL,
    "api_ingest": API_INGEST_ORACLE_SQL,
    # the incremental two-epoch crawl must reproduce the one-shot
    # batch crawl exactly - same oracle, hash-compared
    "streaming_api_ingest": API_INGEST_ORACLE_SQL,
    "tpch_min_cost_supplier": MIN_COST_SUPPLIER_ORACLE_SQL,
    "tpch_important_stock": IMPORTANT_STOCK_ORACLE_SQL,
    "tpch_part_promotion": PART_PROMOTION_ORACLE_SQL,
    "importance_resampling": IMPORTANCE_RESAMPLING_ORACLE_SQL,
    "streaming_transform_state": STREAMING_TRANSFORM_STATE_ORACLE_SQL,
    "bloom_dedup": BLOOM_DEDUP_ORACLE_SQL,
    "bfs_distances": BFS_DISTANCES_ORACLE_SQL,
    "streaming_late_data": STREAMING_LATE_DATA_ORACLE_SQL,
    "substring_dedup": SUBSTRING_DEDUP_ORACLE_SQL,
    "dedup_eval": DEDUP_EVAL_ORACLE_SQL,
    # result-identical to the naive inverted-index plan by design -
    # the optimized prefix-filter plan must change nothing
    "similarity_join_exact": DEDUP_NGRAM_ORACLE_SQL,
    "variant_json_suite": VARIANT_JSON_ORACLE_SQL,
    "balanced_sample": BALANCED_SAMPLE_ORACLE_SQL,
    "leakage_safe_split": LEAKAGE_SAFE_SPLIT_ORACLE_SQL,
    "adaptive_quality_filter": ADAPTIVE_QUALITY_ORACLE_SQL,
    "quantile_rollup": QUANTILE_ROLLUP_ORACLE_SQL,
    "anomaly_mad": ANOMALY_MAD_ORACLE_SQL,
    "bigram_lm_score": BIGRAM_LM_ORACLE_SQL,
    "cross_corpus_overlap": CROSS_CORPUS_OVERLAP_ORACLE_SQL,
    "lang_id_eval": LANG_ID_EVAL_ORACLE_SQL,
    "bpe_train": BPE_TRAIN_ORACLE_SQL,
    "bpe_encode": BPE_ENCODE_ORACLE_SQL,
    "vocab_growth": VOCAB_GROWTH_ORACLE_SQL,
    # the incremental histogram must reproduce the batch rollup
    # exactly - same oracle, hash-compared (streaming_lsh_dedup
    # pattern applied to the mergeable-quantile store)
    "streaming_quantile": QUANTILE_ROLLUP_ORACLE_SQL,
    "k_anonymity": K_ANONYMITY_ORACLE_SQL,
    "top_k_per_group": TOP_K_ORACLE_SQL,
    "recent_n_per_user": RECENT_N_ORACLE_SQL,
    "asof_enrichment": ASOF_ORACLE_SQL,
    "posts_flatten": POSTS_FLATTEN_ORACLE_SQL,
    "anti_join": ANTI_JOIN_ORACLE_SQL,
    "scalar_suite": SCALAR_SUITE_ORACLE_SQL,
    "quality_gates": QUALITY_GATES_ORACLE_SQL,
    "pricing_summary": PRICING_SUMMARY_ORACLE_SQL,
    "pricing_rollup": PRICING_ROLLUP_ORACLE_SQL,
    "skew_salted_agg": SKEW_SALTED_AGG_ORACLE_SQL,
    "sessionize": SESSIONIZE_ORACLE_SQL,
    "event_pivot": EVENT_PIVOT_ORACLE_SQL,
    "text_stats": TEXT_STATS_ORACLE_SQL,
    "lang_id": LANG_ID_ORACLE_SQL,
    "token_count": TOKEN_COUNT_ORACLE_SQL,
    "doc_fingerprint": FINGERPRINT_ORACLE_SQL,
    "vocab_top_terms": VOCAB_ORACLE_SQL,
    "tfidf_top_terms": TFIDF_ORACLE_SQL,
    "dedup_exact": DEDUP_EXACT_ORACLE_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_ORACLE_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_ORACLE_SQL,
    "dedup_simhash": DEDUP_SIMHASH_ORACLE_SQL,
    "dedup_embedding_cosine": DEDUP_EMBEDDING_ORACLE_SQL,
    "similarity_topk": SIMILARITY_TOPK_ORACLE_SQL,
    "similarity_lsh_ann": SIMILARITY_LSH_ORACLE_SQL,
    "similarity_ivf_ann": SIMILARITY_IVF_ORACLE_SQL,
    "multimodal_meta": MULTIMODAL_META_ORACLE_SQL,
    "frame_sample": FRAME_SAMPLE_ORACLE_SQL,
    # color_palette: the fixture family has a provable Lloyd optimum,
    # so the oracle pins the EXACT palette JSON (colors.py:
    # COUNTS_BY_SUM_RANK / expected_palette_json)
    "color_palette": COLOR_PALETTE_ORACLE_SQL,
    "streaming_upsert": STREAMING_UPSERT_ORACLE_SQL,
    "streaming_window_agg": STREAMING_WINDOW_ORACLE_SQL,
    "streaming_stateful": STREAMING_STATEFUL_ORACLE_SQL,
    "keyword_search": KEYWORD_SEARCH_ORACLE_SQL,
    "json_lake_ingest": JSON_LAKE_INGEST_ORACLE_SQL,
    "train_test_split": TRAIN_TEST_SPLIT_ORACLE_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_ORACLE_SQL,
    "label_centroids": LABEL_CENTROIDS_ORACLE_SQL,
    "approx_distinct": APPROX_DISTINCT_ORACLE_SQL,
    "value_percentiles": VALUE_PERCENTILES_ORACLE_SQL,
    "interval_join": INTERVAL_JOIN_ORACLE_SQL,
    "user_timeseries": USER_TIMESERIES_ORACLE_SQL,
    "pricing_cube": PRICING_CUBE_ORACLE_SQL,
    "streaming_dedup": STREAMING_DEDUP_ORACLE_SQL,
    "color_palette_props": COLOR_PALETTE_PROPS_ORACLE_SQL,
    "semi_join": SEMI_JOIN_ORACLE_SQL,
    "set_ops": SET_OPS_ORACLE_SQL,
    "set_ops_fused": SET_OPS_ORACLE_SQL,
    # The incremental stream must reproduce the batch LSH result
    # exactly - same oracle, hash-compared.
    "streaming_lsh_dedup": DEDUP_MINHASH_ORACLE_SQL,
    "dedup_clusters_star": DEDUP_CLUSTERS_ORACLE_SQL,
    "skew_salted_join": SKEW_SALTED_JOIN_ORACLE_SQL,
    "pricing_grouping_sets": PRICING_GROUPING_SETS_ORACLE_SQL,
    "user_rank_suite": USER_RANK_SUITE_ORACLE_SQL,
    "streaming_join": STREAMING_JOIN_ORACLE_SQL,
    "doc_score_inference": DOC_SCORE_ORACLE_SQL,
    "similarity_quantized": SIMILARITY_QUANTIZED_ORACLE_SQL,
    "streaming_session": STREAMING_SESSION_ORACLE_SQL,
    "heavy_hitters": HEAVY_HITTERS_ORACLE_SQL,
    "doc_chunking": DOC_CHUNKING_ORACLE_SQL,
    "pii_redaction": PII_REDACTION_ORACLE_SQL,
    "event_unpivot": EVENT_UNPIVOT_ORACLE_SQL,
    "gap_fill": GAP_FILL_ORACLE_SQL,
    "global_row_ids": GLOBAL_ROW_IDS_ORACLE_SQL,
    "tpch_shipping_priority": SHIPPING_PRIORITY_ORACLE_SQL,
    "tpch_regional_volume": REGIONAL_VOLUME_ORACLE_SQL,
    "scd2_history": SCD2_HISTORY_ORACLE_SQL,
    "stats_suite": STATS_SUITE_ORACLE_SQL,
    "time_range_window": TIME_RANGE_WINDOW_ORACLE_SQL,
    "price_histogram": PRICE_HISTOGRAM_ORACLE_SQL,
    "rolling_distinct": ROLLING_DISTINCT_ORACLE_SQL,
    "funnel": FUNNEL_ORACLE_SQL,
    "cohort_retention": COHORT_RETENTION_ORACLE_SQL,
    "feature_hashing": FEATURE_HASHING_ORACLE_SQL,
    "fuzzy_match": FUZZY_MATCH_ORACLE_SQL,
    "above_customer_avg": ABOVE_CUSTOMER_AVG_ORACLE_SQL,
    "tpch_big_spenders": BIG_SPENDERS_ORACLE_SQL,
    "null_semantics": NULL_SEMANTICS_ORACLE_SQL,
    "pagerank": PAGERANK_ORACLE_SQL,
    "datetime_suite": DATETIME_SUITE_ORACLE_SQL,
    "incremental_agg": INCREMENTAL_AGG_ORACLE_SQL,
    "random_projection": RANDOM_PROJECTION_ORACLE_SQL,
    "argminmax": ARGMINMAX_ORACLE_SQL,
    "weighted_sample": WEIGHTED_SAMPLE_ORACLE_SQL,
    "streaming_multi_sink": STREAMING_MULTI_SINK_ORACLE_SQL,
    "cdc_merge": CDC_MERGE_ORACLE_SQL,
    "array_functions_suite": ARRAY_FUNCTIONS_ORACLE_SQL,
    "feature_scaling": FEATURE_SCALING_ORACLE_SQL,
    "feature_binning": FEATURE_BINNING_ORACLE_SQL,
    "asof_nearest": ASOF_NEAREST_ORACLE_SQL,
    "winnowing_fingerprint": WINNOWING_ORACLE_SQL,
    "time_rollup": TIME_ROLLUP_ORACLE_SQL,
    "join_types_suite": JOIN_TYPES_ORACLE_SQL,
    "tpch_market_share": MARKET_SHARE_ORACLE_SQL,
    "tpch_promo_revenue": PROMO_REVENUE_ORACLE_SQL,
    "tpch_parts_supplier": PARTS_SUPPLIER_ORACLE_SQL,
    "grouped_median": GROUPED_MEDIAN_ORACLE_SQL,
    "ewma_smoothing": EWMA_ORACLE_SQL,
    "map_functions_suite": MAP_FUNCTIONS_ORACLE_SQL,
    "triangle_count": TRIANGLE_COUNT_ORACLE_SQL,
    "json_functions_suite": JSON_FUNCTIONS_ORACLE_SQL,
    "string_functions_suite": STRING_FUNCTIONS_ORACLE_SQL,
    "sketch_rollup": SKETCH_ROLLUP_ORACLE_SQL,
    "data_quality_suite": DATA_QUALITY_SUITE_ORACLE_SQL,
    "retention_prune": RETENTION_PRUNE_ORACLE_SQL,
    "tpch_revenue_filter": REVENUE_FILTER_ORACLE_SQL,
    "tpch_shipmode_priority": SHIPMODE_PRIORITY_ORACLE_SQL,
    "tpch_discounted_revenue": DISCOUNTED_REVENUE_ORACLE_SQL,
    "safe_arithmetic_suite": SAFE_ARITHMETIC_ORACLE_SQL,
    "window_navigation_suite": WINDOW_NAVIGATION_ORACLE_SQL,
}


# --- scale classes (VERDICT r11 item 2) -------------------------------------
#
# Machine-readable per-entry scaling behavior, so an orchestrator of a
# 100x run can refuse to schedule the bounded-corpus diagnostics blind
# (the sf5 measurement that motivated this: 1.18e9 candidates / 429 s
# for dedup_threshold_sweep's t=0.3 candidate stage). Classes:
#
#   linear                one or more full passes whose shuffle keys are
#                         bounded-fanout (aggs, equi-joins on foreign
#                         keys, per-key windows); cost ~ input bytes.
#                         Includes triangle_count (degree-oriented,
#                         m^1.5 worst case but schedulable) and the
#                         streaming entries, whose per-batch work is
#                         bounded by batch size.
#   lsh                   banding-bounded candidate generation; cost ~
#                         input + sum of bucket sizes (hot-bucket bound
#                         documented in operators/dedup.py).
#   iterative             round-bounded fixpoint (CC, PageRank, BFS,
#                         Lloyd); cost ~ rounds x linear pass.
#   fixed-fixture         input is a staged codec-fixture store whose
#                         size does not scale with sf_dir; the entry
#                         pins decode conformance, not throughput.
#   diagnostic-quadratic  exact-pair reporters whose candidate stage is
#                         quadratic under vocabulary saturation; budget-
#                         guarded (operators/dedup.py
#                         _check_candidate_budget) so a blind large-
#                         scale run fails fast with the measured bound
#                         instead of OOMing. dedup_eval's exact ground
#                         truth and the naive dedup_ngram_jaccard
#                         reference plan share the shape.

_SCALE_LSH = {
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
    "similarity_lsh_ann", "similarity_ivf_ann", "similarity_quantized",
    "random_projection", "streaming_lsh_dedup", "ann_recall",
}
_SCALE_ITERATIVE = {
    "pagerank", "bfs_distances", "dedup_clusters", "dedup_clusters_star",
    "leakage_safe_split", "kmeans_lloyd", "semantic_dedup",
}
_SCALE_FIXED_FIXTURE = {
    "image_phash_dedup", "audio_fingerprint_dedup", "video_phash_dedup",
    "video_scene_cuts", "audio_transcode_qa",
    "h264_meta", "h264_nal_census", "h264_frames",
    "webm_meta", "webm_block_census", "subtitle_parse",
    "caption_frame_align", "gif_decode", "mp4_meta", "mp4_audio_meta",
    "video_frames", "wav_stats", "audio_features", "flac_decode",
    "audio_resample", "mp3_meta", "ogg_meta", "exif_meta", "jpeg_decode",
    "image_decode", "media_dispatch", "color_palette",
    "color_palette_props", "color_palette_png", "binary_put_sink",
    "streaming_media_ingest", "api_ingest", "streaming_api_ingest",
}
_SCALE_DIAGNOSTIC_QUADRATIC = {
    "dedup_threshold_sweep", "dedup_threshold_sweep_pairs",
    "similarity_join_exact", "dedup_ngram_jaccard", "dedup_eval",
}

SCALE_CLASS_VALUES = (
    "linear", "lsh", "iterative", "fixed-fixture", "diagnostic-quadratic"
)

SCALE_CLASSES: dict[str, str] = {
    name: (
        "diagnostic-quadratic" if name in _SCALE_DIAGNOSTIC_QUADRATIC
        else "lsh" if name in _SCALE_LSH
        else "iterative" if name in _SCALE_ITERATIVE
        else "fixed-fixture" if name in _SCALE_FIXED_FIXTURE
        else "linear"
    )
    for name in QUERIES
}


def scale_class(name: str) -> str:
    """Scaling class of a registry entry (see the taxonomy above).
    Raises KeyError for unknown entries so an orchestrator typo fails
    loudly rather than defaulting to schedulable."""
    return SCALE_CLASSES[name]
