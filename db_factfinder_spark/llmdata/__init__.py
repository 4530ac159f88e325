"""Large-scale training-data-pipeline operators.

The reference engine stops at census statistics; a 100 TB deployment of
this engine also needs the data-curation operators every LLM pipeline
runs: deduplication (exact and near-), similarity search over
embeddings, text quality analysis, and multimodal column plumbing.
All are DataFrame-native and shuffle-conscious:

* exact dedup — one hash aggregation, no pairwise work;
* MinHash+LSH — signatures are per-row expressions, the only shuffle
  is the band-bucket join (candidate pairs only, never all-pairs);
* SimHash — bit-parallel fingerprint, Hamming-bucket join;
* ANN — brute-force cosine as the correctness baseline, LSH-bucketed
  variant as the scale path;
* text stats — pure column expressions, zero shuffles.
"""

from db_factfinder_spark.llmdata.textstats import (  # noqa: F401
    add_text_stats,
    language_id,
    quality_score,
    fingerprint,
)
from db_factfinder_spark.llmdata.checkpointing import (  # noqa: F401
    CHECKPOINT_MODES,
    materialize,
)
from db_factfinder_spark.llmdata.dedup import (  # noqa: F401
    CorpusDedupState,
    admit_new_documents,
    build_corpus_state,
    cap_hot_buckets,
    containment_pairs,
    cross_corpus_matches,
    dedup_yield_curve,
    exact_dedup,
    union_corpus_state,
    jaccard_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    lsh_candidate_pairs,
    min_count_for_ratio,
    lsh_parameter_plan,
    prefix_filter_pairs,
    simhash,
    simhash_multiprobe_pairs,
    simhash_near_pairs,
)
from db_factfinder_spark.llmdata.sketches import (  # noqa: F401
    countmin_estimate,
    countmin_partials,
    heavy_hitters,
    hll_distinct,
    hll_intersect,
    hll_merge,
    hll_partials,
    kmv_estimate,
    kmv_intersect,
    kmv_merge,
    kmv_partials,
    rolling_hll_distinct,
    sampled_quantiles,
)
from db_factfinder_spark.llmdata.strmatch import (  # noqa: F401
    edit1_join,
    typeahead_completions,
)
from db_factfinder_spark.llmdata.similarity import (  # noqa: F401
    brute_force_topk,
    copeland_fuse,
    cosine_similarity,
    jl_projection,
    jl_sign_matrix,
    hard_negative_topk,
    ivf_pq_topk,
    lsh_bucketed_topk,
    topk_recall,
    maxsim_topk,
    mmr_rerank,
    pq_adc_topk,
    pq_encode,
    quantized_topk,
    rrf_fuse,
    semantic_dedup,
)
from db_factfinder_spark.llmdata.components import (  # noqa: F401
    adamic_adar,
    modularity_score,
    bipartite_label_propagation,
    connected_components,
    connected_components_star,
    deterministic_walks,
    group_medoids,
    hits_scores,
    neardup_groups,
    select_survivors,
    time_respecting_reach,
)
from db_factfinder_spark.llmdata.sampling import (  # noqa: F401
    budget_fill,
    cap_per_group,
    curriculum_interleave,
    deterministic_sample,
    dsir_weights,
    hash_bucket,
    mixture_sample,
    priority_sample,
    priority_sample_per_group,
    negative_sample,
    rendezvous_assign,
    shuffle_shards,
    split_column,
    stratified_split,
    temperature_allocation,
)
from db_factfinder_spark.llmdata.redact import (  # noqa: F401
    domain_blocklist_filter,
    redact_pii,
)
from db_factfinder_spark.llmdata.urls import (  # noqa: F401
    normalize_urls,
    resolve_redirects,
)
from db_factfinder_spark.llmdata.crawl import (  # noqa: F401
    crawl_schedule,
    recrawl_priority,
)
from db_factfinder_spark.llmdata.webclean import (  # noqa: F401
    c4_clean,
    gopher_rules,
    pii_redact,
)
from db_factfinder_spark.llmdata.bpe import (  # noqa: F401
    bpe_encode,
    bpe_train,
    word_freq_table,
)
from db_factfinder_spark.llmdata.integrity import (  # noqa: F401
    corpus_checksums,
    corpus_diff,
    merge_checksums,
)
from db_factfinder_spark.llmdata.conversations import (  # noqa: F401
    conversation_audit,
    truncation_plan,
)
from db_factfinder_spark.llmdata.textstats import (  # noqa: F401
    bigram_lm,
    bm25_search,
    build_gram_state,
    hashed_linear_score,
    ngram_novelty,
    ngram_novelty_with_state,
    bpe_merge_candidates,
    build_postings,
    char_chunker_udtf,
    collocation_lift,
    bigram_perplexity,
    char_entropy,
    heaps_law_fit,
    kneser_ney_bigram,
    phrase_search,
    phrase_search_postings,
    proximity_search,
    rouge_n_pairs,
    rrf_fuse_pair,
    surprisal_score,
    tfidf_top_terms,
    token_diversity,
    top_p_truncate,
    zipf_slope,
)
from db_factfinder_spark.llmdata.lines import (  # noqa: F401
    boilerplate_density,
    dedup_lines_within_doc,
    line_dedup,
)
from db_factfinder_spark.llmdata.winnow import (  # noqa: F401
    stitch_candidates,
    winnow_fingerprint_sets,
    winnow_pairs,
)
from db_factfinder_spark.llmdata.dsir import (  # noqa: F401
    dsir_affinity,
    target_favored_buckets,
)
