"""raylink — Ray-Data-native probabilistic record linkage.

A brand-new Fellegi–Sunter linkage engine with the query and data-processing
capabilities of jw2249a/FastLink.jl (see SURVEY.md), re-expressed as
ray.data.Dataset pipelines for Parquet transcript tables at very large scale.

Public per-stage API (each usable standalone on Datasets, the analogue of
the reference's exported kernels, FastLink.jl:54): blocking, pair
generation, scoring, EM, match extraction, clustering.
"""

from .config import BlockingConfig, ExecutionConfig, LinkConfig, VarConfig, parse_config  # noqa: F401
from .constants import MATCH1, MATCH2, MISSING, NONMATCH  # noqa: F401
from .eval import pairwise_scores, truth_pairs_from_entities  # noqa: F401
from .functions.gamma import (  # noqa: F401
    gamma_exact,
    gamma_numeric,
    gamma_string,
    gamma_token_levenshtein,
)
from .functions.strdist import METHOD_ALIASES, similarity  # noqa: F401
from .pipelines.linkage import LinkResult, dedupe_records, link_records  # noqa: F401
from .pipelines.transcripts import (  # noqa: F401
    default_transcript_config,
    run_transcript_pipeline,
)
from .stages.assemble import assemble_conversations  # noqa: F401
from .stages.blocking import (  # noqa: F401
    derive_block_keys,
    expand_pair_groups,
    plan_salts,
    transcript_block_keys,
)
from .stages.cluster import connected_components  # noqa: F401
from .stages.em import EMResult, em_fit  # noqa: F401
from .stages.matches import get_matches  # noqa: F401
from .stages.pairs import generate_pairs_dedupe, generate_pairs_link  # noqa: F401
from .stages.patterns import pack_gammas, pattern_histogram, unpack_patterns  # noqa: F401
from .stages.scoring import PairScorer, score_pairs  # noqa: F401

# training-data ops layer (each standalone on Datasets; see SURVEY.md §2
# round-2 rows and README for the full catalogue)
from .ops.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup,
    minhash_lsh_dedup_cross,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from .ops.canonical import (  # noqa: F401
    canonical_records,
    grouped_mode,
    grouped_nunique,
)
from .ops.joins import broadcast_join, hash_join  # noqa: F401
from .ops.multiblock import multi_rule_pairs, multi_rule_pairs_link  # noqa: F401
from .ops.lag import (  # noqa: F401
    group_lag,
    group_rolling_sum,
    group_rolling_sum_range,
    group_decayed_sum,
    group_running_sum,
)
from .ops.pack import pack_sequences  # noqa: F401
from .ops.strcat import grouped_concat  # noqa: F401
from .ops.sample import (  # noqa: F401
    assign_splits,
    global_sample_k,
    hash_sample,
    mixture_sample,
    select_to_token_budget,
    stratified_sample,
    weighted_sample,
)
from .ops.semijoin import semi_anti_join  # noqa: F401
from .ops.simjoin import similarity_link_join, similarity_self_join  # noqa: F401
from .ops.sketch import (  # noqa: F401
    approx_distinct,
    approx_quantiles,
    count_min_estimate,
    count_min_sketch,
    frequent_items,
)
from .ops.logreg import fit_logistic_regression, predict_proba  # noqa: F401
from .ops.mutualinfo import grouped_entropy, mutual_information  # noqa: F401
from .ops.transitions import transition_counts  # noqa: F401
from .ops.window import hopping_window_agg, tumbling_window_agg  # noqa: F401
from .ops.rank import group_ntile, keep_top_fraction  # noqa: F401
from .ops.quantiles import clip_to_group_quantiles, grouped_quantiles  # noqa: F401
from .ops.tfidf import tfidf_top_terms, unigram_logprob  # noqa: F401
from .ops.histogram import grouped_histogram  # noqa: F401
from .ops.ngrams import ngram_counts  # noqa: F401
from .ops.collocations import pmi_collocations  # noqa: F401
from .ops.normalize import grouped_corr, grouped_higher_moments  # noqa: F401
from .ops.regression import grouped_linear_fit  # noqa: F401
from .ops.snm import global_rank, sorted_neighborhood_pairs  # noqa: F401
from .ops.mutualinfo import chi_squared_independence  # noqa: F401
from .ops.topk import grouped_weighted_top_k  # noqa: F401
from .ops.matching import mutual_best_pairs  # noqa: F401
from .ops.dupspans import duplicate_ngram_stats  # noqa: F401
from .ops.search import bm25_topk  # noqa: F401
from .ops.bloom import bloom_from_ngrams, mark_contaminated_bloom  # noqa: F401
from .ops.intervaljoin import interval_join  # noqa: F401
from .ops.diff import snapshot_diff  # noqa: F401
from .ops.text import extract_pattern, normalize_text, with_bpe_token_counts  # noqa: F401
from .ops.validate import expect_rules  # noqa: F401
from .ops.cdc import apply_changes  # noqa: F401
from .pipelines.semdedup import semantic_dedup  # noqa: F401
from .pipelines.refresh import refresh_corpus  # noqa: F401
from .sources.sinks import write_partitioned  # noqa: F401
