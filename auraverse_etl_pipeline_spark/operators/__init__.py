from auraverse_etl_pipeline_spark.operators.asof import as_of_join
from auraverse_etl_pipeline_spark.operators.changeset import (
    apply_changeset,
    scd2_history,
)
from auraverse_etl_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_decontaminate,
    bloom_flag_report,
    bloom_might_contain,
    bloom_parameters,
)
from auraverse_etl_pipeline_spark.operators.caching import release_after
from auraverse_etl_pipeline_spark.operators.classifier import (
    nb_score,
    nb_train,
    token_bucket,
)
from auraverse_etl_pipeline_spark.operators.dedup import (
    connected_component_labels,
    decontaminate,
    drop_exact_duplicates,
    drop_hot_buckets,
    drop_near_duplicates,
    drop_near_duplicates_by_cluster,
    exact_duplicate_groups,
    hot_buckets,
    minhash_index,
    minhash_match_index,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
)
from auraverse_etl_pipeline_spark.operators.ids import assign_global_ids
from auraverse_etl_pipeline_spark.operators.retire import (
    bm25_retire,
    bm25_retire_path,
    ivf_retire,
    log_retire,
)
from auraverse_etl_pipeline_spark.operators.sampling import (
    cluster_balanced_sample,
    curriculum_order,
    stratified_exact_sample,
    token_budget_plan,
)
from auraverse_etl_pipeline_spark.operators.sessionize import sessionize
from auraverse_etl_pipeline_spark.operators.sketches import cms_build, cms_lookup
from auraverse_etl_pipeline_spark.operators.similarity import (
    cosine_similarity_expr,
    cosine_top_k,
    ivf_top_k,
    ivfpq_search,
    pq_codebooks,
    pq_encode,
    pq_search,
    pq_topk_rerank,
)

__all__ = [
    "apply_changeset",
    "as_of_join",
    "assign_global_ids",
    "bloom_build",
    "bloom_decontaminate",
    "bloom_flag_report",
    "bloom_might_contain",
    "bm25_retire",
    "bm25_retire_path",
    "bloom_parameters",
    "cluster_balanced_sample",
    "cms_build",
    "curriculum_order",
    "cms_lookup",
    "connected_component_labels",
    "cosine_similarity_expr",
    "cosine_top_k",
    "decontaminate",
    "drop_exact_duplicates",
    "drop_hot_buckets",
    "drop_near_duplicates",
    "drop_near_duplicates_by_cluster",
    "exact_duplicate_groups",
    "hot_buckets",
    "ivf_retire",
    "ivf_top_k",
    "ivfpq_search",
    "minhash_index",
    "minhash_match_index",
    "log_retire",
    "release_after",
    "minhash_near_duplicates",
    "nb_score",
    "nb_train",
    "token_bucket",
    "ngram_jaccard_pairs",
    "pq_codebooks",
    "pq_encode",
    "pq_search",
    "pq_topk_rerank",
    "scd2_history",
    "sessionize",
    "simhash_candidate_pairs",
    "stratified_exact_sample",
    "token_budget_plan",
]
