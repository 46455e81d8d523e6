from auraverse_etl_pipeline_spark.operators.asof import as_of_join
from auraverse_etl_pipeline_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicate_groups,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
)
from auraverse_etl_pipeline_spark.operators.sessionize import sessionize
from auraverse_etl_pipeline_spark.operators.similarity import (
    cosine_similarity_expr,
    cosine_top_k,
    ivf_top_k,
)

__all__ = [
    "as_of_join",
    "drop_exact_duplicates",
    "exact_duplicate_groups",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_candidate_pairs",
    "sessionize",
    "cosine_similarity_expr",
    "cosine_top_k",
    "ivf_top_k",
]
