from etl_mini_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    exact_dedup_keep,
    minhash_signatures,
    near_dup_pairs_minhash_lsh,
    near_dup_pairs_ngram_jaccard,
    ordered_dedup,
    simhash,
)
from etl_mini_spark.operators.joins import asof_join, range_join, salted_join  # noqa: F401
from etl_mini_spark.operators.similarity import (  # noqa: F401
    cosine_similarity_col,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    train_ivf_centroids,
)
from etl_mini_spark.operators.clustering import assign_clusters, kmeans_lloyd  # noqa: F401
from etl_mini_spark.operators.upsert import merge_upsert  # noqa: F401
from etl_mini_spark.operators.sampling import (  # noqa: F401
    deterministic_sample,
    hash_bucket,
    split_assign,
    stratified_take,
)
