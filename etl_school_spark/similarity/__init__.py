from etl_school_spark.similarity.knn import (  # noqa: F401
    brute_force_topk,
    cosine_pairs,
    lsh_topk,
)
