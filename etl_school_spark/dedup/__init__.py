"""Deduplication operators for large-scale training-data pipelines.

Five families, each a pure DataFrame pipeline:
- exact (hash-groupBy on a content fingerprint)
- n-gram Jaccard (inverted-index candidate join + exact verify — exact)
- MinHash + LSH banding (probabilistic candidates + exact verify)
- SimHash + band blocking (hamming-distance near-dup)
- embedding cosine (brute-force exact + hyperplane-LSH scale path)
"""

from etl_school_spark.dedup.exact import exact_dedup_groups  # noqa: F401
from etl_school_spark.dedup.ngram import ngram_jaccard_pairs  # noqa: F401
from etl_school_spark.dedup.minhash import minhash_lsh_pairs  # noqa: F401
from etl_school_spark.dedup.simhash import simhash_near_pairs  # noqa: F401
