from cdc_connector_spark.ops.textstats import (  # noqa: F401
    language_id,
    quality_score,
    text_stats,
    tokenize,
)
from cdc_connector_spark.ops.dedup import (  # noqa: F401
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup_pairs,
)
from cdc_connector_spark.ops.ann import (  # noqa: F401
    brute_force_topk,
    cosine_similarity,
    lsh_bucket_topk,
)
