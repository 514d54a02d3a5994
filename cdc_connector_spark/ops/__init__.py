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
    minhash_verified_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup_pairs,
    simhash_dropped_buckets,
    simhash_pairs_from_sigs,
)
from cdc_connector_spark.ops.ann import embedding_neardup_pairs  # noqa: F401
from cdc_connector_spark.ops.ann import (  # noqa: F401
    brute_force_topk,
    cosine_similarity,
    lsh_bucket_topk,
)
from cdc_connector_spark.ops.asof import asof_join  # noqa: F401
from cdc_connector_spark.ops.rollup import merge_rollup, rollup_delta, rollup_read  # noqa: F401
from cdc_connector_spark.ops.skew import salted_join  # noqa: F401
from cdc_connector_spark.ops.pipeline import clean_corpus  # noqa: F401
from cdc_connector_spark.ops.zorder import zorder_write, zvalue  # noqa: F401
from cdc_connector_spark.ops.ann import (  # noqa: F401
    ivf_assign,
    ivf_topk,
    ivf_train_centroids,
    add_lsh_buckets_arrow,
)
from cdc_connector_spark.ops.dedup import hashed_shingles, simhash_arrow  # noqa: F401
from cdc_connector_spark.ops.cluster import (  # noqa: F401
    kmeans_assign,
    kmeans_clusters,
    kmeans_fit,
    semdedup_pairs,
    semdedup_prune,
)
from cdc_connector_spark.ops.corpus import (  # noqa: F401
    corpus_mix_report,
    temperature_sample,
    weighted_sample,
)
from cdc_connector_spark.ops.textstats import encode_with_vocab, unigram_nll  # noqa: F401
from cdc_connector_spark.ops.pipeline import pretrain_corpus  # noqa: F401
from cdc_connector_spark.ops.rangejoin import band_join, interval_overlap_join  # noqa: F401
from cdc_connector_spark.ops.bpe import bpe_encode, bpe_train  # noqa: F401
from cdc_connector_spark.ops.cluster import oversized_clusters, pairs_within_clusters  # noqa: F401
from cdc_connector_spark.ops.corpus import shard_plan, write_training_shards  # noqa: F401
from cdc_connector_spark.ops.textstats import dsir_scores, repetition_stats  # noqa: F401
from cdc_connector_spark.ops.classifier import (  # noqa: F401
    pareto_quality_filter,
    score_quality,
    train_quality_classifier,
)
from cdc_connector_spark.ops.ann import semantic_decontaminate  # noqa: F401
from cdc_connector_spark.ops.corpus import chunk_documents, stratified_sample  # noqa: F401
from cdc_connector_spark.ops.textstats import bigram_nll, hash_embed  # noqa: F401
from cdc_connector_spark.ops.bpe import bpe_load, bpe_save  # noqa: F401
from cdc_connector_spark.ops.corpus import length_buckets  # noqa: F401
from cdc_connector_spark.ops.multimodal import decode_bmp  # noqa: F401
from cdc_connector_spark.ops.textstats import vocab_coverage, word_ngrams  # noqa: F401
