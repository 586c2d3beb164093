"""Operator library — importing this package does NOT register queries
(plans.registry.load_all does that); these are the reusable building
blocks a pipeline author composes."""

from event_stream_aggr_spark.operators.asof import asof_join  # noqa: F401
from event_stream_aggr_spark.operators.bucketing import (  # noqa: F401
    bucketed_join,
    write_bucketed,
)
from event_stream_aggr_spark.operators.cluster import (  # noqa: F401
    connected_components,
    dedup_keepers,
)
from event_stream_aggr_spark.operators.enrich import (  # noqa: F401
    enrich_with_dim,
    enrich_with_lookup,
)
from event_stream_aggr_spark.operators.sampling import (  # noqa: F401
    hash_sample,
    hash_split,
    seeded_sample,
    stratified_sample,
)
from event_stream_aggr_spark.operators.dedup import (  # noqa: F401
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_signatures,
)
from event_stream_aggr_spark.operators.similarity import (  # noqa: F401
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup_lsh,
)
from event_stream_aggr_spark.operators.skew import salted_join  # noqa: F401

#: Package-level near-dup defaults: the sub-quadratic LSH dataflows.
#: The blocked-Jaccard form (dedup.qd02) exists as the oracle baseline;
#: pipelines should reach for these.
near_dup_pairs = minhash_lsh_pairs
embedding_near_dup = embedding_near_dup_lsh
