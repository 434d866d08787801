from ember_spark.operators.blocking import (  # noqa: F401
    candidate_pairs,
    exact_key_pairs,
    lsh_candidate_pairs,
    block_census,
    cap_hot_blocks,
)
from ember_spark.operators.clustering import connected_components  # noqa: F401
from ember_spark.operators.skew import salted_join  # noqa: F401
from ember_spark.operators.scoring import pair_features, LogisticMatcher  # noqa: F401
