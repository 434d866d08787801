from ember_spark.functions.text import (  # noqa: F401
    falsy_to_empty,
    serialize_attrs,
    serialize_attrs_py,
    strip_separators,
    strip_separators_py,
    extract_text_from_html,
    normalize_text,
)
from ember_spark.functions.tokenize import tokenize_ws, tokenize_chars, char_ngrams  # noqa: F401
from ember_spark.functions.similarity import (  # noqa: F401
    token_jaccard,
    cosine_sim,
    jaro_winkler_udf,
    jaro_winkler_py,
)
from ember_spark.functions.hashing import (  # noqa: F401
    minhash_signature,
    lsh_band_keys,
    simhash64_df,
    simhash64_udf,
    hash_embedding_udf,
)
