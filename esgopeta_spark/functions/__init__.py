"""Column-function library — the flat, importable surface of every
reusable expression the engine defines (all pure Catalyst expressions;
they compose into user queries and stay inside whole-stage codegen).

    from esgopeta_spark import functions as EF
    df.select(EF.cosine(EF.as_double("a"), EF.as_double("b")))
"""

from esgopeta_spark.ham import value_json_col
from esgopeta_spark.operators.dedup import (
    hamming64,
    minhash_signature,
    normalize_text,
    shingle_hashes,
    shingles,
    simhash64,
)
from esgopeta_spark.operators.similarity import (
    as_double,
    cosine,
    cosine_unrolled,
    dot,
    dot_unrolled,
    l2_norm,
    lsh_bucket,
    sq_norm_unrolled,
)
from esgopeta_spark.operators.text import (
    alpha_ratio,
    fingerprint,
    lang_guess,
    mean_word_len,
    punct_ratio,
    quality_score,
    regex_token_count,
    stopword_hits,
    stopword_ratio,
    token_count,
    words,
)

__all__ = [
    "value_json_col",
    "normalize_text",
    "shingles",
    "minhash_signature",
    "simhash64",
    "hamming64",
    "shingle_hashes",
    "as_double",
    "dot",
    "dot_unrolled",
    "l2_norm",
    "sq_norm_unrolled",
    "cosine",
    "cosine_unrolled",
    "lsh_bucket",
    "words",
    "token_count",
    "regex_token_count",
    "stopword_hits",
    "stopword_ratio",
    "alpha_ratio",
    "punct_ratio",
    "mean_word_len",
    "lang_guess",
    "quality_score",
    "fingerprint",
]
