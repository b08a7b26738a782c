from hadoop_mapreduce_spark.functions.text import normalize_text, ngrams_from_tokens, tokenize
from hadoop_mapreduce_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "normalize_text",
    "tokenize",
    "ngrams_from_tokens",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
