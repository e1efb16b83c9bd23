from mapreduce_paper_implementation_spark.functions.text import TOKEN_SEP_RE, token_count, tokens
from mapreduce_paper_implementation_spark.functions.vectors import cosine, dot, norm, to_double_vec

__all__ = ["TOKEN_SEP_RE", "tokens", "token_count", "cosine", "dot", "norm", "to_double_vec"]
