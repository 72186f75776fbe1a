from .vector import dot, l2_norm, cosine
from .text_funcs import tokens, token_bigrams, shingles

__all__ = ["dot", "l2_norm", "cosine", "tokens", "token_bigrams", "shingles"]
