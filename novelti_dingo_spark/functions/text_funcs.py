"""Text tokenization helpers — JVM-side expressions shared by the text
analysis and dedup operators. The corpus is space-separated tokens
(FIXTURES.md), so the tokenizer is a plain split; swap the regex here for
a BPE-ish pattern on messier corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_bigrams(text: Column | str) -> Column:
    """Adjacent-token bigrams as 'w1 w2' strings (n-gram shingling)."""
    t = tokens(text)
    return F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-token shingles as strings, for MinHash signatures."""
    t = tokens(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
