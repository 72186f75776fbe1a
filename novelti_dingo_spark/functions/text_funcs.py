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


def bound(arr: Column, body) -> Column:
    """Evaluate `arr` ONCE per row and pass it to `body` as a bound
    lambda variable.

    Round-14 (guide §1.2 step 2 — per-task work): Spark does not hoist
    loop-invariant subexpressions out of higher-order-function lambdas,
    so `transform(sequence(...), i -> f(split(text), i))` re-splits the
    whole text for EVERY element — O(tokens²) character work per doc.
    Wrapping the invariant in a 1-element array and transforming over it
    binds it to a NamedLambdaVariable, evaluated once: measured 2.21 s →
    0.26 s (8.5×) for the sf0.1 bigram explode. Null/empty semantics are
    unchanged — `array(x)` is a 1-element array even when x is null, the
    inner body sees the same value `f` saw, and `[0]` unwraps the single
    result."""
    return F.transform(F.array(arr), body)[0]


def token_bigrams(text: Column | str) -> Column:
    """Adjacent-token bigrams as 'w1 w2' strings (n-gram shingling)."""
    return bound(
        tokens(text),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-token shingles as strings, for MinHash signatures."""
    return bound(
        tokens(text),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, k)),
        ),
    )


def shingle_md5s(text: Column | str, k: int = 5) -> Column:
    """md5 hex of each k-token shingle (the cross-engine-stable shingle
    hash used by contamination checks and near-dup clustering; production
    swap: xxhash64 for 8-byte keys). Docs shorter than one shingle yield
    an empty array — filter `size(tokens) >= k` at the call site."""
    return bound(
        tokens(text),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, k))),
        ),
    )


# DuckDB oracle fragment for shingle_md5s(k=5) over a `toks` list column —
# keep in sync with the Spark expression above (both change together or
# the contamination/cluster oracles silently diverge).
SHINGLE5_MD5_SQL = (
    "list_transform(range(1, len(toks) - 3), "
    "i -> md5(array_to_string(toks[i:i+4], ' ')))"
)
