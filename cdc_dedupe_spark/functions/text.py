"""Text-analysis column expressions: tokenization, hashing, sketching.

All pure built-in-function compositions (map-side, codegen'd). The SQL
twin strings (for DuckDB oracles) live next to the expressions they must
stay bit-identical with.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization — the corpus-standard baseline."""
    return F.split(text, " ")


def token_hash(t: Column) -> Column:
    """Deterministic, dialect-portable token hash: cheap positional mix of
    leading char codes + length, spread by a Knuth multiplier into 61 bits.
    (Not cryptographic — a hash *family* member for sketching; portable to
    any SQL dialect so oracle twins can reproduce it, see SQL_TOKEN_HASH.)"""
    h = (
        F.ascii(t) * F.lit(130003)
        + F.ascii(F.substring(t, 2, 1)) * F.lit(1009)
        + F.ascii(F.substring(t, 3, 1)) * F.lit(31)
        + F.length(t)
    )
    return (h.cast("long") * F.lit(2654435761)) % F.lit(1 << 61)


# DuckDB twin of token_hash; format with t=<token expression>.
SQL_TOKEN_HASH = (
    "((ascii({t}) * 130003 + ascii(substr({t}, 2, 1)) * 1009"
    " + ascii(substr({t}, 3, 1)) * 31 + length({t})) * 2654435761) % 2305843009213693952"
)


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash signature over token hashes: per output bit, the majority
    vote of that bit across all token hashes. One pass over the token
    array, zero shuffle."""
    hs = F.transform(tokens(text), token_hash)

    def bit(i: int) -> Column:
        mask = F.shiftleft(F.lit(1).cast("long"), i)
        vote = F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        return F.when(vote > 0, mask).otherwise(F.lit(0).cast("long"))

    sig = bit(0)
    for i in range(1, bits):
        sig = sig + bit(i)
    return sig


def char_shingles(text: Column, n: int = 5, prefix_len: int | None = 200) -> Column:
    """Distinct character n-gram set of (a prefix of) the text — the
    Jaccard/MinHash input representation. The prefix bound keeps the set
    size O(1) per document at corpus scale."""
    t = F.substring(text, 1, prefix_len) if prefix_len is not None else text
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, F.lit(n))))


def marker_count(text: Column, marker: str) -> Column:
    """Occurrences of a literal marker substring (n-gram language-ID
    heuristic): (len(text) - len(replace(text, marker, ''))) / len(marker)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(marker)))) / F.lit(len(marker))


def sql_marker_count(marker: str) -> str:
    """DuckDB twin of marker_count over column ``text``."""
    return f"(length(text) - length(replace(text, '{marker}', ''))) / {len(marker)}"
