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
    # long BEFORE the multiplies: ascii() of a non-ASCII codepoint times
    # 130003 overflows int32 — Spark wraps silently (non-ANSI int math in
    # this expression) while DuckDB errors, so the first non-ASCII token
    # would break parity. Values are identical for ASCII inputs.
    h = (
        F.ascii(t).cast("long") * F.lit(130003)
        + F.ascii(F.substring(t, 2, 1)).cast("long") * F.lit(1009)
        + F.ascii(F.substring(t, 3, 1)).cast("long") * F.lit(31)
        + F.length(t)
    )
    return (h * F.lit(2654435761)) % F.lit(1 << 61)


# DuckDB twin of token_hash; format with t=<token expression>.
SQL_TOKEN_HASH = (
    "((CAST(ascii({t}) AS BIGINT) * 130003 + CAST(ascii(substr({t}, 2, 1)) AS BIGINT) * 1009"
    " + CAST(ascii(substr({t}, 3, 1)) AS BIGINT) * 31 + length({t})) * 2654435761) % 2305843009213693952"
)


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash signature over token hashes: per output bit, the majority
    vote of that bit across all token hashes. One pass over the token
    array, zero shuffle. Uses token_hash_wide: with the narrow 3-char
    hash, suffix-divergent tokens of equal length ('table'/'tabby') vote
    identically and the sketch loses discrimination (round-8 review)."""
    hs = F.transform(tokens(text), token_hash_wide)

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


def token_hash_wide(t: Column) -> Column:
    """Higher-resolution portable hash: mixes the first EIGHT char codes,
    giving a low collision rate on short ASCII strings — NOT injective
    even below 8 chars (the per-position coefficients are not linearly
    independent over the ASCII deltas: e.g. the position-3 (x31) and
    position-8 (x7) contributions can cancel, ADVICE r8), but the
    collision mass is negligible for its consumers' purposes — the right
    hash wherever inputs are short raw-text fragments (5-gram shingles,
    whitespace tokens: simhash/minhash/contamination) or where the
    modulus is fine-grained (%10000 sampling: token_hash reads only
    three chars, capping it at 4096 distinct values over hex input).
    token_hash remains adequate for %100 bucketing of md5 hex digests
    (high-entropy input, coarse threshold). Same portability contract;
    SQL twin below."""
    # long-first for the same non-ASCII overflow reason as token_hash.
    h = (
        F.ascii(t).cast("long") * F.lit(130003)
        + F.ascii(F.substring(t, 2, 1)).cast("long") * F.lit(1009)
        + F.ascii(F.substring(t, 3, 1)).cast("long") * F.lit(31)
        + F.ascii(F.substring(t, 4, 1)).cast("long") * F.lit(10007)
        + F.ascii(F.substring(t, 5, 1)).cast("long") * F.lit(2003)
        + F.ascii(F.substring(t, 6, 1)).cast("long") * F.lit(101)
        + F.ascii(F.substring(t, 7, 1)).cast("long") * F.lit(401)
        + F.ascii(F.substring(t, 8, 1)).cast("long") * F.lit(7)
        + F.length(t)
    )
    return (h * F.lit(2654435761)) % F.lit(1 << 61)


SQL_TOKEN_HASH_WIDE = (
    "((CAST(ascii({t}) AS BIGINT) * 130003 + CAST(ascii(substr({t}, 2, 1)) AS BIGINT) * 1009"
    " + CAST(ascii(substr({t}, 3, 1)) AS BIGINT) * 31 + CAST(ascii(substr({t}, 4, 1)) AS BIGINT) * 10007"
    " + CAST(ascii(substr({t}, 5, 1)) AS BIGINT) * 2003 + CAST(ascii(substr({t}, 6, 1)) AS BIGINT) * 101"
    " + CAST(ascii(substr({t}, 7, 1)) AS BIGINT) * 401 + CAST(ascii(substr({t}, 8, 1)) AS BIGINT) * 7"
    " + length({t})) * 2654435761) % 2305843009213693952"
)


def padded_order_key(ts_us: Column | str, event_id: Column | str) -> Column:
    """Zero-padded (ts_us, event_id) string whose lexicographic order
    equals the numeric order — the portable min_by/max_by key (DuckDB
    arg_min/arg_max twin: SQL_PADDED_ORDER_KEY). Widths hold the full
    int64 range for the id (19 digits) and epoch-micros through the year
    ~33658 for the timestamp (20 digits). NON-NEGATIVE inputs only: a
    '-' sign would sort before '0' and break the order — pre-1970
    timestamps are out of contract for these keys."""
    t = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    e = F.col(event_id) if isinstance(event_id, str) else event_id
    return F.concat(
        F.lpad(t.cast("string"), 20, "0"), F.lpad(e.cast("string"), 19, "0")
    )


SQL_PADDED_ORDER_KEY = (
    "lpad(CAST({ts} AS VARCHAR), 20, '0') || lpad(CAST({id} AS VARCHAR), 19, '0')"
)
