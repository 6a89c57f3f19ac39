"""Text-analysis building blocks for the LLM-data-pipeline extensions
(BASELINE.json north star): tokenization, normalization, shingling,
portable hashing, rolling fingerprints, language-ID heuristics.

Everything here is a JVM-side column expression (no Python UDFs): the
hot path at 100 TB is hashing/shingling every document, and these stay
inside WholeStageCodegen.

Two hash families:
- ``tok_hash_portable``: md5-based 60-bit hash reproducible in ANSI SQL
  (DuckDB: ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``) — used by
  oracle-gated queries.
- ``tok_hash_fast``: xxhash64 — the production path (≈10× cheaper than
  md5); same pipeline shape, engine-specific values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: prime just above 2^32 for minhash permutations; with multipliers
#: < 2^30 the product stays < 2^62 (no int64 overflow on either engine).
MINHASH_PRIME = 4294967311

ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31
ROLLING_PREFIX = 64


def tokens(text: Column) -> Column:
    """Whitespace tokens (corpus is single-space separated; ``\\s+``
    regex kept for robustness — identical to the oracle's splitter)."""
    return F.split(text, r"\s+")


def normalize_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (classic near-dup unit). Empty for
    docs shorter than n tokens.

    Built as arrays_zip of the token array against its own shifted
    slices, with the per-shingle lambda touching ONLY its struct
    element — the earlier sequence+element_at(toks, i+j) form CAPTURED
    the outer token expression inside the interpreted HOF lambda, and
    when ``toks`` arrives as an inline ``split(text)`` the capture
    re-evaluates the regex split per element reference (3·|shingles|
    splits per row — profiled ~2 ms/row at sf0.1, the dominant cost of
    every shingle-consuming plan). Same shingle strings in the same
    order, so every MinHash/LSH/span oracle is unchanged."""
    win = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, win).alias(f"t{i}") for i in range(n)]
    )
    grams = F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]),
    )
    empty = F.array().cast("array<string>")
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(empty))


def tok_hash_portable(s: Column) -> Column:
    """60-bit hash from the md5 hex prefix — bit-identical in DuckDB."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def tok_hash_fast(s: Column) -> Column:
    """Production 64-bit hash (xxhash64, engine-native)."""
    return F.xxhash64(s)


def rolling_fingerprint(text: Column, prefix: int = ROLLING_PREFIX) -> Column:
    """Polynomial rolling hash over the first ``prefix`` characters:
    ``h = (h*31 + codepoint) mod 1e9+7`` — a cheap order-sensitive
    document fingerprint (vs the order-insensitive md5)."""
    chars = F.split(F.substring(text, 1, prefix), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, c: (h * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD,
    )


#: language → marker words for the stopword-voting language ID.
#: Deterministic tie-break: the CASE chain below tests in this order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "zu", "ein"),
    "es": ("el", "la", "los", "y", "es", "un", "una"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "zh": ("的", "是", "和", "了", "在"),
}


def lang_hits(toks: Column, lang: str) -> Column:
    """Count of tokens that are marker words for ``lang``."""
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def predicted_lang(hit_cols: dict[str, Column]) -> Column:
    """Argmax over language hit counts, first-in-priority-order wins
    ties (en, de, es, fr, zh): a CASE chain where each branch requires
    hits > 0 and hits >= every other language — a literal
    transliteration of the oracle SQL."""
    langs = list(LANG_MARKERS)
    expr = None
    for lang in reversed(langs):
        cond = hit_cols[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (hit_cols[lang] >= hit_cols[other])
        branch = F.when(cond, F.lit(lang))
        expr = branch.otherwise(expr) if expr is not None else branch.otherwise(F.lit("und"))
    return expr
