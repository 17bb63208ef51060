"""Text-analysis operators for document tables at scale.

Everything here is a pure Column expression (no UDFs): tokenization, token
counting, quality scoring, language-ID heuristic, rolling-hash document
fingerprinting, and shingling. Column expressions stay inside whole-stage
codegen, so these run at full JVM speed over 100 TB of documents.

Hash design: we need hashes that an external ANSI-SQL oracle can reproduce,
so token/shingle hashes derive from `md5` (identical across engines) rather
than engine-private hash functions. `HASH_PRIME` keeps rolling-hash
accumulators within 2^38 so 64-bit arithmetic never overflows in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime): accumulator stays < 2^31, acc*BASE + h < 2^39.
HASH_PRIME = 2147483647
HASH_BASE = 131

# Tiny deterministic stopword list used by quality scoring.
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (matches `regexp_split_to_array(s, '\\s+')`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — the cross-engine
    primitive every hash here builds on (oracle: ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_hash(col: Column) -> Column:
    """Token hash reduced mod HASH_PRIME."""
    return md5_long(col) % F.lit(HASH_PRIME).cast("long")


def fingerprint(tokens_col: Column) -> Column:
    """Order-sensitive rolling polynomial hash of a token sequence:
    fold(acc*B + h(t) mod P). Replaces the per-document identity a
    content-addressed store would key on; sequential fold is per-row work,
    no shuffle.
    """
    p = F.lit(HASH_PRIME).cast("long")
    return F.aggregate(
        tokens_col,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * HASH_BASE + token_hash(t)) % p,
    )


def stopword_count(tokens_col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens_col, lambda t: t.isin(*stopwords)))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length documents
    with a sane stopword ratio and low punctuation density. The exact
    formula matters less than it being cheap, shuffle-free, and
    reproducible in ANSI SQL for the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.size(toks).cast("double")
    sw = stopword_count(toks).cast("double")
    punct = punct_count(c).cast("double")
    chars = F.length(c).cast("double")
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    sw_ratio = sw / F.greatest(n, F.lit(1.0))
    punct_ratio = punct / F.greatest(chars, F.lit(1.0))
    score = (
        F.lit(0.5) * len_score
        + F.lit(0.35) * F.least(sw_ratio * 5.0, F.lit(1.0))
        + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    # floor-based 6-decimal rounding: floor/multiply are bit-identical across
    # engines, unlike round(double, n) whose half-way behavior is
    # implementation-defined (BigDecimal shortest-repr vs scaled rint).
    return F.floor(score * 1000000.0 + 0.5) / F.lit(1000000.0)


def lang_id(col: Column | str) -> Column:
    """Marker-token language heuristic (stand-in for a real n-gram model;
    deterministic so the SQL oracle can replicate it)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_the = F.size(F.filter(toks, lambda t: t == F.lit("the")))
    n_a = F.size(F.filter(toks, lambda t: t == F.lit("a")))
    return (
        F.when(n_the > n_a, F.lit("en"))
        .when(n_a > n_the, F.lit("es"))
        .otherwise(F.lit("zh"))
    )


def word_shingles(tokens_col: Column, k: int = 3) -> Column:
    """Word k-gram shingles joined with single spaces; empty array when the
    document has fewer than k tokens."""
    n = F.size(tokens_col)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, k)),
        )
    )


# GPT-2-style pre-tokenizer pattern (public BPE regex shape): contractions,
# letter runs, digit runs, punctuation runs — each optionally space-prefixed.
# RE2 (DuckDB) has no backreferences/lookahead, and this pattern needs
# neither, so both engines count identical matches.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish subword-boundary token count (the pre-tokenization pass of a
    GPT-2-family tokenizer; real merges need the vocab, but the match count
    is the standard cheap token estimate for corpus budgeting)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))).cast("long")


def repetition_ratio(tokens_col: Column, k: int = 3) -> Column:
    """Duplicate word-k-gram fraction — the repetitiveness quality signal
    (high values flag boilerplate/spam/generation loops; the Gopher-rules
    family of corpus filters thresholds exactly this): 1 - distinct/total
    k-grams. Null when the document has fewer than k tokens. Pure HOFs
    over the token array — map-only, no shuffle, no Python."""
    sh = word_shingles(tokens_col, k)
    n = F.size(sh)
    return F.when(n < 1, F.lit(None).cast("double")).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(sh)) / n
    )
