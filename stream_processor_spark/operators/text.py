"""Text analysis operators for training-data pipelines.

Everything here is expression-first (JVM, codegen'd); the only Python is the
language-ID scorer, which is a proper Arrow-vectorized pandas_udf because
per-language n-gram scoring is not expressible as a fixed-size expression
tree. At 100 TB all of these are embarrassingly parallel map passes — no
shuffle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Small built-in stopword set (ASCII, deterministic).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

WORD_RE = "[^a-zA-Z0-9]+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(col, " ")


def regex_tokens(col: Column) -> Column:
    """BPE-ish tokenization: split on non-alphanumeric runs, drop empties."""
    return F.filter(F.split(col, WORD_RE), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks)


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: length band + stopword presence + casing.

    Deliberately simple and fully SQL-expressible so the oracle can verify;
    mirrors the length/punct/stopword-ratio scoring used by common
    web-corpus quality filters.
    """
    n_tok = token_count(col)
    sw = stopword_ratio(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 0.4).otherwise(0.0)
    sw_ok = F.when((sw > 0.0) & (sw < 0.6), 0.4).otherwise(0.0)
    alnum_ratio = (
        F.length(F.regexp_replace(col, "[^a-zA-Z0-9 ]", "")).cast("double")
        / F.length(col)
    )
    alnum_ok = F.when(alnum_ratio > 0.8, 0.2).otherwise(0.0)
    return F.round(len_ok + sw_ok + alnum_ok, 2)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    md5 (not xxhash64) so external engines can reproduce it bit-for-bit.
    """
    return F.md5(F.lower(F.trim(col)))


# Content-defined chunking (Rabin-style rolling hash). Window 4, base 263,
# hash space 2^20, boundary when h ≡ 0 (mod 64) → expected chunk ~64 chars.
_CDC_W = 4
_CDC_POWS = (1, 263, 263**2, 263**3)
_CDC_MOD = 1 << 20
_CDC_MASK = 64


def char_codes(col: Column) -> Column:
    """Per-char ascii-code array, to be MATERIALIZED in its own projection
    before :func:`rolling_chunks` — an array expression referenced inside
    a higher-order lambda is re-evaluated per element (the inlined-split
    trap), turning the O(L) hash pass back into O(L²)."""
    return F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))


def rolling_chunks(col: Column, codes: Column) -> Column:
    """Content-defined chunk array: ``array<struct<chunk_idx, chunk>>``.

    A position i ends a chunk when the rolling hash of the ``_CDC_W``-char
    window ending at i hits the boundary condition — so chunk boundaries
    move WITH the content: an insertion near the start of a document only
    perturbs the chunks it touches, while fixed-size chunking would shift
    every subsequent boundary (the rsync/LBFS content-defined-chunking
    property that makes chunk-level dedup robust to edits).

    ``codes`` must be :func:`char_codes` pre-materialized in a prior
    select (pass ``F.col(...)``, not the expression) — element_at over
    the array is O(1) where per-position ``substr`` would be an O(i)
    UTF-8 scan (O(L²) per document). Hash products go through longs
    (255·263³ overflows int32). Deterministic, so an external engine
    reproduces the exact chunking.
    """
    length = F.length(col)
    # sequence() DESCENDS when stop < start — short docs get no cuts
    positions = F.when(
        length >= _CDC_W, F.sequence(F.lit(_CDC_W), length)
    ).otherwise(F.array().cast("array<int>"))

    def h(i):
        acc = F.lit(0).cast("long")
        for j, p in enumerate(_CDC_POWS):
            acc = acc + F.element_at(codes, i - j) * F.lit(p)
        return acc % _CDC_MOD

    cuts = F.filter(
        positions, lambda i: (h(i) % _CDC_MASK == 0) & (i < length)
    )
    bounds = F.concat(
        F.array(F.lit(0)), cuts, F.array(length.cast("int"))
    )
    return F.transform(
        F.sequence(F.lit(1), F.size(bounds) - 1),
        lambda k: F.struct(
            k.cast("int").alias("chunk_idx"),
            col.substr(
                F.element_at(bounds, k) + 1,
                F.element_at(bounds, k + 1) - F.element_at(bounds, k),
            ).alias("chunk"),
        ),
    )


# Tiny per-language marker sets for the heuristic language-ID scorer.
# A real deployment would ship trained character-n-gram tables; the operator
# shape (vectorized scoring UDF over a string column) is identical.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": (),  # CJK detected by charset below
}


@pandas_udf(StringType())
def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language ID: charset check then marker-word voting."""

    def detect(text: str | None) -> str:
        if not text:
            return "unk"
        if any("一" <= ch <= "鿿" for ch in text[:200]):
            return "zh"
        toks = set(text.lower().split()[:200])
        best, best_hits = "unk", 0
        for lang, markers in _LANG_MARKERS.items():
            hits = sum(1 for m in markers if m in toks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return texts.map(detect)


def fuzzy_token_pairs(vocab: DataFrame, col: str) -> DataFrame:
    """All distinct string pairs (a < b) within edit distance 1, via a
    SOUND blocked self-join (no quadratic candidate set).

    Soundness of the blocking for d ≤ 1: a single substitution changes
    one position — it can destroy the first character only at p=1 and
    the last only at p=n, never both (n ≥ 2); an insert/delete shifts
    one end but leaves the other end character intact. So every
    qualifying pair shares a first-char or last-char block; length ≤ 1
    strings (where one edit can touch "both ends") all share a
    catch-all block. Exploded block keys → equi-join → exact
    levenshtein residual → distinct (a pair can match in two blocks).
    Verified against the brute-force quadratic join on adversarial
    vocabularies in tests.

    Returns (tok_a, tok_b, dist) with dist ∈ {0-impossible, 1}.
    """
    keys = F.array_distinct(
        F.array(
            F.concat(F.lit("f:"), F.substring(col, 1, 1)),
            F.concat(F.lit("l:"), F.substring(F.col(col), -1, 1)),
            F.when(F.length(col) <= 1, F.lit("s:short")).otherwise(
                F.concat(F.lit("f:"), F.substring(col, 1, 1))
            ),
        )
    )
    blocked = vocab.select(F.col(col).alias("__tok"), F.explode(keys).alias("bk"))
    a = blocked.select(F.col("__tok").alias("tok_a"), "bk")
    b = blocked.select(F.col("__tok").alias("tok_b"), "bk")
    return (
        a.join(b, "bk")
        .filter(
            (F.col("tok_a") < F.col("tok_b"))
            & (F.levenshtein("tok_a", "tok_b") <= 1)
        )
        .select(
            "tok_a",
            "tok_b",
            F.levenshtein("tok_a", "tok_b").cast("long").alias("dist"),
        )
        .distinct()
    )
