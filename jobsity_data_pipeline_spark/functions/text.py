"""Text-analysis column expressions: tokens, shingles, quality, lang-id.

All JVM-side (split/transform/sequence/regexp) — no Python in the hot
path, so a 100 TB documents scan stays inside whole-stage codegen.
Every expression here has an exact ANSI-SQL twin used by the DuckDB
oracle (see __spark_entry__.oracle_sql), so the semantics are pinned
cross-engine: tokens are non-empty runs split on ``\\s+``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword profiles for the n-gram/stopword lang-id
# heuristic. Deliberately tiny + deterministic so the DuckDB oracle can
# replicate scoring with plain SQL.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}

ENGLISH_STOPWORDS = STOPWORDS["en"]


def round_ratio(col: Column, digits: int = 4) -> Column:
    """Engine-stable half-up rounding for NON-NEGATIVE ratios of small
    integers: ``floor(x*10^d + 0.5)/10^d`` in pure double arithmetic.

    Builtin round() differs across engines exactly on such ratios:
    p/q with q = 2^a*5^b terminates in decimal, so round() can hit a
    decimal ".5" tie whose binary neighbor is engine-dependent (Spark
    rounds the shortest decimal repr HALF_UP; DuckDB scales the binary
    value). floor(x*s+0.5) is the same double op everywhere. The DuckDB
    oracle uses the literal same formula.
    """
    s = float(10 ** digits)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empty strings removed (split on ``\\s+``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs, and
    single punctuation marks (the usual pre-tokenizer split). A cheap,
    deterministic token estimate for budgeting training data."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def shingles_from_tokens(tok_col: Column, k: int = 4) -> Column:
    """Array of k-word shingles from a MATERIALIZED token-array column.

    ``tok_col`` must be a plain column reference (built by a previous
    ``select``), not a nested expression: Catalyst does not eliminate
    common subexpressions inside higher-order-function lambdas, so a
    nested ``tokens(text)`` here would re-run the regex tokenization on
    every slice iteration — O(n_tokens^2) per document.
    """
    n = F.size(tok_col)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(col: Column | str, k: int = 4) -> Column:
    """Shingles straight from a text column. Convenience for small
    inputs/tests — hot paths should stage ``tokens`` first and use
    ``shingles_from_tokens`` (see that docstring for why)."""
    return shingles_from_tokens(tokens(col), k)


def punct_ratio(col: Column | str) -> Column:
    """(# non-alnum, non-space chars) / length — quality-score feature."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_hits(tok_col: Column, lang: str = "en") -> Column:
    """Count of (lowercased) stopword tokens in a materialized token
    array column."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tok_col, lambda t: F.lower(t).isin(*words)))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are (lowercased) stopwords for ``lang``.
    Convenience form; hot paths stage ``tokens`` and use stopword_hits."""
    toks = tokens(col)
    return stopword_hits(toks, lang) / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: rewards mid-length docs and a
    healthy stopword ratio, penalizes punctuation soup. Mirrors the
    C4/Gopher-style rule filters in spirit; exact formula is pinned by
    the oracle SQL so it stays stable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = F.when((F.length(c) >= 100) & (F.length(c) <= 20000), F.lit(1.0)).otherwise(F.lit(0.3))
    sw = stopword_ratio(c)
    sw_ok = F.when(sw >= 0.05, F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.when(punct_ratio(c) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.4))
    return F.round(len_ok * sw_ok * punct_ok, 4)


def lang_scores(text_col: Column, tok_col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the lang-id features).

    ``tok_col`` must be a materialized token-array column (see
    shingles_from_tokens for the CSE rationale)."""

    def hit(words: tuple[str, ...]):
        return lambda t: F.lower(t).isin(*words)

    out = {}
    for lang, words in STOPWORDS.items():
        if lang == "zh":
            # zh has no whitespace tokens; count character hits instead.
            score = F.size(
                F.regexp_extract_all(text_col, F.lit("[" + "".join(words) + "]"), 0)
            )
        else:
            score = F.size(F.filter(tok_col, hit(words)))
        out[lang] = score
    return out


def lang_id(text_col: Column, tok_col: Column) -> Column:
    """Pick the language with the max stopword-profile score (ties break
    by language code ascending, 'und' if all scores are 0)."""
    scores = lang_scores(text_col, tok_col)
    pairs = sorted(scores.items())  # deterministic tie-break: code asc
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fold in ascending code order with strict >, so on a tie the
    # earliest code (processed first) is kept.
    for lang, score in pairs:
        best_lang = F.when(score > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(score, best_score)
    return best_lang
