"""Text-analysis column expressions for LLM training-data pipelines.

All pure JVM-side column expressions (whole-stage codegen, no Python in the
hot path, no shuffle) — at 100 TB these run at parquet scan speed. Each
builder has a DuckDB-SQL twin (``sql_*``) used by the correctness oracle;
keep the two in lockstep.

Covers: tokenization, token counting (whitespace + BPE-ish regex),
shingling, language-ID heuristic, quality scoring, bottom-k fingerprinting
(SURVEY.md §2.8 X3 and the north-star text-analysis ops).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword sets for the heuristic language ID. Order
# matters: ties break to the first language in LANGS.
LANGS = ("en", "de", "fr", "es", "zh")
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ein", "ist"),
    "fr": ("le", "la", "et", "les", "une", "est"),
    "es": ("el", "los", "y", "una", "es", "que"),
    "zh": ("的", "了", "是", "在", "我", "有"),
}

#: BPE-ish token pattern: letter runs, digit runs, or single non-space
#: symbols — a cheap stand-in for byte-pair pretokenization.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (trim first so edge whitespace doesn't
    produce empty tokens)."""
    return F.split(F.trim(col), " +")


def sql_tokens(expr: str) -> str:
    return f"string_split_regex(trim({expr}), ' +')"


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Token count under the BPE-ish regex pretokenizer."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0))


def sql_bpe_token_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_PATTERN}'))"


def shingles_of(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array column.

    ``tok`` must be a plain column reference (not an expression tree):
    higher-order-function lambdas re-evaluate captured expressions per
    element, so passing ``tokens(text)`` directly here costs
    O(tokens²·len) per row. Materialize tokens in a prior ``select`` and
    pass the attribute — Catalyst's CollapseProject keeps the staging
    projection because the alias is non-cheap and multiply-referenced.
    """
    windows = F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
    )
    return F.when(F.size(tok) >= n, windows).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (the unit of MinHash/Jaccard dedup). Documents
    shorter than n tokens yield an empty array.

    NB: evaluates ``tokens(col)`` inside a per-element lambda — fine for
    oracles and small data, but the hot path should stage ``tokens`` into
    its own projection and use :func:`shingles_of` (see dedup_fuzzy.py).
    """
    return shingles_of(tokens(col), n)


def sql_shingles(expr: str, n: int = 3) -> str:
    t = sql_tokens(expr)
    return (
        f"list_transform(range(greatest(len({t}) - {n} + 1, 0)), "
        f"i -> array_to_string(({t})[i+1:i+{n}], ' '))"
    )


def stopword_hits(col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda x: x.isin(*words)))


def sql_stopword_hits(expr: str, lang: str) -> str:
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({sql_tokens(expr)}, x -> x IN ({quoted})))"


def language_guess(col: Column) -> Column:
    """Argmax language over stopword-hit counts; deterministic tie-break in
    LANGS order (strict > comparison against all later languages)."""
    hits = {lang: stopword_hits(col, lang) for lang in LANGS}
    expr = F.lit(LANGS[-1])
    for lang in reversed(LANGS[:-1]):
        later = [hits[lang2] for lang2 in LANGS[LANGS.index(lang) + 1 :]]
        cond = None
        for other in later:
            c = hits[lang] >= other
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def sql_language_guess(expr: str) -> str:
    hits = {lang: sql_stopword_hits(expr, lang) for lang in LANGS}
    out = f"'{LANGS[-1]}'"
    for lang in reversed(LANGS[:-1]):
        later = LANGS[LANGS.index(lang) + 1 :]
        cond = " AND ".join(f"({hits[lang]}) >= ({hits[l2]})" for l2 in later)
        out = f"CASE WHEN {cond} THEN '{lang}' ELSE {out} END"
    return out


PUNCT_CLASS = "[.,!?;:]"


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return n_punct.cast("double") / F.greatest(F.length(col), F.lit(1)).cast("double")


def sql_punct_ratio(expr: str) -> str:
    return (
        f"(CAST(length({expr}) - length(regexp_replace({expr}, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)"
        f" / CAST(greatest(length({expr}), 1) AS DOUBLE))"
    )


def type_token_ratio(col: Column) -> Column:
    t = tokens(col)
    return F.size(F.array_distinct(t)).cast("double") / F.greatest(
        F.size(t), F.lit(1)
    ).cast("double")


def sql_type_token_ratio(expr: str) -> str:
    t = sql_tokens(expr)
    return (
        f"(CAST(len(list_distinct({t})) AS DOUBLE) / CAST(greatest(len({t}), 1) AS DOUBLE))"
    )


def quality_score(col: Column) -> Column:
    """Composite heuristic quality score in [0,1]: length saturation,
    punctuation sanity, lexical diversity. Expression structure mirrors
    sql_quality_score exactly so doubles match bit-for-bit."""
    length_part = F.least(token_count(col).cast("double") / F.lit(100.0), F.lit(1.0))
    punct_part = F.lit(1.0) - punct_ratio(col)
    diversity = F.least(type_token_ratio(col) * F.lit(2.0), F.lit(1.0))
    return length_part * F.lit(0.4) + punct_part * F.lit(0.3) + diversity * F.lit(0.3)


def sql_quality_score(expr: str) -> str:
    t = f"CAST(len({sql_tokens(expr)}) AS DOUBLE)"
    return (
        f"(least({t} / 100.0, 1.0) * 0.4"
        f" + (1.0 - {sql_punct_ratio(expr)}) * 0.3"
        f" + least({sql_type_token_ratio(expr)} * 2.0, 1.0) * 0.3)"
    )


def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, trim, collapse whitespace."""
    return F.lower(F.regexp_replace(F.trim(col), " +", " "))


def sql_normalize_text(expr: str) -> str:
    return f"lower(regexp_replace(trim({expr}), ' +', ' ', 'g'))"


def fingerprint_of(sh: Column, k: int = 4) -> Column:
    """Bottom-k sketch fingerprint from a materialized shingle array column:
    md5 of the k lexicographically smallest distinct shingle hashes."""
    hashes = F.array_sort(F.array_distinct(F.transform(sh, F.md5)))
    return F.md5(F.concat_ws("|", F.slice(hashes, 1, k)))


def fingerprint(col: Column, k: int = 4, shingle_n: int = 3) -> Column:
    """Bottom-k sketch fingerprint: md5 of the k lexicographically smallest
    distinct shingle hashes. Two documents sharing most shingles get equal
    fingerprints with high probability — a compact near-dup key.

    Hot path: stage tokens/shingles and use :func:`fingerprint_of`."""
    return fingerprint_of(shingles(col, shingle_n), k)


def sql_fingerprint(expr: str, k: int = 4, shingle_n: int = 3) -> str:
    hashes = f"list_sort(list_distinct(list_transform({sql_shingles(expr, shingle_n)}, s -> md5(s))))"
    return f"md5(array_to_string(({hashes})[1:{k}], '|'))"
