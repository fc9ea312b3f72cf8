"""Text-analysis functions for large-scale training-data pipelines.

All hot-path logic is built from JVM-side ``pyspark.sql.functions`` (regexp,
higher-order array functions) — no Python UDFs — so whole-stage codegen and
column pruning survive at 100 TB. Where a function is used in the correctness
harness, the module also emits the equivalent DuckDB SQL from the *same spec*
(marker tables, regex patterns), so Spark and oracle can't drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Word-boundary regexes below use \\b — supported by both Java regex (Spark)
# and RE2 (DuckDB).

# Whitespace spelled out as a class, NOT \s: Java's \s is [ \t\n\x0b\f\r]
# while RE2's (DuckDB) lacks \x0b, so a vertical tab — present in real
# web-scraped text — would split a token in Spark but not in the oracle
# (r5 review, demonstrated live). The explicit class is Java's exact set,
# so Spark behavior is unchanged and the mirrors now agree.
_WS_CHARS = r" \t\n\x0b\f\r"
WS_TOKEN_SPLIT = rf"[{_WS_CHARS}]+"
# the same pattern spelled for a Spark SQL string literal (F.expr /
# spark.sql), where backslash escapes are interpreted once by the SQL
# parser before reaching the Java regex engine
WS_TOKEN_SPLIT_SPARKSQL = WS_TOKEN_SPLIT.replace("\\", "\\\\")
# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbols
BPE_ISH_PATTERN = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{_WS_CHARS}]"
PUNCT_PATTERN = r"[.,;:!?]"

# language-ID marker words (tiny n-gram/stopword heuristic); deterministic
# alphabetical tie-break on equal scores
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "los", "las", "que", "y", "es", "en"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "dans"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不"],
}

ENGLISH_STOPWORDS = ["the", "and", "of", "to", "a", "is", "in", "that", "it",
                     "for", "on", "as", "with", "was", "at", "by"]


def _marker_regex(words: list[str], boundaries: bool = True) -> str:
    body = "(" + "|".join(words) + ")"
    # CJK text has no inter-word spaces, so \b can never fire around a
    # marker inside a continuous han run (verified on both engines) —
    # the zh markers match as plain substrings (r5 review)
    return r"\b" + body + r"\b" if boundaries else body


# -- token counting -------------------------------------------------------


def token_count(col: Column | str) -> Column:
    """Whitespace token count. Empty fragments are filtered AFTER the
    split: trim() strips only ASCII spaces, so text ending in a newline
    or tab (most real corpus text) kept a phantom '' token — off-by-one
    counts, corrupted shingles and fingerprints (r5 review; the empty
    filter also makes the all-whitespace case 0 naturally)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, WS_TOKEN_SPLIT),
                           lambda x: x != "")).cast("bigint")


def token_count_sql(col: str) -> str:
    return (f"CAST(len(list_filter(regexp_split_to_array({col}, "
            f"'{WS_TOKEN_SPLIT}'), x -> x != '')) AS BIGINT)")


# -- corpus tokenization (lowercased) -------------------------------------

# Characters whose lower() DIVERGES between Spark (Java full case mapping)
# and DuckDB (simple fold): U+0130 'İ' -> 'i'+U+0307 vs 'i', and final
# sigma — Java lowers a word-final 'Σ' to 'ς', DuckDB always to 'σ'
# (r5 review, demonstrated live). The oracle guards on these instead of
# hash-mismatching mysteriously; Spark keeps real Unicode folding.
_CASEFOLD_DIVERGENT = "İΣ"


def tokens_lower(col: Column | str) -> Column:
    """THE corpus tokenizer: lowercased whitespace token array, empties
    dropped. Every corpus-statistics operator (tf-idf, vocabulary, LM
    log-probs, entropy, collocations) MUST tokenize through here or
    :func:`token_rows` so the spelling can't drift from the oracle's."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(F.lower(c)), WS_TOKEN_SPLIT),
                    lambda x: x != "")


def tokens_lower_sql(col: str) -> str:
    """DuckDB words-array mirror of :func:`tokens_lower`. The inner CASE
    errors loudly on characters where the engines' lower() disagree
    (same pattern as the url_funcs oracle guard) — testdata that ever
    grows Turkish dotted-I or Greek sigma fails the oracle with a clear
    message instead of a silent value drift."""
    guarded = (f"CASE WHEN regexp_matches({col}, '[{_CASEFOLD_DIVERGENT}]') "
               f"THEN error('tokens_lower oracle: text contains a character "
               f"whose lower() diverges between Java full case mapping and "
               f"DuckDB simple folding ({_CASEFOLD_DIVERGENT})') "
               f"ELSE {col} END")
    return (f"list_filter(regexp_split_to_array(trim(lower({guarded})), "
            f"'{WS_TOKEN_SPLIT}'), x -> x != '')")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count from the BPE-style pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("bigint")


def bpe_ish_token_count_sql(col: str) -> str:
    return f"CAST(len(regexp_extract_all({col}, '{BPE_ISH_PATTERN}')) AS BIGINT)"


# -- quality scoring ------------------------------------------------------


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.regexp_count(c, F.lit(PUNCT_PATTERN)) / F.greatest(F.length(c), F.lit(1)),
        6,
    )


def punct_ratio_sql(col: str) -> str:
    return (f"round(len(regexp_extract_all({col}, '{PUNCT_PATTERN}')) "
            f"/ greatest(length({col}), 1), 6)")


def stopword_ratio(col: Column | str) -> Column:
    """English stopword tokens / whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    hits = F.regexp_count(F.lower(c), F.lit(_marker_regex(ENGLISH_STOPWORDS)))
    return F.round(hits / F.greatest(token_count(c), F.lit(1)), 6)


def stopword_ratio_sql(col: str) -> str:
    pattern = _marker_regex(ENGLISH_STOPWORDS)
    return (f"round(len(regexp_extract_all(lower({col}), '{pattern}')) "
            f"/ greatest({token_count_sql(col)}, 1), 6)")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long enough, some punctuation,
    sane stopword density. Weights are arbitrary but fixed."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    punct_score = F.least(punct_ratio(c) * 20, F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 5, F.lit(1.0))
    # round at the composite's native decimal precision (8): rounding at 6
    # lands on true .5 ties where engine tie-breaking differs
    return F.round(0.5 * len_score + 0.2 * punct_score + 0.3 * stop_score, 8)


def quality_score_sql(col: str) -> str:
    return (f"round(0.5 * least(length({col}) / 500.0, 1.0) "
            f"+ 0.2 * least({punct_ratio_sql(col)} * 20, 1.0) "
            f"+ 0.3 * least({stopword_ratio_sql(col)} * 5, 1.0), 8)")


# -- language ID ----------------------------------------------------------


def lang_id(col: Column | str) -> Column:
    """Marker-word language ID with deterministic alphabetical tie-break:
    score each language by whole-word marker hits, pick the argmax."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    scores = {lang: F.regexp_count(
        c, F.lit(_marker_regex(words, boundaries=(lang != "zh"))))
              for lang, words in sorted(LANG_MARKERS.items())}
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    # reversed so earlier languages win ties (when() chains short-circuit)
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("unknown")).otherwise(out)


def lang_id_sql(col: str) -> str:
    scores = {
        lang: ("len(regexp_extract_all(lower(" + col + "), '"
               + _marker_regex(w, boundaries=(lang != "zh")) + "'))")
        for lang, w in sorted(LANG_MARKERS.items())}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    expr = "'unknown'"
    for lang in sorted(scores, reverse=True):
        expr = f"CASE WHEN {scores[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return f"CASE WHEN {best} = 0 THEN 'unknown' ELSE {expr} END"


# -- PII redaction --------------------------------------------------------

# Patterns restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, non-capturing groups —
# no lookaround. Order matters: emails first (their local part can contain
# digits), then SSN (3-2-4 can't match the 3-3-4 phone shape), then phones.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # \b can't lead the pattern: '(' and '+' are non-word chars, so a
    # boundary assertion before them fails after whitespace. Anchor the
    # bare-digit alternative only.
    (r"(?:\+[0-9]{1,2}[ -]?)?(?:\([0-9]{3}\)|\b[0-9]{3})[ -][0-9]{3}[ -][0-9]{4}\b",
     "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace emails, SSNs, and phone numbers with typed placeholders."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, replacement in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    return c


def redact_pii_sql(col: str) -> str:
    expr = col
    for pattern, replacement in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{escaped}', '{replacement}', 'g')"
    return expr


# -- document fingerprinting ----------------------------------------------


def words_of(col: Column | str) -> Column:
    """Whitespace word array, empty fragments removed (leading/trailing
    tabs/newlines survive trim(), which strips spaces only — the '' words
    corrupted shingles and dedup keys; the SQL mirrors always filtered,
    see collocations/corpusstats list_filter). Materialize this as its
    own column before shingling: embedding the split inside the shingle
    lambda makes Spark re-split the text once per shingle (O(words²) —
    measured 3× slower)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, WS_TOKEN_SPLIT), lambda x: x != "")


def shingles_of_words(words: Column | str, raw: Column | str, k: int = 5) -> Column:
    """Word k-shingles from a pre-materialized words array."""
    w = F.col(words) if isinstance(words, str) else words
    r = F.col(raw) if isinstance(raw, str) else raw
    return F.when(F.size(w) < k, F.array(F.trim(r))).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(w) - k + 1),
                    lambda i: F.array_join(F.slice(w, i, F.lit(k)), " ")))


def shingles(col: Column | str, k: int = 5) -> Column:
    """Word k-shingles straight from a text column (convenience; prefer
    materializing ``words_of`` first in performance-sensitive plans)."""
    return shingles_of_words(words_of(col), col, k)


def dup_ngram_ratio(col: Column | str, k: int = 3,
                    words: Column | str | None = None) -> Column:
    """Fraction of word ``k``-grams that are repeats of an earlier one —
    the Gopher-style intra-document repetition signal (high values mark
    boilerplate/spam worth dropping before training). 0 for documents
    shorter than ``k`` words (single-shingle fallback). Pure higher-order
    array functions; pass a pre-materialized ``words`` column in hot
    paths."""
    sh = (shingles_of_words(words, col, k) if words is not None
          else shingles(col, k))
    return F.round(
        1 - F.size(F.array_distinct(sh)) / F.size(sh), 6)


def dup_ngram_ratio_sql(col: str, k: int = 3) -> str:
    """DuckDB mirror of :func:`dup_ngram_ratio`."""
    words = f"list_filter(regexp_split_to_array(trim({col}), '{WS_TOKEN_SPLIT}'), x -> x != '')"
    shs = (f"CASE WHEN len({words}) < {k} THEN [trim({col})] "
           f"ELSE list_transform(range(1, len({words}) - {k} + 2), "
           f"i -> array_to_string({words}[i:i+{k - 1}], ' ')) END")
    return f"round(1 - len(list_distinct({shs})) / len({shs}), 6)"


def doc_fingerprint(col: Column | str, k: int = 5,
                    words: Column | str | None = None) -> Column:
    """Winnowing-style fingerprint: the minimum md5 over word k-shingles.
    md5-hex strings compare identically in Spark and DuckDB, so this is
    oracle-checkable (unlike xxhash64, which DuckDB lacks). Pass a
    pre-materialized ``words`` column in hot paths."""
    sh = (shingles_of_words(words, col, k) if words is not None
          else shingles(col, k))
    return F.array_min(F.transform(sh, lambda s: F.md5(s)))


def doc_fingerprint_sql(col: str, k: int = 5) -> str:
    words = f"list_filter(regexp_split_to_array(trim({col}), '{WS_TOKEN_SPLIT}'), x -> x != '')"
    return (
        f"CASE WHEN len({words}) < {k} THEN md5(trim({col})) "
        f"ELSE list_min(list_transform(range(1, len({words}) - {k} + 2), "
        f"i -> md5(array_to_string({words}[i:i+{k}-1], ' ')))) END"
    )
