"""Scalar text functions — all built-in-expression (JVM, codegen'd).

``think_strip`` is reference A9 (lib/job_processor.rb:207-210): remove
every non-greedy ``<think>...</think>`` block (DOTALL), then strip
surrounding whitespace. Malformed/unclosed tags and ``<thinking>`` are
left untouched — pinned by spec/reasoning_removal_spec.rb:34-148.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

THINK_RE = r"(?s)<think>.*?</think>"
# Ruby String#strip (the reference's post-clean, job_processor.rb:209)
# trims exactly " \0\t\n\v\f\r" from both ends; SQL trim() only trims
# spaces, so use an anchored regex on both engines. Java \s is
# [ \t\n\x0B\f\r] (add \x00); RE2's \s lacks \x0B (add both).
TRIM_RE = r"^[\s\x00]+|[\s\x00]+$"

# DuckDB dialect twins (for oracle SQL builders)
DUCKDB_THINK = "regexp_replace({col}, '<think>.*?</think>', '', 'gs')"
DUCKDB_TRIM = r"regexp_replace({col}, '^[\s\x00\x0B]+|[\s\x00\x0B]+$', '', 'g')"


def think_strip(col: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(col, THINK_RE, ""), TRIM_RE, "")


def duckdb_think_strip(col_sql: str) -> str:
    inner = DUCKDB_THINK.format(col=col_sql)
    return DUCKDB_TRIM.format(col=inner)


# ---------------------------------------------------------------------------
# text-analysis kernels, defined once with Spark + DuckDB twins so the
# oracle can never drift from the implementation
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: letter runs | single digits | non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"

# language marker stopword sets for the n-gram/stopword lang-id heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "zh": ["的", "是", "了", "在", "和"],
}
LANG_ORDER = ["en", "es", "fr", "de", "zh"]  # deterministic tie order


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, " "))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (letter runs / digits / symbols)."""
    return F.regexp_count(text, F.lit(BPE_RE))


def lang_id(text: Column) -> Column:
    """Marker-stopword language ID: argmax of per-language marker token
    counts, first-in-LANG_ORDER tie-break, 'und' when all scores are 0.

    Arrow-batched kernel rather than expressions: the argmax CASE chain
    references each per-language score ~2n times, and the score itself
    is a higher-order ``filter`` that runs interpreted (no codegen, no
    reliable subexpression elimination) — the expression form cost ~20
    interpreted passes per row. Semantics are pinned against the DuckDB
    twin (``duckdb_lang_id``) by the oracle."""
    marker_sets = [(lang, frozenset(LANG_MARKERS[lang])) for lang in LANG_ORDER]

    def f(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            counts = [0] * len(marker_sets)
            for tok in t.split(" "):
                for i, (_, ms) in enumerate(marker_sets):
                    if tok in ms:
                        counts[i] += 1
            best_i, best = -1, 0
            for i, c in enumerate(counts):  # first argmax == stable tie-break
                if c > best:
                    best, best_i = c, i
            out.append(marker_sets[best_i][0] if best_i >= 0 else "und")
        return pd.Series(out)

    return F.pandas_udf(f, "string")(text)


def duckdb_lang_id(col: str) -> str:
    def score(lang: str) -> str:
        lst = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            f"len(list_filter(string_split({col}, ' '), t -> list_contains([{lst}], t)))"
        )

    whens = []
    for lang in LANG_ORDER:
        conds = [f"{score(lang)} > 0"]
        for o in LANG_ORDER:
            if o == lang:
                continue
            op = ">" if LANG_ORDER.index(o) < LANG_ORDER.index(lang) else ">="
            conds.append(f"{score(lang)} {op} {score(o)}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    # NULL text -> NULL prediction, mirroring the Arrow kernel's
    # identity-preserving null flow; 'und' is for scoreable-but-
    # undetermined text only (r6 NULL-corpus parity audit)
    return (
        f"CASE WHEN {col} IS NULL THEN NULL ELSE "
        + "CASE " + " ".join(whens) + " ELSE 'und' END END"
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / mean-token-length features for
    quality scoring. All ratios rounded to 4 decimals."""
    n_chars = F.length(text)
    toks = F.split(text, " ")
    n_toks = F.size(toks)
    n_punct = F.regexp_count(text, F.lit(PUNCT_RE))
    en = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_toks,
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop / F.greatest(n_toks, F.lit(1)), 4),
        "mean_token_len": F.round(
            (n_chars - (n_toks - 1)) / F.greatest(n_toks, F.lit(1)), 4
        ),
    }


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 over the sorted distinct token set —
    invariant to token order/multiplicity (bag-of-words identity)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " "))


DUCKDB_FINGERPRINT = (
    "md5(array_to_string(list_sort(list_distinct(string_split({col}, ' '))), ' '))"
)
