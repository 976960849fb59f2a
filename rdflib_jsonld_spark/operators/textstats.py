"""Text-analysis operators over a documents table (training-data pipeline
extensions — first-class alongside SURVEY.md §2; see the build brief).

Everything here stays JVM-side (pyspark.sql.functions, whole-stage
codegen'd) except language-ID's n-gram scorer, which is a vectorized
pandas UDF (Arrow-batched, no per-row Python).

Operators:
- token_count      whitespace + BPE-ish regex token counting
- quality_score    length / punctuation / stopword-ratio scoring
- fingerprint      deterministic document fingerprint (64-bit)
- lang_id          char-trigram language identification (heuristic)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.pandas.functions import pandas_udf

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "for", "on", "that")

#: BPE-ish tokenizer regex: words, numbers, or single non-space symbols —
#: the shape GPT-style byte-pair pretokenizers use (public pattern family).
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + regex (BPE-ish pretoken) counts, all JVM-side."""
    c = F.col(text_col)
    ws = F.size(F.split(F.trim(c), r"\s+"))
    ws = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(ws)
    bpe = F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))
    return (docs
            .withColumn("n_ws_tokens", ws)
            .withColumn("n_bpe_tokens", bpe))


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio, mean
    word length → a [0,1] composite. Formula is deliberately simple and
    SQL-expressible so the DuckDB oracle can replicate it exactly."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    words = F.split(F.trim(c), r"\s+")
    n_words = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(words))
    stop_pattern = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(c, F.lit(stop_pattern), 0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_words > 0,
                       F.length(F.regexp_replace(c, r"\s+", "")) / n_words
                       ).otherwise(F.lit(0.0))
    score = (
        F.when(n_words >= 5, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when((stop_ratio > 0.05) & (stop_ratio < 0.6), F.lit(0.2))
          .otherwise(F.lit(0.0))
        + F.when((mean_wlen > 2.5) & (mean_wlen < 12.0), F.lit(0.2))
          .otherwise(F.lit(0.0))
    )
    return (docs
            .withColumn("punct_ratio", F.round(punct_ratio, 6))
            .withColumn("stopword_ratio", F.round(stop_ratio, 6))
            .withColumn("mean_word_len", F.round(mean_wlen, 6))
            .withColumn("quality_score", F.round(score, 2)))


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit document fingerprint: xxhash64 of the whitespace-normalized
    lowercased text (content-defined identity for exact dedup at scale —
    cheaper to shuffle than the text itself)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.withColumn("fingerprint", F.xxhash64(norm))


# --- language identification -------------------------------------------------

#: Tiny per-language trigram profiles (hand-picked high-frequency character
#: trigrams; heuristic, deterministic, offline).
_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing",
           "ng ", " to", "to ", "er ", " in", "in "),
    "de": ("er ", " de", "der", "ie ", " di", "die", "ein", "ich", "sch",
           "und", " un", "nd ", "en ", "ch ", " ge"),
    "fr": (" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion",
           "que", " qu", "ue ", "ait", " et", "et "),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ent",
           " en", "en ", "ar ", "ado", " qu", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人",
           "这", "中", "大", "为", "上"),
}


@pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Vectorized n-gram language ID: score = profile-hit count normalized
    by text length; deterministic argmax with lexicographic tie-break.

    Column-vectorized (one ``Series.str.count`` pass per profile gram,
    ~75 C-loop passes per Arrow batch) — no per-row Python. idxmax takes
    the FIRST column at the max, and columns are in sorted-language
    order, which reproduces the strict-greater/lexicographic rule the
    DuckDB oracle (generated from the same profiles) encodes."""
    import re as _re

    tl = texts.fillna("").str.lower()
    denom = 1.0 + tl.str.len() / 100.0
    scores = pd.DataFrame(index=tl.index)
    for lang in sorted(_PROFILES):
        hits = None
        for g in _PROFILES[lang]:
            c = tl.str.count(_re.escape(g))
            hits = c if hits is None else hits + c
        scores[lang] = hits / denom
    best = scores.max(axis=1)
    pred = scores.idxmax(axis=1)
    return pred.where(best > 0, "und")


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("pred_lang", lang_id_udf(F.col(text_col)))


def chunk_documents(docs: DataFrame, chunk_chars: int = 1000,
                    overlap: int = 100,
                    text_col: str = "text") -> DataFrame:
    """Sliding-window document chunking (the training-data windowing
    op): one row per (doc, chunk) with ``chunk_idx``, 0-based
    ``chunk_start`` and ``chunk_text`` — all original columns kept.

    Chunks start every ``chunk_chars - overlap`` characters; the last
    chunk may be shorter; an empty/short document yields exactly ONE
    chunk (its full text). Entirely JVM column algebra
    (sequence/explode/substring — no Python, no shuffle), so the fan-out
    is pipelined into the scan and Catalyst prunes columns through it.
    By construction ``chunk0 + chunk1[overlap:] + chunk2[overlap:] + …``
    reconstructs the document (coverage property, unit-tested).
    """
    step = chunk_chars - overlap
    if step <= 0:
        raise ValueError("chunk_chars must exceed overlap")
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(text_col) - F.lit(overlap)) / F.lit(float(step))))
    out = docs.withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0), (n - 1).cast("int"))))
    return (out
            .withColumn("chunk_start", F.col("chunk_idx") * step)
            .withColumn("chunk_text",
                        F.expr(f"substring({text_col}, "
                               f"chunk_idx * {step} + 1, {chunk_chars})")))
