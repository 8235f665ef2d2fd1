"""Text analysis scalar functions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) with exact
ANSI-SQL twins for the DuckDB oracle — definitions are deliberately
engine-portable (whitespace tokenization, simple ratios, md5).
"""

from __future__ import annotations

from functools import reduce
from operator import add
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "token_count",
    "vocab",
    "vocab_sql",
    "bpe_token_count",
    "char_count",
    "punct_ratio",
    "stopword_count",
    "quality_score",
    "lang_scores",
    "langid_confusion",
    "langid_confusion_sql",
    "doc_fingerprint",
    "rolling_fingerprint",
    "text_stats",
    "repetition_stats",
    "repetition_stats_sql",
    "redact_text",
    "redact_text_sql",
    "redact_expr_sql",
    "STOPWORDS",
]

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language id.  Chosen from the most frequent function words; the corpus
# here is synthetic, so the mechanism (not lexicon coverage) is the point.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "人", "这"),
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
        .otherwise(F.size(_tokens(text))).cast("long")


def token_count_sql(col: str) -> str:
    return (f"cast(CASE WHEN length(trim({col})) = 0 THEN 0 "
            f"ELSE len(string_split_regex(trim({col}), '\\s+')) END as bigint)")


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs
# (whitespace dropped) — the GPT-2-style split shape, kept to constructs
# whose semantics are identical in Java regex and DuckDB's RE2.
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens (letter/digit/punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_PATTERN), 0)) \
        .cast("long")


def bpe_token_count_sql(col: str) -> str:
    return (f"cast(len(regexp_extract_all({col}, "
            f"'{_BPE_PATTERN}')) as bigint)")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [A-Za-z0-9 ]."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)) \
        .otherwise(F.length(stripped) / F.length(text).cast("double"))


def punct_ratio_sql(col: str) -> str:
    return (f"CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
            f"length(regexp_replace({col}, '[A-Za-z0-9 ]', '', 'g')) "
            f"* 1.0 / length({col}) END")


def stopword_count(text: Column, lang: str = "en") -> Column:
    toks = _tokens(F.lower(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("long")


def stopword_count_sql(col: str, lang: str = "en") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (f"cast(len(list_filter(string_split_regex(trim(lower({col})), '\\s+'), "
            f"t -> list_contains([{lst}], t))) as bigint)")


def quality_score(text: Column, lang: str = "en") -> Column:
    """Heuristic document quality in [0, 1].

    0.4·length-band + 0.3·(1 − punct_ratio) + 0.3·stopword-density-band —
    the standard cheap pre-filter shape for web-scale corpora (cf. C4 /
    Gopher rules); exact weights are engine-portable constants.
    """
    ntok = token_count(text).cast("double")
    len_band = F.least(ntok / F.lit(50.0), F.lit(1.0))
    sw_density = F.when(ntok == 0, F.lit(0.0)) \
        .otherwise(stopword_count(text, lang).cast("double") / ntok)
    sw_band = F.least(sw_density * 5.0, F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_band + F.lit(0.3) * (1.0 - punct_ratio(text))
        + F.lit(0.3) * sw_band, 6,
    )


def quality_score_sql(col: str, lang: str = "en") -> str:
    ntok = token_count_sql(col)
    sw = stopword_count_sql(col, lang)
    return (
        f"round(0.4 * least({ntok} / 50.0, 1.0) "
        f"+ 0.3 * (1.0 - ({punct_ratio_sql(col)})) "
        f"+ 0.3 * least(CASE WHEN {ntok} = 0 THEN 0.0 "
        f"ELSE ({sw}) * 1.0 / ({ntok}) END * 5.0, 1.0), 6)"
    )


def lang_scores(text: Column) -> Column:
    """Predicted language = argmax of per-language stopword hit counts,
    'und' (undetermined) when every score is zero."""
    toks = _tokens(F.lower(text))
    best = None
    best_score = None
    for lang in STOPWORDS:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def lang_scores_sql(col: str) -> str:
    # same first-wins argmax order as the Column builder (dict order)
    cases = []
    scores = {}
    for lang in STOPWORDS:
        scores[lang] = stopword_count_sql(col, lang)
    langs = list(STOPWORDS)
    # emulate iterative argmax: lang beats current best only if strictly greater
    expr = f"'{langs[0]}'"
    best = scores[langs[0]]
    for lang in langs[1:]:
        expr = f"CASE WHEN ({scores[lang]}) > ({best}) THEN '{lang}' ELSE {expr} END"
        best = f"greatest({best}, {scores[lang]})"
    return f"CASE WHEN ({best}) > 0 THEN {expr} ELSE 'und' END"


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 hex) — portable."""
    return F.md5(text)


# Rabin-Karp-style rolling polynomial hash.  Base/modulus chosen so
# every intermediate stays below 2⁶³ (h < P, code ≤ 0x10FFFF ⇒
# h·B + code < 2³¹·2³¹ + 2²¹): overflow-free in both engines' BIGINT.
_RH_BASE = 1_000_003
_RH_MOD = (1 << 31) - 1


def rolling_fingerprint(text: Column) -> Column:
    """64-bit-safe rolling hash over the codepoint sequence.

    h ← (h·B + codepoint) mod P, folded left-to-right — the classic
    Rabin-Karp document fingerprint, as a pure `aggregate` Column
    expression (no UDF).
    """
    codes = F.transform(F.split(text, ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(_RH_BASE) + c.cast("long")) % F.lit(_RH_MOD),
    )


def rolling_fingerprint_sql(col: str) -> str:
    """DuckDB twin of :func:`rolling_fingerprint`.

    Spark's split("") yields codepoints in order; DuckDB's
    string_split on '' does the same.  `ascii()` returns the full
    codepoint (not just ASCII) in both engines.
    """
    return (
        f"list_reduce(list_prepend(cast(0 as bigint), "
        f"list_transform(string_split({col}, ''), "
        f"ch -> cast(ascii(ch) as bigint))), "
        f"(h, c) -> (h * {_RH_BASE} + c) % {_RH_MOD})"
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document feature frame: counts, ratios, quality, lang, fingerprint."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        char_count(t).alias("n_chars_computed"),
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        stopword_count(t, "en").alias("en_stopwords"),
        quality_score(t, "en").alias("quality"),
        lang_scores(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
        rolling_fingerprint(t).alias("rolling_fp"),
    )


def text_stats_sql(table: str, text_col: str = "text") -> str:
    c = text_col
    return (
        "SELECT doc_id, "
        f"cast(length({c}) as bigint) AS n_chars_computed, "
        f"{token_count_sql(c)} AS n_tokens, "
        f"{bpe_token_count_sql(c)} AS n_bpe_tokens, "
        f"round({punct_ratio_sql(c)}, 6) AS punct_ratio, "
        f"{stopword_count_sql(c, 'en')} AS en_stopwords, "
        f"{quality_score_sql(c, 'en')} AS quality, "
        f"{lang_scores_sql(c)} AS lang_pred, "
        f"md5({c}) AS fingerprint, "
        f"{rolling_fingerprint_sql(c)} AS rolling_fp "
        f"FROM {table}"
    )


def repetition_stats(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text", ngram: int = 2) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
    ``(id, dup_line_frac, top_ngram_frac)``.

    * ``dup_line_frac`` — fraction of the document's lines that are
      duplicates of an earlier line (1 − distinct/total).
    * ``top_ngram_frac`` — occurrences of the most frequent word
      `ngram`-gram over total n-gram occurrences.  Documents with fewer
      than `ngram` tokens contribute one truncated gram (frac 1.0).

    Relational shape: explode → two hash aggregates keyed on (id, gram)
    then (id) — map-side combined, no UDF, no per-doc quadratic
    expression; at 100 TB both shuffles carry (id, gram-count) rows,
    never raw text.
    """
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - ngram, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, ngram)),
    )
    lines = F.split(t, "\n")
    per_doc = df.select(
        F.col(id_col),
        (F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines))
        .alias("dup_line_frac"),
        grams.alias("__g"),
    )
    counts = per_doc.select(id_col, F.explode("__g").alias("g")) \
        .groupBy(id_col, "g").agg(F.count("*").alias("c"))
    top = counts.groupBy(id_col).agg(
        (F.max("c") * F.lit(1.0) / F.sum("c")).alias("top_ngram_frac"))
    return per_doc.select(id_col, "dup_line_frac").join(top, id_col)


def repetition_stats_sql(table: str, *, id_col: str = "doc_id",
                         text_col: str = "text", ngram: int = 2) -> str:
    """DuckDB twin of :func:`repetition_stats` (exact value parity:
    integer-count divisions are correctly-rounded doubles on both
    engines)."""
    c = text_col
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         string_split_regex(trim({c}), '\\s+') AS w,
         string_split({c}, chr(10)) AS lines
  FROM {table}
),
grams AS (
  SELECT id,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - {ngram - 1}, 1)),
           i -> array_to_string(w[i:i+{ngram - 1}], ' '))) AS g
  FROM base
),
counts AS (SELECT id, g, count(*) AS c FROM grams GROUP BY 1, 2),
top AS (
  SELECT id, max(c) * 1.0 / sum(c) AS top_ngram_frac FROM counts GROUP BY 1
),
dl AS (
  SELECT id,
         1.0 - len(list_distinct(lines)) / len(lines) AS dup_line_frac
  FROM base
)
SELECT dl.id AS {id_col}, dl.dup_line_frac, top.top_ngram_frac
FROM dl JOIN top USING (id)
""".strip()


# Redaction patterns restricted to constructs with identical semantics
# in Java regex (Spark) and RE2 (DuckDB): char classes, +/{m,}, alternation.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_LONG_DIGITS_RE = r"[0-9]{9,}"  # SSN/phone/card-shaped digit runs


def redact_text(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text",
                keep: Sequence[str] = ()) -> DataFrame:
    """PII/URL scrubbing — the standard pre-training redaction pass.

    Returns (id, redacted text, per-category match counts).  Emails →
    ``<EMAIL>``, URLs → ``<URL>``, ≥9-digit runs → ``<NUM>`` (applied in
    that order, so URL query digits are already collapsed into
    ``<URL>``).  Pure `regexp_replace`/`regexp_count` Column exprs —
    whole-stage codegen, no UDF, no shuffle; patterns kept to the
    Java-regex ∩ RE2 common subset so the DuckDB twin is exact.
    `keep` names extra input columns to pass through unchanged — a
    redact-then-rejoin-for-metadata composition is a needless shuffle
    when the redaction itself is a narrow projection.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, _EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, _URL_RE, "<URL>")
    red = F.regexp_replace(red, _LONG_DIGITS_RE, "<NUM>")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        red.alias("redacted"),
        F.regexp_count(t, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(_URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count(t, F.lit(_LONG_DIGITS_RE)).cast("long")
        .alias("n_long_digit_runs"),
    )


def redact_expr_sql(col: str) -> str:
    """Just the redaction expression (for composing into pipelines)."""
    return (f"regexp_replace(regexp_replace(regexp_replace({col}, "
            f"'{_EMAIL_RE}', '<EMAIL>', 'g'), "
            f"'{_URL_RE}', '<URL>', 'g'), "
            f"'{_LONG_DIGITS_RE}', '<NUM>', 'g')")


def redact_text_sql(table: str, *, id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB twin of :func:`redact_text`."""
    c = text_col
    return f"""
SELECT {id_col},
       regexp_replace(regexp_replace(regexp_replace({c},
         '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_URL_RE}', '<URL>', 'g'),
         '{_LONG_DIGITS_RE}', '<NUM>', 'g') AS redacted,
       cast(len(regexp_extract_all({c}, '{_EMAIL_RE}')) as bigint)
         AS n_emails,
       cast(len(regexp_extract_all({c}, '{_URL_RE}')) as bigint) AS n_urls,
       cast(len(regexp_extract_all({c}, '{_LONG_DIGITS_RE}')) as bigint)
         AS n_long_digit_runs
FROM {table}
""".strip()


def vocab(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
          top_v: int = 1000, min_count: int = 1) -> DataFrame:
    """Corpus vocabulary: the top-V whitespace tokens with term and
    document frequencies — the tokenizer/vocab-building pass of a
    training-data pipeline.

    Returns (token, term_freq, doc_freq, rank), rank 1..V ordered by
    (term_freq DESC, token ASC) — a total order, so top-V is
    deterministic.  Physical shape is the canonical scalable word
    count: explode → per-(token, doc) partial counts (map-side
    combined) → per-token aggregate — two hash exchanges, all JVM; the
    global top-V rank runs over the (≤ distinct-token) aggregate, never
    the corpus.  At 100 TB nothing here touches the driver until the
    V-row result.
    """
    toks = (
        df.select(F.col(id_col).alias("__id"),
                  F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                  .alias("token"))
        .filter(F.col("token") != "")
    )
    per_doc = toks.groupBy("token", "__id").agg(
        F.count(F.lit(1)).alias("n"))
    agg = per_doc.groupBy("token").agg(
        F.sum("n").alias("term_freq"),
        F.count(F.lit(1)).alias("doc_freq"),
    ).filter(F.col("term_freq") >= min_count)
    w = Window.orderBy(F.desc("term_freq"), F.asc("token"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_v))


def vocab_sql(table: str, *, text_col: str = "text", id_col: str = "doc_id",
              top_v: int = 1000, min_count: int = 1) -> str:
    """DuckDB twin of :func:`vocab` (bit-identical tokens and counts)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         unnest(list_filter(string_split_regex(trim({text_col}), '\\s+'),
                            x -> x <> '')) AS token
  FROM {table}
),
agg AS (
  SELECT token, count(*)::BIGINT AS term_freq,
         count(DISTINCT id)::BIGINT AS doc_freq
  FROM toks GROUP BY token
  HAVING count(*) >= {min_count}
)
SELECT token, term_freq, doc_freq,
       row_number() OVER (ORDER BY term_freq DESC, token ASC) AS rank
FROM agg
QUALIFY rank <= {top_v}
ORDER BY rank
""".strip()

def langid_confusion(df: DataFrame, *, lang_col: str = "lang",
                     text_col: str = "text") -> DataFrame:
    """Language-ID confusion matrix: the corpus's labelled language
    against :func:`lang_scores`' stopword-heuristic prediction, with
    document counts — the evaluation artifact a pipeline owner reads
    before trusting the classifier as a filter.

    Returns (actual, predicted, n_docs).  One projection + one
    map-side-combined groupBy on a ≤ |langs|² key space — at 100 TB the
    shuffle is a few dozen rows.
    """
    return (df.select(F.col(lang_col).alias("actual"),
                      lang_scores(F.col(text_col)).alias("predicted"))
            .groupBy("actual", "predicted")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def langid_confusion_sql(table: str, *, lang_col: str = "lang",
                         text_col: str = "text") -> str:
    """DuckDB twin of :func:`langid_confusion`."""
    return (f"SELECT {lang_col} AS actual, "
            f"{lang_scores_sql(text_col)} AS predicted, "
            f"count(*)::BIGINT AS n_docs "
            f"FROM {table} GROUP BY 1, 2")
