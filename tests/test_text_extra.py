"""Repetition-signal tests (Gopher rules, functions/text.repetition_stats)."""

import pytest

from flink_skyline_qos_spark.functions.text import repetition_stats


def test_repetition_stats_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # top 2-gram "a b" = 3 of 5
            (2, "x\nx\ny"),            # 1 dup line of 3
            (3, "w"),                  # short doc: one truncated gram
            (4, "p q r s"),            # all grams unique
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["dup_line_frac"], r["top_ngram_frac"])
           for r in repetition_stats(docs).collect()}
    assert out[1][0] == 0.0
    assert out[1][1] == pytest.approx(3 / 5)
    assert out[2][0] == pytest.approx(1 - 2 / 3)
    assert out[3] == (0.0, 1.0)
    assert out[4] == (0.0, pytest.approx(1 / 3))


def _py_repetition(text, ngram=2):
    """Pure-Python model of repetition_stats for property testing."""
    lines = text.split("\n")
    dup_line_frac = 1.0 - len(set(lines)) / len(lines)
    toks = [t for t in __import__("re").split(r"\s+", text.strip())]
    # Spark split keeps [''] for empty/blank text
    if toks == []:
        toks = [""]
    n = len(toks)
    grams = [" ".join(toks[i:i + ngram]) for i in range(max(n - ngram, 0) + 1)]
    from collections import Counter

    c = Counter(grams)
    return dup_line_frac, max(c.values()) / len(grams)


def test_repetition_stats_property(spark):
    """Spark output equals the pure-Python model over generated docs
    (word repeats, newlines, blanks, unicode)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["a", "bb", "ccc", "τok", "x1"])
    line = st.lists(words, min_size=1, max_size=6).map(" ".join)
    doc = st.lists(line, min_size=1, max_size=5).map("\n".join)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string")
        got = {r["doc_id"]: (r["dup_line_frac"], r["top_ngram_frac"])
               for r in repetition_stats(df).collect()}
        for i, t in enumerate(texts):
            exp = _py_repetition(t)
            assert got[i][0] == pytest.approx(exp[0]), (t, got[i], exp)
            assert got[i][1] == pytest.approx(exp[1]), (t, got[i], exp)

    run()


def test_redact_text_crafted(spark):
    from flink_skyline_qos_spark.functions.text import redact_text

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org today"),
            (2, "see https://a.example.com/p?q=123456789123 and http://b.io"),
            (3, "card 4111111111111111 pin 1234"),
            (4, "clean text, nothing to hide"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_text(docs).collect()}
    assert out[1]["redacted"] == "mail me at <EMAIL> today"
    assert out[1]["n_emails"] == 1
    # URL swallows its digit query; the bare domain is a second URL
    assert out[2]["redacted"] == "see <URL> and <URL>"
    assert out[2]["n_urls"] == 2 and out[2]["n_long_digit_runs"] == 1
    assert out[3]["redacted"] == "card <NUM> pin 1234"
    assert out[3]["n_long_digit_runs"] == 1
    assert out[4]["redacted"] == "clean text, nothing to hide"
    assert out[4]["n_emails"] == out[4]["n_urls"] == 0


def test_vocab_counts_and_rank_order(spark):
    from flink_skyline_qos_spark.functions.text import vocab

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a  b\tb"), (3, ""), (4, "c")],
        "doc_id long, text string",
    )
    got = {r["token"]: (r["term_freq"], r["doc_freq"], r["rank"])
           for r in vocab(df, top_v=10).collect()}
    # a: tf 3 (docs 1,2), b: tf 3 (docs 1,2), c: tf 2 (docs 1,4)
    assert got["a"] == (3, 2, 1)   # tie with b -> token order breaks it
    assert got["b"] == (3, 2, 2)
    assert got["c"] == (2, 2, 3)
    assert len(got) == 3           # empty text contributes nothing
    top1 = vocab(df, top_v=1).collect()
    assert [(r["token"], r["rank"]) for r in top1] == [("a", 1)]


def test_vocab_plan_two_exchanges_all_jvm(spark):
    import io
    import re
    from contextlib import redirect_stdout

    from flink_skyline_qos_spark.functions.text import vocab

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        vocab(df, top_v=5).explain("formatted")
    plan = buf.getvalue()
    # explode -> (token, doc) agg -> token agg: two hash exchanges plus
    # the single-partition window for the global top-V rank
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 3, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan
