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
