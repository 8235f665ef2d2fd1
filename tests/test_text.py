"""Text analysis functions: exact expectations on crafted inputs."""

import pytest
from pyspark.sql import functions as F

from flink_skyline_qos_spark.functions.text import (
    lang_scores,
    punct_ratio,
    quality_score,
    stopword_count,
    text_stats,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog sat on a mat for a while, resting."),
        (1, "der hund und die katze das ist ein test mit wörtern für uns"),
        (2, "el perro y la casa de que un es por con"),
        (3, ""),
        (4, "    "),
        (5, "x"),
        (6, "!!! ??? ;;; ..."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def one(df, col):
    return {r.doc_id: r[col] for r in df.collect()}


def test_token_count(docs):
    got = one(docs.select("doc_id", token_count(F.col("text")).alias("n")), "n")
    assert got[0] == 13 and got[3] == 0 and got[4] == 0 and got[5] == 1
    assert got[6] == 4


def test_punct_ratio(docs):
    got = one(docs.select("doc_id",
                          punct_ratio(F.col("text")).alias("p")), "p")
    assert got[3] == 0.0
    assert got[5] == 0.0
    assert got[6] == pytest.approx(12 / 15)


def test_stopword_count_en(docs):
    got = one(docs.select("doc_id",
                          stopword_count(F.col("text"), "en").alias("s")), "s")
    # the, and, the, a, for, a  (on/sat/... not in the mini list)
    assert got[0] == 6
    assert got[1] == 0


def test_lang_pred(docs):
    got = one(docs.select("doc_id", lang_scores(F.col("text")).alias("l")), "l")
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "es"
    assert got[3] == "und"
    assert got[6] == "und"


def test_quality_score_bounds(docs):
    got = one(docs.select("doc_id",
                          quality_score(F.col("text")).alias("q")), "q")
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[0] > got[6]  # clean English prose beats punctuation soup


def test_text_stats_schema(docs):
    out = text_stats(docs)
    assert out.columns == [
        "doc_id", "n_chars_computed", "n_tokens", "n_bpe_tokens",
        "punct_ratio", "en_stopwords", "quality", "lang_pred",
        "fingerprint", "rolling_fp",
    ]
    fp = one(out, "fingerprint")
    assert fp[0] != fp[1] and len(fp[0]) == 32


def test_langid_confusion_crafted(spark):
    from flink_skyline_qos_spark.functions.text import langid_confusion

    docs = spark.createDataFrame(
        [
            (1, "en", "the cat sat and the dog ran for it"),
            (2, "en", "la casa es de el que y en un es por"),  # mislabeled
            (3, "zh", "xyzzy plugh"),                          # no signal
        ],
        "doc_id long, lang string, text string",
    )
    got = {(r.actual, r.predicted): r.n_docs
           for r in langid_confusion(docs).collect()}
    assert got[("en", "en")] == 1
    assert got[("en", "es")] == 1
    assert got[("zh", "und")] == 1


def test_langid_confusion_duckdb_parity(documents, sf_dir):
    import duckdb

    from flink_skyline_qos_spark.functions.text import (
        langid_confusion,
        langid_confusion_sql,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    sp = sorted((r.actual, r.predicted, r.n_docs)
                for r in langid_confusion(documents).collect())
    dk = sorted(map(tuple,
                    con.sql(langid_confusion_sql("documents")).fetchall()))
    assert sp == dk
    # the matrix is a real confusion matrix: some mass off-diagonal
    assert any(a != p for a, p, _ in sp)
    assert sum(n for *_, n in sp) == documents.count()
