from __future__ import annotations

import hashlib

import pytest

from ais_etl_spark.operators import textstats as T

DOCS = [
    (0, "The cat and the dog went to the river, and that is it."),
    (1, "Der Hund ist nicht mit der Katze und das ist gut."),
    (2, "le chat est avec les enfants pour la fête"),
    (3, "x"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lang_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in T.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "unknown"


def test_quality_stats(docs):
    got = {r["doc_id"]: r for r in T.quality_stats(docs).collect()}
    r0 = got[0]
    assert r0["n_words"] == 13
    assert r0["n_chars_text"] == len(DOCS[0][1])
    # punct: 2 commas + 2 periods = 3 (., , .) → count exactly
    assert r0["punct_ratio"] == round(
        sum(DOCS[0][1].count(c) for c in ".,;:!?") / len(DOCS[0][1]), 6
    )
    assert got[3]["keep"] is False


def test_token_counts(docs):
    got = {r["doc_id"]: r for r in T.token_counts(docs).collect()}
    assert got[0]["n_ws_tokens"] == len(DOCS[0][1].split())
    assert got[3]["n_word_tokens"] == 1
    # BPE-ish: 13 letter runs + 2 punctuation symbols (',' and '.')
    assert got[0]["n_bpe_tokens"] == 13 + 2


def test_fingerprint_md5(docs):
    got = {r["doc_id"]: r["fingerprint"] for r in T.fingerprint_md5(docs).collect()}
    want = hashlib.md5(" ".join(DOCS[0][1].lower().split()).encode()).hexdigest()
    assert got[0] == want


def test_winnow_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghij klmnop qrstuv"), (1, "abcdefghij klmnop qrstuv"), (2, "zz")],
        "doc_id long, text string",
    )
    udf = T.winnow_fingerprint_udf(k=5, window=4)
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", udf("text").alias("fp")).collect()}
    assert got[0] == got[1]          # identical text → identical fingerprint set
    assert got[2] == []              # shorter than k
    assert all(len(x) == 8 for x in got[0])


def test_scrub_pii(spark):
    from ais_etl_spark.operators.textstats import scrub_pii

    df = spark.createDataFrame(
        [
            (0, "contact alice@corp.io or visit https://a.io/x?q=1 now"),
            (1, "call +1 (555) 867-5309 today"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.scrubbed, r.had_pii) for r in scrub_pii(df).collect()}
    assert got[0] == ("contact <EMAIL> or visit <URL> now", True)
    assert got[1] == ("call <PHONE> today", True)
    assert got[2] == ("nothing sensitive here", False)


def test_doc_frequency(spark):
    from ais_etl_spark.operators.textstats import doc_frequency

    df = spark.createDataFrame(
        [
            (0, "spark spark shuffle plan"),
            (1, "spark plan"),
            (2, "unrelated words"),
        ],
        "doc_id long, text string",
    )
    got = {r.token: r.df for r in doc_frequency(df, min_df=2).collect()}
    # within-doc repeats count once (distinct per doc); min_df prunes singletons
    assert got == {"spark": 2, "plan": 2}
