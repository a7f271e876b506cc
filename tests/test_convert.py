"""parquet-parser re-expression: record encoders + ordered merge.
Oracle = local Python recompute (the reference's own test strategy)."""

from __future__ import annotations

import csv
import io
import json


def _csv_row(vals):
    buf = io.StringIO()
    # default \r\n lineterminator so QUOTE_MINIMAL quotes CR/LF fields
    csv.writer(buf).writerow(vals)
    return buf.getvalue()[:-2]

from ais_etl_spark.transforms.convert import (
    assemble_documents,
    document_header,
    format_records,
)

ROWS = [
    (3, 'plain value', 10),
    (1, 'has,comma', 20),
    (2, 'has "quote"', 30),
    (0, 'multi\nline', 40),
    (4, 'both,"and"\nmore', 50),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, text string, n int")


def test_csv_rows_match_python_csv(spark):
    got = {r["id"]: r["record"] for r in format_records(_df(spark), "csv").collect()}
    for rid, text, n in ROWS:
        assert got[rid] == _csv_row([rid, text, n]), rid


def test_jsonl_rows_parse_back(spark):
    got = {r["id"]: r["record"] for r in format_records(_df(spark), "jsonl").collect()}
    for rid, text, n in ROWS:
        assert json.loads(got[rid]) == {"id": rid, "text": text, "n": n}


def test_txt_rows(spark):
    got = {r["id"]: r["record"] for r in format_records(_df(spark), "txt").collect()}
    assert got[3] == "3\tplain value\t10"


def test_assemble_documents_ordered_merge(spark):
    base = _df(spark)
    df = base.withColumn("grp", (base.id % 2).cast("string"))
    out = {r["object_id"]: r for r in
           assemble_documents(df, "csv", "grp", "id", cols=["id", "text", "n"]).collect()}
    # rows concatenated strictly in id order, header once, trailing \n
    for grp, ids in (("0", [0, 2, 4]), ("1", [1, 3])):
        body_rows = []
        for rid in ids:
            text, n = next((t, x) for i, t, x in ROWS if i == rid)
            body_rows.append(_csv_row([rid, text, n]))
        want = "id,text,n\n" + "\n".join(body_rows) + "\n"
        assert out[grp]["doc"] == want, grp
        assert out[grp]["n_rows"] == len(ids)


def test_txt_document_header_has_dashes():
    assert document_header("txt", ["ab", "c"]) == "ab\tc\n--\t-\n"
    assert document_header("jsonl", ["x"]) == ""
