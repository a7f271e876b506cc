"""Columnar → record-format conversion (the parquet-parser analog).

Reference semantics being re-expressed
(/root/reference/transformers/parquet-parser/src/parser.go):

- JSONL leg (parser.go:147-167): one JSON object per row, rows in
  table order, chunks concatenated in index order.
- CSV leg (parser.go:170-192 + 216-224): header line of column names,
  then escaped rows (no header per chunk — added once at merge).
- TXT leg (parser.go:195-212 + 226-241): tab-joined header, a dashes
  separator line, then tab-joined rows.
- Ordered chunk merge (parser.go:84-130, 214-256): chunks are
  processed in parallel but concatenated strictly in chunk-index
  order — parallelism never reorders output rows.

Spark-first shape: the per-row formatting is pure built-ins
(``to_json`` / ``concat_ws`` + regex escaping — whole-stage codegen,
zero Python); only the per-object document assembly (fan-in with an
explicit row order, the mergeChunks analog) uses ``applyInPandas``,
because "concatenate this group's rows in this order into one value"
is not a one-pass column expression. At 100 TB each output object is
one group — groups are independent, the shuffle routes rows to their
object's task, and a single giant object is the same bound the
reference has (it builds one buffer per object too).

CSV escaping is RFC 4180 (quote iff the field contains a comma,
quote, CR or LF; embedded quotes doubled) — expressed identically in
the SQL oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FORMATS = ("jsonl", "csv", "txt")


def _s(col) -> "F.Column":
    return F.col(col).cast("string")


def csv_field(col) -> "F.Column":
    """RFC 4180 field escaping, built-ins only."""
    s = col.cast("string")
    needs = s.rlike('[",\n\r]')
    return F.when(
        needs, F.concat(F.lit('"'), F.regexp_replace(s, '"', '""'), F.lit('"'))
    ).otherwise(s)


def record_col(df: DataFrame, fmt: str, cols: list[str] | None = None) -> "F.Column":
    """One formatted record per row, as a column expression."""
    cols = cols or df.columns
    if fmt == "jsonl":
        return F.to_json(F.struct(*[F.col(c) for c in cols]))
    if fmt == "csv":
        return F.concat_ws(",", *[csv_field(F.col(c)) for c in cols])
    if fmt == "txt":
        return F.concat_ws("\t", *[_s(c) for c in cols])
    raise ValueError(f"unsupported format: {fmt} (one of {FORMATS})")


def format_records(
    df: DataFrame, fmt: str, cols: list[str] | None = None, dst: str = "record"
) -> DataFrame:
    """Append a ``dst`` column holding each row as a jsonl/csv/txt
    record (parser.go's per-chunk encoders, minus the merge)."""
    return df.withColumn(dst, record_col(df, fmt, cols))


def document_header(fmt: str, cols: list[str]) -> str:
    """The once-per-document header mergeChunks prepends."""
    if fmt == "jsonl":
        return ""
    if fmt == "csv":
        return ",".join(cols) + "\n"
    if fmt == "txt":
        head = "\t".join(cols)
        dashes = "\t".join("-" * len(c) for c in cols)
        return head + "\n" + dashes + "\n"
    raise ValueError(f"unsupported format: {fmt}")


def assemble_documents(
    df: DataFrame,
    fmt: str,
    group_col: str,
    order_col: str,
    cols: list[str] | None = None,
) -> DataFrame:
    """Fan-in: one formatted document per ``group_col`` value, rows
    concatenated strictly in ``order_col`` order (the ordered chunk
    merge, parser.go:214-256). Output: (object_id, doc, n_rows)."""
    cols = cols or [c for c in df.columns if c not in (group_col, order_col)]
    header = document_header(fmt, cols)
    recs = df.select(
        F.col(group_col).cast("string").alias("object_id"),
        F.col(order_col).alias("_ord"),
        record_col(df, fmt, cols).alias("_rec"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord", kind="mergesort")
        body = "\n".join(pdf["_rec"]) + "\n" if len(pdf) else ""
        return pd.DataFrame(
            {
                "object_id": [pdf["object_id"].iloc[0]],
                "doc": [header + body],
                "n_rows": [len(pdf)],
            }
        )

    return recs.groupBy("object_id").applyInPandas(
        build, schema="object_id string, doc string, n_rows int"
    )
