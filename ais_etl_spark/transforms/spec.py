"""Spec-compiled transform pipelines (the tar2tf plan compiler analog).

tar2tf compiles ``{"conversions": [...], "selections": [...]}`` into an
ordered op pipeline applied per record
(/root/reference/transformers/tar2tf/src/main.go:32-47,
transforms/pipeline.go:32-48: Decode/Rotate/Resize/Rename/Select).
Our spec is a list of steps compiled into a DataFrame chain — i.e. a
*logical plan* Catalyst then optimizes (column pruning means a trailing
``select`` prunes every upstream UDF input it can).

Step forms::

    {"op": "<registered transform>", ...params}       # registry call
    {"op": "select", "cols": ["a", "b"]}              # tar2tf Select
    {"op": "rename", "from": "a", "to": "b"}          # tar2tf Rename
    {"op": "filter", "expr": "lang = 'en'"}           # SQL predicate
    {"op": "with_column", "name": "x", "expr": "..."} # SQL expression
    {"op": "drop", "cols": ["a"]}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ais_etl_spark.transforms.registry import apply_transform

_STRUCTURAL = {"select", "rename", "filter", "with_column", "drop"}


def compile_pipeline(df: DataFrame, spec: list[dict]) -> DataFrame:
    """Apply an ordered spec to ``df`` (conversions applied in spec
    order, as tar2tf does)."""
    for raw in spec:
        step = dict(raw)
        op = step.pop("op")
        if op == "select":
            df = df.select(*step["cols"])
        elif op == "rename":
            df = df.withColumnRenamed(step["from"], step["to"])
        elif op == "filter":
            df = df.filter(step["expr"])
        elif op == "with_column":
            df = df.withColumn(step["name"], F.expr(step["expr"]))
        elif op == "drop":
            df = df.drop(*step["cols"])
        else:
            df = apply_transform(df, op, **step)
    return df
