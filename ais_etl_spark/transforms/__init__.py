"""Vectorized transformer registry + spec-compiled pipelines.

The Spark re-expression of ais-etl's user-defined transformer contract:
``transform(data: bytes, path: str, etl_args: str) -> bytes``
(/root/reference/runtime/README.md:52-56), shipped by cloudpickle
(/root/reference/runtime/python/bootstrap.py:79-89). Here a transformer
is a named column-level operation — a built-in pyspark function where
one exists (JVM-side, codegen'd), a pandas UDF (Arrow-batched, zero
per-row Python) where it can't — and pipelines are compiled from a
JSON/dict spec the way tar2tf compiles its conversion/selection spec
(/root/reference/transformers/tar2tf/src/transforms/pipeline.go:32-48).
"""

from ais_etl_spark.transforms.registry import (  # noqa: F401
    TRANSFORMS,
    register,
    get_transform,
)
from ais_etl_spark.transforms.spec import compile_pipeline  # noqa: F401
from ais_etl_spark.transforms import builtin  # noqa: F401  (registers builtins)
