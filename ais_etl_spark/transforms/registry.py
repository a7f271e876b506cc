"""Named-transform registry (the ``init_class`` analog).

In ais-etl a user ships an ``ETLServer`` subclass via cloudpickle
(/root/reference/runtime/python/bootstrap.py:30-33,79-89); the pod
bootstraps it and serves ``transform()``. Here a user registers a named
function that takes/returns Spark Columns (or a DataFrame-level
callable); Spark itself cloudpickles any enclosed pandas UDF to the
executors — which is why the north rule's run mode is plain
``spark-submit --py-files``: the shipping machinery already exists.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Transform:
    name: str
    fn: Callable  # (df, **params) -> df
    doc: str = ""
    params: dict = field(default_factory=dict)


TRANSFORMS: dict[str, Transform] = {}


def register(name: str, doc: str = "", **default_params):
    """Decorator: register ``fn(df, **params) -> df`` under ``name``."""

    def deco(fn):
        TRANSFORMS[name] = Transform(name=name, fn=fn, doc=doc, params=default_params)
        return fn

    return deco


# built-in transform modules register on import; lazy-load them on a
# lookup miss so a user (or a spec pipeline) can name any built-in
# without having imported its module first — the bootstrap analog of
# the reference pre-loading its transformer set
_BUILTIN_MODULES = (
    "ais_etl_spark.transforms.builtin",
    "ais_etl_spark.transforms.audio",
    "ais_etl_spark.transforms.raster",
)


def _load_builtin_modules() -> None:
    import importlib

    for m in _BUILTIN_MODULES:
        importlib.import_module(m)


def get_transform(name: str) -> Transform:
    if name not in TRANSFORMS:
        _load_builtin_modules()
    try:
        return TRANSFORMS[name]
    except KeyError:
        raise KeyError(
            f"unknown transform {name!r}; registered: {sorted(TRANSFORMS)}"
        ) from None


def apply_transform(df, name: str, **params):
    t = get_transform(name)
    merged = {**t.params, **params}
    return t.fn(df, **merged)
