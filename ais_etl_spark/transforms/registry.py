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


def get_transform(name: str) -> Transform:
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
