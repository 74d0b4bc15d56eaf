"""The `me` symbolic frame variable (reference idataframe.py:633-677,
expression.py:17-105).

In the reference, ``me['B'] > 2`` builds a Var/GetAttr/Call tree that
``where``/``select`` evaluate against the concrete frame. Here the same
role is played by an *unbound* :class:`~torcharrow_spark.columns.Column`
whose resolver looks the name up in whatever frame it's evaluated against
— Catalyst is the expression IR, so no separate AST is needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import dtypes as dt
from .columns import Column


class _Me:
    def __getitem__(self, name: str) -> Column:
        def resolve(df):
            if df is None:
                # unresolved: usable only where Spark can infer (rare)
                return F.col(name), dt.float64.with_null(True)
            schema = {f.name: f for f in df._sdf.schema.fields}
            if name not in schema:
                raise KeyError(name)
            f = schema[name]
            return F.col(name), dt.from_spark(f.dataType, f.nullable)

        return Column(resolve, owner=None, name=name)

    def __getattr__(self, name: str) -> Column:
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]


me = _Me()
