"""DataFrame facade: a lazy, typed wrapper over pyspark.sql.DataFrame.

Reference surface: /root/reference/torcharrow/idataframe.py:44-677 and
velox_rt/dataframe_cpu.py. The reference is eager and single-node; this
facade keeps everything as an unexecuted Catalyst plan so the same API
distributes across a cluster. Actions happen only in ``to_*`` /
``collect``-style methods, mirroring §4.1's design rule ("keep our API
lazy ... never .collect() between ops").

Positional-order note (SURVEY §7.4): distributed data has no inherent row
order, so order-dependent ops (cumulatives, keep='first' dedup, head/tail)
take an explicit ``order_by``; when omitted they fall back to an
ingestion-time ``__index__`` column if present.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import dtypes as dt
from .columns import Column, if_else  # noqa: F401  (re-exported)

INDEX_COL = "__index__"


def _active_session() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        from .session import get_session

        s = get_session()
    return s


class DataFrame:
    """Typed lazy frame. ``_sdf`` is the underlying Spark DataFrame."""

    def __init__(self, sdf: SDF):
        self._sdf = sdf

    # -- interop ------------------------------------------------------------

    def to_spark(self) -> SDF:
        return self._sdf.drop(INDEX_COL) if INDEX_COL in self._sdf.columns else self._sdf

    def to_pandas(self):
        return self.to_spark().toPandas()

    def to_arrow(self):
        return self.to_spark().toArrow()

    def to_pylist(self) -> list:
        return [row.asDict(recursive=True) for row in self.to_spark().collect()]

    def profile(self, cols: _ty.Optional[_ty.List[str]] = None) -> "DataFrame":
        """One-pass per-column dataset profile (row/null/distinct counts,
        numeric min/max/exact mean) — see operators.stats.profile_frame
        for the melt-to-long scale design."""
        from torcharrow_spark.operators import profile_frame

        return DataFrame(profile_frame(self.to_spark(), cols))

    @property
    def dtype(self) -> dt.Struct:
        return dt.from_spark(self.to_spark().schema, nullable=False)

    @property
    def columns(self) -> _ty.List[str]:
        return [c for c in self._sdf.columns if c != INDEX_COL]

    def __len__(self) -> int:
        return self._sdf.count()

    def _eval_scalar(self, col: Column):
        e, d = col._resolve(self)
        row = self._sdf.agg(e.alias("v")).collect()[0]
        return row["v"]

    def _repr_column(self, col: Column) -> str:
        e, _ = col._resolve(self)
        rows = self._sdf.select(e.alias("v")).limit(11).collect()
        vals = [r["v"] for r in rows[:10]]
        suffix = ", ..." if len(rows) > 10 else ""
        return f"Column([{', '.join(map(repr, vals))}{suffix}])"

    def __repr__(self) -> str:
        pdf = self._sdf.limit(10).toPandas()
        return repr(pdf)

    # -- column access / surgery (reference §2.2) ---------------------------

    def __getitem__(self, key):
        if isinstance(key, str):
            schema = {f.name: f for f in self._sdf.schema.fields}
            if key not in schema:
                raise KeyError(key)
            f = schema[key]
            d = dt.from_spark(f.dataType, f.nullable)
            return Column(lambda df: (F.col(key), d), owner=self, name=key)
        if isinstance(key, bool):
            raise TypeError(f"unsupported key {key!r}")
        if isinstance(key, int):
            # df[i] -> tuple of the i-th row (reference icolumn.py:317-318)
            n = self._positional_order()
            i = key if key >= 0 else self.count() + key
            row = self.gather([i], order_by=n).to_pylist()
            if not row:
                raise IndexError(key)
            return tuple(row[0][c] for c in self.columns)
        if isinstance(key, slice) and (
            isinstance(key.start, str) or isinstance(key.stop, str)
        ):
            # column-RANGE slice df['a':'c'] — stop exclusive (reference
            # dataframe_cpu.py:426-439)
            cols = self.columns
            lo = 0 if key.start is None else cols.index(key.start)
            hi = len(cols) if key.stop is None else cols.index(key.stop)
            return DataFrame(self._sdf.select(*cols[lo:hi]))
        if isinstance(key, slice):
            n = self._positional_order()
            start, stop, step = key.start, key.stop, key.step
            if step is not None and step < 1:
                raise ValueError("positional slice requires step >= 1")
            if (start is not None and start < 0) or (stop is None or stop < 0):
                start, stop, step = slice(start, stop, step).indices(self.count())
            return self.slice_rows(start or 0, stop, order_by=n, step=step or 1)
        if isinstance(key, list):
            if not key:
                return DataFrame(self._sdf.select().limit(0))
            if all(isinstance(k, bool) for k in key):
                # literal boolean mask (reference icolumn.py:337-338);
                # length must match the frame exactly — a short mask
                # would silently drop trailing rows
                n = self._positional_order()
                total = self.count()
                if len(key) != total:
                    raise ValueError(
                        f"boolean mask length {len(key)} != frame length {total}"
                    )
                idx = [i for i, b in enumerate(key) if b]
                return self.gather(idx, order_by=n)
            if all(isinstance(k, int) and not isinstance(k, bool) for k in key):
                n = self._positional_order()
                idx = list(key)
                if any(i < 0 for i in idx):
                    total = self.count()
                    idx = [i if i >= 0 else total + i for i in idx]
                return self.gather(idx, order_by=n)
            if all(isinstance(k, str) for k in key):
                return DataFrame(self._sdf.select(*key))
            raise TypeError("index should be list of bool, int, or str")
        if isinstance(key, Column):
            return self.where(key)
        raise TypeError(f"unsupported key {key!r}")

    def _positional_order(self) -> _ty.List[str]:
        """Order backing positional indexing: the hidden construction
        index if the frame still carries one (row_number over it
        renumbers correctly after filters); otherwise the caller must use
        slice_rows/gather with an explicit order_by."""
        if INDEX_COL in self._sdf.columns:
            return [INDEX_COL]
        raise TypeError(
            "positional indexing needs the construction-order index "
            "(frames built via ta.dataframe/from_pylist); for derived "
            "frames use slice_rows/gather with an explicit order_by"
        )

    def __setitem__(self, name: str, value):
        if isinstance(value, Column):
            e, _ = value._resolve(self)
            self._sdf = self._sdf.withColumn(name, e)
        else:
            self._sdf = self._sdf.withColumn(name, F.lit(value))

    def with_column(self, name: str, value) -> "DataFrame":
        e = value._resolve(self)[0] if isinstance(value, Column) else F.lit(value)
        return DataFrame(self._sdf.withColumn(name, e))

    def drop(self, columns: _ty.List[str]) -> "DataFrame":
        return DataFrame(self._sdf.drop(*columns))

    def keep(self, columns: _ty.List[str]) -> "DataFrame":
        return DataFrame(self._sdf.select(*columns))

    def rename(self, mapper: _ty.Dict[str, str]) -> "DataFrame":
        return DataFrame(self._sdf.withColumnsRenamed(mapper))

    def reorder(self, columns: _ty.List[str]) -> "DataFrame":
        return DataFrame(self._sdf.select(*columns))

    def head(self, n: int = 5) -> "DataFrame":
        return DataFrame(self._sdf.limit(n))

    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)

    # -- select / where with `me` expressions (reference
    #    dataframe_cpu.py:2016-2082) ---------------------------------------

    def _as_expr(self, item):
        if isinstance(item, Column):
            return item._resolve(self)[0]
        return item

    def select(self, *args, **kwargs) -> "DataFrame":
        """SQL-style SELECT: positional args are column names, `'*'`, or
        `'-name'` exclusions; kwargs are computed columns (me-exprs or
        Columns)."""
        cols: _ty.List = []
        exclude = [a[1:] for a in args if isinstance(a, str) and a.startswith("-")]
        for a in args:
            if isinstance(a, str):
                if a == "*":
                    cols.extend(c for c in self.columns if c not in exclude)
                elif not a.startswith("-"):
                    cols.append(a)
            elif isinstance(a, Column):
                cols.append(a._resolve(self)[0])
        for name, v in kwargs.items():
            e = v._resolve(self)[0] if isinstance(v, Column) else F.lit(v)
            cols.append(e.alias(name))
        return DataFrame(self._sdf.select(*cols))

    def where(self, *conditions) -> "DataFrame":
        sdf = self._sdf
        for c in conditions:
            e = c._resolve(self)[0] if isinstance(c, Column) else c
            sdf = sdf.filter(e)
        return DataFrame(sdf)

    # -- sorting (reference dataframe_cpu.py:591-620) -----------------------

    def sort(
        self,
        by: _ty.Union[str, _ty.List[str], None] = None,
        ascending: bool = True,
        na_position: str = "last",
    ) -> "DataFrame":
        by = [by] if isinstance(by, str) else (by or self.columns)
        exprs = []
        for c in by:
            col = F.col(c)
            if ascending:
                exprs.append(col.asc_nulls_last() if na_position == "last" else col.asc_nulls_first())
            else:
                exprs.append(col.desc_nulls_last() if na_position == "last" else col.desc_nulls_first())
        return DataFrame(self._sdf.orderBy(*exprs))

    def top_k(self, by: str, k: int, ascending: bool = False) -> "DataFrame":
        """Relational top-k: total-order limit — Spark plans this as
        TakeOrderedAndProject (no full sort, no single-node bottleneck)."""
        col = F.col(by).asc() if ascending else F.col(by).desc()
        return DataFrame(self._sdf.orderBy(col).limit(k))

    # -- null handling / dedup (reference §2.11) ----------------------------

    @staticmethod
    def _fill_matches(dtype, value) -> bool:
        """fillna's type-matching contract: numbers fill numeric columns,
        strings fill strings, bools fill bools."""
        import pyspark.sql.types as T

        if isinstance(value, bool):
            return isinstance(dtype, T.BooleanType)
        if isinstance(value, (int, float)):
            return isinstance(dtype, T.NumericType)
        if isinstance(value, str):
            return isinstance(dtype, T.StringType)
        return False

    @classmethod
    def _fill_struct_expr(cls, col_expr, struct_type, value):
        """Rebuild a struct with nulls filled recursively (reference
        fills per-child: dataframe_cpu.py:1535-1557). A NULL struct ROW
        stays null — row-level and field-level nullness are distinct
        (reference dataframe_cpu.py:240-254)."""
        import pyspark.sql.types as T

        parts = []
        for f in struct_type.fields:
            child = col_expr[f.name]
            if isinstance(f.dataType, T.StructType):
                e = cls._fill_struct_expr(child, f.dataType, value)
            elif cls._fill_matches(f.dataType, value):
                e = F.coalesce(child, F.lit(value).cast(f.dataType))
            else:
                e = child
            parts.append(e.alias(f.name))
        return F.when(col_expr.isNotNull(), F.struct(*parts)).otherwise(
            F.lit(None).cast(struct_type)
        )

    def fill_null(self, value) -> "DataFrame":
        """fillna that also descends into struct columns (Spark's fillna
        does not — SURVEY §7.4 risk 1)."""
        import pyspark.sql.types as T

        if isinstance(value, dict):
            return DataFrame(self._sdf.fillna(value))
        sdf = self._sdf.fillna(value)
        for f in sdf.schema.fields:
            if isinstance(f.dataType, T.StructType):
                sdf = sdf.withColumn(
                    f.name, self._fill_struct_expr(F.col(f.name), f.dataType, value)
                )
        return DataFrame(sdf)

    def drop_null(self, how: str = "any") -> "DataFrame":
        # subset excludes the hidden never-null index: it must not make
        # an all-null data row survive how='all'
        return DataFrame(self._sdf.dropna(how=how, subset=self.columns))

    def validate_fixed_size(self, column: str, size: int) -> "DataFrame":
        """CHECK-style enforcement of dt.List(fixed_size=n): Spark has no
        type-level fixed-size arrays (SURVEY §1.2), so — like the
        reference, which validates only on append
        (list_column_cpu.py:98-101) — we validate at a chosen pipeline
        point with a raise_error expression. Zero cost when data is
        valid; fails the job with a clear message otherwise."""
        c = F.col(column)
        checked = F.when(
            c.isNotNull() & (F.size(c) != F.lit(size)),
            F.raise_error(
                F.concat(
                    F.lit(f"fixed_size violation in '{column}': expected {size}, got "),
                    F.size(c).cast("string"),
                )
            ).cast(self._sdf.schema[column].dataType),
        ).otherwise(c)
        return DataFrame(self._sdf.withColumn(column, checked))

    def drop_duplicates(
        self,
        subset: _ty.Optional[_ty.List[str]] = None,
        keep: str = "first",
        order_by: _ty.Optional[_ty.List[str]] = None,
    ) -> "DataFrame":
        """Dedup. With ``subset`` and ``keep='first'``, "first" needs a total
        order (reference relies on single-node insertion order:
        dataframe_cpu.py:1578-1606); distributed, pass ``order_by``. This
        lowers to one hash-shuffle on ``subset`` + min_by per group — no
        window sort over the full table. ``keep=False`` (declared but
        unimplemented in the reference, icolumn.py:1068-1079) drops every
        row whose key occurs more than once — one windowed count, no
        order needed."""
        if keep is False:
            cols = subset or self.columns
            w = Window.partitionBy(*cols)
            out = (
                self._sdf.withColumn("__n__", F.count(F.lit(1)).over(w))
                .filter(F.col("__n__") == 1)
                .drop("__n__")
            )
            return DataFrame(out)
        if subset is None:
            # dedup over the DATA columns — the hidden construction index
            # is unique per row and would make this a silent no-op
            return DataFrame(self._sdf.dropDuplicates(self.columns))
        if keep not in ("first", "last"):
            raise ValueError(keep)
        order_by = order_by or ([INDEX_COL] if INDEX_COL in self._sdf.columns else None)
        if order_by is None:
            return DataFrame(self._sdf.dropDuplicates(subset))
        w = Window.partitionBy(*subset).orderBy(
            *[F.col(c).asc() if keep == "first" else F.col(c).desc() for c in order_by]
        )
        out = (
            self._sdf.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        return DataFrame(out)

    # -- row-level functional ops (reference §2.3) --------------------------

    def map(
        self,
        arg,
        na_action: _ty.Optional[str] = None,
        dtype: _ty.Optional[dt.DType] = None,
        columns: _ty.Optional[_ty.List[str]] = None,
    ) -> Column:
        """Per-row UDF or dict lookup (reference icolumn.py:420-611).

        dict -> a Catalyst MapLookup (JVM-side, no Python);
        callable -> Arrow-vectorized pandas UDF (never row-at-a-time py4j).
        """
        columns = columns or self.columns[:1]
        if isinstance(arg, dict):
            items: _ty.List = []
            for k, v in arg.items():
                items.extend([F.lit(k), F.lit(v)])
            m = F.create_map(*items)
            vd = dt.infer_dtype_from_prefix(list(arg.values()))
            src = F.col(columns[0])
            expr = F.element_at(m, src)
            if hasattr(arg, "default_factory"):  # defaultdict
                expr = F.coalesce(expr, F.lit(arg.default_factory()))
            return Column(lambda df: (expr, vd.with_null(True)), owner=self)
        if not callable(arg):
            raise TypeError("map() needs a dict or callable")
        if dtype is None:
            # reference contract: infer from the callable's return
            # annotation, else require dtype= (dtypes.py:329-350,
            # icolumn.py:597-610)
            try:
                dtype = dt.infer_dtype_from_callable(arg)
            except TypeError:
                raise ValueError(
                    "map(callable) requires dtype= or a return annotation "
                    "(reference icolumn.py:597-610)"
                )
        spark_t = dt.to_spark(dtype)
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        ignore_null = na_action == "ignore"

        def _fn(*series):
            def _null(v):
                return v is None or (isinstance(v, float) and v != v)

            # tolist() once per batch, then a plain zip loop: ~2-5x faster
            # per batch than per-row .iloc indexing (same semantics)
            lists = [s.tolist() for s in series]
            out = []
            if len(lists) == 1:
                for v in lists[0]:
                    v = None if _null(v) else v
                    out.append(None if (ignore_null and v is None) else arg(v))
            else:
                for row in zip(*lists):
                    vals = tuple(None if _null(v) else v for v in row)
                    if ignore_null and any(v is None for v in vals):
                        out.append(None)
                        continue
                    out.append(arg(*vals))
            return pd.Series(out, dtype=object)

        _udf = pandas_udf(_fn, spark_t)
        expr = _udf(*[F.col(c) for c in columns])
        return Column(lambda df: (expr, dtype.with_null(True)), owner=self)

    def flatmap(self, fn, dtype: _ty.Optional[dt.DType] = None,
                columns: _ty.Optional[_ty.List[str]] = None) -> "DataFrame":
        """Row -> list of rows (reference icolumn.py:646-675): UDF returning
        an array + explode. `dtype` is the ELEMENT dtype; when omitted it
        is inferred from the callable's return annotation (a List hint's
        item type)."""
        if dtype is None:
            inferred = dt.infer_dtype_from_callable(fn)
            dtype = inferred.item_dtype if dt.is_list(inferred) else inferred
        col = self.map(fn, dtype=dt.List(dtype), columns=columns)
        e, _ = col._resolve(self)
        return DataFrame(self._sdf.select(F.explode(e).alias("value")))

    def filter(self, predicate, columns: _ty.Optional[_ty.List[str]] = None) -> "DataFrame":
        """Keep rows where predicate(row-values) is True (reference
        icolumn.py:677-727)."""
        if isinstance(predicate, Column):
            return self.where(predicate)
        col = self.map(predicate, dtype=dt.boolean, columns=columns)
        e, _ = col._resolve(self)
        return DataFrame(self._sdf.filter(e))

    def transform(self, fn, dtype: _ty.Optional[dt.DType] = None, format: str = "column",
                  columns: _ty.Optional[_ty.List[str]] = None) -> "DataFrame":
        """Batch UDF over whole column batches (reference icolumn.py:613-644,
        format contract idataframe.py:458-496) via mapInArrow — zero-copy
        Arrow batches. `format` controls what `fn` receives and returns
        per batch, mirroring the reference:
          'column' — an Arrow RecordBatch (the vectorized path; return a
                     RecordBatch/Table);
          'python' — a dict of column-name -> list (return the same shape);
          'torch'  — a dict of column-name -> torch tensor / numpy array
                     for numeric columns (Arrow -> tensor without copies
                     where dtypes allow; return the same shape)."""
        import pyarrow as pa

        columns = columns or self.columns
        src = self._sdf.select(*columns)
        out_schema = dt.to_spark(dtype) if dtype is not None else src.schema

        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            pa_schema = to_arrow_schema(out_schema)
        except Exception:  # pragma: no cover - pyspark-internal API
            pa_schema = None

        def _to_batch(res, like: pa.RecordBatch):
            if isinstance(res, pa.RecordBatch):
                return [res]
            if isinstance(res, pa.Table):
                return list(res.to_batches())
            if isinstance(res, dict):
                cols = {}
                for k, v in res.items():
                    if hasattr(v, "numpy"):  # torch tensor
                        v = v.numpy()
                    t = pa_schema.field(k).type if pa_schema is not None else None
                    cols[k] = pa.array(
                        list(v) if not hasattr(v, "dtype") else v, type=t
                    )
                return [pa.RecordBatch.from_pydict(cols)]
            raise TypeError("transform fn must return RecordBatch/Table/dict")

        def _iter(batches: _ty.Iterable[pa.RecordBatch]) -> _ty.Iterable[pa.RecordBatch]:
            for b in batches:
                if format == "column":
                    arg = b
                elif format == "python":
                    arg = {name: b.column(i).to_pylist() for i, name in enumerate(b.schema.names)}
                elif format == "torch":
                    arg = {}
                    for i, name in enumerate(b.schema.names):
                        arr = b.column(i).to_numpy(zero_copy_only=False)
                        try:  # torch optional in this container
                            import torch

                            arg[name] = torch.from_numpy(arr)
                        except Exception:
                            arg[name] = arr
                else:
                    raise ValueError(f"unknown format {format!r}")
                yield from _to_batch(fn(arg), b)

        return DataFrame(src.mapInArrow(_iter, out_schema))

    # -- aggregation (reference §2.6) ---------------------------------------

    _DF_AGGS = {
        "min": F.min,
        "max": F.max,
        "sum": F.sum,
        "mean": F.avg,
        "median": F.median,
        "mode": F.mode,
        "std": F.stddev_samp,
        "count": F.count,
        "any": lambda c: F.bool_or(c.cast("boolean")),
        "all": lambda c: F.bool_and(c.cast("boolean")),
        "nunique": F.count_distinct,
    }

    def _numeric_columns(self) -> _ty.List[str]:
        out = []
        for f in self.to_spark().schema.fields:
            if dt.is_numerical(dt.from_spark(f.dataType)):
                out.append(f.name)
        return out

    def _df_agg(self, op: str, numeric_only: bool = True) -> "DataFrame":
        cols = self._numeric_columns() if numeric_only else self.columns
        fn = self._DF_AGGS[op]
        return DataFrame(self._sdf.agg(*[fn(F.col(c)).alias(c) for c in cols]))

    def sum(self):
        return self._df_agg("sum")

    def mean(self):
        return self._df_agg("mean")

    def min(self):
        return self._df_agg("min")

    def max(self):
        return self._df_agg("max")

    def std(self):
        return self._df_agg("std")

    def median(self):
        return self._df_agg("median")

    def count(self) -> int:
        return self._sdf.count()

    def describe(
        self,
        percentiles=None,
        include: _ty.Optional[_ty.List] = None,
        exclude: _ty.Optional[_ty.List] = None,
    ) -> "DataFrame":
        """Per-column count/mean/std/min/percentiles/max (reference
        dataframe_cpu.py:1784-1838) — one aggregate job, unpivoted.

        `percentiles` are PERCENT values in [0, 100] (default [25, 50,
        75]) and are computed with midpoint interpolation, both matching
        the reference. `include`/`exclude` are lists of dtypes selecting
        columns by exact dtype (reference `f.dtype in include`); default
        selects the numeric columns. Non-numeric columns selected via
        `include` get count/min/max with null mean/std/percentiles (the
        stats column for them is string-typed); the reference crashes on
        those — a documented extension, not a behavior change."""
        if percentiles is None:
            percentiles = [25, 50, 75]
        percentiles = sorted(set(percentiles))
        if percentiles and (percentiles[0] < 0 or percentiles[-1] > 100):
            raise ValueError("percentiles must be between 0 and 100")
        if include is not None and not isinstance(include, list):
            raise TypeError(f"describe with include of type {type(include).__name__} is not supported")
        if exclude is not None and not isinstance(exclude, list):
            raise TypeError(f"describe with exclude of type {type(exclude).__name__} is not supported")
        fields = {f.name: f.dtype for f in self.dtype.fields}
        if include is None:
            includes = self._numeric_columns()
        else:
            includes = [n for n, d in fields.items() if d in include]
        excludes = [] if exclude is None else [n for n, d in fields.items() if d in exclude]
        cols = [c for c in includes if c not in excludes]
        stats_names = ["count", "mean", "std", "min", *[f"{p:g}%" for p in percentiles], "max"]
        if not cols:
            # empty selection: the reference still emits the metric rows
            return DataFrame(
                self._sdf.sparkSession.createDataFrame(
                    [(s,) for s in stats_names], "metric string"
                )
            )

        def _mid(col, p):
            # midpoint of the two bracketing order stats (reference uses
            # interpolation="midpoint" for describe percentiles)
            arr = F.array_sort(F.collect_list(col))
            n = F.size(arr)
            h = (n - 1).cast("double") * F.lit(p / 100.0)
            lo = F.element_at(arr, F.floor(h).cast("int") + 1).cast("double")
            hi = F.element_at(arr, F.ceil(h).cast("int") + 1).cast("double")
            return F.when(n > 0, (lo + hi) / 2)

        numeric = set(self._numeric_columns())
        aggs = []
        for c in cols:
            col = F.col(c)
            if c in numeric:
                aggs += [
                    F.count(col).cast("double").alias(f"{c}:count"),
                    F.avg(col).alias(f"{c}:mean"),
                    F.stddev_samp(col).alias(f"{c}:std"),
                    F.min(col).cast("double").alias(f"{c}:min"),
                    F.max(col).cast("double").alias(f"{c}:max"),
                    *[_mid(col, p).alias(f"{c}:{p:g}%") for p in percentiles],
                ]
            else:
                null = F.lit(None).cast("string")
                aggs += [
                    F.count(col).cast("string").alias(f"{c}:count"),
                    null.alias(f"{c}:mean"),
                    null.alias(f"{c}:std"),
                    F.min(col).cast("string").alias(f"{c}:min"),
                    F.max(col).cast("string").alias(f"{c}:max"),
                    *[null.alias(f"{c}:{p:g}%") for p in percentiles],
                ]
        row = self._sdf.agg(*aggs)
        stats = stats_names
        n = len(stats)
        typ = {c: ("double" if c in numeric else "string") for c in cols}
        exprs = ", ".join(
            "'" + s + "', " + ", ".join(f"cast(`{c}:{s}` as {typ[c]})" for c in cols)
            for s in stats
        )
        out = row.selectExpr(f"stack({n}, {exprs}) as (metric, {', '.join('`'+c+'`' for c in cols)})")
        return DataFrame(out)

    def pivot(
        self,
        index: _ty.Union[str, _ty.List[str]],
        columns: str,
        values: str,
        agg: str = "sum",
        col_values: _ty.Optional[_ty.List] = None,
    ) -> "DataFrame":
        """Wide pivot: one output column per distinct value of `columns`
        (beyond reference parity; free on Spark's hash aggregate). Pass
        `col_values` at scale — without it Spark runs an extra distinct
        job over `columns` to discover the output schema."""
        index = [index] if isinstance(index, str) else list(index)
        gd = self._sdf.groupBy(*index)
        p = gd.pivot(columns, col_values) if col_values is not None else gd.pivot(columns)
        fn = self._DF_AGGS[agg]
        return DataFrame(p.agg(fn(F.col(values))))

    def melt(
        self,
        ids: _ty.List[str],
        values: _ty.List[str],
        var_name: str = "variable",
        value_name: str = "value",
    ) -> "DataFrame":
        """Long unpivot (pandas melt; Spark-native unpivot — a
        generate/explode, no shuffle)."""
        return DataFrame(self._sdf.unpivot(ids, values, var_name, value_name))

    def _cumulative(self, fn, columns, order_by, partition_by=None) -> "DataFrame":
        order_by = order_by or ([INDEX_COL] if INDEX_COL in self._sdf.columns else None)
        if order_by is None:
            raise ValueError("cumulative ops require order_by (no inherent row order at scale)")
        w = Window.partitionBy(*(partition_by or [])).orderBy(*order_by).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        columns = columns or self._numeric_columns()
        sdf = self._sdf
        for c in columns:
            sdf = sdf.withColumn(c, fn(F.col(c)).over(w))
        return DataFrame(sdf)

    def cumsum(self, columns=None, order_by=None, partition_by=None) -> "DataFrame":
        """Cumulative sum (reference inumerical_column.py:229-312) — needs a
        total order; see module docstring. `partition_by` keeps the window
        distributed (a global cumulative is a single-partition sort)."""
        return self._cumulative(F.sum, columns, order_by, partition_by)

    def cummin(self, columns=None, order_by=None, partition_by=None) -> "DataFrame":
        return self._cumulative(F.min, columns, order_by, partition_by)

    def cummax(self, columns=None, order_by=None, partition_by=None) -> "DataFrame":
        return self._cumulative(F.max, columns, order_by, partition_by)

    def cumprod(self, columns=None, order_by=None, partition_by=None) -> "DataFrame":
        return self._cumulative(F.product, columns, order_by, partition_by)

    def copy(self) -> "DataFrame":
        """Shallow copy (reference dataframe_cpu.py:260) — plans are
        immutable, so this is free."""
        return DataFrame(self._sdf)

    def slice_rows(
        self,
        start: int,
        stop: int,
        order_by: _ty.List[str],
        step: int = 1,
    ) -> "DataFrame":
        """Positional row slice df[start:stop:step] under an explicit
        total order (reference icolumn.py:317-340; SURVEY §4.2: positional
        semantics need a global order — the row_number window is a
        single-partition sort, documented cost of positional APIs at
        scale; prefer key predicates in pipelines)."""
        w = Window.orderBy(*order_by)
        pos = F.row_number().over(w) - 1
        sdf = self._sdf.withColumn("__pos__", pos)
        cond = (F.col("__pos__") >= start) & (F.col("__pos__") < stop)
        if step != 1:
            cond = cond & ((F.col("__pos__") - start) % step == 0)
        return DataFrame(sdf.filter(cond).drop("__pos__"))

    def gather(self, indices: _ty.List[int], order_by: _ty.List[str]) -> "DataFrame":
        """Row gather df[[i, j, ...]] under an explicit total order
        (reference velox_rt/column.py:35-51 uses Arrow take)."""
        w = Window.orderBy(*order_by)
        pos = F.row_number().over(w) - 1
        sdf = self._sdf.withColumn("__pos__", pos)
        return DataFrame(sdf.filter(F.col("__pos__").isin(list(indices))).drop("__pos__"))

    def rolling(
        self,
        window: int,
        order_by: _ty.List[str],
        partition_by: _ty.Optional[_ty.List[str]] = None,
    ) -> "RollingWindow":
        """Trailing row-count window (the reference stubs `rolling` out:
        velox_rt/dataframe_cpu.py:2472-2482 — free on Spark windows).
        `partition_by` keeps the window distributed; a global rolling
        aggregate is a single-partition sort."""
        return RollingWindow(self, window, order_by, partition_by or [])

    def batch(self, n: int, order_by: _ty.Optional[_ty.List[str]] = None):
        """EXPERIMENTAL (reference icolumn.py:1171-1183): yield the frame
        in chunks of `n` rows under a total order (the hidden
        construction index by default). Each chunk is a lazy slice —
        evaluating all of them re-ranks per chunk, so this is a
        driver-paced convenience, not the bulk export path
        (interop_torch.batched_tensors streams Arrow instead)."""
        if n <= 0:
            raise ValueError("batch size must be positive")
        order = order_by or self._positional_order()
        total = self.count()
        for start in range(0, total, n):
            yield self.slice_rows(start, min(start + n, total), order_by=order)

    @staticmethod
    def unbatch(frames: _ty.Iterable["DataFrame"]) -> "DataFrame":
        """Concatenate batches back into one frame (reference
        icolumn.py:1184-1193)."""
        frames = list(frames)
        if not frames:
            raise ValueError("can't determine column type")
        out = frames[0]
        for f in frames[1:]:
            out = out.append(f)
        return out

    def tail(self, n: int = 5, order_by: _ty.Optional[_ty.List[str]] = None) -> "DataFrame":
        """Last n rows under an explicit order (reference icolumn.py:352-409;
        positional tail needs a total order at scale)."""
        if order_by is None:
            raise ValueError("tail requires order_by (no inherent row order at scale)")
        rev = self._sdf.orderBy(*[F.col(c).desc() for c in order_by]).limit(n)
        return DataFrame(rev.orderBy(*order_by))

    def is_unique(self, columns: _ty.Optional[_ty.List[str]] = None) -> bool:
        """True iff no two rows agree on `columns`, nulls compared as
        values like the reference's set-based check (icolumn.py:171-206):
        [1, null, null] is NOT unique. Null-safe distinct via groupBy —
        one shuffle on `columns`, no data collected."""
        columns = columns or self.columns
        row = (
            self._sdf.groupBy(*[F.col(c) for c in columns])
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("m"))
            .collect()[0]
        )
        return bool(row["m"] is None or row["m"] <= 1)

    def _is_monotonic(self, column: str, order_by: _ty.List[str], op) -> bool:
        w = Window.orderBy(*order_by)
        step = self._sdf.select(
            op(F.col(column), F.coalesce(F.lag(column).over(w), F.col(column))).alias("ok")
        )
        row = step.agg(F.bool_and(F.col("ok")).alias("m")).collect()[0]
        return bool(row["m"])

    def is_monotonic_increasing(self, column: str, order_by: _ty.List[str]) -> bool:
        """reference numerical_column_cpu.py:757-796; order must be given."""
        return self._is_monotonic(column, order_by, lambda a, b: a >= b)

    def is_monotonic_decreasing(self, column: str, order_by: _ty.List[str]) -> bool:
        return self._is_monotonic(column, order_by, lambda a, b: a <= b)

    # -- groupby ------------------------------------------------------------

    def groupby(self, by: _ty.Union[str, _ty.List[str]], drop_null: bool = True) -> "GroupedDataFrame":
        by = [by] if isinstance(by, str) else list(by)
        return GroupedDataFrame(self, by, drop_null=drop_null)

    # -- joins / set ops (beyond-parity, free in Spark — SURVEY §2.5) -------

    def join(self, other: "DataFrame", on, how: str = "inner", broadcast: bool = False) -> "DataFrame":
        right = other._sdf
        if broadcast:
            right = F.broadcast(right)
        return DataFrame(self.to_spark().join(right, on, how))

    def union(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self.to_spark().unionByName(other.to_spark()))

    def union_distinct(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self.to_spark().unionByName(other.to_spark()).distinct())

    def intersect(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self.to_spark().intersect(other.to_spark()))

    def except_(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self.to_spark().exceptAll(other.to_spark()))

    def to_tensor(self, conversion=None):
        """Driver-side tensor export (reference §2.12); see
        interop_torch.to_tensor."""
        from .interop_torch import to_tensor

        return to_tensor(self, conversion)

    def append(self, rows) -> "DataFrame":
        """Append literal rows (reference icolumn append) or another
        frame (plan-level unionByName — no data movement)."""
        if isinstance(rows, DataFrame):
            return DataFrame(self.to_spark().unionByName(rows.to_spark()))
        spark = self._sdf.sparkSession
        new = spark.createDataFrame(rows, self.to_spark().schema)
        return DataFrame(self.to_spark().unionByName(new))


class GroupedDataFrame:
    """Split-apply-combine handle (reference dataframe_cpu.py:2201-2435).

    Lowers to Spark's hash aggregate (partial map-side combine + one
    shuffle) instead of the reference's driver-side dict of row indices.
    Output naming follows the reference: ``f"{col}.{op}"``
    (dataframe_cpu.py:2257).
    """

    _AGG_FNS = DataFrame._DF_AGGS

    # result-dtype rules: reference dtypes.py:485-508
    _CAST_OUT = {
        "mean": "double",
        "median": "double",
        "std": "double",
        "count": "long",
        "nunique": "long",
    }

    def __init__(self, df: DataFrame, by: _ty.List[str], drop_null: bool = True):
        self._df = df
        self._by = by
        base = df.to_spark()
        if drop_null:
            base = base.dropna(subset=by)
        self._base = base
        self._gd = base.groupBy(*by)

    @property
    def size(self) -> DataFrame:
        return DataFrame(self._gd.agg(F.count(F.lit(1)).alias("size")))

    def __getitem__(self, col: str) -> "GroupedDataFrame":
        """Grouped single column (reference dataframe_cpu.py:2227-2245):
        a grouped frame restricted to the key + one value column."""
        return GroupedDataFrame(
            DataFrame(self._base.select(*self._by, col)), self._by, drop_null=False
        )

    #: group-iteration safety cap — raise instead of silently pulling a
    #: huge key set to the driver; raise via iter_groups(max_groups=...)
    MAX_ITER_GROUPS = 1000

    def __iter__(self):
        """Iterate (key_tuple, DataFrame) per group (reference
        dataframe_cpu.py:2304-2321). Driver-bound by the number of GROUPS
        (one collect for the key set, one lazy filtered frame per key) —
        fine for pandas-style exploration over few groups; use
        apply_in_pandas for distributed per-group logic. Guarded: more
        than MAX_ITER_GROUPS distinct keys raises instead of silently
        flooding the driver — call iter_groups(max_groups=...) to opt
        into a larger pull explicitly."""
        return self.iter_groups(max_groups=self.MAX_ITER_GROUPS)

    def iter_groups(self, max_groups: int | None = None):
        """Explicit form of ``__iter__`` with a caller-chosen cap;
        ``max_groups=None`` removes the guard entirely (you are asserting
        the key set fits in driver memory)."""
        key_q = self._base.select(*self._by).distinct().orderBy(*self._by)
        if max_groups is not None:
            keys = key_q.limit(max_groups + 1).collect()
            if len(keys) > max_groups:
                raise ValueError(
                    f"group iteration would collect > {max_groups} distinct "
                    "keys to the driver; use apply_in_pandas for distributed "
                    "per-group logic, or iter_groups(max_groups=N) / "
                    "iter_groups(max_groups=None) to opt in explicitly"
                )
        else:
            keys = key_q.collect()
        for row in keys:
            key = tuple(row[c] for c in self._by)
            cond = None
            for c, v in zip(self._by, key):
                p = F.col(c) == F.lit(v)
                cond = p if cond is None else (cond & p)
            yield (key if len(key) > 1 else key[0]), DataFrame(self._base.filter(cond))

    # ops that only make sense on numeric/boolean inputs; applying a
    # blanket gd.agg('sum') skips other columns (pandas-style) instead of
    # failing analysis on e.g. a timestamp column.
    _NUMERIC_ONLY = {"sum", "mean", "median", "std", "any", "all"}

    def _value_cols(self, op: str | None = None) -> _ty.List[str]:
        out = []
        for f in self._base.schema.fields:
            if f.name in self._by:
                continue
            if op in self._NUMERIC_ONLY and not dt.is_numerical(dt.from_spark(f.dataType)):
                continue
            out.append(f.name)
        return out

    def _normalize(self, spec) -> _ty.Dict[str, _ty.List[str]]:
        """str | [str] | {col: op|[ops]} -> {col: [ops]}
        (reference dataframe_cpu.py:2413-2435)."""
        if isinstance(spec, str):
            return {c: [spec] for c in self._value_cols(spec)}
        if isinstance(spec, list):
            out: _ty.Dict[str, _ty.List[str]] = {}
            for op in spec:
                for c in self._value_cols(op):
                    out.setdefault(c, []).append(op)
            return out
        if isinstance(spec, dict):
            return {c: ([ops] if isinstance(ops, str) else list(ops)) for c, ops in spec.items()}
        raise TypeError(f"bad agg spec {spec!r}")

    def agg(self, spec) -> DataFrame:
        plan = self._normalize(spec)
        aggs = []
        for c, ops in plan.items():
            for op in ops:
                expr = self._AGG_FNS[op](F.col(c))
                if op in self._CAST_OUT:
                    expr = expr.cast(self._CAST_OUT[op])
                elif op == "sum":
                    ftype = dict(zip(self._base.schema.names, self._base.schema.fields))[c].dataType
                    if dt.is_integer(dt.from_spark(ftype)):
                        expr = expr.cast("long")
                aggs.append(expr.alias(f"{c}.{op}"))
        return DataFrame(self._gd.agg(*aggs))

    def select(self, **kwargs) -> DataFrame:
        """Named aggregations with me-exprs: gd.select(total=me['x'].sum())
        (reference dataframe_cpu.py:2400-2411)."""
        aggs = []
        for name, col in kwargs.items():
            e, _ = col._resolve(self._df)
            aggs.append(e.alias(name))
        return DataFrame(self._gd.agg(*aggs))

    def __getattr__(self, op: str):
        if op in self._AGG_FNS:
            return lambda: self.agg(op)
        raise AttributeError(op)

    def apply_in_pandas(self, fn, schema) -> DataFrame:
        """Per-group pandas function (the distributed analog of the
        reference's `for (key, df) in gd` iteration,
        dataframe_cpu.py:2304-2321)."""
        return DataFrame(self._gd.applyInPandas(fn, schema=schema))


class RollingWindow:
    """Handle for DataFrame.rolling: trailing-`window`-rows aggregates."""

    _FNS = {
        "sum": F.sum,
        "mean": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        # sample std, consistent with Column.std
        "std": F.stddev_samp,
    }

    def __init__(self, df: DataFrame, window: int, order_by, partition_by):
        self._df = df
        self._w = (
            Window.partitionBy(*partition_by)
            .orderBy(*order_by)
            .rowsBetween(-(window - 1), Window.currentRow)
        )

    def agg(self, spec: _ty.Dict[str, _ty.List[str]]) -> DataFrame:
        """spec: {column: [ops]} -> adds `{col}.rolling_{op}` columns.
        Ops: sum/mean/min/max/count/std/median (median = exact trailing
        quantile 0.5; see `quantile`)."""
        sdf = self._df.to_spark()
        for col, ops in spec.items():
            for op in ops:
                if op == "median":
                    e = F.percentile(F.col(col), F.lit(0.5)).over(self._w)
                elif op == "std":
                    # decimal-exact window moments + ONE fixed double
                    # formula: Spark's stddev_samp window uses a
                    # streaming variance whose float order differs from
                    # other engines by an ulp — exact decimal sums make
                    # the result engine-bit-identical (same trick as
                    # scaled_frame / bigram scores).
                    # Domain guard: decimal(18,6) holds |v| < 1e12 and
                    # quantizes below 1e-6; outside that range the cast
                    # NULLs out (non-ANSI) and would silently drop the
                    # value from the sums — so (a) n is based on the
                    # CAST column (rows stay self-consistent) and (b)
                    # windows whose max |v| leaves the safe domain fall
                    # back to stddev_samp over the raw double.
                    dec = F.col(col).cast("decimal(18,6)")
                    n = F.count(dec).over(self._w).cast("double")
                    sm = F.sum(dec).over(self._w).cast("double")
                    q2 = F.sum(dec * dec).over(self._w).cast("double")
                    exact = F.when(
                        n > 1,
                        F.sqrt(
                            F.greatest(
                                (q2 - sm * sm / n) / (n - F.lit(1.0)),
                                F.lit(0.0),
                            )
                        ),
                    )
                    # 1e9 (not the full 1e12 cast limit) also keeps the
                    # window's sum-of-squares inside decimal(38,12)
                    in_domain = (
                        F.max(F.abs(F.col(col))).over(self._w) < F.lit(1e9)
                    )
                    e = F.when(in_domain, exact).otherwise(
                        F.stddev_samp(F.col(col)).over(self._w)
                    )
                else:
                    e = self._FNS[op](F.col(col)).over(self._w)
                sdf = sdf.withColumn(f"{col}.rolling_{op}", e)
        return DataFrame(sdf)

    def quantile(self, column: str, q: float) -> DataFrame:
        """Exact trailing-window quantile with linear interpolation
        (pandas `rolling(w).quantile(q)` semantics; matches DuckDB
        `quantile_cont` over the same frame) — adds
        ``{col}.rolling_q{q}``. The window aggregate buffers at most
        `window` values per row, so memory is bounded by the window
        size, never by the partition — the property that keeps grouped
        rolling quantiles viable on an unbounded event stream's batch
        twin."""
        if not 0 <= q <= 1:
            raise ValueError(f"quantile {q} outside [0, 1]")
        sdf = self._df.to_spark()
        return DataFrame(
            sdf.withColumn(
                f"{column}.rolling_q{q}",
                F.percentile(F.col(column), F.lit(float(q))).over(self._w),
            )
        )
