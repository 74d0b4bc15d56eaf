"""Type system for the PySpark-native torcharrow-capability engine.

Mirrors the *semantics* of the reference type system
(/root/reference/torcharrow/dtypes_core.py:48-283,
/root/reference/torcharrow/dtypes.py:278-422) — immutable dtypes with a
``nullable`` flag, prefix-based inference, and the PyTorch-style numeric
promotion lattice — re-expressed on top of ``pyspark.sql.types``.

Nothing here runs a Spark job; this module is pure metadata.
"""

from __future__ import annotations

import dataclasses as _dc
import typing as _ty

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# DType core


@_dc.dataclass(frozen=True)
class DType:
    """Abstract immutable dtype with structural equality.

    Reference: dtypes_core.py:48-77 (every dtype carries ``nullable``).
    """

    @property
    def nullable(self) -> bool:  # overridden via field in subclasses
        return getattr(self, "_nullable", True)

    def with_null(self, nullable: bool = True) -> "DType":
        return _dc.replace(self, _nullable=nullable)  # type: ignore[arg-type]

    @property
    def name(self) -> str:
        return type(self).__name__.lower()


def _simple(name: str, typecode: str, spark_type: T.DataType):
    """Build a scalar dtype class + its two singletons (nullable / not)."""

    @_dc.dataclass(frozen=True)
    class _D(DType):
        _nullable: bool = False

        @property
        def name(self) -> str:  # noqa: D401
            return name

        def __str__(self) -> str:
            return f"{name}{'(nullable=True)' if self._nullable else ''}"

    _D.__name__ = name.capitalize()
    _D.typecode = typecode
    _D.spark_type = spark_type
    return _D


Boolean = _simple("boolean", "b", T.BooleanType())
Int8 = _simple("int8", "c", T.ByteType())
Int16 = _simple("int16", "s", T.ShortType())
Int32 = _simple("int32", "i", T.IntegerType())
Int64 = _simple("int64", "l", T.LongType())
Float32 = _simple("float32", "f", T.FloatType())
Float64 = _simple("float64", "g", T.DoubleType())
String = _simple("string", "u", T.StringType())
# Beyond-reference scalar types Spark gives for free (dtypes_core.py:80
# deliberately omits temporal types; we expose them as natural extensions).
Timestamp = _simple("timestamp", "t", T.TimestampType())
Date = _simple("date", "d", T.DateType())
Binary = _simple("binary", "z", T.BinaryType())

boolean = Boolean(False)
int8 = Int8(False)
int16 = Int16(False)
int32 = Int32(False)
int64 = Int64(False)
float32 = Float32(False)
float64 = Float64(False)
string = String(False)
timestamp = Timestamp(False)
date = Date(False)
binary = Binary(False)


@_dc.dataclass(frozen=True)
class Field:
    name: str
    dtype: DType


@_dc.dataclass(frozen=True)
class List_(DType):
    """List dtype; ``fixed_size`` has no Spark type-level analog and is
    enforced only at validation points (reference: dtypes_core.py:215-218,
    velox_rt/list_column_cpu.py:98-101)."""

    item_dtype: DType = None  # type: ignore[assignment]
    _nullable: bool = False
    fixed_size: int = -1

    @property
    def name(self) -> str:
        return "list"


@_dc.dataclass(frozen=True)
class Map(DType):
    key_dtype: DType = None  # type: ignore[assignment]
    item_dtype: DType = None  # type: ignore[assignment]
    _nullable: bool = False
    keys_sorted: bool = False

    @property
    def name(self) -> str:
        return "map"


@_dc.dataclass(frozen=True)
class Struct(DType):
    fields: _ty.Tuple[Field, ...] = ()
    _nullable: bool = False

    def __post_init__(self):
        if not isinstance(self.fields, tuple):
            object.__setattr__(self, "fields", tuple(self.fields))
        # Nullable structs require all-nullable fields
        # (reference: dtypes_core.py:277-283 raises TypeError).
        if self._nullable and any(not f.dtype.nullable for f in self.fields):
            raise TypeError(
                "nullable structs require all fields to be nullable"
            )

    @property
    def name(self) -> str:
        return "struct"

    def get(self, name: str) -> DType:
        for f in self.fields:
            if f.name == name:
                return f.dtype
        raise KeyError(name)


def List(item_dtype: DType, nullable: bool = False, fixed_size: int = -1) -> List_:
    return List_(item_dtype, nullable, fixed_size)


def is_numerical(d: DType) -> bool:
    return d.name in _PROMOTION_ORDER


def is_boolean(d: DType) -> bool:
    return d.name == "boolean"


def is_string(d: DType) -> bool:
    return d.name == "string"


def is_list(d: DType) -> bool:
    return isinstance(d, List_)


def is_map(d: DType) -> bool:
    return isinstance(d, Map)


def is_struct(d: DType) -> bool:
    return isinstance(d, Struct)


def is_floating(d: DType) -> bool:
    return d.name in ("float32", "float64")


def is_integer(d: DType) -> bool:
    return d.name in ("int8", "int16", "int32", "int64")


# ---------------------------------------------------------------------------
# Spark <-> DType round trip

_SIMPLE_BY_NAME = {
    "boolean": boolean,
    "int8": int8,
    "int16": int16,
    "int32": int32,
    "int64": int64,
    "float32": float32,
    "float64": float64,
    "string": string,
    "timestamp": timestamp,
    "date": date,
    "binary": binary,
}

_SPARK_TO_NAME = {
    T.BooleanType: "boolean",
    T.ByteType: "int8",
    T.ShortType: "int16",
    T.IntegerType: "int32",
    T.LongType: "int64",
    T.FloatType: "float32",
    T.DoubleType: "float64",
    T.StringType: "string",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp",
    T.DateType: "date",
    T.BinaryType: "binary",
}


def to_spark(d: DType) -> T.DataType:
    """DType -> pyspark.sql.types.DataType."""
    if isinstance(d, Void):
        return T.NullType()
    if isinstance(d, List_):
        return T.ArrayType(to_spark(d.item_dtype), d.item_dtype.nullable)
    if isinstance(d, Map):
        return T.MapType(to_spark(d.key_dtype), to_spark(d.item_dtype), d.item_dtype.nullable)
    if isinstance(d, Struct):
        return T.StructType(
            [T.StructField(f.name, to_spark(f.dtype), f.dtype.nullable) for f in d.fields]
        )
    return type(d).spark_type


def from_spark(st: T.DataType, nullable: bool = True) -> DType:
    """pyspark.sql.types.DataType -> DType."""
    if isinstance(st, T.ArrayType):
        return List_(from_spark(st.elementType, st.containsNull), nullable)
    if isinstance(st, T.MapType):
        return Map(
            from_spark(st.keyType, False),
            from_spark(st.valueType, st.valueContainsNull),
            nullable,
        )
    if isinstance(st, T.StructType):
        return Struct(
            tuple(Field(f.name, from_spark(f.dataType, f.nullable)) for f in st.fields),
            nullable and all(f.nullable for f in st.fields),
        )
    if isinstance(st, T.DecimalType):
        return float64.with_null(nullable)
    name = _SPARK_TO_NAME.get(type(st))
    if name is None:
        raise TypeError(f"unsupported Spark type {st}")
    return _SIMPLE_BY_NAME[name].with_null(nullable)


def spark_schema(d: Struct) -> T.StructType:
    st = to_spark(d)
    assert isinstance(st, T.StructType)
    return st


# ---------------------------------------------------------------------------
# Promotion lattice (reference: dtypes.py:356-422 `_promotion_list`/`promote`;
# C++ matrix csrc/velox/column.h:132-218). bool < int8 < int16 < int32 <
# int64 < float32 < float64; column-scalar: the column's type wins for
# int-int and float-float pairs (PyTorch rule).

_PROMOTION_ORDER = {
    "boolean": 0,
    "int8": 1,
    "int16": 2,
    "int32": 3,
    "int64": 4,
    "float32": 5,
    "float64": 6,
}

_BY_RANK = ["boolean", "int8", "int16", "int32", "int64", "float32", "float64"]


def promote(l: DType, r: DType) -> DType:
    """Least-upper-bound of two numeric/boolean dtypes (column-column rule)."""
    if not (is_numerical(l) and is_numerical(r)):
        raise TypeError(f"cannot promote {l.name} and {r.name}")
    rank = max(_PROMOTION_ORDER[l.name], _PROMOTION_ORDER[r.name])
    return _SIMPLE_BY_NAME[_BY_RANK[rank]].with_null(l.nullable or r.nullable)


def promote_column_scalar(col: DType, scalar: DType) -> DType:
    """Column-scalar asymmetric rule (reference column.h:148-218): the
    column's dtype wins when both are ints or both are floats; otherwise
    standard promotion (e.g. int column + float scalar -> float32)."""
    if is_integer(col) and is_integer(scalar):
        return col
    if is_floating(col) and is_floating(scalar):
        return col
    if is_integer(col) and is_floating(scalar):
        # PyTorch: int tensor + float scalar -> default float dtype (float32)
        return float32.with_null(col.nullable or scalar.nullable)
    return promote(col, scalar)


def common_dtype(l: DType, r: DType) -> DType:
    """lub over the full dtype space (reference dtypes.py:381-422)."""
    if l.name == "void":
        return r.with_null(True)
    if r.name == "void":
        return l.with_null(True)
    if is_numerical(l) and is_numerical(r):
        return promote(l, r)
    if l.name == r.name:
        if isinstance(l, List_) and isinstance(r, List_):
            return List_(common_dtype(l.item_dtype, r.item_dtype), l.nullable or r.nullable)
        return l.with_null(l.nullable or r.nullable)
    raise TypeError(f"no common dtype for {l.name} and {r.name}")


# ---------------------------------------------------------------------------
# Inference from Python values (reference dtypes.py:278-350; int->int64,
# float->float32 (PyTorch convention, dtypes.py:639-641), prefix length 7
# at the top level: scope.py:185-193).

PREFIX_LENGTH = 7


def infer_dtype_from_value(value) -> DType:
    if value is None:
        return Void()
    if isinstance(value, bool):
        return boolean
    if isinstance(value, int):
        return int64
    if isinstance(value, float):
        return float32
    if isinstance(value, str):
        return string
    if isinstance(value, bytes):
        return binary
    if isinstance(value, list):
        return List_(infer_dtype_from_prefix(value[:PREFIX_LENGTH]))
    if isinstance(value, tuple):
        return Struct(
            tuple(Field(f"f{i}", infer_dtype_from_value(v).with_null(v is None))
                  for i, v in enumerate(value))
        )
    if isinstance(value, dict):
        keys = list(value.keys())
        vals = list(value.values())
        return Map(
            infer_dtype_from_prefix(keys),
            infer_dtype_from_prefix(vals),
        )
    raise TypeError(f"cannot infer dtype from {type(value)}")


@_dc.dataclass(frozen=True)
class Void(DType):
    """All-null placeholder (reference dtypes.py:42)."""

    _nullable: bool = True

    @property
    def name(self) -> str:
        return "void"


def infer_dtype_from_prefix(values) -> DType:
    """Infer from the first PREFIX_LENGTH values (reference scope.py:185-193,
    dtypes.py:297-326)."""
    values = list(values)[:PREFIX_LENGTH]
    result: DType | None = None
    nullable = False
    for v in values:
        if v is None:
            nullable = True
            continue
        d = infer_dtype_from_value(v)
        result = d if result is None else common_dtype(result, d)
    if result is None:
        return Void()
    return result.with_null(nullable)


# Typed-hint inference (reference dtypes.py:599-648 `dtype_of_type`).
def dtype_from_hint(hint) -> DType:
    origin = _ty.get_origin(hint)
    if origin in (list, _ty.List):
        (item,) = _ty.get_args(hint)
        return List_(dtype_from_hint(item))
    if origin in (dict, _ty.Dict):
        k, v = _ty.get_args(hint)
        return Map(dtype_from_hint(k), dtype_from_hint(v))
    # typing.Optional[X] and PEP 604 `X | None` (types.UnionType) alike
    import types as _types

    if origin in (_ty.Union, _types.UnionType):
        args = [a for a in _ty.get_args(hint) if a is not type(None)]
        if len(args) == 1 and type(None) in _ty.get_args(hint):
            return dtype_from_hint(args[0]).with_null(True)
        raise TypeError(f"unsupported union {hint}")
    mapping = {bool: boolean, int: int64, float: float32, str: string, bytes: binary}
    if hint in mapping:
        return mapping[hint]
    # NamedTuple classes (reference dtypes.py:599-648 handles these)
    if isinstance(hint, type) and issubclass(hint, tuple) and hasattr(hint, "_fields"):
        anns = _ty.get_type_hints(hint)
        return Struct(
            tuple(Field(n, dtype_from_hint(anns[n])) for n in hint._fields)
        )
    # dataclasses
    import dataclasses

    if dataclasses.is_dataclass(hint):
        return Struct(
            tuple(
                Field(f.name, dtype_from_hint(f.type if not isinstance(f.type, str) else _ty.get_type_hints(hint)[f.name]))
                for f in dataclasses.fields(hint)
            )
        )
    raise TypeError(f"cannot map type hint {hint}")


def infer_dtype_from_callable(fn) -> DType:
    """Result dtype from a UDF's return annotation (reference
    infer_dype_from_callable_hint, dtypes.py:329-350). Raises if the
    callable is unannotated — mirroring the reference's 'dtype required
    if it cannot be inferred' contract (icolumn.py:597-610)."""
    hints = _ty.get_type_hints(fn)
    if "return" not in hints:
        raise TypeError(
            f"{getattr(fn, '__name__', fn)!r} has no return annotation; "
            "pass dtype= explicitly"
        )
    return dtype_from_hint(hints["return"])
