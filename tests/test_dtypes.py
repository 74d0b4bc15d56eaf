"""Type-system unit tests (reference model: test_dtypes.py — SURVEY §5.2).
Pure metadata; no Spark jobs."""

import pytest
from pyspark.sql import types as T

from torcharrow_spark import dtypes as dt


def test_simple_roundtrip():
    for d, st in [
        (dt.int64, T.LongType()),
        (dt.float32, T.FloatType()),
        (dt.string, T.StringType()),
        (dt.boolean, T.BooleanType()),
    ]:
        assert dt.to_spark(d) == st
        assert dt.from_spark(st, nullable=False) == d


def test_nested_roundtrip():
    d = dt.Struct(
        (
            dt.Field("a", dt.int64),
            dt.Field("b", dt.List(dt.string.with_null(True), nullable=True)),
            dt.Field("m", dt.Map(dt.string, dt.float64, _nullable=True)),
        )
    )
    st = dt.to_spark(d)
    assert isinstance(st, T.StructType)
    back = dt.from_spark(st, nullable=False)
    assert back.get("a") == dt.int64
    assert dt.is_list(back.get("b"))
    assert dt.is_map(back.get("m"))


def test_nullable_struct_requires_nullable_fields():
    # reference dtypes_core.py:277-283
    with pytest.raises(TypeError):
        dt.Struct((dt.Field("a", dt.int64),), True)
    dt.Struct((dt.Field("a", dt.int64.with_null(True)),), True)


def test_promotion_lattice():
    # reference dtypes.py:356-378
    assert dt.promote(dt.int8, dt.int64).name == "int64"
    assert dt.promote(dt.boolean, dt.int8).name == "int8"
    assert dt.promote(dt.int64, dt.float32).name == "float32"
    assert dt.promote(dt.float32, dt.float64).name == "float64"
    assert dt.promote(dt.int32.with_null(True), dt.int8).nullable


def test_column_scalar_promotion():
    # column wins for int-int / float-float (reference column.h:148-218)
    assert dt.promote_column_scalar(dt.int8, dt.int64).name == "int8"
    assert dt.promote_column_scalar(dt.float32, dt.float64).name == "float32"
    assert dt.promote_column_scalar(dt.int32, dt.float32).name == "float32"


def test_inference():
    # int->int64, float->float32 (PyTorch convention, dtypes.py:639-641)
    assert dt.infer_dtype_from_value(3).name == "int64"
    assert dt.infer_dtype_from_value(3.0).name == "float32"
    assert dt.infer_dtype_from_value("x").name == "string"
    assert dt.infer_dtype_from_value(True).name == "boolean"
    d = dt.infer_dtype_from_prefix([1, 2, None])
    assert d.name == "int64" and d.nullable
    d = dt.infer_dtype_from_prefix([1, 2.5])
    assert d.name == "float32"
    d = dt.infer_dtype_from_value([1, 2])
    assert dt.is_list(d) and d.item_dtype.name == "int64"


def test_hint_inference():
    import typing

    assert dt.dtype_from_hint(int).name == "int64"
    assert dt.dtype_from_hint(typing.Optional[str]).nullable
    assert dt.is_list(dt.dtype_from_hint(typing.List[int]))
    assert dt.is_map(dt.dtype_from_hint(typing.Dict[str, float]))


def test_dtype_from_hint_structs():
    import dataclasses
    import typing

    from torcharrow_spark import dtypes as dt

    class Point(typing.NamedTuple):
        x: float
        y: int

    d = dt.dtype_from_hint(Point)
    assert dt.is_struct(d)
    assert [f.name for f in d.fields] == ["x", "y"]
    assert d.fields[0].dtype == dt.float32 and d.fields[1].dtype == dt.int64

    @dataclasses.dataclass
    class Doc:
        ident: int
        tags: typing.List[str]
        score: typing.Optional[float]

    d2 = dt.dtype_from_hint(Doc)
    assert [f.name for f in d2.fields] == ["ident", "tags", "score"]
    assert dt.is_list(d2.fields[1].dtype)
    assert d2.fields[2].dtype.nullable


def test_infer_dtype_from_callable():
    import typing

    from torcharrow_spark import dtypes as dt

    def f(x) -> typing.Optional[int]:
        return x

    assert dt.infer_dtype_from_callable(f) == dt.int64.with_null(True)

    def g(x):
        return x

    import pytest

    with pytest.raises(TypeError):
        dt.infer_dtype_from_callable(g)


def test_dtype_from_hint_pep604_union():
    from torcharrow_spark import dt
    from torcharrow_spark.dtypes import dtype_from_hint

    assert dtype_from_hint(int | None) == dt.int64.with_null(True)
    assert dtype_from_hint(list[str | None]) == dt.List(dt.string.with_null(True))


def test_column_is_hashable(spark):
    import torcharrow_spark as ts
    from torcharrow_spark import me

    c = me["x"]
    assert len({c, c}) == 1  # identity hash, no TypeError


def test_nullable_struct_result_is_nullable():
    """reference dtypes_core.py:277-283 (constraint itself is covered
    above; this checks the accepted form reports nullable)."""
    from torcharrow_spark import dt

    ok = dt.Struct((dt.Field("a", dt.int64.with_null(True)),), True)
    assert ok.nullable
