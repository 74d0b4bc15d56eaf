"""DataFrame/GroupedDataFrame behavior tests (reference model:
test_dataframe.py — SURVEY §5.1)."""

import torcharrow_spark as ts
from torcharrow_spark import dt, me


def test_select_where_exclude(spark):
    d = ts.dataframe({"a": [1, 2, 3], "b": [4, 5, 6], "c": [7, 8, 9]}, spark=spark)
    out = d.select("*", "-c", s=me["a"] + me["b"])
    assert out.columns == ["a", "b", "s"]
    assert [r["s"] for r in out.to_pylist()] == [5, 7, 9]
    assert len(d.where(me["a"] > 1, me["b"] < 6)) == 1


def test_column_surgery(spark):
    d = ts.dataframe({"a": [1], "b": [2]}, spark=spark)
    d["c"] = me["a"] + 10
    assert d.to_pylist() == [{"a": 1, "b": 2, "c": 11}]
    assert d.drop(["b"]).columns == ["a", "c"]
    assert d.keep(["b"]).columns == ["b"]
    assert d.rename({"a": "x"}).columns == ["x", "b", "c"]
    assert d.reorder(["c", "a", "b"]).columns == ["c", "a", "b"]


def test_groupby_reference_naming(spark):
    d = ts.dataframe(
        {"g": ["x", "x", "y", None], "v": [1, 2, 3, 4]}, spark=spark
    )
    out = d.groupby("g").agg({"v": ["sum", "count"]}).sort(by=["g"])
    rows = out.to_pylist()
    # null group dropped (reference drop_null=True, dataframe_cpu.py:2092)
    assert rows == [
        {"g": "x", "v.sum": 3, "v.count": 2},
        {"g": "y", "v.sum": 3, "v.count": 1},
    ]
    sized = d.groupby("g").size.sort(by=["g"]).to_pylist()
    assert sized == [{"g": "x", "size": 2}, {"g": "y", "size": 1}]


def test_groupby_me_select(spark):
    d = ts.dataframe({"g": ["x", "x", "y"], "v": [1.0, 3.0, 5.0]}, spark=spark)
    out = d.groupby("g").select(total=me["v"].sum(), avg=me["v"].mean()).sort(by=["g"])
    assert out.to_pylist() == [
        {"g": "x", "total": 4.0, "avg": 2.0},
        {"g": "y", "total": 5.0, "avg": 5.0},
    ]


def test_dedup_and_nulls(spark):
    d = ts.dataframe(
        {"k": [1, 1, 2], "o": [2, 1, 5], "v": ["a", "b", "c"]}, spark=spark
    )
    out = d.drop_duplicates(subset=["k"], keep="first", order_by=["o"]).sort(by=["k"])
    assert [r["v"] for r in out.to_pylist()] == ["b", "c"]
    last = d.drop_duplicates(subset=["k"], keep="last", order_by=["o"]).sort(by=["k"])
    assert [r["v"] for r in last.to_pylist()] == ["a", "c"]

    dn = ts.dataframe(
        {"x": [1, None], "y": [None, None]},
        dtype=ts.dt.Struct(
            (
                ts.dt.Field("x", ts.dt.int64.with_null(True)),
                ts.dt.Field("y", ts.dt.int64.with_null(True)),
            )
        ),
        spark=spark,
    )
    assert len(dn.drop_null("any")) == 0
    assert len(dn.drop_null("all")) == 1
    assert dn.fill_null(0).to_pylist() == [{"x": 1, "y": 0}, {"x": 0, "y": 0}]


def test_sort_na_position(spark):
    d = ts.dataframe({"x": [3, None, 1]}, spark=spark)
    assert [r["x"] for r in d.sort(by=["x"]).to_pylist()] == [1, 3, None]
    assert [r["x"] for r in d.sort(by=["x"], na_position="first").to_pylist()] == [None, 1, 3]
    assert [r["x"] for r in d.sort(by=["x"], ascending=False).to_pylist()] == [3, 1, None]


def test_map_flatmap_filter(spark):
    d = ts.dataframe({"x": [1, 2, None]}, spark=spark)
    m = d.map({1: "one"}, columns=["x"])
    assert [r["v"] for r in d.select(v=m).to_pylist()] == ["one", None, None]
    f = d.filter(lambda x: x is not None and x > 1, columns=["x"])
    assert [r["x"] for r in f.to_pylist()] == [2]
    fm = d.flatmap(lambda x: [x, x * 10] if x else [], dtype=dt.int64.with_null(True), columns=["x"])
    assert sorted(r["value"] for r in fm.to_pylist()) == [1, 2, 10, 20]


def test_transform_arrow(spark):
    import pyarrow as pa

    d = ts.dataframe({"x": [1, 2, 3]}, spark=spark)

    def double(batch: pa.RecordBatch) -> pa.RecordBatch:
        import pyarrow.compute as pc

        return pa.RecordBatch.from_arrays([pc.multiply(batch["x"], 2)], names=["x"])

    out = d.transform(double)
    assert sorted(r["x"] for r in out.to_pylist()) == [2, 4, 6]


def test_describe_cumsum_concat(spark):
    d = ts.dataframe({"i": [1, 2], "x": [1.0, 3.0]}, spark=spark)
    desc = {r["metric"]: r["x"] for r in d.describe().to_pylist()}
    assert desc["count"] == 2.0 and desc["mean"] == 2.0
    cs = d.cumsum(columns=["x"], order_by=["i"]).sort(by=["i"])
    assert [r["x"] for r in cs.to_pylist()] == [1.0, 4.0]
    cc = ts.concat([d, d])
    assert len(cc) == 4


def test_join_append(spark):
    left = ts.dataframe({"k": [1, 2], "v": ["a", "b"]}, spark=spark)
    right = ts.dataframe({"k": [2, 3], "w": [20, 30]}, spark=spark)
    j = left.join(right, "k", "inner", broadcast=True)
    assert j.to_pylist() == [{"k": 2, "v": "b", "w": 20}]
    ap = left.append([(4, "d")])
    assert len(ap) == 3


def test_interop(spark):
    import pandas as pd
    import pyarrow as pa

    d = ts.dataframe({"x": [1, 2]}, spark=spark)
    assert d.to_pandas()["x"].tolist() == [1, 2]
    assert d.to_arrow().column("x").to_pylist() == [1, 2]
    back = ts.from_pandas(pd.DataFrame({"y": [1.5]}), spark=spark)
    assert back.to_pylist() == [{"y": 1.5}]
    back2 = ts.from_arrow(pa.table({"z": ["s"]}), spark=spark)
    assert back2.to_pylist() == [{"z": "s"}]


def test_positional_rows(spark):
    import torcharrow_spark as ts

    d = ts.dataframe({"i": [3, 1, 2, 5, 4], "x": list("cabed")}, spark=spark)
    s = d.slice_rows(1, 4, order_by=["i"])
    assert [r["i"] for r in s.sort(by=["i"]).to_pylist()] == [2, 3, 4]
    s2 = d.slice_rows(0, 5, order_by=["i"], step=2)
    assert [r["i"] for r in s2.sort(by=["i"]).to_pylist()] == [1, 3, 5]
    g = d.gather([0, 4], order_by=["i"])
    assert [r["x"] for r in g.sort(by=["i"]).to_pylist()] == ["a", "e"]
    assert d.copy().count() == 5


def test_map_callable_infers_dtype_from_annotation(spark):
    import torcharrow_spark as ts

    d = ts.dataframe({"a": [1, 2, 3]}, spark=spark)

    def double(x) -> int:
        return None if x is None else x * 2

    out = d.select("a", b=d.map(double, columns=["a"])).sort(by=["a"]).to_pylist()
    assert [r["b"] for r in out] == [2, 4, 6]


def test_grouped_iteration_and_column(spark):
    import torcharrow_spark as ts

    d = ts.dataframe({"g": [1, 1, 2], "x": [10, 20, 30]}, spark=spark)
    groups = {k: sorted(r["x"] for r in sub.to_pylist()) for k, sub in d.groupby("g")}
    assert groups == {1: [10, 20], 2: [30]}
    gx = d.groupby("g")["x"].agg("sum").sort(by=["g"]).to_pylist()
    assert [r["x.sum"] for r in gx] == [30, 30]


def test_transform_formats(spark):
    import torcharrow_spark as ts
    from torcharrow_spark import dt

    d = ts.dataframe({"a": [1.0, 2.0, 3.0]}, spark=spark)
    py = d.transform(
        lambda b: {"a": [x * 2 for x in b["a"]]},
        dtype=dt.Struct((dt.Field("a", dt.float64),)),
        format="python",
    )
    assert sorted(r["a"] for r in py.to_pylist()) == [2.0, 4.0, 6.0]

    tc = d.transform(
        lambda b: {"a": b["a"] * 3},  # numpy (or torch) batch math
        dtype=dt.Struct((dt.Field("a", dt.float64),)),
        format="torch",
    )
    assert sorted(r["a"] for r in tc.to_pylist()) == [3.0, 6.0, 9.0]


def test_fill_null_descends_into_structs(spark):
    """fill_null rebuilds struct children recursively; a NULL struct ROW
    stays null (row-null vs field-null are distinct — reference
    dataframe_cpu.py:240-254)."""
    import torcharrow_spark as ts

    sdf = spark.createDataFrame(
        [
            (1, {"x": None, "y": 2.0, "inner": {"z": None}}),
            (2, {"x": 5.0, "y": None, "inner": None}),
            (3, None),
        ],
        "id long, s struct<x double, y double, inner struct<z double>>",
    )
    out = {r["id"]: r for r in ts.DataFrame(sdf).fill_null(0.0).to_pylist()}
    assert out[1]["s"] == {"x": 0.0, "y": 2.0, "inner": {"z": 0.0}}
    assert out[2]["s"]["x"] == 5.0 and out[2]["s"]["y"] == 0.0
    assert out[2]["s"]["inner"] is None  # null inner struct row stays null
    assert out[3]["s"] is None  # null outer struct row stays null


def test_validate_fixed_size(spark):
    import pytest

    import torcharrow_spark as ts

    ok = ts.dataframe({"v": [[1, 2], [3, 4]]}, spark=spark).validate_fixed_size("v", 2)
    assert ok.count() == 2
    bad = ts.dataframe({"v": [[1, 2], [3]]}, spark=spark).validate_fixed_size("v", 2)
    with pytest.raises(Exception, match="fixed_size violation"):
        bad.to_pylist()


def test_rolling_window(spark):
    import torcharrow_spark as ts

    d = ts.dataframe(
        {"g": [1, 1, 1, 2], "i": [1, 2, 3, 1], "x": [1.0, 2.0, 3.0, 10.0]}, spark=spark
    )
    out = (
        d.rolling(2, order_by=["i"], partition_by=["g"])
        .agg({"x": ["sum", "max"]})
        .sort(by=["g", "i"])
        .to_pylist()
    )
    assert [r["x.rolling_sum"] for r in out] == [1.0, 3.0, 5.0, 10.0]
    assert [r["x.rolling_max"] for r in out] == [1.0, 2.0, 3.0, 10.0]


def test_is_unique_null_semantics(spark):
    """Nulls compare as values (reference icolumn.py is_unique is
    set-based): duplicate nulls break uniqueness; a single row with
    nulls in several columns is still unique."""
    import torcharrow_spark as ts

    d = ts.dataframe({"x": [1, None, None]}, dtype=dt.Struct([dt.Field("x", dt.Int64(True))]), spark=spark)
    assert not d.is_unique(["x"])
    d2 = ts.dataframe({"x": [1, None, 2]}, dtype=dt.Struct([dt.Field("x", dt.Int64(True))]), spark=spark)
    assert d2.is_unique(["x"])
    # one row, nulls in two checked columns: trivially unique
    d3 = ts.dataframe(
        {"a": [None], "b": [None]},
        dtype=dt.Struct([dt.Field("a", dt.Int64(True)), dt.Field("b", dt.Int64(True))]),
        spark=spark,
    )
    assert d3.is_unique(["a", "b"])
    # same null-tuple twice: not unique
    d4 = ts.dataframe(
        {"a": [None, None], "b": [None, None]},
        dtype=dt.Struct([dt.Field("a", dt.Int64(True)), dt.Field("b", dt.Int64(True))]),
        spark=spark,
    )
    assert not d4.is_unique(["a", "b"])
    # empty frame is unique
    assert d.where(me["x"] > 99).is_unique(["x"])


def test_describe_include_exclude_percent(spark):
    """Reference describe parity (dataframe_cpu.py:1784-1838): percent
    percentiles with midpoint interpolation, dtype-list include/exclude,
    non-numeric columns get count/min/max."""
    import pytest as _pt

    d = ts.dataframe(
        {"i": [1, 2, 999, 4], "s": ["b", "a", "c", "a"]},
        spark=spark,
    )
    desc = {r["metric"]: r["i"] for r in d.describe().to_pylist()}
    assert desc["count"] == 4.0 and desc["mean"] == 251.5
    assert desc["25%"] == 1.5 and desc["50%"] == 3.0 and desc["75%"] == 501.5
    # include a string dtype -> string stats column
    sd = d.dtype.fields
    s_dtype = [f.dtype for f in sd if f.name == "s"][0]
    rows = {r["metric"]: r["s"] for r in d.describe(include=[s_dtype]).to_pylist()}
    assert rows["count"] == "4" and rows["min"] == "a" and rows["max"] == "c"
    assert rows["mean"] is None
    # exclude the numeric column -> empty selection is an error-free no-op frame
    i_dtype = [f.dtype for f in sd if f.name == "i"][0]
    both = d.describe(include=[s_dtype, i_dtype], exclude=[s_dtype])
    assert "s" not in both.columns and "i" in both.columns
    with _pt.raises(ValueError):
        d.describe(percentiles=[150])
    with _pt.raises(TypeError):
        d.describe(include="all")


def test_positional_literal_indexing(spark):
    """Reference icolumn.py:317-346 literal semantics: df[i] row tuple,
    python slices, literal boolean masks, int-list gather — all over the
    hidden construction-order index, renumbering after filters."""
    import pytest as _pt

    d = ts.dataframe({"i": [10, 11, 12, 13, 14], "x": list("abcde")}, spark=spark)
    assert d[0] == (10, "a") and d[3] == (13, "d") and d[-1] == (14, "e")
    with _pt.raises(IndexError):
        d[99]
    assert [r["x"] for r in d[1:3].to_pylist()] == ["b", "c"]
    assert [r["x"] for r in d[::2].to_pylist()] == ["a", "c", "e"]
    assert [r["x"] for r in d[-2:].to_pylist()] == ["d", "e"]
    assert [r["x"] for r in d[[True, False, True, False, True]].to_pylist()] == ["a", "c", "e"]
    assert [r["x"] for r in d[[0, 4]].to_pylist()] == ["a", "e"]
    empty = d[[]]
    assert empty.count() == 0 and empty.columns == []
    # positions renumber after a filter: surviving rows are 0..n-1
    f = d.where(d["i"] > 11)
    assert f[0] == (12, "c")
    assert [r["x"] for r in f[[True, False, True]].to_pylist()] == ["c", "e"]
    # from_pylist frames carry the index too
    p = ts.from_pylist([{"a": 1}, {"a": 2}, {"a": 3}], spark=spark)
    assert p[1] == (2,)


def test_drop_duplicates_keep_false(spark):
    """keep=False drops every row whose key occurs more than once
    (declared-but-unimplemented in the reference, icolumn.py:1068-1079)."""
    d = ts.dataframe({"k": [1, 1, 2, 3, 3, 3], "v": list("abcdef")}, spark=spark)
    out = d.drop_duplicates(subset=["k"], keep=False)
    assert sorted(r["v"] for r in out.to_pylist()) == ["c"]
    # whole-row variant ignores the hidden index
    d2 = ts.dataframe({"k": [5, 5, 6]}, spark=spark)
    assert [r["k"] for r in d2.drop_duplicates(keep=False).to_pylist()] == [6]


def test_review_regressions_positional_and_dedup(spark):
    """Round-2 review findings: whole-row dedup must ignore the hidden
    index; masks validate length; negative gather indices normalize;
    empty describe selection yields metric rows, not a crash."""
    import pytest as _pt

    d = ts.dataframe({"k": [5, 5, 6]}, spark=spark)
    assert sorted(r["k"] for r in d.drop_duplicates().to_pylist()) == [5, 6]
    d2 = ts.dataframe({"x": [1, 2, 3, 4, 5]}, spark=spark)
    with _pt.raises(ValueError, match="mask length"):
        d2[[True, False, True]]
    assert [r["x"] for r in d2[[0, -1]].to_pylist()] == [1, 5]
    out = d2.describe(include=[])
    assert out.columns == ["metric"] and out.count() == 8


def test_column_range_slice(spark):
    """df['b':'d'] selects the column range, stop-exclusive (reference
    dataframe_cpu.py:426-439)."""
    d = ts.dataframe({"a": [1], "b": [2], "c": [3], "d": [4]}, spark=spark)
    assert d["b":"d"].columns == ["b", "c"]
    assert d[:"b"].columns == ["a"]
    assert d["c":].columns == ["c", "d"]


def test_pivot_melt_roundtrip(spark):
    d = ts.dataframe(
        {"k": ["a", "a", "b"], "g": ["x", "y", "x"], "v": [1.0, 2.0, 3.0]}, spark=spark
    )
    wide = d.pivot("k", "g", "v", agg="sum", col_values=["x", "y"])
    rows = {r["k"]: (r["x"], r["y"]) for r in wide.to_pylist()}
    assert rows["a"] == (1.0, 2.0) and rows["b"] == (3.0, None)
    tall = wide.melt(["k"], ["x", "y"]).to_spark()
    assert tall.count() == 4 and set(tall.columns) == {"k", "variable", "value"}


def test_csv_json_sink_roundtrip(spark, tmp_path):
    import torcharrow_spark as ts

    df = ts.from_pylist(
        [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}], spark=spark
    )
    p_csv, p_json = str(tmp_path / "c"), str(tmp_path / "j")
    ts.write_csv(df, p_csv)
    ts.write_json(df, p_json)
    back_csv = ts.read_csv(p_csv, spark, schema="a bigint, b string")
    back_json = ts.read_json(p_json, spark, schema="a bigint, b string")
    expect = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    assert sorted(back_csv.to_pylist(), key=lambda r: r["a"]) == expect
    assert sorted(back_json.to_pylist(), key=lambda r: r["a"]) == expect


def test_frame_profile_method(spark):
    import torcharrow_spark as ts

    df = ts.from_pylist([{"a": 1, "b": "x"}, {"a": None, "b": "x"}],
                        spark=spark)
    prof = {r["column"]: r for r in df.profile().to_pylist()}
    assert prof["a"]["n_null"] == 1 and prof["a"]["n_distinct"] == 1
    assert prof["b"]["n_distinct"] == 1 and prof["b"]["n_rows"] == 2


def test_trace_replay(spark, sf_dir):
    """trace() records the fluent API calls; replay() re-applies them to
    a different input frame and reproduces the result exactly
    (reference torcharrow/trace.py:16-129 — here the recorded steps
    carry live argument objects, so me-expressions and lambdas replay
    without a repr/eval round-trip)."""
    import torcharrow_spark as ts
    from torcharrow_spark import me
    from torcharrow_spark.trace import replay, trace

    base = ts.read_parquet(f"{sf_dir}/lineitem.parquet", spark)
    t = trace(base)
    out = (
        t.where(me["l_quantity"] > 40)
        .select("l_orderkey", "l_quantity", half=me["l_quantity"] / 2)
        .sort(by=["l_orderkey", "l_quantity"])
        .head(20)
    )
    assert len(out.steps) == 4
    assert [s.method for s in out.steps] == ["where", "select", "sort", "head"]
    assert all("=" in line for line in out.statements())

    expect = out.result().to_pylist()
    # replay on a re-read of the same data (a "new shard")
    again = replay(out.steps, ts.read_parquet(f"{sf_dir}/lineitem.parquet", spark))
    assert again.to_pylist() == expect

    # non-DataFrame returns pass through unrecorded (sinks)
    t2 = trace(base)
    n = t2.where(me["l_quantity"] > 40).to_spark().count()
    assert n > 0


def test_read_write_text(spark, tmp_path):
    """Raw text ingestion: line mode (distributed splits) and
    whole-file mode (document-per-file corpora), plus the text sink."""
    import os

    import torcharrow_spark as ts
    from torcharrow_spark import me

    p = str(tmp_path / "corpus")
    os.makedirs(p)
    with open(f"{p}/a.txt", "w") as fh:
        fh.write("first line\nsecond line\n")
    with open(f"{p}/b.txt", "w") as fh:
        fh.write("third line\n")

    lines = ts.read_text(p, spark)
    assert sorted(r["text"] for r in lines.to_pylist()) == [
        "first line", "second line", "third line"]

    docs = ts.read_text(p, spark, whole_file=True)
    rows = {os.path.basename(r["path"]): r["text"] for r in docs.to_pylist()}
    assert rows["a.txt"] == "first line\nsecond line\n"
    assert rows["b.txt"] == "third line\n"

    out = str(tmp_path / "out")
    ts.write_text(lines.where(me["text"].str.contains("line", regex=False)), out)
    back = ts.read_text(out, spark)
    assert back.to_spark().count() == 3


def test_rolling_quantile_median_std(spark):
    """Rolling median/quantile/std match pandas rolling semantics on a
    hand-checkable series (exact trailing-window order statistics with
    linear interpolation; sample std from decimal-exact moments)."""
    import math

    import torcharrow_spark as ts

    vals = [5.0, 1.0, 4.0, 2.0, 8.0, 3.0]
    d = ts.dataframe(
        {"g": ["a"] * 6, "i": list(range(6)), "x": vals}, spark=spark
    )
    r = d.rolling(3, order_by=["i"], partition_by=["g"])
    med = {row["i"]: row["x.rolling_median"]
           for row in r.agg({"x": ["median"]}).to_pylist()}
    # trailing-3 windows: [5],[5,1],[5,1,4],[1,4,2],[4,2,8],[2,8,3]
    assert med == {0: 5.0, 1: 3.0, 2: 4.0, 3: 2.0, 4: 4.0, 5: 3.0}
    q9 = {row["i"]: row["x.rolling_q0.9"]
          for row in r.quantile("x", 0.9).to_pylist()}
    # linear interpolation at h = (n-1)*0.9
    assert abs(q9[2] - 4.8) < 1e-12 and abs(q9[4] - 7.2) < 1e-12
    std = {row["i"]: row["x.rolling_std"]
           for row in r.agg({"x": ["std"]}).to_pylist()}
    assert std[0] is None  # n = 1
    assert abs(std[2] - math.sqrt(13 / 3)) < 1e-9  # stdev of 5,1,4


def test_rolling_std_large_value_fallback(spark):
    """Rolling std windows whose max |v| leaves the decimal(18,6)
    domain (>= 1e9 guard) fall back to stddev_samp over the raw double
    instead of silently NULLing the overflowed value out of the sums
    (which previously produced a wrong-not-error std)."""
    import math

    vals = [1.0, 2.0, 5.0e13, 4.0, 7.0]
    d = ts.dataframe(
        {"i": list(range(len(vals))), "x": vals}, spark=spark
    )
    out = d.rolling(3, order_by=["i"]).agg({"x": ["std"]})
    got = {row["i"]: row["x.rolling_std"] for row in out.to_pylist()}

    def ref_std(window):
        n = len(window)
        if n < 2:
            return None
        m = sum(window) / n
        return math.sqrt(sum((v - m) ** 2 for v in window) / (n - 1))

    for i in range(len(vals)):
        window = vals[max(0, i - 2): i + 1]
        want = ref_std(window)
        if want is None:
            assert got[i] is None
        else:
            assert abs(got[i] - want) <= 1e-6 * abs(want), (i, window, got[i], want)
