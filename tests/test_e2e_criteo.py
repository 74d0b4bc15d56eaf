"""Criteo-style end-to-end preprocessing test — the reference's flagship
integration test pattern (reference test/integration/test_criteo.py:98-215):
random rows -> parquet -> engine preproc (fill_null -> +3 -> log ->
array_constructor -> cast) -> dense tensor, compared against an
independent NUMPY reimplementation of the same pipeline."""

import math
import random

import numpy as np
import pytest

import torcharrow_spark as ts
from torcharrow_spark import me, dt
from torcharrow_spark import functional as fn

N_ROWS = 200
N_DENSE = 4


@pytest.fixture(scope="module")
def criteo_parquet(spark, tmp_path_factory):
    rng = random.Random(42)
    rows = []
    for i in range(N_ROWS):
        dense = [
            None if rng.random() < 0.2 else rng.uniform(0, 100.0)
            for _ in range(N_DENSE)
        ]
        label = rng.randint(0, 1)
        rows.append((i, label, *dense))
    schema = "row_id long, label long, " + ", ".join(
        f"d{j} double" for j in range(N_DENSE)
    )
    path = str(tmp_path_factory.mktemp("criteo") / "data.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    return path, rows


def test_criteo_pipeline_matches_numpy(spark, criteo_parquet):
    path, rows = criteo_parquet

    # engine pipeline
    df = ts.read_parquet(path, spark)
    for j in range(N_DENSE):
        df[f"d{j}"] = df[f"d{j}"].fill_null(0.0)
        df[f"d{j}"] = (df[f"d{j}"] + 3.0).log()
    out = df.select(
        "row_id",
        dense=fn.array(*[me[f"d{j}"] for j in range(N_DENSE)]),
        label=me["label"].cast(dt.int32),
    ).sort(by=["row_id"])

    from torcharrow_spark.interop_torch import Dense

    tensors = out.to_tensor({"dense": Dense(dtype=np.float64)})
    dense_t = np.asarray(tensors["dense"], dtype=np.float64)
    label_t = np.asarray(tensors["label"])

    # independent numpy oracle
    want = np.zeros((N_ROWS, N_DENSE))
    want_label = np.zeros(N_ROWS, dtype=np.int32)
    for i, (_rid, label, *dense) in enumerate(rows):
        for j, v in enumerate(dense):
            want[i, j] = math.log((0.0 if v is None else v) + 3.0)
        want_label[i] = label

    assert dense_t.shape == (N_ROWS, N_DENSE)
    # Java Math.log and C libm log differ by <=1 ulp on some inputs; the
    # reference's Criteo test also compares with a tolerance
    # (test_criteo.py:183-186 uses np.isclose/torch.allclose)
    np.testing.assert_allclose(dense_t, want, rtol=1e-14, atol=0)
    np.testing.assert_array_equal(label_t, want_label)


def test_criteo_sparse_and_jagged(spark, criteo_parquet):
    """Jagged sparse-id lists survive the tensor bridge as offsets+values
    (reference PackedList), built from the same parquet."""
    path, rows = criteo_parquet
    df = ts.read_parquet(path, spark)
    df["ids"] = df["row_id"].list_repeat_ids() if False else df["row_id"]
    # derive a deterministic jagged list: row_id % 3 + 1 copies of row_id
    out = df.select(
        "row_id",
        ids=fn.array_repeat(me["row_id"], (me["row_id"] % 3 + 1).cast(dt.int32)),
    ).sort(by=["row_id"])
    t = out.to_tensor()
    ids = t["ids"]
    # PackedList: offsets + flat values
    offsets = np.asarray(ids.offsets)
    values = np.asarray(ids.values)
    lens = [(r[0] % 3) + 1 for r in rows]
    assert offsets[0] == 0 and offsets[-1] == sum(lens)
    assert list(np.diff(offsets)) == lens
    k = 0
    for rid, n in enumerate(lens):
        assert all(values[k + m] == rid for m in range(n))
        k += n
