"""torcharrow_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of facebookresearch/torcharrow (reference at
/root/reference, studied for behavior only; architecture is Spark-first:
lazy DataFrame plans optimized by Catalyst, executed by Tungsten).

Public surface mirrors the reference's module layout:
  - dtypes (dt): typed, nullability-carrying dtype system
  - DataFrame / Column: lazy typed facades
  - me: symbolic frame variable for select/where
  - functional: domain ops + generic scalar-function registry fallthrough
  - sources: parquet/csv/json/arrow/pandas ingestion
  - operators: beyond-parity LLM-pipeline ops (dedup, similarity, text
    analysis, multimodal) designed for 100 TB scale
"""

from . import dtypes
from . import dtypes as dt
from . import functional
from .columns import Column, if_else
from .expr import me
from .frame import DataFrame, GroupedDataFrame
from .session import get_session, tune
from .trace import TracedFrame, replay, trace
from .sources import (
    dataframe,
    from_arrow,
    from_pandas,
    from_pylist,
    read_csv,
    read_json,
    read_orc,
    read_text,
    read_parquet,
    read_table,
    read_warc,
    write_bucketed,
    write_csv,
    write_json,
    write_parquet,
    write_text,
    write_warc,
)

__version__ = "0.1.0"

__all__ = [
    "Column",
    "DataFrame",
    "GroupedDataFrame",
    "dataframe",
    "dt",
    "dtypes",
    "from_arrow",
    "from_pandas",
    "from_pylist",
    "functional",
    "get_session",
    "if_else",
    "me",
    "read_csv",
    "read_json",
    "read_orc",
    "read_text",
    "read_parquet",
    "read_table",
    "read_warc",
    "replay",
    "trace",
    "TracedFrame",
    "tune",
    "write_bucketed",
    "write_warc",
    "write_csv",
    "write_json",
    "write_parquet",
    "write_text",
]


def column(data, dtype=None, device: str = "", spark=None):
    """Single-column constructor (reference icolumn.py:34-92): returns a
    one-column DataFrame's column handle. ``device`` mirrors the
    reference dispatcher's signature (icolumn.py:34,
    /root/reference/torcharrow/dispatcher.py): '' or 'cpu' select this
    engine's (only) runtime — the Spark cluster; anything else raises
    like an unregistered dispatch key."""
    from .sources import _check_device

    _check_device(device)
    if dtype is None:
        dtype = dtypes.infer_dtype_from_prefix(data)
    df = dataframe({"value": list(data)}, dtype=dtypes.Struct((dtypes.Field("value", dtype),)), spark=spark)
    return df["value"]


def concat(frames):
    """Concatenate frames (reference icolumn.py:95-97) via unionByName."""
    out = frames[0]
    for f in frames[1:]:
        out = out.union(f)
    return out
