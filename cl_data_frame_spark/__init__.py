"""cl_data_frame_spark — a PySpark-native analytics engine with the
capabilities of tpapp/cl-data-frame (reference: /root/reference/), rebuilt
Spark-first: DataFrame/Catalyst for everything relational, Arrow-vectorized
pandas UDFs for arbitrary row functions, Structured Streaming for streams.

See SURVEY.md for the blueprint (§2 operator inventory: Tier R = reference
contract, Tier S = relational completion, Tier X = pipeline extensions).
"""

from .errors import (ColumnLengthMismatch, DataFrameError, DuplicateKey,
                     EmptyFrame, KeyNotFound)
from .frame import (ALL, ROW_ID, DataVector, SparkFrame, alist_df, df, dv,
                    make_df, matrix_df, plist_df)
from .session import get_spark
from .summary import (BitSummary, GenericSummary, QuantilesSummary,
                      column_summary)

__all__ = [
    "ALL", "ROW_ID", "DataVector", "SparkFrame",
    "df", "dv", "make_df", "alist_df", "plist_df", "matrix_df",
    "get_spark", "column_summary",
    "BitSummary", "GenericSummary", "QuantilesSummary",
    "DataFrameError", "DuplicateKey", "KeyNotFound",
    "ColumnLengthMismatch", "EmptyFrame",
]
