"""Spark-side html→text extraction (vectorized pandas UDF over Arrow batches).

The north-rule invariant: per-url extracted text is byte-identical to the
stored ``text`` column (the reference pipeline's output).  Asserted in
tests/test_extraction.py over the deterministic pages table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    from sketchlib.data.extract import extract_series

    return extract_series(html).astype("string")


def with_extracted_text(df: DataFrame, html_col: str = "html",
                        out_col: str = "text_extracted") -> DataFrame:
    from sketchlib.spark.shipping import ensure_on_workers

    ensure_on_workers(df.sparkSession)
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
