"""Grouped-aggregate pandas UDAFs (Arrow-batched Series → scalar).

No `from __future__ import annotations` here: the pandas_udf type-hint
resolver needs real pd.Series annotations.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
    """Weight-averaged value; NaN on zero total weight."""
    denom = weight.sum()
    return float((value * weight).sum() / denom) if denom else float("nan")
