"""Isotonic calibration — pool-adjacent-violators (PAV) per group.

Monotone regression is the standard score-calibration step for ranking /
recommendation pipelines (calibrate raw model scores to observed CTR or
price): fit the best weighted least-squares NON-DECREASING function of x.
Spark has no built-in isotonic DataFrame op (MLlib's lives on RDDs of
doubles), and PAV is inherently sequential per group — exactly the
"custom stateful operator" case the brief routes to ``applyInPandas``.

Scale design — the crucial trick is that PAV's input is NOT the raw
relation: we first hash-aggregate to one row per (group, x) with the
weighted mean of y and the weight (count). That agg has map-side
partials, so the Python stage sees |distinct x per group| rows, not
|rows|; a 100-TB fact table with a few thousand distinct scores per
group costs the JVM one agg and Python a few KB per group. The PAV
itself is the O(n) stack algorithm, NumPy-backed.

Reference parity: generalizes the reference's MinMax rescale step
(recommender.py:244-252, linear score calibration) to monotone
calibration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _pav(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Weighted PAV, O(n) stack form: pool adjacent violating blocks."""
    vals: list[float] = []
    wts: list[float] = []
    lens: list[int] = []
    for yi, wi in zip(y, w):
        vals.append(float(yi))
        wts.append(float(wi))
        lens.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            tot = wts[-2] + wts[-1]
            vals[-2] = (vals[-2] * wts[-2] + vals[-1] * wts[-1]) / tot
            wts[-2] = tot
            lens[-2] += lens[-1]
            vals.pop()
            wts.pop()
            lens.pop()
    return np.repeat(np.asarray(vals), np.asarray(lens, dtype=int))


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group isotonic regression of mean(y) as a function of x.

    Returns one row per (group, x): the pooled x-level weight ``w``,
    the observed weighted mean ``y_mean``, and the monotone fit
    ``y_hat`` (non-decreasing in x within each group, weighted mean
    preserved exactly — both properties are unit-tested laws).
    """
    agg = (
        df.groupBy(group_col, x_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.avg(y_col).alias("y_mean"),
        )
    )

    schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField(x_col, DoubleType()),
            StructField("w", LongType()),
            StructField("y_mean", DoubleType()),
            StructField("y_hat", DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        pdf["y_hat"] = _pav(
            pdf["y_mean"].to_numpy(dtype=float), pdf["w"].to_numpy(dtype=float)
        )
        return pdf[[group_col, x_col, "w", "y_mean", "y_hat"]]

    typed = agg.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(x_col).cast("double").alias(x_col),
        "w",
        "y_mean",
    )
    return typed.groupBy(group_col).applyInPandas(fit, schema=schema)
