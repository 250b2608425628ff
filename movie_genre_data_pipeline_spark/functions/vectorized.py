"""Arrow-vectorized scalar Pandas UDFs.

The engine keeps hot-path expressions JVM-side (pyspark.sql.functions); this
module is the pattern for the cases that genuinely need Python — a scalar
``@pandas_udf`` receives whole Arrow batches as pandas Series (no per-row Py4J
crossing), so it runs at NumPy speed and scales with partition count like any
built-in expression. Reference parity note: the reference has no UDFs at all
(SURVEY.md §2.3); this is north-star surface for feature engineering.

Numeric discipline: implementations mirror their SQL oracles op-for-op
(``np.log(1.0 + v)``, not ``np.log1p``) so both engines execute the same IEEE
double sequence and only libm ulp noise remains, which the 6dp rounding in the
suite queries absorbs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def log_damped_value(v: pd.Series) -> pd.Series:
    """ln(1 + value): the standard heavy-tail damping transform for a
    monetary/intensity feature column."""
    return np.log(1.0 + v)


@pandas_udf("double")
def signed_sqrt(v: pd.Series) -> pd.Series:
    """sign(x) * sqrt(|x|): variance-stabilizing transform that keeps sign."""
    return np.sign(v) * np.sqrt(np.abs(v))
