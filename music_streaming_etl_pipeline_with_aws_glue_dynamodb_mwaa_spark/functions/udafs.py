"""Python UDAF surface (SURVEY.md §2.10): Arrow-batched GROUPED_AGG
pandas UDFs.

The reference needs zero UDAFs (its aggregations are all built-ins); this
completes the engine's UDF/UDAF/UDTF triad alongside functions/udtfs.py.
Discipline: a Python UDAF returns ONE scalar per group and its partials
don't combine map-side (the whole group's values ship to one task), so it
is reserved for genuinely non-expressible aggregates over groups of
bounded size — and even then the heavy arithmetic stays in EXACT integer
space so results are engine-portable.

``gini_numerator`` is the demonstrator: the Gini coefficient's sorted
weighted sum Σ(2i−n−1)·xᵢ (i = 1-based rank). Sorting inside an aggregate
has no SQL-expression form (ordered-set aggregates are the engine-native
analogue), but the numerator is an exact int64 — ties contribute
identically under any sort order, so the value is deterministic and
bit-portable; the final G = num/(n·Σx) is ONE IEEE division composed in
the calling query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


@F.pandas_udf(LongType())
def gini_numerator(v: pd.Series) -> int:
    """Σ (2i − n − 1) · x_(i) over the ascending-sorted group values.

    Exact int64 (inputs are integer cents); empty groups yield 0.
    Overflow envelope: n·max|x| per term — 10⁶ rows of 10⁶ cents stay
    inside int64 (~10¹⁸ worst case); larger groups belong in the
    expression-based percentile/stats operators, not a Python UDAF.
    """
    x = np.sort(v.to_numpy(dtype=np.int64))
    n = len(x)
    if n == 0:
        return 0
    i = np.arange(1, n + 1, dtype=np.int64)
    return int(((2 * i - n - 1) * x).sum())
