"""User-defined aggregate / table functions — the UDAF/UDTF surface.

The reference's whole extensibility story is a scalar row→row callback
(prepareFunction). The Spark-native engine rounds this out:

* scalar: ``TransformSpec.batch_fn`` (mapInPandas) — see operators/transform.py
* aggregate: pandas GROUPED_AGG UDFs (Arrow-batched per group) — example
  :func:`geomean`
* table: Python UDTFs (Spark 3.5+) — example :class:`ExplodeProps`

Both examples are deliberately oracle-expressible so the correctness gate
covers the mechanism, not just the toy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean as a pandas GROUPED_AGG UDAF (Arrow transfers the
    group's values once; numpy does the math). Algebraically
    exp(avg(ln(x))) — which is also its SQL oracle."""
    import numpy as np

    return float(np.exp(np.log(v[v > 0]).mean()))


@udtf(returnType="key string, val int")
class ExplodeProps:
    """Python UDTF: one (key, val) row per JSON property — the dynamic-
    document flattener as a table function. eval() is called per input row
    and yields any number of output rows."""

    def eval(self, props: str):  # noqa: D102
        import json

        if props is None:
            return
        try:
            obj = json.loads(props)
        except ValueError:
            return
        for k, v in obj.items():
            if isinstance(v, (int, float)):
                yield k, int(v)
