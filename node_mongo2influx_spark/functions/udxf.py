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
    """Python UDTF: one (key, val) row per TOP-LEVEL KEY OCCURRENCE of a
    valid JSON object — the dynamic-document flattener as a table
    function. eval() is called per input row and yields any number of
    output rows. Semantics match the engine-native json path (and the
    DuckDB oracle) on adversarial documents (tools/json_fixtures.py, r8):
    malformed or non-object roots yield nothing; duplicate keys yield one
    row each, all carrying the key's FIRST value (object_pairs_hook keeps
    the duplicates a plain dict would silently last-wins); values that
    aren't tolerant ints are NULL, not dropped rows."""

    @staticmethod
    def _tolerant_int(v):
        """Mirror of DuckDB's TRY_CAST(json_extract_string(...) AS INT):
        ints (and integral floats / numeric strings) inside int32, NULL
        for everything else — bools, nested structures, overflow,
        non-numeric. A staticmethod so the class pickles self-contained:
        a module-global helper would make cloudpickle serialize by
        reference, and importing THIS module on a worker trips the
        module-level @pandas_udf DDL parse (no session there)."""
        if isinstance(v, bool) or v is None or isinstance(
            v, (dict, list, tuple)
        ):
            return None
        if isinstance(v, float):
            if not v.is_integer():
                return None
            v = int(v)
        if isinstance(v, str):
            try:
                v = int(v)
            except ValueError:
                return None
        return v if -(2**31) <= v < 2**31 else None

    def eval(self, props: str):  # noqa: D102
        import json

        if props is None:
            return
        sentinel = object()
        try:
            root = json.loads(
                props, object_pairs_hook=lambda p: (sentinel, p)
            )
        except ValueError:
            return
        if not (
            isinstance(root, tuple) and len(root) == 2 and root[0] is sentinel
        ):
            return  # array/scalar root: no properties
        pairs = root[1]
        first: dict = {}
        for k, v in pairs:
            first.setdefault(k, v)
        for k, _ in pairs:
            yield k, self._tolerant_int(first[k])
