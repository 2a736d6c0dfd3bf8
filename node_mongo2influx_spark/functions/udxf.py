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
    DuckDB oracle) on adversarial documents (tools/json_fixtures.py,
    r8/r9) — the contract in functions/jsonpath.py: malformed or
    non-object roots yield nothing; duplicate keys yield one row each,
    all carrying the key's FIRST value (object_pairs_hook keeps the
    duplicates a plain dict would silently last-wins); a path-unsafe
    key (jsonpath.SAFE_KEY_RE) or a non-integer-shaped value
    (jsonpath.INT_SHAPE_RE) gives a NULL value, not a dropped row.

    The two patterns are CLASS-ATTRIBUTE copies of the
    functions/jsonpath constants (pinned equal by
    tests/test_relational_extra.py): the class must pickle
    self-contained — referencing a module global makes cloudpickle
    serialize by reference, and importing THIS module on a worker
    trips the module-level @pandas_udf DDL parse (no session there).
    """

    _SAFE_KEY_RE = (
        "^[^\\x00-\\x20\\x22\\x27\\x5C*]"
        "([^\\x00-\\x1F\\x22\\x27\\x5C*]*"
        "[^\\x00-\\x20\\x22\\x27\\x5C*])?$"
    )
    _INT_SHAPE_RE = "^[+-]?[0-9]+$"

    def _tolerant_int(self, v):
        """The INT_SHAPE contract (functions/jsonpath.py): Python ints
        inside int32; strings that are pure optional-sign digits; NULL
        for everything else — bools, ANY float (both engines render a
        JSON 3.0 / 3e2 as '3.0' / '300.0', which fails the shape guard
        there; DuckDB's bare TRY_CAST would ROUND '3.7' to 4 where
        Spark's is NULL, which is why the shape rule exists), nested
        structures, overflow, non-numeric. An instance method reaching
        the patterns through ``self`` — naming the class would be a
        module-global reference, the same cloudpickle worker-import
        trap as a free helper function."""
        import re

        if isinstance(v, bool) or not isinstance(v, (int, str)):
            return None
        if isinstance(v, str):
            if not re.fullmatch(self._INT_SHAPE_RE, v):
                return None
            v = int(v)
        return v if -(2**31) <= v < 2**31 else None

    def eval(self, props: str):  # noqa: D102
        import json
        import re

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
            # A path-unsafe key (engine path parsers disagree or error
            # on it) is enumerable but not extractable: NULL value.
            if re.fullmatch(self._SAFE_KEY_RE, k):
                yield k, self._tolerant_int(first[k])
            else:
                yield k, None
