"""The portable dynamic-JSON extraction contract (round 9).

The schemaless ``events.props`` documents (the Mongo dynamic-document
analogue, reference index.js:198) carry arbitrary user keys and values.
Extracting them by *interpolated JSON path* is the only spelling both
engines share, and each engine's path parser has its own hazard set,
measured live in this repo:

* Spark ``get_json_object`` bracket paths ``$['k']``: fail (NULL) on a
  key with LEADING/TRAILING whitespace, a single quote (the bracket
  delimiter), or an empty key; interior spaces, dots, unicode, ``[]``,
  ``$`` and every other punctuation class all work.
* DuckDB quoted paths ``$."k"``: a ``*`` inside quotes is STILL the
  wildcard (returns a list, not the member), an empty key RAISES a
  path error, and an embedded double quote (the quote delimiter) can
  raise or mis-bind. Dots, spaces, unicode etc. work.

The pinned, engine-independent contract is therefore:

1. **Key enumeration is unrestricted**: ``json_object_keys`` /
   ``json_keys`` agree exactly (document order, duplicate keys kept,
   nothing for non-object or malformed roots) — every key becomes a
   row.
2. **A key is path-extractable iff it matches** :data:`SAFE_KEY_RE` —
   non-empty, contains no single quote, double quote, backslash, ``*``
   or control character, and does not start or end with whitespace.
   The union of both engines' hazard sets, applied on BOTH sides (and
   in the Python UDTF), so an unsafe key yields a NULL value — never
   an engine-dependent result or an error. Path extraction of a safe
   key is FIRST-wins on duplicate keys in both engines (measured).
3. **A value is an int iff its extracted string form matches**
   :data:`INT_SHAPE_RE` (optional sign + digits, nothing else), then
   try_cast. Both engines normalize extracted numbers identically
   (``3e2`` → ``'300.0'``, ``99999999999999999999`` → shape-fail or
   int32-overflow → NULL either way), but their bare string→int casts
   disagree — DuckDB ``TRY_CAST('3.7' AS INT)`` ROUNDS to 4 while
   Spark's ANSI try_cast is NULL — so the shape guard runs before any
   cast, on both sides. Whitespace-padded numeric strings are NULL by
   contract (Spark's try_cast would trim; DuckDB trims too; Python's
   ``int()`` trims differently on unicode — the strict shape sidesteps
   all three).

Both patterns use ``\\xNN`` escapes only, so the SAME source text is a
valid Java regex (Spark ``rlike``), RE2 regex (DuckDB
``regexp_matches``), and Python ``re`` pattern, with no quoting or
backslash-processing differences between the three hosts.
:class:`~node_mongo2influx_spark.functions.udxf.ExplodeProps` keeps
self-contained copies as class attributes (a UDTF must not reference
module globals — cloudpickle would serialize by reference and import
this package on executors); ``tests/test_relational_extra.py`` pins
them equal to these constants.
"""

from __future__ import annotations

#: A props key this contract extracts by path. \x22 is '"', \x27 is
#: "'", \x5C is '\'; [\x00-\x20] covers control chars + space (banned
#: at the ends, control-only banned in the interior).
SAFE_KEY_RE = (
    "^[^\\x00-\\x20\\x22\\x27\\x5C*]"
    "([^\\x00-\\x1F\\x22\\x27\\x5C*]*"
    "[^\\x00-\\x20\\x22\\x27\\x5C*])?$"
)

#: A value string this contract accepts as an integer (before the
#: engine's try_cast, which still applies the int32/int64 range).
INT_SHAPE_RE = "^[+-]?[0-9]+$"
