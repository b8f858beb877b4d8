"""Engine scalar helpers as SQL functions (for the ``Engine.sql`` surface).

Spark 4 SQL scalar UDFs (``CREATE TEMPORARY FUNCTION ... RETURN
<expr>``) have pure-SQL bodies: Catalyst inlines the expression into
the calling plan, so these run in whole-stage codegen like any
built-in — no Python round-trip, unlike ``spark.udf.register``. They
mirror the Python parsers bit-for-bit (pinned in
tests/test_sqlfns.py):

- ``eng_duration_s('30d')``  — reference duration literal to seconds;
  ``m`` means MINUTES (config.rs quirk, config.py:49-55).
- ``eng_size_bytes('10M')``  — 1024-based size literal to bytes.
- ``eng_ts_nanos('2024-01-10T00:00:00.5Z')`` — RFC3339 to epoch
  nanos; NULL when unparseable (the reference's silent-drop policy,
  logger.rs:323-343). Fractional digits beyond Spark's µs timestamps
  are preserved by splitting the fraction textually, exactly like
  functions/time.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DUR = """
CREATE OR REPLACE TEMPORARY FUNCTION eng_duration_s(s STRING)
RETURNS BIGINT RETURN
  CAST(regexp_extract(s, '^([0-9]+)', 1) AS BIGINT) *
  CASE lower(regexp_extract(s, '^[0-9]+(.*)$', 1))
    WHEN 'w' THEN 604800 WHEN 'd' THEN 86400 WHEN 'h' THEN 3600
    WHEN 'm' THEN 60 WHEN 's' THEN 1 END
"""

_SIZE = """
CREATE OR REPLACE TEMPORARY FUNCTION eng_size_bytes(s STRING)
RETURNS BIGINT RETURN
  CAST(regexp_extract(s, '^([0-9]+)', 1) AS BIGINT) *
  CASE lower(regexp_extract(s, '^[0-9]+(.*)$', 1))
    WHEN 'g' THEN 1073741824 WHEN 'm' THEN 1048576
    WHEN 'k' THEN 1024 WHEN 'b' THEN 1 END
"""

# whole seconds via try_to_timestamp on the fraction-stripped text;
# fractional nanos re-attached from the captured digits
_TS = """
CREATE OR REPLACE TEMPORARY FUNCTION eng_ts_nanos(s STRING)
RETURNS BIGINT RETURN
  unix_seconds(try_to_timestamp(
      regexp_replace(s, '\\\\.[0-9]+', ''))) * 1000000000
  + CAST(substring(regexp_extract(s, '\\\\.([0-9]+)', 1)
                   || '000000000', 1, 9) AS BIGINT)
"""


def register_sql_functions(spark: SparkSession) -> None:
    """Install the engine helpers into the session's SQL namespace."""
    for ddl in (_DUR, _SIZE, _TS):
        spark.sql(ddl)
