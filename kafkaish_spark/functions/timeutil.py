"""Epoch extraction that works for TIMESTAMP and TIMESTAMP_NTZ alike.

Event timestamps are delivered as TIMESTAMP_NTZ holding UTC wall-clock
(sources/tables.py), which ``unix_millis`` rejects.  Casting NTZ ->
TIMESTAMP reads the wall-clock in the session zone; ``load_table`` pins
the session zone to UTC before any plan is analyzed, so the cast is the
identity on the underlying instant and the result matches the oracle's
``epoch_ms`` on naive-UTC values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))
