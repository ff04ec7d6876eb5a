"""The engine's one deterministic uniform-hash expression.

First 60 bits of md5 (15 hex chars — fits signed int64 in any SQL
engine) mod a caller modulus. Batch shard membership, streaming shard
membership, and sampling draws all route through THIS function so the
cross-module guarantee "same arithmetic everywhere, replayable as one
line of ANSI SQL" holds by construction, not by convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uniform_hash(col: str | Column, modulus: int) -> Column:
    """Deterministic draw in ``[0, modulus)`` from a column's string form:
    ANSI-SQL twin is
    ``('0x' || substr(md5(cast(x as varchar)), 1, 15))::bigint % modulus``."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(modulus))
