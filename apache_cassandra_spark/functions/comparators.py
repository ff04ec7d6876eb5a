"""Column-name comparators as Spark sort-key expressions.

The reference types column *names* only (values are opaque ``byte[]``);
each ``AbstractType`` subclass defines the per-row ordering of columns
(reference ``db/marshal/*.java``, registry ``db/marshal/Types.java:14-44``).

Here every comparator compiles to a list of **directed Spark key
expressions** — ordering by them ascending reproduces the reference's
``compare()`` exactly, with all computation JVM-side (hex/conv/substring:
whole-stage-codegen friendly, no Python UDFs in the hot path).

Why directed keys instead of one expression: ``FreshTimestampType``
(fork, ``db/marshal/FreshTimestampType.java:22-41``) orders *descending*
by bytes with the empty name sorting first, which cannot be a single
ascending key without byte-negation; a (direction, expr) list handles it
and generalizes to TimeUUID's (timestamp, raw-bytes) two-level order.
"""

from __future__ import annotations

from decimal import Decimal
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

_TWO_63 = Decimal(2**63)
_TWO_64 = Decimal(2**64)


def _unsigned64(hex_col: Column) -> Column:
    """16-hex-char string -> unsigned 64-bit value as decimal(20,0)."""
    return F.conv(hex_col, 16, 10).cast("decimal(20,0)")


def _signed64(hex_col: Column) -> Column:
    """16-hex-char string -> signed big-endian 64-bit value (decimal)."""
    d = _unsigned64(hex_col)
    return F.when(d >= F.lit(_TWO_63), d - F.lit(_TWO_64)).otherwise(d)


class AbstractComparator:
    """Base comparator: unsigned lexical byte order (``BytesType``,
    reference ``db/marshal/BytesType.java:26-31``). Spark's ``BinaryType``
    ordering is also unsigned-lexicographic, so the raw column is the key."""

    name = "BytesType"

    def keys(self, col: Column) -> list[tuple[Column, bool]]:
        """[(expr, ascending)] such that sorting by them (respecting each
        direction) == the reference comparator's ascending order."""
        return [(col, True)]

    def py_key(self, name: bytes):
        """Driver-side total-order key mirroring ``keys`` — used by request
        validation (slice bound ordering) where no DataFrame exists. Must
        stay in lockstep with ``keys``; the property suite fuzzes both
        against the reference compare() models."""
        return bytes(name)

    # -- derived helpers ----------------------------------------------------
    def order_exprs(self, col: Column, reverse: bool = False) -> list[Column]:
        """Ready for ``orderBy`` / window ``orderBy``."""
        out = []
        for expr, asc in self.keys(col):
            asc = asc != reverse
            out.append(expr.asc() if asc else expr.desc())
        return out

    def _cmp(self, a: Column, b: Column, strict: bool) -> Column:
        """comparator(a) < b (strict) or <= b — lexicographic over keys."""
        ka = self.keys(a)
        kb = self.keys(b)
        levels = list(zip(ka, kb))

        def less(level: int) -> Column:
            (ea, asc), (eb, _) = levels[level]
            lt = (ea < eb) if asc else (ea > eb)
            eq = ea.eqNullSafe(eb)
            if level == len(levels) - 1:
                return lt if strict else (lt | eq)
            return lt | (eq & less(level + 1))

        return less(0)

    def lt(self, a: Column, b: Column) -> Column:
        return self._cmp(a, b, strict=True)

    def le(self, a: Column, b: Column) -> Column:
        return self._cmp(a, b, strict=False)

    def gt(self, a: Column, b: Column) -> Column:
        return self._cmp(b, a, strict=True)

    def ge(self, a: Column, b: Column) -> Column:
        return self._cmp(b, a, strict=False)


class _ReversedBytes:
    """Sort-key wrapper that inverts lexicographic byte order (correct for
    prefix pairs, unlike byte negation)."""

    __slots__ = ("b",)

    def __init__(self, b: bytes):
        self.b = b

    def __lt__(self, other: "_ReversedBytes") -> bool:
        return other.b < self.b

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _ReversedBytes) and other.b == self.b

    def __hash__(self) -> int:
        return hash(self.b)


class BytesType(AbstractComparator):
    name = "BytesType"


class AsciiType(BytesType):
    """Byte order + US-ASCII validation on write
    (reference ``db/marshal/AsciiType.java:26``)."""

    name = "AsciiType"


class UTF8Type(BytesType):
    """Byte order + UTF-8 validation; UTF-8 byte order == codepoint order
    (reference ``db/marshal/UTF8Type.java:30``)."""

    name = "UTF8Type"


class LongType(AbstractComparator):
    """8-byte big-endian signed long, compared numerically
    (reference ``db/marshal/LongType.java:28-45``)."""

    name = "LongType"

    def keys(self, col: Column) -> list[tuple[Column, bool]]:
        return [(F.coalesce(_signed64(F.hex(col)), F.lit(_TWO_63 * -1)), True)]

    def py_key(self, name: bytes):
        import struct as _struct

        return _struct.unpack(">q", bytes(name))[0] if len(name) == 8 else -_TWO_63


class TimeUUIDType(AbstractComparator):
    """v1-UUID 60-bit timestamp order, raw-byte tiebreak; empty name first
    (reference ``db/marshal/TimeUUIDType.java:28-64``: low nibble of byte 6,
    byte 7, bytes 4-5, bytes 0-3 == the 60-bit timestamp big-endian)."""

    name = "TimeUUIDType"

    def keys(self, col: Column) -> list[tuple[Column, bool]]:
        h = F.hex(col)  # 32 uppercase hex chars for a 16-byte uuid
        # hex char indexes (1-based): byte6 low nibble = 14, byte7 = 15-16,
        # bytes4-5 = 9-12, bytes0-3 = 1-8  ->  60-bit timestamp
        ts_hex = F.concat(F.substring(h, 14, 3), F.substring(h, 9, 4), F.substring(h, 1, 8))
        ts = F.conv(ts_hex, 16, 10).cast("decimal(20,0)")
        empty_first = F.when(F.length(col) == 0, 0).otherwise(1)
        return [(empty_first, True), (F.coalesce(ts, F.lit(Decimal(-1))), True), (col, True)]

    def py_key(self, name: bytes):
        b = bytes(name)
        if len(b) == 0:
            return (0, -1, b)
        ts = ((b[6] & 0x0F) << 56) | (b[7] << 48) | (b[4] << 40) | (b[5] << 32) | int.from_bytes(b[0:4], "big")
        return (1, ts, b)


class LexicalUUIDType(AbstractComparator):
    """UUID msb/lsb compared as signed longs (Java ``UUID.compareTo``;
    reference ``db/marshal/LexicalUUIDType.java:27-46``)."""

    name = "LexicalUUIDType"

    def keys(self, col: Column) -> list[tuple[Column, bool]]:
        h = F.hex(col)
        neg = F.lit(_TWO_63 * -1)
        msb = F.coalesce(_signed64(F.substring(h, 1, 16)), neg)
        lsb = F.coalesce(_signed64(F.substring(h, 17, 16)), neg)
        return [(msb, True), (lsb, True)]

    def py_key(self, name: bytes):
        b = bytes(name)
        if len(b) != 16:
            return (-_TWO_63, -_TWO_63)
        msb = int.from_bytes(b[0:8], "big", signed=True)
        lsb = int.from_bytes(b[8:16], "big", signed=True)
        return (msb, lsb)


class FreshTimestampType(AbstractComparator):
    """Fork type: reverse byte order, "fresh first"; the empty name is the
    freshest sentinel (reference ``db/marshal/FreshTimestampType.java:22-41``)."""

    name = "FreshTimestampType"

    def keys(self, col: Column) -> list[tuple[Column, bool]]:
        empty_first = F.when(F.length(col) == 0, 0).otherwise(1)
        return [(empty_first, True), (col, False)]

    def py_key(self, name: bytes):
        # NB not a negated-bytes trick: negation fails to reverse order for
        # prefix pairs ("a" vs "ab"); wrap with a reversed __lt__ instead
        b = bytes(name)
        return (0 if len(b) == 0 else 1, _ReversedBytes(b))


_REGISTRY: dict[str, AbstractComparator] = {}


def register_comparator(cmp: AbstractComparator) -> None:
    """Pluggable registry, mirroring ``db/marshal/Types.java:14-44`` (any
    AbstractType FQCN accepted in config)."""
    _REGISTRY[cmp.name] = cmp


for _c in (BytesType(), AsciiType(), UTF8Type(), LongType(), TimeUUIDType(), LexicalUUIDType(), FreshTimestampType()):
    register_comparator(_c)


def get_comparator(name: str) -> AbstractComparator:
    # accept both short names and the reference's FQCN form
    short = name.rsplit(".", 1)[-1]
    try:
        return _REGISTRY[short]
    except KeyError:
        raise KeyError(f"unknown comparator {name!r}; registered: {sorted(_REGISTRY)}") from None


def and_all(preds: list[Column]) -> Column:
    return reduce(lambda a, b: a & b, preds)
