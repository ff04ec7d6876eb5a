"""Property-based comparator fuzz: Spark sort order under each comparator
must equal a pure-Python model of the reference compare() functions
(db/marshal/*.java)."""

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_cassandra_spark.functions.comparators import get_comparator

name_bytes = st.binary(min_size=0, max_size=6)
longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
uuid16 = st.binary(min_size=16, max_size=16)

COMMON = dict(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))


def spark_order(spark, cmp_name, names):
    cmp = get_comparator(cmp_name)
    df = spark.createDataFrame([(bytearray(n),) for n in names], "column binary")
    return [bytes(r["column"]) for r in df.orderBy(*cmp.order_exprs(F.col("column"))).collect()]


def stable_expected(names, key):
    # Spark's sort is not stable across equal keys with identical payloads;
    # compare multisets in order of the sort key only
    return sorted(names, key=key)


@settings(**COMMON)
@given(st.lists(name_bytes, min_size=1, max_size=8, unique=True))
def test_bytes_unsigned_order(spark, names):
    # BytesType: unsigned lexical (python bytes comparison is exactly that)
    assert spark_order(spark, "BytesType", names) == sorted(names)


@settings(**COMMON)
@given(st.lists(longs, min_size=1, max_size=8, unique=True))
def test_long_signed_order(spark, vals):
    names = [struct.pack(">q", v) for v in vals]
    expected = [struct.pack(">q", v) for v in sorted(vals)]
    assert spark_order(spark, "LongType", names) == expected


def _timeuuid_key(b):
    # reference TimeUUIDType.compareTimestampBytes: nibble6-low, byte7,
    # bytes4-5, bytes0-3; tiebreak raw bytes; empty first
    if len(b) == 0:
        return (0,)
    ts = ((b[6] & 0x0F), b[7], b[4], b[5], b[0], b[1], b[2], b[3])
    return (1, ts, b)


@settings(**COMMON)
@given(st.lists(uuid16, min_size=1, max_size=8, unique=True))
def test_timeuuid_order(spark, names):
    assert spark_order(spark, "TimeUUIDType", names) == sorted(names, key=_timeuuid_key)


def _lexuuid_key(b):
    msb = struct.unpack(">q", b[:8])[0]
    lsb = struct.unpack(">q", b[8:])[0]
    return (msb, lsb)


@settings(**COMMON)
@given(st.lists(uuid16, min_size=1, max_size=8, unique=True))
def test_lexicaluuid_order(spark, names):
    assert spark_order(spark, "LexicalUUIDType", names) == sorted(names, key=_lexuuid_key)


def _fresh_key(b):
    # FreshTimestampType: empty first, then reverse byte order
    if len(b) == 0:
        return (0, b"")
    return (1, _NegBytes(b))


class _NegBytes:
    def __init__(self, b):
        self.b = b

    def __lt__(self, other):
        return self.b > other.b


@settings(**COMMON)
@given(st.lists(name_bytes, min_size=1, max_size=8, unique=True))
def test_fresh_timestamp_order(spark, names):
    assert spark_order(spark, "FreshTimestampType", names) == sorted(names, key=_fresh_key)


@settings(**COMMON)
@given(st.lists(name_bytes, min_size=1, max_size=8, unique=True))
def test_py_key_matches_spark_order_bytes_fresh(spark, names):
    """Driver-side py_key (used by slice-bound validation) must induce the
    same total order as the Spark sort-key expressions."""
    for cmp_name in ("BytesType", "FreshTimestampType"):
        cmp = get_comparator(cmp_name)
        assert sorted(names, key=cmp.py_key) == spark_order(spark, cmp_name, names)


@settings(**COMMON)
@given(st.lists(longs, min_size=1, max_size=8, unique=True))
def test_py_key_matches_spark_order_long(spark, vals):
    names = [struct.pack(">q", v) for v in vals]
    cmp = get_comparator("LongType")
    assert sorted(names, key=cmp.py_key) == spark_order(spark, "LongType", names)


@settings(**COMMON)
@given(st.lists(uuid16, min_size=1, max_size=8, unique=True))
def test_py_key_matches_spark_order_uuids(spark, names):
    for cmp_name in ("TimeUUIDType", "LexicalUUIDType"):
        cmp = get_comparator(cmp_name)
        assert sorted(names, key=cmp.py_key) == spark_order(spark, cmp_name, names)
