"""Comparator ordering parity — mirrors the reference's
db/marshal/TypeCompareTest.java:36-95 and TimeUUIDTypeTest.java:32-62."""

import struct
import uuid

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.functions.comparators import get_comparator


def sort_names(spark, comparator_name, names, reverse=False):
    cmp = get_comparator(comparator_name)
    df = spark.createDataFrame([(bytearray(n),) for n in names], "column binary")
    rows = df.orderBy(*cmp.order_exprs(F.col("column"), reverse=reverse)).collect()
    return [bytes(r["column"]) for r in rows]


def test_bytes_unsigned_order(spark):
    names = [b"\x01", b"\xff", b"\x7f", b"\x80", b"a", b""]
    assert sort_names(spark, "BytesType", names) == [b"", b"\x01", b"a", b"\x7f", b"\x80", b"\xff"]


def test_utf8_order(spark):
    names = [s.encode() for s in ["b", "a", "aa", "Z", "z"]]
    assert sort_names(spark, "UTF8Type", names) == [b"Z", b"a", b"aa", b"b", b"z"]


def test_long_signed_numeric_order(spark):
    vals = [5, -3, 0, 2**62, -(2**62), 1]
    names = [struct.pack(">q", v) for v in vals]
    expected = [struct.pack(">q", v) for v in sorted(vals)]
    assert sort_names(spark, "LongType", names) == expected


def test_long_reversed(spark):
    vals = [5, -3, 0]
    names = [struct.pack(">q", v) for v in vals]
    expected = [struct.pack(">q", v) for v in sorted(vals, reverse=True)]
    assert sort_names(spark, "LongType", names, reverse=True) == expected


def test_timeuuid_timestamp_order(spark):
    # v1 uuids with increasing timestamps but shuffled random node bits
    def v1(ts_100ns):
        time_low = ts_100ns & 0xFFFFFFFF
        time_mid = (ts_100ns >> 32) & 0xFFFF
        time_hi = ((ts_100ns >> 48) & 0x0FFF) | 0x1000
        rest = uuid.uuid4().bytes[8:]
        return struct.pack(">IHH", time_low, time_mid, time_hi) + rest

    names = [v1(t) for t in (500, 100, 300, 200, 400)]
    got = sort_names(spark, "TimeUUIDType", names)
    expected = [names[i] for i in (1, 3, 2, 4, 0)]
    assert got == expected


def test_lexicaluuid_msb_lsb_order(spark):
    us = [uuid.UUID(int=i) for i in (5, 1, 3)]
    names = [u.bytes for u in us]
    got = sort_names(spark, "LexicalUUIDType", names)
    assert got == [uuid.UUID(int=1).bytes, uuid.UUID(int=3).bytes, uuid.UUID(int=5).bytes]


def test_fresh_timestamp_fresh_first(spark):
    # empty = freshest sentinel, then descending byte order
    names = [b"\x00\x00\x00\x00\x00\x00\x00\x01", b"\x00\x00\x00\x00\x00\x00\x00\x03", b"", b"\x00\x00\x00\x00\x00\x00\x00\x02"]
    got = sort_names(spark, "FreshTimestampType", names)
    assert got == [
        b"",
        b"\x00\x00\x00\x00\x00\x00\x00\x03",
        b"\x00\x00\x00\x00\x00\x00\x00\x02",
        b"\x00\x00\x00\x00\x00\x00\x00\x01",
    ]


def test_comparator_range_predicates(spark):
    cmp = get_comparator("LongType")
    df = spark.createDataFrame(
        [(bytearray(struct.pack(">q", v)),) for v in (-5, -1, 0, 3, 9)], "column binary"
    )
    lo = F.lit(struct.pack(">q", -1))
    hi = F.lit(struct.pack(">q", 3))
    got = df.where(cmp.ge(F.col("column"), lo) & cmp.le(F.col("column"), hi)).count()
    assert got == 3  # -1, 0, 3


def test_fqcn_accepted(spark):
    assert get_comparator("org.apache.cassandra.db.marshal.LongType").name == "LongType"


def test_unknown_comparator():
    with pytest.raises(KeyError):
        get_comparator("NopeType")
