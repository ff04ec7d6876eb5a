"""Golden tests ported from the reference's end-to-end system suite
(test/system/test_server.py) — the sequences that pin down LWW + tombstone
+ comparator interplay, run through the Engine facade with the memtable
buffer (durable=False) like the reference's in-process server tests."""

import struct
import uuid

import pytest

from apache_cassandra_spark.catalog import Catalog
from apache_cassandra_spark.engine import Engine
from apache_cassandra_spark.model import ColumnPath, SlicePredicate, SliceRange


def _i64(i):
    return struct.pack(">q", i)


BIG = SlicePredicate(slice_range=SliceRange(count=1000))


@pytest.fixture()
def engine(spark, tmp_path):
    catalog = Catalog.from_dict(
        {
            "Keyspace1": {
                "Standard1": {"compare_with": "BytesType"},
                "Standard2": {"compare_with": "BytesType"},
                "StandardLong1": {"compare_with": "LongType"},
                "Super1": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "LongType"},
                "Super2": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "LongType"},
            },
            "Keyspace2": {
                "Super3": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "BytesType"},
                "Super4": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "TimeUUIDType"},
            },
        }
    )
    return Engine(spark, str(tmp_path), catalog)


def ins(engine, ks, cf, key, col, val, ts, sc=None):
    engine.insert(ks, key, ColumnPath(cf, super_column=sc, column=col), val, ts, durable=False)


def slice_cols(engine, ks, cf, key, pred=BIG, sc=None):
    rows = engine.get_slice(ks, key, cf, pred, super_column=sc).collect()
    return [(bytes(r["column"]), bytes(r["value"]), r["ts"]) for r in rows]


def _insert_simple(engine):
    ins(engine, "Keyspace1", "Standard1", "key1", b"c1", b"value1", 0)
    ins(engine, "Keyspace1", "Standard1", "key1", b"c2", b"value2", 0)


def _insert_super(engine):
    ins(engine, "Keyspace1", "Super1", "key1", _i64(4), b"value4", 0, sc=b"sc1")
    ins(engine, "Keyspace1", "Super1", "key1", _i64(5), b"value5", 0, sc=b"sc2")
    ins(engine, "Keyspace1", "Super1", "key1", _i64(6), b"value6", 0, sc=b"sc2")


def test_cf_remove(engine):
    # test_server.py:653
    _insert_simple(engine)
    _insert_super(engine)

    engine.remove("Keyspace1", "key1", ColumnPath("Standard1"), 3, durable=False)
    assert slice_cols(engine, "Keyspace1", "Standard1", "key1") == []
    # super CF unaffected
    assert len(slice_cols(engine, "Keyspace1", "Super1", "key1")) == 3

    # resurrection: older timestamp stays removed
    ins(engine, "Keyspace1", "Standard1", "key1", b"c1", b"value1", 0)
    assert slice_cols(engine, "Keyspace1", "Standard1", "key1") == []
    # newer timestamp comes back
    ins(engine, "Keyspace1", "Standard1", "key1", b"c1", b"value1", 4)
    assert slice_cols(engine, "Keyspace1", "Standard1", "key1") == [(b"c1", b"value1", 4)]

    # removing the entire super cf kills parent- and sc-level slices
    engine.remove("Keyspace1", "key1", ColumnPath("Super1"), 3, durable=False)
    assert slice_cols(engine, "Keyspace1", "Super1", "key1") == []
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc1") == []


def test_super_cf_remove_column(engine):
    # test_server.py:678
    _insert_simple(engine)
    _insert_super(engine)

    engine.remove("Keyspace1", "key1", ColumnPath("Super1", super_column=b"sc2", column=_i64(5)), 5, durable=False)
    assert engine.get("Keyspace1", "key1", ColumnPath("Super1", super_column=b"sc2", column=_i64(5))).count() == 0
    got = slice_cols(engine, "Keyspace1", "Super1", "key1")
    assert got == [(_i64(4), b"value4", 0), (_i64(6), b"value6", 0)]
    # standard cf untouched
    assert slice_cols(engine, "Keyspace1", "Standard1", "key1") == [
        (b"c1", b"value1", 0),
        (b"c2", b"value2", 0),
    ]
    # new insert shows up post-remove
    ins(engine, "Keyspace1", "Super1", "key1", _i64(7), b"value7", 0, sc=b"sc2")
    got = slice_cols(engine, "Keyspace1", "Super1", "key1")
    assert got == [(_i64(4), b"value4", 0), (_i64(6), b"value6", 0), (_i64(7), b"value7", 0)]


def test_long_remove_resurrect_cycles(engine):
    # test_server.py:310 test_long_remove - repeated row-delete/resurrect
    sp = SlicePredicate(slice_range=SliceRange(count=1))
    for i in range(0, 30, 10):
        path = ColumnPath("StandardLong1", column=_i64(i))
        engine.insert("Keyspace1", "key1", path, b"value1", 10 * i, durable=False)
        engine.remove("Keyspace1", "key1", ColumnPath("StandardLong1"), 10 * i + 1, durable=False)
        assert slice_cols(engine, "Keyspace1", "StandardLong1", "key1", sp) == []
        engine.insert("Keyspace1", "key1", path, b"value2", 10 * i + 2, durable=False)
        assert slice_cols(engine, "Keyspace1", "StandardLong1", "key1", sp) == [
            (_i64(i), b"value2", 10 * i + 2)
        ]


def test_time_uuid_slices(engine):
    # test_server.py:267 - TimeUUID subcolumn ordering in Super4
    uuids = []
    ts = 0x1ECB_0000_0000_0000
    for i in range(20):
        # strictly increasing v1 timestamps, random node/clock bits
        u = uuid.uuid1(node=uuid.getnode(), clock_seq=i)
        time_low = (ts + i) & 0xFFFFFFFF
        time_mid = ((ts + i) >> 32) & 0xFFFF
        time_hi = (((ts + i) >> 48) & 0x0FFF) | 0x1000
        b = struct.pack(">IHH", time_low, time_mid, time_hi) + u.bytes[8:]
        uuids.append(b)
        ins(engine, "Keyspace2", "Super4", "key1", b, f"value{i}".encode(), i, sc=b"sc1")

    got = slice_cols(engine, "Keyspace2", "Super4", "key1", sc=b"sc1")
    assert [c for c, _, _ in got] == uuids  # timestamp order
    assert [v for _, v, _ in got] == [f"value{i}".encode() for i in range(20)]

    # reversed count=1 -> the newest
    p = SlicePredicate(slice_range=SliceRange(reversed=True, count=1))
    assert slice_cols(engine, "Keyspace2", "Super4", "key1", p, sc=b"sc1") == [
        (uuids[-1], b"value19", 19)
    ]

    # bounded: start='' finish=uuids[2] -> first three
    p = SlicePredicate(slice_range=SliceRange(finish=uuids[2], count=1000))
    got = slice_cols(engine, "Keyspace2", "Super4", "key1", p, sc=b"sc1")
    assert [c for c, _, _ in got] == uuids[:3]

    # reversed from uuids[2] -> value2, value1, value0
    p = SlicePredicate(slice_range=SliceRange(start=uuids[2], reversed=True, count=1000))
    got = slice_cols(engine, "Keyspace2", "Super4", "key1", p, sc=b"sc1")
    assert [c for c, _, _ in got] == [uuids[2], uuids[1], uuids[0]]


def test_batch_mutate_standard_columns(engine):
    # test_server.py:335
    from apache_cassandra_spark.model import Mutation

    keys = [f"key_{i}" for i in range(27, 32)]
    muts = [
        Mutation(column_name=b"c1", value=b"value1", timestamp=0),
        Mutation(column_name=b"c2", value=b"value2", timestamp=0),
    ]
    engine.batch_mutate("Keyspace1", {k: {"Standard1": muts} for k in keys}, durable=False)
    for k in keys:
        r = engine.get("Keyspace1", k, ColumnPath("Standard1", column=b"c1")).collect()
        assert len(r) == 1 and bytes(r[0]["value"]) == b"value1"


def test_batch_mutate_super_deletion(engine):
    # test_server.py:1008 — a name-predicate deletion WITHOUT super_column
    # on a Super CF addresses whole supercolumns (RowMutation.java:354)
    from apache_cassandra_spark.model import Deletion, Mutation

    _insert_super(engine)
    d = Deletion(timestamp=1, predicate=SlicePredicate(column_names=[b"sc1"]))
    engine.batch_mutate("Keyspace1", {"key1": {"Super1": [Mutation(deletion=d)]}}, durable=False)
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc1") == []
    # sc2 untouched
    assert len(slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc2")) == 2


def test_batch_mutate_remove_super_columns_none_given_underneath(engine):
    # test_server.py:419 — Deletion(ts, super_column=sc) with no predicate
    # removes the whole container
    from apache_cassandra_spark.model import Deletion, Mutation

    _insert_super(engine)
    muts = [
        Mutation(deletion=Deletion(timestamp=20, super_column=b"sc1")),
        Mutation(deletion=Deletion(timestamp=20, super_column=b"sc2")),
    ]
    engine.batch_mutate("Keyspace1", {"key1": {"Super1": muts}}, durable=False)
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc1") == []
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc2") == []


def test_batch_mutate_remove_super_columns_entire_row(engine):
    # test_server.py:448 — Deletion(ts) with neither super_column nor
    # predicate is a row tombstone
    from apache_cassandra_spark.model import Deletion, Mutation

    _insert_super(engine)
    engine.batch_mutate(
        "Keyspace1", {"key1": {"Super1": [Mutation(deletion=Deletion(timestamp=20))]}}, durable=False
    )
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc1") == []
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc2") == []


def test_batch_mutate_insertions_and_deletions(engine):
    # test_server.py:473 — one batch_mutate carrying BOTH supercolumn
    # inserts and name-predicate deletions, across two Super CFs and two
    # keys, applied atomically per row
    from apache_cassandra_spark.model import Deletion, Mutation

    keys = ["key_30", "key_31"]
    for k in keys:
        for i in (22, 23):
            ins(engine, "Keyspace1", "Super1", k, _i64(i), f"value{i}".encode(), 0, sc=b"sc1")
            ins(engine, "Keyspace1", "Super2", k, _i64(i), f"value{i}".encode(), 0, sc=b"sc2")
    first_insert = [
        Mutation(column_name=_i64(i), value=f"value{i}".encode(), timestamp=3, super_column=b"sc1")
        for i in (20, 21)
    ]
    first_deletion = Mutation(
        deletion=Deletion(timestamp=3, super_column=b"sc1", predicate=SlicePredicate(column_names=[_i64(22), _i64(23)]))
    )
    second_deletion = Mutation(
        deletion=Deletion(timestamp=2, super_column=b"sc2", predicate=SlicePredicate(column_names=[_i64(22), _i64(23)]))
    )
    mutation_map = {
        "Super1": first_insert + [first_deletion],
        "Super2": [second_deletion] + list(first_insert),
    }
    engine.batch_mutate("Keyspace1", {k: mutation_map for k in keys}, durable=False)
    for k in keys:
        # deleted names gone from both CFs
        assert slice_cols(engine, "Keyspace1", "Super1", k, sc=b"sc1") == [
            (_i64(20), b"value20", 3),
            (_i64(21), b"value21", 3),
        ]
        assert slice_cols(engine, "Keyspace1", "Super2", k, sc=b"sc2") == []
        # and the same-batch insert landed in Super2/sc1
        assert slice_cols(engine, "Keyspace1", "Super2", k, sc=b"sc1") == [
            (_i64(20), b"value20", 3),
            (_i64(21), b"value21", 3),
        ]


def test_super_reinsert(engine):
    # test_server.py:222 — delete a supercolumn, then reinsert at a higher
    # timestamp: the new subcolumns resurrect, old ones stay shadowed
    for i in range(3):
        ins(engine, "Keyspace1", "Super1", "key1", _i64(i), b"value2", 2, sc=b"sc2")
    engine.remove("Keyspace1", "key1", ColumnPath("Super1", super_column=b"sc2"), 3, durable=False)
    for i in range(10, 13):
        ins(engine, "Keyspace1", "Super1", "key1", _i64(i), b"value4", 4, sc=b"sc2")
    cols = slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc2")
    assert [(c, v) for c, v, _ in cols] == [(_i64(i), b"value4") for i in range(10, 13)]


def test_empty_slice_and_missing_super(engine):
    # test_server.py:197,201
    assert slice_cols(engine, "Keyspace1", "Standard1", "key1") == []
    assert slice_cols(engine, "Keyspace1", "Super1", "key1") == []
    _insert_super(engine)
    # sc1 has subcolumn 4 only; subcolumn 1 is missing
    r = engine.get("Keyspace1", "key1", ColumnPath("Super1", super_column=b"sc1", column=_i64(1))).collect()
    assert r == []


def test_count_parent_shapes(engine):
    # test_server.py:206 — count of absent row is 0; super parent counts
    # supercolumns; sc-addressed parent counts subcolumns
    _insert_simple(engine)
    _insert_super(engine)
    def cnt(cf, sc=None):
        return engine.get_count("Keyspace1", "key1", cf, super_column=sc)
    assert cnt("Standard1") == 2
    assert engine.get_count("Keyspace1", "nokey", "Standard1") == 0
    assert cnt("Super1", sc=b"sc2") == 2
    assert cnt("Super1") == 2  # two supercolumns


def test_super_subcolumn_limit(engine):
    # test_server.py:241 — count applies per subcolumn slice; reversed
    # takes from the high end (LongType order)
    _insert_super(engine)
    one = SlicePredicate(slice_range=SliceRange(count=1))
    cols = slice_cols(engine, "Keyspace1", "Super1", "key1", pred=one, sc=b"sc2")
    assert [(c, v) for c, v, _ in cols] == [(_i64(5), b"value5")]
    rev = SlicePredicate(slice_range=SliceRange(count=1, reversed=True))
    cols = slice_cols(engine, "Keyspace1", "Super1", "key1", pred=rev, sc=b"sc2")
    assert [(c, v) for c, v, _ in cols] == [(_i64(6), b"value6")]


def test_super_cf_resurrect_subcolumn(engine):
    # test_server.py:757 — subcolumn reinserted ABOVE the container
    # tombstone's timestamp is visible again
    ins(engine, "Keyspace1", "Super1", "vijay", _i64(4), b"value4", 0, sc=b"sc1")
    engine.remove("Keyspace1", "vijay", ColumnPath("Super1", super_column=b"sc1"), 1, durable=False)
    assert slice_cols(engine, "Keyspace1", "Super1", "vijay", sc=b"sc1") == []
    ins(engine, "Keyspace1", "Super1", "vijay", _i64(4), b"value4", 2, sc=b"sc1")
    cols = slice_cols(engine, "Keyspace1", "Super1", "vijay", sc=b"sc1")
    assert [(c, v) for c, v, _ in cols] == [(_i64(4), b"value4")]


@pytest.fixture()
def opp_engine(spark, tmp_path):
    """The reference's system tests run under OrderPreservingPartitioner
    (test storage-conf) — key-addressed ranges compare lexically."""
    from apache_cassandra_spark.functions.tokens import OrderPreservingPartitioner

    catalog = Catalog.from_dict(
        {
            "Keyspace2": {
                "Super3": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "BytesType"},
            },
        }
    )
    return Engine(spark, str(tmp_path), catalog, partitioner=OrderPreservingPartitioner())


def test_get_range_slice_super(opp_engine):
    # test_server.py:843 — range scan over a super CF, sc-addressed parent
    # with a by-names predicate; then parent-level names selecting whole
    # supercolumns
    from apache_cassandra_spark.model import KeyRange
    from apache_cassandra_spark.operators import read as R

    engine = opp_engine
    for key in ["key1", "key2", "key3", "key4", "key5"]:
        for cname in [b"col1", b"col2", b"col3", b"col4", b"col5"]:
            ins(engine, "Keyspace2", "Super3", key, cname, b"v-" + cname, 0, sc=b"sc1")
    cf = engine.cf("Keyspace2", "Super3")
    pred = SlicePredicate(column_names=[b"col1", b"col3"])
    kr = KeyRange(start_key="key2", end_key="key4", count=5)
    rows = R.get_range_slices(cf, pred, kr, super_column=b"sc1").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(bytes(r["column"]))
    assert sorted(by_key) == ["key2", "key3", "key4"]
    assert all(sorted(cols) == [b"col1", b"col3"] for cols in by_key.values())

    # parent-level names address supercolumns
    sc_pred = SlicePredicate(column_names=[b"sc1"])
    rows = R.get_range_slices(cf, sc_pred, kr).collect()
    assert {bytes(r["sc"]) for r in rows} == {b"sc1"}
    assert len({r["key"] for r in rows}) == 3


def test_get_range_slice_after_deletion(opp_engine):
    # test_server.py:859 — sc-level count=1 slices through delete/reinsert
    from apache_cassandra_spark.model import KeyRange
    from apache_cassandra_spark.operators import read as R

    engine = opp_engine
    key = "key1"
    for i in range(1, 4):
        ins(engine, "Keyspace2", "Super3", key, b"col1", b"val1", 0, sc=f"sc{i}".encode())
    cf = engine.cf("Keyspace2", "Super3")
    pred = SlicePredicate(slice_range=SliceRange(start=b"sc1", finish=b"sc3", count=1))
    kr = KeyRange(start_key=key, end_key=key, count=1)
    rows = R.get_range_slices(cf, pred, kr).collect()
    assert {bytes(r["sc"]) for r in rows} == {b"sc1"}  # count=1 keeps one sc

    engine.remove("Keyspace2", key, ColumnPath("Super3", super_column=b"sc1"), 1, durable=False)
    cf = engine.cf("Keyspace2", "Super3")
    rows = R.get_range_slices(cf, pred, kr).collect()
    assert {bytes(r["sc"]) for r in rows} == {b"sc2"}  # next sc takes the slot

    ins(engine, "Keyspace2", "Super3", key, b"col1", b"val1", 2, sc=b"sc1")
    cf = engine.cf("Keyspace2", "Super3")
    rows = R.get_range_slices(cf, pred, kr).collect()
    assert {bytes(r["sc"]) for r in rows} == {b"sc1"}  # resurrected above ts


def test_batch_mutate_remove_standard_columns_across_keys_and_cfs(engine):
    """test_server.py:362 — one batch deletes NAMED standard columns in
    two CFs for ten keys at once; every addressed cell must be gone."""
    from apache_cassandra_spark.model import Deletion, Mutation

    keys = [f"key_{i}" for i in range(11, 21)]
    for key in keys:
        for cf in ("Standard1", "Standard2"):
            ins(engine, "Keyspace1", cf, key, b"c1", b"value1", 0)
            ins(engine, "Keyspace1", cf, key, b"c2", b"value2", 0)
    d = Deletion(timestamp=20, predicate=SlicePredicate(column_names=[b"c1", b"c2"]))
    muts = {key: {cf: [Mutation(deletion=d)] for cf in ("Standard1", "Standard2")} for key in keys}
    engine.batch_mutate("Keyspace1", muts, durable=False)
    for cf in ("Standard1", "Standard2"):
        for key in keys:
            assert slice_cols(engine, "Keyspace1", cf, key) == []


def test_batch_mutate_remove_standard_row_across_keys_and_cfs(engine):
    """test_server.py:378 — Deletion with NO predicate is a whole-row
    tombstone, applied through batch_mutate to two CFs × ten keys."""
    from apache_cassandra_spark.model import Deletion, Mutation

    keys = [f"key_{i}" for i in range(11, 21)]
    for key in keys:
        for cf in ("Standard1", "Standard2"):
            ins(engine, "Keyspace1", cf, key, b"c1", b"value1", 0)
            ins(engine, "Keyspace1", cf, key, b"c2", b"value2", 0)
    muts = {key: {cf: [Mutation(deletion=Deletion(timestamp=20))] for cf in ("Standard1", "Standard2")} for key in keys}
    engine.batch_mutate("Keyspace1", muts, durable=False)
    for cf in ("Standard1", "Standard2"):
        for key in keys:
            assert slice_cols(engine, "Keyspace1", cf, key) == []


def test_batch_mutate_remove_super_columns_by_subnames(engine):
    """test_server.py:395 — sc-scoped Deletion with a NAMES predicate
    over the subcolumns, fanned over two super CFs × ten keys."""
    from apache_cassandra_spark.model import Deletion, Mutation

    keys = [f"key_{i}" for i in range(11, 21)]
    for key in keys:
        for cf in ("Super1", "Super2"):
            ins(engine, "Keyspace1", cf, key, _i64(4), b"value4", 0, sc=b"sc1")
            ins(engine, "Keyspace1", cf, key, _i64(5), b"value5", 0, sc=b"sc2")
            ins(engine, "Keyspace1", cf, key, _i64(6), b"value6", 0, sc=b"sc2")
    muts = {
        key: {
            cf: [
                Mutation(deletion=Deletion(timestamp=20, super_column=b"sc1",
                                           predicate=SlicePredicate(column_names=[_i64(4)]))),
                Mutation(deletion=Deletion(timestamp=20, super_column=b"sc2",
                                           predicate=SlicePredicate(column_names=[_i64(5), _i64(6)]))),
            ]
            for cf in ("Super1", "Super2")
        }
        for key in keys
    }
    engine.batch_mutate("Keyspace1", muts, durable=False)
    for cf in ("Super1", "Super2"):
        for key in keys:
            assert slice_cols(engine, "Keyspace1", cf, key, sc=b"sc1") == []
            assert slice_cols(engine, "Keyspace1", cf, key, sc=b"sc2") == []


def test_super_cf_remove_supercolumn_and_resurrect(engine):
    """test_server.py:720 — remove() scoped to one supercolumn: only sc2
    dies, sc1 and the standard CF stay; re-insert below the tombstone
    stays dead, above it resurrects; subcolumn slice agrees."""
    _insert_simple(engine)
    _insert_super(engine)
    engine.remove("Keyspace1", "key1", ColumnPath("Super1", super_column=b"sc2"), 5, durable=False)
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc2") == []
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc1") == [(_i64(4), b"value4", 0)]
    assert slice_cols(engine, "Keyspace1", "Standard1", "key1") == [
        (b"c1", b"value1", 0),
        (b"c2", b"value2", 0),
    ]
    # older timestamp stays shadowed
    ins(engine, "Keyspace1", "Super1", "key1", _i64(5), b"value5", 1, sc=b"sc2")
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc2") == []
    # newer timestamp resurrects
    ins(engine, "Keyspace1", "Super1", "key1", _i64(5), b"value5", 6, sc=b"sc2")
    assert slice_cols(engine, "Keyspace1", "Super1", "key1", sc=b"sc2") == [(_i64(5), b"value5", 6)]


COLLATED = (  # test_server.py:796 — "the collated ordering rather than ascii"
    ['0', '1', '10', '11', '12', '13', '14', '15', '16', '17', '18', '19', '2',
     '20', '21', '22', '23', '24', '25', '26', '27', '28', '29', '3', '30', '31',
     '32', '33', '34', '35', '36', '37', '38', '39', '4', '40', '41', '42', '43',
     '44', '45', '46', '47', '48', '49', '5', '50', '51', '52', '53', '54', '55',
     '56', '57', '58', '59', '6', '60', '61', '62', '63', '64', '65', '66', '67',
     '68', '69', '7', '70', '71', '72', '73', '74', '75', '76', '77', '78', '79',
     '8', '80', '81', '82', '83', '84', '85', '86', '87', '88', '89', '9', '90',
     '91', '92', '93', '94', '95', '96', '97', '98', '99', 'a', '-a', 'b', '-b']
)


@pytest.fixture()
def collating_engine(spark, tmp_path):
    """test_range_collation/test_range_partial ran under
    CollatingOrderPreservingPartitioner (Collator.getInstance(en_US)
    keys: punctuation primary-ignorable)."""
    from apache_cassandra_spark.functions.tokens import CollatingOrderPreservingPartitioner

    catalog = Catalog.from_dict({"Keyspace1": {"Standard1": {"compare_with": "BytesType"}}})
    eng = Engine(spark, str(tmp_path), catalog, partitioner=CollatingOrderPreservingPartitioner())
    for key in COLLATED:
        ins(eng, "Keyspace1", "Standard1", key, key.encode(), b"v", 0)
    return eng


def _range_keys(engine, start, end, count=1000):
    from apache_cassandra_spark.model import KeyRange
    from apache_cassandra_spark.operators import read as R

    kr = KeyRange(start_key=start, end_key=end, count=count)
    rows = R.get_range_slices(engine.cf("Keyspace1", "Standard1"), BIG, kr).collect()
    return {r["key"] for r in rows}


def test_range_collation(collating_engine):
    """test_server.py:791 — the full scan sees every key, and the token
    order the count cap consumes is the COLLATED order ('-a' sorts with
    'a', not before '0')."""
    assert _range_keys(collating_engine, "", "") == set(COLLATED)
    # count truncation consumes collated order, not ascii order
    for n in (1, 8, 100, 101):
        assert _range_keys(collating_engine, "", "", count=n) == set(COLLATED[:n])


def test_range_partial(collating_engine):
    """test_server.py:801 — bounded/counted sub-ranges in collated order."""
    assert _range_keys(collating_engine, "a", "") == {"a", "-a", "b", "-b"}
    assert _range_keys(collating_engine, "", "15") == set(COLLATED[:8])
    assert _range_keys(collating_engine, "50", "51") == {"50", "51"}
    assert _range_keys(collating_engine, "1", "", count=10) == {
        "1", "10", "11", "12", "13", "14", "15", "16", "17", "18"}


def test_collation_token_order_matches_java_collator():
    """The partitioner's driver-side token reproduces the reference's
    hard-coded en_US collation sequence exactly."""
    from apache_cassandra_spark.functions.tokens import CollatingOrderPreservingPartitioner

    p = CollatingOrderPreservingPartitioner()
    assert sorted(COLLATED, key=p.token_of) == COLLATED


def test_batch_insert_super(engine):
    # test_server.py:610 — W2 batch_insert of _SUPER_COLUMNS into BOTH
    # Super1 and Super2 in one call, then _verify_super on each: sc1={4},
    # sc2={5,6}, subcolumns in Long comparator order
    from apache_cassandra_spark.model import Mutation
    from apache_cassandra_spark.operators import write as W

    muts = [
        Mutation(super_column=b"sc1", column_name=_i64(4), value=b"value4", timestamp=0),
        Mutation(super_column=b"sc2", column_name=_i64(5), value=b"value5", timestamp=0),
        Mutation(super_column=b"sc2", column_name=_i64(6), value=b"value6", timestamp=0),
    ]
    for cf_name, batch in W.batch_insert("key1", {"Super1": muts, "Super2": muts}).items():
        engine.store.apply("Keyspace1", cf_name, batch, durable=False)
    for cf in ("Super1", "Super2"):
        assert slice_cols(engine, "Keyspace1", cf, "key1", sc=b"sc1") == [
            (_i64(4), b"value4", 0)
        ]
        assert slice_cols(engine, "Keyspace1", cf, "key1", sc=b"sc2") == [
            (_i64(5), b"value5", 0),
            (_i64(6), b"value6", 0),
        ]


def test_long_order(engine):
    # test_server.py:253 — 243 8-byte-long column names inserted in
    # numeric order; an unbounded slice returns them in LongType
    # comparator order (numeric, not lexical-bytes)
    names = [_i64(i) for i in range(0, 104294967296, 429496729)]
    for name in names:
        ins(engine, "Keyspace1", "StandardLong1", "key1", name, b"v", 0)
    got = [c for c, _, _ in slice_cols(engine, "Keyspace1", "StandardLong1", "key1")]
    assert got == names


def test_empty_range(engine):
    # test_server.py:769 — range scans over empty CFs return no rows,
    # before and after unrelated inserts into a different CF
    from apache_cassandra_spark.model import KeyRange

    kr = KeyRange(start_key="", end_key="", count=1000)
    pred = SlicePredicate(column_names=[b"c1"])
    assert engine.get_range_slices("Keyspace1", "Standard1", pred, kr).count() == 0
    _insert_simple(engine)  # Standard1 now has rows; Super1 still empty
    assert engine.get_range_slices("Keyspace1", "Super1", pred, kr).count() == 0


def test_range_with_remove(engine):
    # test_server.py:774 — after tombstoning the addressed columns, the
    # key survives the range scan as a ghost KeySlice with empty columns
    from apache_cassandra_spark.model import KeyRange

    _insert_simple(engine)
    kr = KeyRange(start_key="key1", end_key="", count=1000)
    pred1 = SlicePredicate(column_names=[b"c1"])
    rows = engine.get_range_slices("Keyspace1", "Standard1", pred1, kr).collect()
    assert rows and rows[0]["key"] == "key1"

    engine.remove("Keyspace1", "key1", ColumnPath("Standard1", column=b"c1"), 1, durable=False)
    engine.remove("Keyspace1", "key1", ColumnPath("Standard1", column=b"c2"), 1, durable=False)
    full = KeyRange(start_key="", end_key="", count=1000)
    ghosts = engine.get_range_slices(
        "Keyspace1", "Standard1", SlicePredicate(column_names=[b"c1", b"c2"]), full,
        include_empty_rows=True,
    ).collect()
    assert [(r["key"], r["column"]) for r in ghosts] == [("key1", None)]


def test_range_with_remove_cf(engine):
    # test_server.py:783 — whole-row removal: same ghost shape
    from apache_cassandra_spark.model import KeyRange

    _insert_simple(engine)
    engine.remove("Keyspace1", "key1", ColumnPath("Standard1"), 1, durable=False)
    full = KeyRange(start_key="", end_key="", count=1000)
    ghosts = engine.get_range_slices(
        "Keyspace1", "Standard1", SlicePredicate(column_names=[b"c1"]), full,
        include_empty_rows=True,
    ).collect()
    assert [(r["key"], r["column"]) for r in ghosts] == [("key1", None)]
