"""ThriftValidation parity (thrift/ThriftValidation.java:280-360):
malformed requests rejected before touching storage."""

import pytest

from apache_cassandra_spark.catalog import Catalog
from apache_cassandra_spark.engine import Engine
from apache_cassandra_spark.model import ColumnPath, Deletion, Mutation, SlicePredicate, SliceRange
from apache_cassandra_spark.validation import InvalidRequest


@pytest.fixture()
def engine(spark, tmp_path):
    catalog = Catalog.from_dict(
        {
            "KS": {
                "Std": {"compare_with": "UTF8Type"},
                "StdLong": {"compare_with": "LongType"},
                "Sup": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "LongType"},
            }
        }
    )
    return Engine(spark, str(tmp_path), catalog)


def test_empty_key_rejected(engine):
    with pytest.raises(InvalidRequest, match="empty"):
        engine.insert("KS", "", ColumnPath("Std", column=b"c"), b"v", 1)


def test_unknown_cf_rejected(engine):
    with pytest.raises(InvalidRequest, match="unknown column family"):
        engine.insert("KS", "k", ColumnPath("Nope", column=b"c"), b"v", 1)


def test_unknown_keyspace_rejected(engine):
    with pytest.raises(InvalidRequest, match="unknown keyspace"):
        engine.insert("Nope", "k", ColumnPath("Std", column=b"c"), b"v", 1)


def test_supercolumn_on_standard_cf_rejected(engine):
    with pytest.raises(InvalidRequest, match="supercolumn"):
        engine.insert("KS", "k", ColumnPath("Std", super_column=b"sc", column=b"c"), b"v", 1)


def test_column_without_supercolumn_on_super_cf_rejected(engine):
    with pytest.raises(InvalidRequest, match="without supercolumn"):
        engine.insert("KS", "k", ColumnPath("Sup", column=b"\0" * 8), b"v", 1)


def test_long_comparator_length_checked(engine):
    with pytest.raises(InvalidRequest, match="8 bytes"):
        engine.insert("KS", "k", ColumnPath("StdLong", column=b"short"), b"v", 1)
    engine.insert("KS", "k", ColumnPath("StdLong", column=b"\0" * 8), b"v", 1, durable=False)


def test_empty_column_name_rejected(engine):
    with pytest.raises(InvalidRequest, match="empty"):
        engine.insert("KS", "k", ColumnPath("Std", column=b""), b"v", 1)


def test_batch_mutate_validates_each_mutation(engine):
    bad = Mutation(column_name=b"c", value=b"v", timestamp=1, deletion=Deletion(timestamp=2))
    with pytest.raises(InvalidRequest, match="exactly one"):
        engine.batch_mutate("KS", {"k": {"Std": [bad]}})
    with pytest.raises(InvalidRequest, match="timestamp"):
        engine.batch_mutate("KS", {"k": {"Std": [Mutation(column_name=b"c", value=b"v")]}})


def test_slice_range_deletion_rejected(engine):
    d = Deletion(timestamp=1, predicate=SlicePredicate(slice_range=SliceRange()))
    with pytest.raises(InvalidRequest, match="column names"):
        engine.batch_mutate("KS", {"k": {"Std": [Mutation(deletion=d)]}})


def test_row_remove_without_column_ok(engine):
    engine.remove("KS", "k", ColumnPath("Std"), 5, durable=False)  # no exception


def test_bare_column_mutation_on_super_cf_rejected(engine):
    # reference ThriftValidation rejects a Column (no supercolumn) mutation
    # addressed at a Super CF
    m = Mutation(column_name=b"\x00" * 8, value=b"v", timestamp=1)
    with pytest.raises(InvalidRequest, match="supercolumn"):
        engine.batch_mutate("KS", {"k": {"Sup": [m]}})
