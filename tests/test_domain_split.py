"""Fork domain-split CFs (CFMetaData.java:49-53, OdklDomainPartitioner):
physical partitioning by key domain + partition pruning on point reads."""

import pytest

from apache_cassandra_spark.catalog import Catalog
from apache_cassandra_spark.engine import Engine
from apache_cassandra_spark.model import ColumnPath, SlicePredicate, SliceRange
from apache_cassandra_spark.operators import read


@pytest.fixture()
def engine(spark, tmp_path):
    catalog = Catalog.from_dict(
        {"KS": {"Dom": {"compare_with": "UTF8Type", "domain_split": True}}}
    )
    return Engine(spark, str(tmp_path), catalog)


@pytest.fixture()
def loaded(engine):
    for key in ["user_ab", "user_cd", "other_ab", "x"]:
        engine.insert("KS", key, ColumnPath("Dom", column=b"c"), key.encode(), 1)
    return engine


def test_domain_split_layout_on_disk(loaded):
    import os

    cells_dir = loaded.store._cells_dir("KS", "Dom")
    doms = sorted(d for d in os.listdir(cells_dir) if d.startswith("_dom="))
    assert doms == ["_dom=0x", "_dom=ab", "_dom=cd"]


def test_point_read_prunes_partitions(loaded):
    cf = loaded.cf("KS", "Dom")
    df = read.get_slice(cf, "user_ab", SlicePredicate(slice_range=SliceRange(count=10)))
    rows = df.collect()
    assert len(rows) == 1 and bytes(rows[0]["value"]) == b"user_ab"
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition filter on _dom reached the scan
    assert "_dom" in plan and ("PartitionFilters" in plan or "partitionFilters" in plan)


def test_multiget_across_domains(loaded):
    cf = loaded.cf("KS", "Dom")
    pred = SlicePredicate(slice_range=SliceRange(count=10))
    rows = read.multiget_slice(cf, ["user_ab", "user_cd", "nope"], pred).collect()
    assert sorted(r["key"] for r in rows) == ["user_ab", "user_cd"]


def test_lww_and_delete_still_work_on_domain_cf(loaded):
    loaded.insert("KS", "user_ab", ColumnPath("Dom", column=b"c"), b"v2", 5)
    cf = loaded.cf("KS", "Dom")
    r = read.get(cf, "user_ab", ColumnPath("Dom", column=b"c")).collect()
    assert bytes(r[0]["value"]) == b"v2"
    loaded.remove("KS", "user_ab", ColumnPath("Dom"), 9)
    cf = loaded.cf("KS", "Dom")
    assert read.get_count(cf, "user_ab").collect()[0]["count"] == 0


def test_compaction_preserves_domain_layout(loaded):
    import os

    from apache_cassandra_spark.operators.maintenance import compact

    loaded.remove("KS", "x", ColumnPath("Dom"), 5, ldt=100)
    compact(loaded.store, "KS", "Dom", gc_grace_seconds=0)
    cells_dir = loaded.store._cells_dir("KS", "Dom")
    doms = sorted(d for d in os.listdir(cells_dir) if d.startswith("_dom="))
    assert doms == ["_dom=ab", "_dom=cd"]  # 'x' row purged, layout intact
    cf = loaded.cf("KS", "Dom")
    assert read.get_count(cf, "user_ab").collect()[0]["count"] == 1


def test_range_scan_over_domain_cf(loaded):
    from apache_cassandra_spark.model import KeyRange

    cf = loaded.cf("KS", "Dom")
    pred = SlicePredicate(slice_range=SliceRange(count=10))
    kr = KeyRange(start_token="", end_token="", count=10)
    assert read.get_range_slices(cf, pred, kr).count() == 4
