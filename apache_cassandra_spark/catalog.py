"""Keyspace / ColumnFamily catalog.

Mirrors the reference's static schema system — ``storage-conf.xml`` parsed
into ``CFMetaData`` (reference ``config/CFMetaData.java:30-87``,
``config/DatabaseDescriptor.java:1200-1365``) — as a plain-Python catalog
that can be loaded from a dict / JSON file. The reference has no ALTER
(0.6 limitation); we keep the catalog immutable per session for parity but
nothing prevents rebuilding it.

Fork fields carried over: ``bloom_columns`` (column-level bloom filters,
``CFMetaData.java:47``), ``domain_split`` (one logical CF split into 256
per-domain partitions, ``CFMetaData.java:49-53``), ``row_processors``
(compaction-time UDF chain, ``CFMetaData.java:58``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from apache_cassandra_spark.functions.comparators import AbstractComparator, get_comparator


@dataclass(frozen=True)
class CFDef:
    """Per-CF metadata (reference ``config/CFMetaData.java:30-87``)."""

    name: str
    column_type: str = "Standard"  # "Standard" | "Super"
    compare_with: str = "BytesType"
    compare_subcolumns_with: str = "BytesType"  # Super CFs only
    gc_grace_seconds: int = 10 * 24 * 3600  # CFMetaData.java default
    bloom_columns: bool = False  # fork: column-level bloom filters
    domain_split: bool = False  # fork: 256-way domain split
    row_processors: tuple[str, ...] = ()  # fork: IRowProcessor chain names
    comment: str = ""

    @property
    def is_super(self) -> bool:
        return self.column_type == "Super"

    @property
    def comparator(self) -> AbstractComparator:
        return get_comparator(self.compare_with)

    @property
    def subcomparator(self) -> AbstractComparator:
        return get_comparator(self.compare_subcolumns_with)


@dataclass(frozen=True)
class KeyspaceDef:
    """A namespace of column families (reference ``db/Table.java:52``)."""

    name: str
    column_families: tuple[CFDef, ...] = ()

    def cf(self, name: str) -> CFDef:
        for c in self.column_families:
            if c.name == name:
                return c
        raise KeyError(f"no such column family: {self.name}.{name}")


@dataclass
class Catalog:
    """All keyspaces known to the engine (``describe_keyspaces`` surface,
    reference ``thrift/CassandraServer.java:609-612``)."""

    keyspaces: dict[str, KeyspaceDef] = field(default_factory=dict)

    # -- DDL-ish meta operators (reference §2.3) ---------------------------
    def describe_keyspaces(self) -> list[str]:
        return sorted(self.keyspaces)

    def describe_keyspace(self, name: str) -> dict[str, dict[str, str]]:
        """Per-CF {Type, CompareWith, CompareSubcolumnsWith} — mirrors
        ``CassandraServer.describe_keyspace`` (``CassandraServer.java:514-540``)."""
        ks = self.keyspaces[name]
        out: dict[str, dict[str, str]] = {}
        for cf in ks.column_families:
            d = {"Type": cf.column_type, "CompareWith": cf.compare_with}
            if cf.is_super:
                d["CompareSubcolumnsWith"] = cf.compare_subcolumns_with
            out[cf.name] = d
        return out

    def add_keyspace(self, ks: KeyspaceDef) -> None:
        self.keyspaces[ks.name] = ks

    def keyspace(self, name: str) -> KeyspaceDef:
        return self.keyspaces[name]

    # -- (de)serialization -------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> Catalog:
        kss = {}
        for ks_name, cfs in d.items():
            cf_defs = tuple(
                CFDef(name=cf_name, **{k: (tuple(v) if k == "row_processors" else v) for k, v in attrs.items()})
                for cf_name, attrs in cfs.items()
            )
            kss[ks_name] = KeyspaceDef(name=ks_name, column_families=cf_defs)
        return cls(keyspaces=kss)

    @classmethod
    def load(cls, path: str) -> Catalog:
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        out: dict = {}
        for ks in self.keyspaces.values():
            out[ks.name] = {
                cf.name: {
                    "column_type": cf.column_type,
                    "compare_with": cf.compare_with,
                    "compare_subcolumns_with": cf.compare_subcolumns_with,
                    "gc_grace_seconds": cf.gc_grace_seconds,
                    "bloom_columns": cf.bloom_columns,
                    "domain_split": cf.domain_split,
                    "row_processors": list(cf.row_processors),
                }
                for cf in ks.column_families
            }
        return out

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


#: The reference's test fixture schema (test/conf/storage-conf.xml:42-86),
#: used by our test suite for parity with the reference's unit tests.
FIXTURE_CATALOG = Catalog.from_dict(
    {
        "Keyspace1": {
            "Standard1": {"compare_with": "BytesType"},
            "Standard2": {"compare_with": "UTF8Type"},
            "StandardLong1": {"compare_with": "LongType"},
            "StandardByUUID1": {"compare_with": "TimeUUIDType"},
            "StandardFresh1": {"compare_with": "FreshTimestampType"},
            "Super1": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "LongType"},
            "Super4": {"column_type": "Super", "compare_with": "BytesType", "compare_subcolumns_with": "UTF8Type"},
        },
        "Keyspace2": {
            "Standard1": {"compare_with": "BytesType"},
            "Standard1c": {"compare_with": "BytesType", "bloom_columns": True},
        },
    }
)
