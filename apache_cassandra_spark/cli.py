"""Interactive CLI — parity with the reference's ANTLR grammar
(``cli/Cli.g:100-139``, executor ``cli/CliClient.java:64-76``):

    GET    ks.cf['key']                 whole-row slice
    GET    ks.cf['key']['col']          point lookup
    GET    ks.cf['key']['sc']['col']    super-CF subcolumn
    SET    ks.cf['key']['col'] = 'val'  upsert
    DEL    ks.cf['key']                 row tombstone
    DEL    ks.cf['key']['col']          column tombstone
    COUNT  ks.cf['key']                 live-column count
    SHOW KEYSPACES | SHOW VERSION | SHOW CLUSTER NAME
    DESCRIBE KEYSPACE <ks>
    CONNECT <store-root>                bind to another store (CliSession)

A thin REPL over the same operators — no logic of its own (like the
reference CLI, which shells into the Thrift methods).
"""

from __future__ import annotations

import re
import time

from apache_cassandra_spark.engine import Engine
from apache_cassandra_spark.model import ColumnPath, SlicePredicate, SliceRange

_PATH = re.compile(
    r"^(?P<ks>\w+)\.(?P<cf>\w+)"
    r"\['(?P<key>[^']*)'\]"
    r"(?:\['(?P<a>[^']*)'\])?"
    r"(?:\['(?P<b>[^']*)'\])?\s*$"
)


def _path(engine: Engine, expr: str) -> tuple[str, str, str, bytes | None, bytes | None]:
    m = _PATH.match(expr.strip())
    if not m:
        raise ValueError(f"cannot parse path: {expr!r}")
    ks, cf, key = m.group("ks"), m.group("cf"), m.group("key")
    a = m.group("a").encode() if m.group("a") is not None else None
    b = m.group("b").encode() if m.group("b") is not None else None
    is_super = engine.catalog.keyspace(ks).cf(cf).is_super
    if b is not None:
        sc, col = a, b
    elif a is not None and is_super:
        sc, col = a, None
    else:
        sc, col = None, a
    return ks, cf, key, sc, col


def execute(engine: Engine, line: str) -> str:
    """Execute one CLI statement, return printable output."""
    line = line.strip().rstrip(";")
    if not line:
        return ""
    upper = line.upper()

    if upper == "SHOW KEYSPACES":
        return "\n".join(engine.describe_keyspaces())
    if upper == "SHOW VERSION":
        return engine.describe_version()
    if upper == "SHOW CLUSTER NAME":
        return engine.describe_cluster_name()
    if upper.startswith("DESCRIBE KEYSPACE"):
        name = line.split()[-1]
        desc = engine.describe_keyspace(name)
        return "\n".join(f"{cf}: {attrs}" for cf, attrs in sorted(desc.items()))

    verb, _, rest = line.partition(" ")
    verb = verb.upper()

    if verb == "GET":
        ks, cf, key, sc, col = _path(engine, rest)
        if col is not None:
            df = engine.get(ks, key, ColumnPath(cf, super_column=sc, column=col))
        else:
            pred = SlicePredicate(slice_range=SliceRange(count=100))
            df = engine.get_slice(ks, key, cf, pred, super_column=sc)
        rows = df.collect()
        if not rows:
            return "not found"
        out = []
        for r in rows:
            scs = f"['{bytes(r['sc']).decode(errors='replace')}']" if r["sc"] is not None else ""
            out.append(
                f"{scs}[{bytes(r['column']).decode(errors='replace')}] "
                f"= {bytes(r['value']).decode(errors='replace') if r['value'] is not None else None} "
                f"(ts={r['ts']})"
            )
        return "\n".join(out)

    if verb == "SET":
        target, _, value = rest.partition("=")
        value = value.strip().strip("'")
        ks, cf, key, sc, col = _path(engine, target)
        if col is None:
            raise ValueError("SET needs a column coordinate")
        engine.insert(ks, key, ColumnPath(cf, super_column=sc, column=col), value.encode(), int(time.time() * 1e6))
        return "ok"

    if verb == "DEL":
        ks, cf, key, sc, col = _path(engine, rest)
        engine.remove(ks, key, ColumnPath(cf, super_column=sc, column=col), int(time.time() * 1e6))
        return "ok"

    if verb == "COUNT":
        ks, cf, key, sc, col = _path(engine, rest)
        return str(engine.get_count(ks, key, cf, super_column=sc))

    raise ValueError(f"unknown statement: {line!r}")


class CliSession:
    """Connection-holding CLI session — the ``CONNECT`` statement
    (``cli/Cli.g:85-86``: ``K_CONNECT host SLASH port``). The reference
    CLI dials a server by host/port; the in-process analog binds to a
    STORE ROOT: ``CONNECT <root>`` loads the catalog the engine persisted
    at ``<root>/catalog.json`` and rebinds every subsequent statement to
    that store (the CliClient keeps exactly this kind of current-
    connection state). All other statements delegate to :func:`execute`
    on the current engine."""

    def __init__(self, spark, engine: Engine | None = None) -> None:
        self.spark = spark
        self.engine = engine

    def connect(self, root: str) -> str:
        import os

        from apache_cassandra_spark.catalog import Catalog

        from apache_cassandra_spark.engine import restore_store_kwargs

        cat_path = os.path.join(root, "catalog.json")
        if not os.path.isfile(cat_path):
            raise ValueError(f"no store at {root!r} (missing catalog.json)")
        # shared restore path (cluster name + partitioner — see
        # restore_store_kwargs for the legacy/unknown-name semantics);
        # the previous session's partitioner NEVER carries over: it
        # describes the last store's layout, not this one's
        kwargs = restore_store_kwargs(root)
        if self.engine is not None:
            # the session's auth CONFIG travels with the connection (the
            # reference CLI's credentials are client-side state); login
            # STATE does not — the fresh engine starts logged out, so a
            # SimpleAuthenticator session must login again after CONNECT
            # rather than silently downgrading to AllowAll
            kwargs["authenticator"] = self.engine.authenticator
        self.engine = Engine(self.spark, root, Catalog.load(cat_path), **kwargs)
        return f'Connected to "{self.engine.describe_cluster_name()}" at {root}'

    def execute(self, line: str) -> str:
        stripped = line.strip().rstrip(";")
        if stripped.upper().startswith("CONNECT "):
            return self.connect(stripped[len("CONNECT ") :].strip().strip("'\""))
        if self.engine is None:
            raise ValueError("not connected — run CONNECT <store-root> first")
        return execute(self.engine, line)


def repl(engine: Engine) -> None:  # pragma: no cover - interactive
    session = CliSession(engine.spark, engine)
    while True:
        try:
            line = input("widecolumn> ")
        except EOFError:
            break
        if line.strip().upper() in ("QUIT", "EXIT"):
            break
        try:
            print(session.execute(line))
        except Exception as e:  # noqa: BLE001 - REPL surfaces all errors
            print(f"error: {e}")
