"""decode_capabilities surfacing (r13 verdict "What's missing" #3): the
report's shape, the once-per-process warn on missing shared libraries,
and silence when everything is present."""

import logging

from apache_cassandra_spark.sources import capabilities


def _reset():
    capabilities._WARNED["done"] = False


def test_report_shape_and_this_container():
    caps = capabilities.decode_capabilities()
    assert set(caps) == {"brotli", "brotli_encoder", "zstd", "pil_jpeg"}
    assert all(isinstance(v, bool) for v in caps.values())
    # this sandbox ships libbrotli + libzstd (the r13 bindings were
    # verified live against them) — if this fails the env changed and
    # every br/zstd round-trip test would be silently skipping
    assert caps["brotli"] and caps["zstd"]


def test_warn_fires_once_when_degraded(monkeypatch, caplog):
    from apache_cassandra_spark.sources import brotli, zstd

    monkeypatch.setattr(brotli, "available", lambda: False)
    monkeypatch.setattr(zstd, "available", lambda: False)
    _reset()
    with caplog.at_level(logging.WARNING, "apache_cassandra_spark.capabilities"):
        caps = capabilities.warn_once_if_degraded("decode_http_bodies")
        capabilities.warn_once_if_degraded("read_wat")  # second call: silent
    assert caps["brotli"] is False and caps["zstd"] is False
    warns = [r for r in caplog.records if r.levelno == logging.WARNING]
    assert len(warns) == 1
    msg = warns[0].getMessage()
    assert "brotli/zstd" in msg and "unsupported" in msg
    assert "decode_http_bodies" in msg


def test_no_warn_when_everything_present(caplog):
    _reset()
    with caplog.at_level(logging.WARNING, "apache_cassandra_spark.capabilities"):
        caps = capabilities.warn_once_if_degraded("decode_http_bodies")
    assert caps["brotli"] and caps["zstd"]
    assert not [r for r in caplog.records if r.levelno == logging.WARNING]
    # the once-guard stays un-tripped when nothing is missing, so a
    # LATER degradation (executor-side reload, test monkeypatch) still
    # gets its line
    assert capabilities._WARNED["done"] is False
