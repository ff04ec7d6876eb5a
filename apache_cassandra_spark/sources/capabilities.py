"""Decode-capability surfacing (r13 verdict "What's missing" #3).

The ``br``/``zstd`` HTTP content codings inflate through ctypes
bindings to the SYSTEM shared libraries (:mod:`.brotli` /
:mod:`.zstd`); the JPEG fast path rides Pillow/libjpeg. All three
degrade HONESTLY when absent — rows keep typed ``unsupported`` flags
instead of decoded bytes — but on a cluster image without the shared
libraries a whole modality can quietly turn into flagged rows and a
user reading only the happy-path columns may not notice.
:func:`decode_capabilities` makes the degradation inspectable, and
:func:`warn_once_if_degraded` logs it exactly once per interpreter
from the decode front doors (``warc.decode_http_bodies`` /
``warc.read_wat``), so the fact lands in the DRIVER log of any job
that would be affected. One log line per process, never per row —
the probes are all cached by their own modules.
"""

from __future__ import annotations

import logging

_log = logging.getLogger("apache_cassandra_spark.capabilities")

#: process-wide once-guard for the degradation warning
_WARNED = {"done": False}


def decode_capabilities() -> dict[str, bool]:
    """Probe every optional decode dependency once and report
    availability: ``brotli`` / ``zstd`` (system shared libraries via
    ctypes — RFC 7932 / RFC 8878 content codings), ``brotli_encoder``
    (the encode side, test-fixture only), and ``pil_jpeg``
    (Pillow/libjpeg fast path; the from-scratch T.81 decoder works
    regardless, so ``False`` here means slower, not absent)."""
    from apache_cassandra_spark.analytics.codecs import _pil_available
    from apache_cassandra_spark.sources import brotli, zstd

    return {
        "brotli": brotli.available(),
        "brotli_encoder": brotli.encoder_available(),
        "zstd": zstd.available(),
        "pil_jpeg": _pil_available(),
    }


def warn_once_if_degraded(context: str) -> dict[str, bool]:
    """Log ONE warn-level line naming the missing decode libraries (if
    any) and the flag contract degraded rows will carry; return the
    capability dict either way. Driver-side call sites only — the
    probe must not run per executor task."""
    caps = decode_capabilities()
    missing = [k for k in ("brotli", "zstd") if not caps[k]]
    if missing and not _WARNED["done"]:
        _WARNED["done"] = True
        _log.warning(
            "%s: system librar%s for %s not found — HTTP bodies with "
            "matching Content-/Transfer-Encoding will keep their raw "
            "bytes and carry an 'unsupported' http_decode_error flag "
            "instead of decoding (check the flag column before "
            "assuming the modality is covered)",
            context,
            "y" if len(missing) == 1 else "ies",
            "/".join(missing),
        )
    return caps
