"""Property fuzz for the binary WARC walker: random record streams with
random chunk boundaries must walk identically to one-big-chunk, clean
streams must recover every record exactly, and corruptions must never
kill the walk or desync past the next intact record."""

import gzip
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.sources import warc

PAYLOAD_ATOMS = [
    b"plain text ",
    b"\x00\x01\xff\xfe binary ",
    b"WARC/1.0\r\n",        # embedded magic — the WET splitter's nemesis
    b"\r\n\r\n",            # embedded separator
    b"Content-Length: 99\r\n",  # embedded header-lookalike
    "unicode café ".encode("utf-8"),
    b"",
]


def _mk_record(rnd, idx, safe=False):
    if safe:
        payload = b"safe payload %d " % idx * rnd.randint(0, 4)
    else:
        payload = b"".join(rnd.choices(PAYLOAD_ATOMS, k=rnd.randint(0, 6)))
    uri = f"http://fuzz.example/{idx}".encode()
    return payload, (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


def _chunked(data, rnd):
    out, i = [], 0
    while i < len(data):
        step = rnd.randint(1, 37)
        out.append(data[i : i + step])
        i += step
    return out


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**9), n=st.integers(0, 8))
def test_clean_stream_exact_recovery_any_chunking(seed, n):
    rnd = random.Random(seed)
    payloads, blobs = [], []
    for i in range(n):
        p, b = _mk_record(rnd, i)
        payloads.append(p)
        blobs.append(b)
    data = b"".join(blobs)
    recs = list(warc.walk_warc_records(_chunked(data, rnd)))
    assert [r[3] for r in recs] == payloads
    assert all(r[4] is True and r[5] is None for r in recs)
    # chunking-invariance: byte-identical to the single-chunk walk
    assert recs == list(warc.walk_warc_records([data] if data else []))


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**9))
def test_corruption_never_desyncs_past_next_record(seed):
    """Clip/garble ONE middle record; the records before it AND after it
    must still come back exact, and flagged rows must carry a typed
    reason. Records AFTER the damage use fake-start-free payloads: a
    payload-embedded fake record start inside the LOST region can
    legitimately extend the collateral (the walker validates header
    shape before trusting a Content-Length, but a payload can embed a
    fully valid-looking fake record — unresolvable without a trusted
    anchor, and honestly flagged either way)."""
    rnd = random.Random(seed)
    parts, payloads = [], []
    for i in range(5):
        p, b = _mk_record(rnd, i, safe=i >= 2)
        payloads.append(p)
        parts.append(b)
    kind = rnd.choice(["clip", "garbage", "nolen"])
    if kind == "clip":  # overrun: declared length eats into the next record
        parts[2] = parts[2].replace(
            b"Content-Length: " + str(len(payloads[2])).encode(),
            b"Content-Length: " + str(len(payloads[2]) + 7).encode(),
            1,
        )
    elif kind == "garbage":
        parts[2] = b"gArBaGe not a record\r\n" + parts[2]
    else:  # strip the Content-Length header entirely
        parts[2] = parts[2].replace(
            b"Content-Length: " + str(len(payloads[2])).encode() + b"\r\n", b"", 1
        )
    recs = list(warc.walk_warc_records(_chunked(b"".join(parts), rnd)))
    got = [r[3] for r in recs]
    # the two records before the damage are exact
    assert got[:2] == payloads[:2]
    # the last record always survives the resync
    assert payloads[4] in got
    clean = [r for r in recs if r[4]]
    assert all(r[5] is None for r in clean)
    flagged = [r for r in recs if not r[4]]
    assert all(isinstance(r[5], str) and r[5] for r in flagged)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**9), n=st.integers(1, 6))
def test_gzip_members_equal_plain_walk(seed, n):
    rnd = random.Random(seed)
    blobs = [_mk_record(rnd, i)[1] for i in range(n)]
    plain = list(warc.walk_warc_records([b"".join(blobs)]))
    gz = b"".join(gzip.compress(b) for b in blobs)
    via_gz = list(warc.walk_warc_records(warc._gzip_members(_chunked(gz, rnd))))
    assert plain == via_gz


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**9))
def test_truncation_at_any_point_is_flagged_not_fatal(seed):
    rnd = random.Random(seed)
    p, b = _mk_record(rnd, 0)
    cut = rnd.randint(1, len(b) - 1)
    recs = list(warc.walk_warc_records([b[:cut]]))
    # never raises; at most one clean record (if the cut only ate the
    # trailing separator bytes the record body may still frame short)
    assert all(len(r) == 6 for r in recs)
    if any(r[4] for r in recs):
        assert cut >= len(b) - 4  # only separator bytes were lost
