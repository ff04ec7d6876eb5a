"""Property fuzz of the WET round trip (sources/warc.py): arbitrary
unicode payloads and URIs survive write→read byte-for-byte whenever the
framing contract holds, and the framing flag is exactly the predicate
the module documents (payload-trailing CRLFs are trimmed; embedded
record magic splits early; everything else round-trips)."""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.sources import warc

# payload alphabet mixes multibyte UTF-8, quotes, CR/LF (interior CRLF
# must survive), header-lookalike lines, and plain text
_payload_st = st.text(
    alphabet=st.sampled_from(list("abß語 \t\"'<>&:/-.\r\n")), min_size=0, max_size=40
)
_uri_st = st.text(
    alphabet=st.sampled_from(list("abc09-._~:/?#[]@!$&'()*+,;=%")), min_size=1, max_size=24
).map(lambda s: "http://h.example/" + s)


def _clean(payload: str) -> bool:
    """Does the module's framing contract promise an exact round trip?"""
    return warc.RECORD_MAGIC not in payload and not payload.endswith("\r\n")


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(_uri_st, _payload_st), min_size=1, max_size=6))
def test_wet_round_trip_property(spark, rows):
    data = [(i, uri, payload) for i, (uri, payload) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, url string, text string")
    out_dir = tempfile.mkdtemp(prefix="wet_prop_")
    warc.write_wet(df, out_dir)
    got = warc.read_wet(spark, out_dir).collect()

    want_clean = sorted((uri, p) for _, uri, p in data if _clean(p))
    got_clean = sorted((r["target_uri"], r["text"]) for r in got if r["framing_ok"])
    # every contract-clean payload round-trips byte-for-byte AND is
    # flagged ok; (multiple inputs can share a uri — compare multisets)
    for pair in want_clean:
        assert pair in got_clean, pair
    # and nothing flagged ok violates the byte-length identity
    for r in got:
        if r["framing_ok"]:
            assert len(r["text"].encode("utf-8")) == r["content_length"]
        else:
            assert len(r["text"].encode("utf-8")) != r["content_length"]
