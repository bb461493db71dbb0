"""WARC/WET source (r10, VERDICT r9 #5) and HTML extraction (#6)."""

import gzip

import pytest

from azure_airbnb_cdc_ingestion_pipeline_spark.sources.warc import (
    _gunzip_members,
    parse_warc_bytes,
)


def _rec(uri="http://x/1", body=b"hello world", version="WARC/1.0",
         clen=None, drop=()):
    h = [version.encode(),
         b"WARC-Type: response",
         b"WARC-Target-URI: " + uri.encode(),
         b"WARC-Date: 2024-01-01T00:00:00Z",
         b"WARC-Record-ID: <urn:uuid:t>",
         b"Content-Type: text/plain",
         b"Content-Length: "
         + (str(len(body)) if clen is None else clen).encode()]
    h = [x for x in h if not any(x.startswith(d) for d in drop)]
    return b"\r\n".join(h) + b"\r\n\r\n" + body + b"\r\n\r\n"


def test_plain_stream_multi_record():
    rows = list(parse_warc_bytes(_rec("http://a/1") + _rec("http://a/2"), "f"))
    assert [r.get("target_uri") for r in rows] == ["http://a/1", "http://a/2"]
    assert rows[0]["payload"] == b"hello world"
    assert rows[0]["warc_type"] == "response"
    assert rows[0]["content_length"] == 11


def test_gzip_multi_member():
    gz = gzip.compress(_rec("http://a/1")) + gzip.compress(_rec("http://a/2"))
    rows = list(parse_warc_bytes(gz, "f"))
    assert len(rows) == 2
    assert all(r.get("reject_reason") is None for r in rows)
    # offsets point at the member starts
    assert rows[0]["record_offset"] == 0 and rows[1]["record_offset"] > 0


@pytest.mark.parametrize(
    "bad, reason",
    [
        (_rec(clen="xx"), "bad_content_length"),
        (_rec(drop=(b"WARC-Record-ID",)), "missing_required_header"),
        (_rec(drop=(b"WARC-Date",)), "missing_required_header"),
        (_rec(version="WARC/9.9"), "unsupported_warc_version"),
        (_rec(version="HTTP/1.1 200 OK"), "bad_magic"),
    ],
)
def test_reject_then_resync(bad, reason):
    rows = list(parse_warc_bytes(bad + _rec("http://a/after"), "f"))
    assert [r.get("reject_reason") for r in rows] == [reason, None]
    assert rows[1]["target_uri"] == "http://a/after"


def test_truncated_payload_rejects():
    rows = list(parse_warc_bytes(_rec()[:-8], "f"))
    assert rows[0]["reject_reason"] == "payload_truncated"


def test_corrupt_gzip_member_resyncs():
    gz = gzip.compress(_rec("http://a/1"))
    buf = gz[:18] + b"\x00\x01\x02" + gzip.compress(_rec("http://a/2"))
    rows = list(parse_warc_bytes(buf, "f"))
    reasons = [r.get("reject_reason") for r in rows]
    assert "corrupt_gzip_member" in reasons
    assert any(r.get("target_uri") == "http://a/2" for r in rows)
    # and a truncated final member is its own reason
    assert list(_gunzip_members(gz[:-4]))[-1][2] == "truncated_gzip_member"


def test_header_fold_and_case_insensitive_lookup():
    raw = _rec().replace(
        b"WARC-Type: response", b"warc-type: RESPONSE\r\nX-Long: a\r\n\tb"
    )
    (row,) = parse_warc_bytes(raw, "f")
    assert row["warc_type"] == "response"  # case-folded on both axes
    assert row["headers"]["X-Long"] == "a b"  # LWS continuation folded


def test_binary_payload_exact():
    body = bytes(range(256)) * 3 + b"\r\n\r\nWARC/1.0\r\n"  # traps inside
    (row,) = parse_warc_bytes(_rec(body=body), "f")
    assert row["payload"] == body  # length-delimited, never scanned


def test_html_extract_text(spark):
    from pyspark.sql import functions as F

    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.text import (
        html_extract_text,
    )

    body = "This line of body copy is comfortably past the gate."
    html = (
        "<html><head><style>p{}</style><script>let s='</p>';</script></head>"
        "<body><nav>Home | About</nav>\n"
        "<p>Share</p><p>Tweet</p>\n"
        f"<div><p>{body}</p><p>a &amp; b &lt;tag&gt; that is also long"
        " enough to survive</p></div>"
        "<!-- comment --><footer>(c) corp</footer></body></html>"
    )
    out = (
        spark.range(1)
        .select(html_extract_text(F.lit(html)).alias("t"))
        .collect()[0]["t"]
    )
    assert out.splitlines() == [
        body,
        "a & b <tag> that is also long enough to survive",
    ]
