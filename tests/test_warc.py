"""WARC source (sources/warc.py): byte-level record walking, gzip member
decompression, header folding, HTTP splitting, and the Spark mapInPandas
surface."""

import gzip

import pytest

from kenlm_rs_spark.sources.warc import (
    build_warc_record,
    iter_warc_records,
    maybe_gunzip,
    parse_warc,
    split_http_response,
)


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n".encode()
        + body
    )


def test_roundtrip_multiple_records():
    recs = [
        build_warc_record("https://a/1", "2024-01-01T00:00:00Z", _http(b"<p>one</p>")),
        build_warc_record("https://a/2", "2024-01-02T00:00:00Z", _http(b"two", 404)),
    ]
    got = list(iter_warc_records(b"".join(recs)))
    assert len(got) == 2
    ver, hdrs, payload = got[0]
    assert ver == "WARC/1.0"
    assert hdrs["warc-target-uri"] == "https://a/1"
    assert hdrs["warc-type"] == "response"
    status, body = split_http_response(payload)
    assert (status, body) == (200, b"<p>one</p>")
    status2, body2 = split_http_response(got[1][2])
    assert (status2, body2) == (404, b"two")


def test_payload_may_contain_separator_bytes():
    # Content-Length framing must win over any \r\n\r\n inside the payload
    tricky = _http(b"a\r\n\r\nWARC/1.0\r\n\r\nb")
    data = build_warc_record("https://t/x", "2024-01-01T00:00:00Z", tricky)
    (_, hdrs, payload), = iter_warc_records(data)
    assert payload == tricky
    assert int(hdrs["content-length"]) == len(tricky)


def test_gzip_members_concatenated():
    r1 = build_warc_record("https://g/1", "2024-01-01T00:00:00Z", _http(b"x"))
    r2 = build_warc_record("https://g/2", "2024-01-01T00:00:00Z", _http(b"yy"))
    blob = gzip.compress(r1) + gzip.compress(r2)
    assert maybe_gunzip(blob) == r1 + r2
    uris = [h["warc-target-uri"] for _, h, _ in iter_warc_records(blob)]
    assert uris == ["https://g/1", "https://g/2"]


def test_folded_header_unfolds():
    data = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Target-URI: https://long/\r\n"
        b" continued-path\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    (_, hdrs, payload), = iter_warc_records(data)
    assert hdrs["warc-target-uri"] == "https://long/ continued-path"
    assert payload == b"abc"


def test_non_http_payload_passthrough():
    data = build_warc_record(
        "urn:info", "2024-01-01T00:00:00Z", b"software: test", warc_type="warcinfo"
    )
    (_, hdrs, payload), = iter_warc_records(data)
    assert hdrs["warc-type"] == "warcinfo"
    assert split_http_response(payload) == (None, b"software: test")


def test_truncated_payload_raises():
    good = build_warc_record("https://t/1", "2024-01-01T00:00:00Z", _http(b"abcdef"))
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(good[:-12]))
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"NOT-WARC\r\n\r\n"))


def test_parse_warc_spark_surface(spark):
    recs = b"".join(
        build_warc_record(
            f"https://s/{i}", "2024-01-03T00:00:00Z", _http(f"body{i}".encode())
        )
        for i in range(3)
    )
    df = spark.createDataFrame(
        [(42, bytearray(recs))], "file_id long, content binary"
    )
    out = parse_warc(df, keep_cols=["file_id"]).collect()
    assert [r["record_seq"] for r in out] == [0, 1, 2]
    assert all(r["file_id"] == 42 for r in out)
    assert [bytes(r["body"]) for r in out] == [b"body0", b"body1", b"body2"]
    assert out[1]["target_uri"] == "https://s/1"
    assert out[0]["http_status"] == 200
    assert out[0]["content_length"] == len(_http(b"body0"))


def test_extract_sql_expr_matches_python_twin():
    # oracle-side RE2-safe chain == the frozen Python/Spark extractor
    import duckdb

    from kenlm_rs_spark.pipeline.extract import extract_sql_expr, extract_text_py

    cases = [
        "<html><body>plain words</body></html>",
        '<script a="b">x</script>kept<style>y{}</style>',
        "a &amp;&lt;&gt;&quot;&#39;&nbsp; b",
        "no markup at all",
        "  spaced\t\tout\r\n lines ",
        "<SCRIPT>not stripped (case-sensitive, both engines)</html>",
        "",
    ]
    con = duckdb.connect()
    for html in cases:
        got = con.sql(
            f"SELECT {extract_sql_expr('h')} AS t FROM (SELECT ? AS h)",
            params=[html],
        ).fetchone()[0]
        assert got == extract_text_py(html), html
