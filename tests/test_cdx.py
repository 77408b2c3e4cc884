"""CDX index source (sources/cdx.py): field parsing on hand-written
CDXJ lines, malformed-line drop, span coalescing laws (gap=0 adjacency,
record coverage, big-gap single span), and validation."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.sources.cdx import coalesce_fetch_ranges, parse_cdx


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


GOOD = (
    'com,example)/a 20260101000000 {"url": "https://example.com/a", '
    '"mime": "text/html", "status": "200", "digest": "sha1:AB12", '
    '"length": "500", "offset": "1000", "filename": "f-0.warc.gz"}'
)


def test_parse_fields_and_malformed_drop(spark):
    lines = [
        GOOD,
        "not a cdx line at all",          # no shape
        "com,x)/b 2026 {}",               # timestamp not 14 digits
        'com,x)/c 20260101000001 {"status": "301"}',  # sparse json ok
    ]
    out = parse_cdx(_lines_df(spark, lines)).collect()
    assert len(out) == 2
    r = {x["surt_key"]: x for x in out}
    g = r["com,example)/a"]
    assert g["timestamp"] == "20260101000000"
    assert g["url"] == "https://example.com/a"
    assert (g["status"], g["length"], g["offset"]) == (200, 500, 1000)
    assert g["filename"] == "f-0.warc.gz"
    sparse = r["com,x)/c"]
    assert sparse["status"] == 301 and sparse["offset"] is None


def _ranges_df(spark, rows):
    return spark.createDataFrame(
        rows, "filename string, offset long, length long"
    )


def test_gap_zero_merges_only_adjacent_or_overlapping(spark):
    rows = [
        ("f", 0, 100),     # [0,100)
        ("f", 100, 50),    # adjacent -> same span
        ("f", 151, 10),    # 1-byte gap -> new span
    ]
    out = {
        r["span_id"]: r
        for r in coalesce_fetch_ranges(_ranges_df(spark, rows), gap=0).collect()
    }
    assert len(out) == 2
    assert (out[1]["span_start"], out[1]["span_end"], out[1]["n_records"]) == (
        0, 150, 2,
    )
    assert (out[2]["span_start"], out[2]["span_end"]) == (151, 161)


def test_big_gap_single_span_and_coverage(spark):
    rows = [("f", i * 10_000, 500) for i in range(20)] + [
        ("g", 5, 10), ("g", 1_000_000, 10),
    ]
    spans = coalesce_fetch_ranges(
        _ranges_df(spark, rows), gap=10_000
    ).collect()
    by_file = {}
    for s in spans:
        by_file.setdefault(s["filename"], []).append(s)
    assert len(by_file["f"]) == 1 and by_file["f"][0]["n_records"] == 20
    assert by_file["f"][0]["span_bytes"] == 19 * 10_000 + 500
    assert len(by_file["g"]) == 2
    # coverage law: every record's byte range sits inside its file's spans
    for fn, off, ln in rows:
        assert any(
            s["span_start"] <= off and off + ln <= s["span_end"]
            for s in by_file[fn]
        )


def test_unsorted_input_and_validation(spark):
    rows = [("f", 200, 50), ("f", 0, 100), ("f", 100, 50)]
    out = coalesce_fetch_ranges(_ranges_df(spark, rows), gap=0).collect()
    assert [r["span_id"] for r in sorted(out, key=lambda r: r["span_start"])] \
        == [1, 2]
    with pytest.raises(ValueError):
        coalesce_fetch_ranges(_ranges_df(spark, rows), gap=-1)
