"""WARC (ISO 28500) source: parse Web ARChive files into one row per
record — the format Common-Crawl-style corpora actually arrive in, before
any parquet/Iceberg landing table exists.

Real byte-level parsing (no external libs):
- record = version line ``WARC/1.x`` + CRLF header block (with RFC-style
  continuation-line folding) + blank line + exactly ``Content-Length``
  payload octets + CRLF CRLF separator;
- per-record gzip members (the Common Crawl convention: each record is an
  independent gzip member, concatenated) are detected by magic and
  decompressed with stdlib zlib, member by member;
- ``response`` payloads are split into HTTP status / headers / body.

Scale shape (100 TB): one WARC file = one input row (spark.read.format
('binaryFile') or a table with a binary column); parsing is a narrow
mapInPandas stage — no shuffle, Arrow-batched, and each ~1 GB WARC file is
an independent work unit so parallelism = number of files. A single WARC
file must fit in executor memory (true of the 1 GB CC convention); for
larger archives, split on gzip-member boundaries upstream.

Reference relation: kenlm-rs consumes pre-extracted text (corpus source,
/root/reference/src/lib.rs); WARC ingestion is the step in front
of it that the north rule's Common-Crawl shape implies.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame

GZIP_MAGIC = b"\x1f\x8b"


def maybe_gunzip(data: bytes) -> bytes:
    """Decompress concatenated per-record gzip members; pass through
    uncompressed bytes unchanged."""
    if not data.startswith(GZIP_MAGIC):
        return data
    out, rest = [], data
    while rest.startswith(GZIP_MAGIC):
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        out.append(d.decompress(rest))
        out.append(d.flush())
        rest = d.unused_data
    out.append(rest)
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[str, dict, bytes]]:
    """Yield (version, headers, payload) per record. Headers are
    lower-cased keys; folded continuation lines are unfolded with a single
    space. Raises ValueError on a malformed record boundary."""
    data = maybe_gunzip(data)
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):  # tolerate stray separators
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        version = lines[0].strip()
        headers: dict[str, str] = {}
        last_key = None
        for line in lines[1:]:
            if line[:1] in (" ", "\t") and last_key:  # folded continuation
                headers[last_key] += " " + line.strip()
                continue
            k, _, v = line.partition(":")
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/invalid Content-Length at {pos}")
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("payload truncated")
        yield version, headers, data[body_start : body_start + clen]
        pos = body_start + clen
        # record separator (optional at EOF)
        if data.startswith(b"\r\n\r\n", pos):
            pos += 4


def split_http_response(payload: bytes) -> tuple[int | None, bytes]:
    """(status, body) from an HTTP response payload; (None, payload) when
    the payload isn't HTTP."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(b"\r\n\r\n")
    head = payload if sep < 0 else payload[:sep]
    body = b"" if sep < 0 else payload[sep + 4 :]
    parts = head.split(b"\r\n", 1)[0].split()
    try:
        return int(parts[1]), body
    except (IndexError, ValueError):
        return None, body


PARSE_SCHEMA_TAIL = (
    "record_seq int, warc_version string, warc_type string, "
    "target_uri string, warc_date string, content_length long, "
    "http_status int, body binary"
)


def parse_warc(
    df: DataFrame,
    content_col: str = "content",
    keep_cols: Iterable[str] = (),
) -> DataFrame:
    """One row per WARC record in each input file (a binary column). The
    per-file record order is preserved in ``record_seq``. ``keep_cols``
    are carried through from the file row (e.g. a path or file id)."""
    keep = list(keep_cols)
    in_schema = df.schema
    keep_ddl = "".join(
        f"{c} {in_schema[c].dataType.simpleString()}, " for c in keep
    )
    out_schema = keep_ddl + PARSE_SCHEMA_TAIL

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                raw = getattr(rec, content_col)
                raw = bytes(raw) if raw is not None else b""
                carried = {c: getattr(rec, c) for c in keep}
                for seq, (ver, hdrs, payload) in enumerate(
                    iter_warc_records(raw)
                ):
                    status, body = split_http_response(payload)
                    rows.append(
                        {
                            **carried,
                            "record_seq": seq,
                            "warc_version": ver,
                            "warc_type": hdrs.get("warc-type"),
                            "target_uri": hdrs.get("warc-target-uri"),
                            "warc_date": hdrs.get("warc-date"),
                            "content_length": len(payload),
                            "http_status": status,
                            "body": body,
                        }
                    )
            cols = keep + [
                "record_seq", "warc_version", "warc_type", "target_uri",
                "warc_date", "content_length", "http_status", "body",
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(*keep, content_col).mapInPandas(gen, out_schema)


def build_warc_record(
    uri: str, date: str, http_payload: bytes, warc_type: str = "response"
) -> bytes:
    """Serialize one WARC record (the writer twin used by tests)."""
    head = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\nContent-Length: {len(http_payload)}\r\n\r\n"
    ).encode()
    return head + http_payload + b"\r\n\r\n"
