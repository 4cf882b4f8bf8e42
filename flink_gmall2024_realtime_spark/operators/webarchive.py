"""WARC (ISO 28500) web-archive ingestion — the Common Crawl path.

Large-scale pretraining corpora start life as WARC files: gzip members
concatenated back to back, one member per record, each record a block of
``WARC/1.0`` headers plus (for ``response`` records) a raw HTTP response
whose body is the page. The member-per-record convention is what makes
100 TB crawls range-readable — an index can point at (offset, length) and
a reader gunzips exactly one record.

This module implements the real walk with stdlib zlib only (the same
dependency stance as the PNG codec): multi-member gunzip, WARC header
parse, embedded HTTP status/header parse, and a tag-stripping text
extraction — per-row Arrow work via ``mapInPandas``, linear by
construction, no shuffle.

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no web-archive path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

import gzip
import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .codecguard import malformed_guard


def synth_warc_gz(seed: int) -> bytes:
    """Deterministic WARC.gz fixture: one warcinfo record followed by
    ``seed%6+1`` response records, EACH compressed as its own gzip member
    (mtime pinned to 0) and concatenated — the Common Crawl layout.

    Response k targets ``http://site{seed%1000}.example/page{k}``; every
    5th (seed+k)%5==0 is a ``404`` text/plain miss, the rest are ``200``
    text/html pages whose body is ``<html><body>w000 w001 ...`` with
    m = (seed + 3k) % 40 + 5 fixed-width words — so byte and token counts
    are exact seed arithmetic. Pages with (seed+k)%7==0 carry a 47-byte
    ``<script>``+``<style>`` prefix whose content must NOT count as
    text."""
    seed = int(seed)
    n = seed % 6 + 1

    def record(headers: list, body: bytes) -> bytes:
        head = "\r\n".join(headers + [f"Content-Length: {len(body)}", "", ""])
        return head.encode() + body + b"\r\n\r\n"

    out = []
    info = b"software: synth-warc/1.0\r\n"
    out.append(
        record(
            [
                "WARC/1.0",
                "WARC-Type: warcinfo",
                "WARC-Record-ID: <urn:synth:%d:info>" % seed,
                "WARC-Date: 2024-01-01T00:00:00Z",
                "Content-Type: application/warc-fields",
            ],
            info,
        )
    )
    for k in range(n):
        uri = f"http://site{seed % 1000}.example/page{k}"
        if (seed + k) % 5 == 0:
            body = b"not found"
            http = (
                b"HTTP/1.1 404 Not Found\r\n"
                b"Content-Type: text/plain\r\n"
                + b"Content-Length: %d\r\n\r\n" % len(body)
                + body
            )
        else:
            m = (seed + 3 * k) % 40 + 5
            text = " ".join(f"w{i:03d}" for i in range(m))
            noise = (
                "<script>var x = 1;</script><style>p { }</style>"
                if (seed + k) % 7 == 0
                else ""
            )
            body = (f"<html><body>{noise}{text}</body></html>").encode()
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html\r\n"
                + b"Content-Length: %d\r\n\r\n" % len(body)
                + body
            )
        out.append(
            record(
                [
                    "WARC/1.0",
                    "WARC-Type: response",
                    f"WARC-Target-URI: {uri}",
                    "WARC-Record-ID: <urn:synth:%d:%d>" % (seed, k),
                    "WARC-Date: 2024-01-01T00:00:00Z",
                    "Content-Type: application/http; msgtype=response",
                ],
                http,
            )
        )
    return b"".join(
        gzip.compress(r, compresslevel=6, mtime=0) for r in out
    )


def _gunzip_members(payload: bytes) -> list:
    """Decompress a concatenation of gzip members into one bytes object per
    member — the range-readable WARC convention. Fails loudly on trailing
    garbage or a truncated member."""
    members = []
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(payload[pos:]))
        if not d.eof:
            raise ValueError("truncated gzip member in WARC payload")
        consumed = len(payload) - pos - len(d.unused_data)
        pos += consumed
    return members


_TAG_RE = re.compile(rb"<[^>]*>")
# script/style CONTENT is not page text: drop whole elements before the
# tag strip (real extractors do this first; counting "var x = 1;" as four
# tokens poisons quality stats)
_NOISE_ELEMENT_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)


@malformed_guard
def parse_warc(payload: bytes) -> list:
    """REAL WARC record walk over a multi-member .warc.gz: gunzip each
    member, parse WARC headers (type, target URI, declared length), and
    for ``response`` records parse the embedded HTTP response — status
    code, Content-Type, exact body bytes by Content-Length — plus a
    tag-stripped whitespace token count for HTML bodies.

    Returns one tuple per response record:
    (rec_idx, uri, http_status, content_type, n_body_bytes, n_text_tokens).
    Raises ValueError on malformed members, headers, or length
    mismatches — never a silently short corpus."""
    rows = []
    idx = 0
    for member in _gunzip_members(payload):
        head_end = member.find(b"\r\n\r\n")
        if head_end < 0 or not member.startswith(b"WARC/"):
            raise ValueError("malformed WARC record header")
        headers = {}
        lines = member[:head_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        block = member[head_end + 4 : head_end + 4 + clen]
        if len(block) != clen:
            raise ValueError("WARC record shorter than declared length")
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri", b"").decode()
        http_end = block.find(b"\r\n\r\n")
        if http_end < 0 or not block.startswith(b"HTTP/"):
            raise ValueError("response record without an HTTP block")
        status_line, *http_header_lines = block[:http_end].split(b"\r\n")
        parts = status_line.split(b" ", 2)
        if len(parts) < 2 or not parts[1].isdigit():
            raise ValueError("malformed HTTP status line")
        status = int(parts[1])
        ctype = b""
        body_len = None
        for line in http_header_lines:
            k, _, v = line.partition(b":")
            lk = k.strip().lower()
            if lk == b"content-type":
                ctype = v.strip()
            elif lk == b"content-length":
                body_len = int(v.strip())
        body = block[http_end + 4 :]
        if body_len is not None and len(body) != body_len:
            raise ValueError("HTTP body shorter than declared length")
        if ctype.startswith(b"text/html"):
            stripped = _NOISE_ELEMENT_RE.sub(b" ", body)
            n_tokens = len(_TAG_RE.sub(b" ", stripped).split())
        else:
            n_tokens = 0
        rows.append((idx, uri, status, ctype.decode(), len(body), n_tokens))
        idx += 1
    return rows


WARC_RECORDS_SCHEMA = (
    "media_id long, rec_idx int, uri string, http_status int, "
    "content_type string, n_body_bytes int, n_text_tokens int"
)


def warc_records(media: DataFrame) -> DataFrame:
    """Per-record table from .warc.gz payloads via ``mapInPandas`` — one
    row per HTTP response with its URI, status, content type, exact body
    size and extracted-text token count. Downstream curation filters
    status=200 + text/html and feeds the text path; everything is per-row
    Arrow work, linear at 100 TB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for row in parse_warc(bytes(p)):
                    out.append((mid, *row))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "rec_idx", "uri", "http_status",
                    "content_type", "n_body_bytes", "n_text_tokens",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=WARC_RECORDS_SCHEMA
    )
