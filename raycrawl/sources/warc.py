"""WARC (Web ARChive, ISO 28500) reading and writing — the native
container of web-scale text corpora (Common Crawl ships ~100 TB of
exactly these). Pure-Python: no warcio in the sandbox, and the format is
simple enough that a length-delimited walker is both robust and fast.

Reader shape (Ray-Data-first): one task per WARC FILE —
``ray.data.read_binary_files`` keeps each file's bytes in the object
store, ``map_batches`` walks records by Content-Length (binary-safe:
never a regex over the payload), and only response records leave the
stage as (url, warc_ts, html, text, lang) rows matching
:func:`raycrawl.sources.synth.corpus_schema`. Common Crawl's sharding IS
file-per-task, so the parallelism unit is the archive's own.

Writer: `write_warc` formats standard WARC/1.0 response records wrapping
an HTTP/1.1 response (deterministic record ids — a blake2b urn over
url+ts — so exports are byte-reproducible). Round-trips through the
reader bit-exactly; conformance is the crawl-parity test
(tests/test_pipeline_features.py): a WARC-ingested corpus must crawl to
IDENTICAL done/seen sets as the native parquet one.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from datetime import datetime, timezone

import pyarrow as pa
import ray.data as rd

__all__ = ["parse_warc", "format_warc_record", "write_warc", "read_warc"]

_CRLF = b"\r\n"


def _warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_warc_date(s: str) -> int:
    s = s.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ"):
        try:
            dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1e6)
        except ValueError:
            continue
    return 0


def format_warc_record(
    url: str,
    ts_us: int,
    body: bytes,
    status: int = 200,
    mime: str = "text/html",
) -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 response."""
    if "\r" in url or "\n" in url or "\r" in mime or "\n" in mime:
        raise ValueError("CR/LF in url or mime would corrupt WARC headers")
    if not url.isascii() or not mime.isascii():
        # WARC headers are ASCII; fail with a clear validation error here
        # rather than a UnicodeEncodeError deep inside a remote export task.
        # IRI targets must be percent-encoded by the caller first.
        raise ValueError(
            f"non-ASCII url or mime not representable in WARC headers: "
            f"{url!r} / {mime!r} — percent-encode IRIs before export"
        )
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    rid = hashlib.blake2b(
        f"{url}\x00{ts_us}".encode(), digest_size=16
    ).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:blake2b:{rid}>\r\n".encode("ascii")
        + f"WARC-Date: {_warc_date(ts_us)}\r\n".encode("ascii")
        + f"WARC-Target-URI: {url}\r\n".encode("ascii")
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode("ascii")
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def write_warc(records, path: str, compress: bool | None = None) -> int:
    """Write ``records`` — an iterable of dicts with url / warc_ts
    (epoch-us int) / html (bytes) and optional status / mime — as one
    WARC file (gzipped when the path ends ``.gz`` or ``compress=True``).
    Returns the record count."""
    if compress is None:
        compress = path.endswith(".gz")
    n = 0
    chunks = []
    for r in records:
        chunks.append(
            format_warc_record(
                r["url"],
                int(r.get("warc_ts", 0)),
                bytes(r.get("html", b"") or b""),
                int(r.get("status", 200)),
                str(r.get("mime", "text/html")),
            )
        )
        n += 1
    data = b"".join(chunks)
    if compress:
        # mtime=0: deterministic bytes for identical inputs
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)
    return n


def parse_warc(data: bytes) -> list[dict]:
    """Walk one WARC file's bytes into record dicts: url, warc_ts
    (epoch-us), html (the HTTP payload), status, mime. Length-delimited
    (Content-Length), so binary payloads never confuse the walker;
    non-response records and truncated tails are skipped, not fatal."""
    if data[:2] == b"\x1f\x8b":  # gzip magic (multi-member ok)
        data = gzip.decompress(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        header = data[pos:head_end].decode("ascii", "replace")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break  # lost sync — stop rather than misparse
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            break
        block = data[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        ts_us = _parse_warc_date(fields.get("warc-date", ""))
        status, mime, body = 0, "", block
        http_end = block.find(b"\r\n\r\n")
        if http_end >= 0 and block[:5] in (b"HTTP/",):
            body = block[http_end + 4 :]
            for i, hline in enumerate(
                block[:http_end].decode("ascii", "replace").split("\r\n")
            ):
                if i == 0:
                    parts = hline.split(" ")
                    if len(parts) >= 2 and parts[1].isdigit():
                        status = int(parts[1])
                elif hline.lower().startswith("content-type:"):
                    mime = hline.partition(":")[2].strip()
        out.append(
            {
                "url": url,
                "warc_ts": ts_us,
                "html": body,
                "status": status,
                "mime": mime,
            }
        )
    return out


def _warc_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".warc", ".warc.gz"))
        )
    return [path]


def read_warc(path: str) -> rd.Dataset:
    """Dataset of corpus-schema rows (url, warc_ts epoch-us, html, text,
    lang) from a ``.warc`` / ``.warc.gz`` file or a directory of them —
    one read task per archive file (Common Crawl's own shard unit), the
    record walk fully inside the task."""
    files = _warc_paths(path)
    if not files:
        raise ValueError(f"no .warc/.warc.gz files under {path!r}")

    def expand(t: pa.Table) -> pa.Table:
        urls, tss, htmls, texts = [], [], [], []
        for blob in t["bytes"]:
            for rec in parse_warc(blob.as_py()):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
                # plain-text payloads (robots.txt, sitemaps, .txt pages)
                # surface in the text column — that is where the engine
                # reads robots rules from (state/robots.py)
                mime = rec["mime"].split(";")[0].strip().lower()
                if mime.startswith("text/") and mime != "text/html":
                    texts.append(rec["html"].decode("utf-8", "replace"))
                else:
                    texts.append("")
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.int64()),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array([""] * n, pa.string()),
            }
        )

    return rd.read_binary_files(files).map_batches(
        expand, batch_format="pyarrow"
    )
