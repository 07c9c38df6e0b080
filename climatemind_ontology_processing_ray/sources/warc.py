"""WARC (ISO 28500) web-archive source — the native container of
Common-Crawl-style webtext corpora.

Reads ``.warc`` / ``.warc.gz`` files into the pipeline's pages shape
(``url: string, warc_ts: timestamp[us], html: binary``), ready for
``pipelines/kg.py`` / ``stages/extract.py``.  Pure-python parser (no
external WARC lib in the sandbox): records are ``WARC/1.x`` header
blocks terminated by CRLFCRLF followed by exactly ``Content-Length``
payload bytes; ``response`` records carry an HTTP envelope whose
headers are stripped to recover the raw html bytes.  Gzip inputs use
the member-per-record layout (each WARC record its own gzip member —
the Common Crawl convention, which is what makes the format splittable
at member boundaries); ``gzip.decompress`` of a multi-member stream
concatenates members, so one pass handles both one-member-per-record
and whole-file compression.

Scale shape: ``ray.data.read_binary_files`` → ``flat_map`` per file.
One task parses one archive file — Common Crawl ships ~1 GB segments
by design, so file-level parallelism IS record-level parallelism at
fleet width; no shuffle, no driver-side bytes.  A malformed record
ends that FILE's parse (archives are sequential containers — a
corrupted length header poisons everything after it) but not the run.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa

from ray.data import Dataset

_CRLF2 = b"\r\n\r\n"


def _parse_warc_ts(value: str):
    """WARC-Date (ISO-8601 Zulu, e.g. 2024-01-02T03:04:05Z) → naive-UTC
    datetime (the pages table convention)."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def _strip_http_envelope(payload: bytes) -> bytes:
    """A response record's payload is an HTTP/1.x message; the body
    starts after the first CRLFCRLF.  Payloads without an HTTP status
    line (resource records, raw captures) pass through unchanged."""
    if payload[:5] == b"HTTP/":
        cut = payload.find(_CRLF2)
        if cut >= 0:
            return payload[cut + 4 :]
    return payload


def parse_warc_records(data: bytes) -> list[dict]:
    """(url, warc_ts, html) dicts for every ``response`` /
    ``resource`` record in one WARC byte stream."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # concatenates all gzip members
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (two CRLFs per spec)
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            break  # trailing garbage / truncated record: stop this file
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            break  # malformed length: a negative value would move pos
            # BACKWARDS, and a crafted archive can aim the jump at an
            # earlier 'WARC/' header to loop forever on the same bytes
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            break  # truncated payload
        rtype = headers.get("warc-type", "")
        if rtype in ("response", "resource"):
            url = headers.get("warc-target-uri", "")
            ts = _parse_warc_ts(headers.get("warc-date", ""))
            if url and ts is not None:
                out.append(
                    {
                        "url": url,
                        "warc_ts": ts,
                        "html": _strip_http_envelope(data[body_start:body_end]),
                    }
                )
        pos = body_end
    return out


def read_warc(paths: str | list[str], **read_kwargs) -> Dataset:
    """``.warc`` / ``.warc.gz`` files → Dataset(url, warc_ts, html),
    one parse task per archive file (see module docstring for why that
    is the right granularity).  ``read_kwargs`` pass through to
    ``ray.data.read_binary_files`` (e.g. ``override_num_blocks``)."""
    import ray.data

    files = ray.data.read_binary_files(paths, **read_kwargs)
    return files.flat_map(lambda row: parse_warc_records(row["bytes"]))


def write_warc(records: list[dict], path: str, *, per_record_gzip: bool = False) -> None:
    """Serialize (url, warc_ts, html) dicts as WARC response records
    (HTTP envelope included) — the test/fixture counterpart of
    :func:`read_warc`.  ``per_record_gzip`` emits the Common Crawl
    member-per-record gzip layout."""
    chunks: list[bytes] = []
    for rec in records:
        html = rec["html"]
        if isinstance(html, str):
            html = html.encode("utf-8")
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        ts = rec["warc_ts"]
        header = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {rec['url']}\r\n".encode()
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n\r\n"
        )
        raw = header + http + b"\r\n\r\n"
        chunks.append(gzip.compress(raw) if per_record_gzip else raw)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
