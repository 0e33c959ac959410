"""WARC source: Common-Crawl-style web-archive ingestion (ISO 28500).

The north-rule input is a table of CC-style pages; real crawls ship as WARC
files, so a reference user switching to this engine needs the format read
natively.  `read_warc` maps WARC shards onto the SAME page schema the
parquet reader produces — `(url, warc_ts, html, lang, shard)` — so every
downstream stage (prepare_pages → extraction → graph) is source-agnostic;
`warc_bytes` is the exact inverse for fixtures and tests.

Scale shape: one WARC file = one read task (`read_binary_files`), parsed
inside the task into page rows (headers + Content-Length framing — a
sequential scan, no regex backtracking); .warc.gz is handled by stdlib
gzip (concatenated-member streams decompress natively).  The shard lineage
column comes from the file path, exactly like the parquet path → shard
mapping, so checkpoint-resume manifests work unchanged.
"""

from __future__ import annotations

import gzip
from typing import Any, Iterable

import pyarrow as pa

import ray.data as rd

_CRLF2 = b"\r\n\r\n"


def warc_shard_name(path: str) -> str:
    """Lineage shard name for a WARC file: basename minus .warc/.warc.gz
    (the ONE place this rule lives — kg_build and to_pages both call it)."""
    import os as _os

    from ..state.manifests import shard_name

    base = _os.path.basename(path)
    for suffix in (".warc.gz", ".warc"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
            break
    return shard_name(base)


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # first line = version / status
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return out


def parse_warc(data: bytes) -> Iterable[dict[str, Any]]:
    """WARC/1.0 bytes (plain or gzip, incl. per-record gzip members) →
    dicts for each *response* record: {url, warc_date, html, http_status}."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # concatenated members decompress whole
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record blank lines
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not data[i : i + 5].startswith(b"WARC/"):
            raise ValueError(f"bad WARC record header at byte {i}")
        hdr_end = data.index(_CRLF2, i)
        headers = _parse_headers(data[i:hdr_end])
        length = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        i = hdr_end + 4 + length
        if headers.get("warc-type") != "response":
            continue  # warcinfo / request / metadata records
        status = ""
        html = body
        if body[:5] in (b"HTTP/", b"http/"):
            split = body.find(_CRLF2)
            if split >= 0:
                status = body[:split].split(b"\r\n", 1)[0].decode(
                    "latin-1", "replace"
                )
                html = body[split + 4 :]
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "html": html,
            "http_status": status,
        }


def read_warc(
    paths: "list[str] | str",
    *,
    file_seq_paths: "list[str] | None" = None,
) -> rd.Dataset:
    """WARC shard files → page Dataset `(url, ord, warc_ts timestamp[us],
    html binary, lang, shard)` — schema-compatible with the parquet page
    reader, so `kg_build`'s prepare→extract→graph stages run unchanged.

    ``file_seq_paths``: the FULL run's input list when reading a subset
    (kg_build waves) so file sequence numbers — and therefore page
    ordinals — stay globally unique and layout-independent."""
    import os

    files = rd.read_binary_files(paths, include_paths=True)
    # deterministic global page ordinal (the "first item wins" tiebreaker
    # the parquet pages carry as `ord`): file sequence in the sorted input
    # list × 2^32 + record position within the file — unique, layout-
    # independent, and < 2^50 so mid = ord·4096 + i stays in int64
    path_list = [paths] if isinstance(paths, str) else list(paths)
    seq_src = file_seq_paths if file_seq_paths is not None else path_list
    file_seq = {os.path.abspath(p): i for i, p in enumerate(sorted(seq_src))}

    schema = pa.schema([
        ("url", pa.string()),
        ("ord", pa.int64()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
        ("shard", pa.string()),
    ])

    def to_pages(batch: pa.Table) -> pa.Table:
        rows: dict[str, list[Any]] = {k: [] for k in schema.names}
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            sh = warc_shard_name(path)
            seq = file_seq.get(os.path.abspath(path))
            if seq is None:
                # ord uniqueness is a correctness invariant — a silent
                # default would make mention ids collide across files
                raise ValueError(
                    f"read_warc: worker path {path!r} not in the driver's "
                    f"input list ({len(file_seq)} files) — ordinal "
                    "sequencing would be ambiguous"
                )
            for pos, rec in enumerate(parse_warc(data or b"")):
                rows["url"].append(rec["url"])
                rows["ord"].append((seq << 32) | pos)
                rows["warc_ts"].append(_parse_warc_date(rec["warc_date"]))
                rows["html"].append(rec["html"])
                rows["lang"].append("")
                rows["shard"].append(sh)
        return pa.Table.from_pydict(rows, schema=schema)

    return files.map_batches(to_pages, batch_format="pyarrow")


def _parse_warc_date(s: str) -> "int | None":
    """ISO-8601 Z timestamp → epoch microseconds (None when absent)."""
    import datetime as dt

    if not s:
        return None
    try:
        d = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        return int(d.timestamp() * 1_000_000)
    except ValueError:
        return None


def warc_bytes(
    pages: Iterable[dict[str, Any]],
    *,
    compress: bool = True,
    warcinfo: bool = True,
) -> bytes:
    """Page dicts {url, warc_date, html} → WARC/1.0 bytes (the exact inverse
    of `parse_warc`; per-record gzip members when ``compress``, the CC
    convention).  Record IDs are derived from the url (deterministic)."""
    import hashlib

    def record(rtype: str, headers: dict[str, str], body: bytes) -> bytes:
        head = [f"WARC/1.0"]
        rid = hashlib.sha1(
            (rtype + headers.get("WARC-Target-URI", "")).encode()
        ).hexdigest()
        base = {
            "WARC-Type": rtype,
            "WARC-Record-ID": f"<urn:sha1:{rid}>",
            "Content-Length": str(len(body)),
        }
        for k, v in {**base, **headers}.items():
            head.append(f"{k}: {v}")
        blob = ("\r\n".join(head) + "\r\n\r\n").encode() + body + b"\r\n\r\n"
        return gzip.compress(blob, mtime=0) if compress else blob

    out = bytearray()
    if warcinfo:
        info = b"software: knowledgegraph_ray\r\n"
        out += record("warcinfo", {"Content-Type": "application/warc-fields"}, info)
    for p in pages:
        html = p["html"] if isinstance(p["html"], bytes) else str(
            p["html"]
        ).encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        out += record(
            "response",
            {
                "WARC-Target-URI": p["url"],
                "WARC-Date": p.get("warc_date", "2026-01-01T00:00:00Z"),
                "Content-Type": "application/http; msgtype=response",
            },
            http,
        )
    return bytes(out)
