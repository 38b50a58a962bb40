"""WARC (Web ARChive) source + sink, from scratch on the stdlib
(SURVEY.md §2B "Sources" — the web-archive ingestion format of every
large-scale crawl corpus, Common Crawl above all; reference parity:
the reference's pipeline STARTS with HTTP fetches of filings
(`ETFQuarterlyHoldingsExtractor.py:54-66`), and a WARC file is exactly
the at-rest capture of such fetches, so reading WARC is reading the
reference's input stage from archive instead of from the network).

Format (ISO 28500 / the public WARC 1.1 spec): a WARC file is a
sequence of records, each
``WARC/1.1\\r\\n`` + header lines + ``\\r\\n`` + Content-Length payload
bytes + ``\\r\\n\\r\\n``. The ``.warc.gz`` layout compresses EACH record
as its own gzip member (the Common Crawl convention — members are the
seek/split unit) and a conforming reader must handle multi-member
streams; this one does, via a ``zlib.decompressobj`` loop over
``unused_data``.

Scale posture: files are read with Spark's ``binaryFile`` source and
parsed per-file inside ``mapInPandas`` — per-FILE parallelism, which
is exactly how WARC corpora are laid out to be consumed (Common Crawl
ships ~1 GB files by the tens of thousands; one file is the natural
work unit because gzip members are not splittable without an external
index). Malformed bytes NEVER raise: every defect becomes an error
row carrying the file path and record ordinal (reference R22 — errors
are data). The record walk is incremental and the reader emits
fixed-size chunks of parsed rows, so PAYLOAD memory is bounded by the
chunk; the compressed file bytes themselves stay resident for the
task — that is binaryFile's unit of work, and the reason WARC corpora
cap file sizes (~1 GB). Files beyond executor memory use the member
OFFSET INDEX below (`index_warc_members` + `read_warc_ranges`):
indexing streams the file in 1 MiB reads, and the ranged reader
splits one file's members across many tasks by byte span.

The sink mirrors the source: ``write_warc`` partitions the frame and
each task writes one ``part-NNNNN.warc.gz`` with per-record members
and a leading ``warcinfo`` record. Local/NFS paths write directly;
object stores would swap the ``open()`` for a Hadoop output stream —
the record serialization (the format-bearing part) is identical.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"

#: Schema of the parsed record stream (one row per WARC record, plus
#: one error row per unparseable region).
WARC_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_ix", LongType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_date", StringType()),
        StructField("target_uri", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("payload_len", LongType()),
        StructField("error", StringType()),
    ]
)


# ---------------------------------------------------------------------------
# record serialization (shared by the sink and by tests' hand-built
# fixtures)
# ---------------------------------------------------------------------------


def build_record(
    warc_type: str,
    payload: bytes,
    *,
    record_id: str,
    date: str = "2024-01-01T00:00:00Z",
    target_uri: str | None = None,
    content_type: str = "application/octet-stream",
    version: str = "1.1",
) -> bytes:
    """Serialize ONE spec-shaped WARC record (uncompressed)."""
    lines = [
        f"WARC/{version}".encode(),
        f"WARC-Type: {warc_type}".encode(),
        f"WARC-Record-ID: <urn:uuid:{record_id}>".encode(),
        f"WARC-Date: {date}".encode(),
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}".encode())
    lines.append(f"Content-Type: {content_type}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_http_response_record(
    url: str,
    html: bytes,
    *,
    record_id: str,
    date: str = "2024-01-01T00:00:00Z",
    status: int = 200,
    mime: str = "text/html; charset=utf-8",
) -> bytes:
    """A ``response`` record whose payload is a captured HTTP
    response — the record type crawl pipelines actually consume."""
    http = (
        f"HTTP/1.1 {status} OK".encode()
        + _CRLF
        + f"Content-Type: {mime}".encode()
        + _CRLF
        + f"Content-Length: {len(html)}".encode()
        + _CRLF
        + _CRLF
        + html
    )
    return build_record(
        "response",
        http,
        record_id=record_id,
        date=date,
        target_uri=url,
        content_type="application/http;msgtype=response",
    )


def gzip_member(record: bytes) -> bytes:
    """Compress one record as one gzip member (wbits 16+15 → gzip
    wrapper, mtime 0 → byte-deterministic output)."""
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + 15)
    return co.compress(record) + co.flush()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _split_gzip_members(data: bytes) -> Iterator[tuple[bytes | None, str | None]]:
    """Yield (decompressed_member, error) pairs; an error ends the walk
    (byte offsets past a corrupt member are unrecoverable)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + 15)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as exc:
            yield None, f"bad_gzip_member: {exc}"
            return
        if not d.eof:
            yield None, "truncated_gzip_member"
            return
        yield out, None
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # defensive: no forward progress
            yield None, "empty_gzip_member"
            return
        pos += consumed


def _parse_records(stream: bytes) -> Iterator[tuple[dict, str | None]]:
    """Walk an UNCOMPRESSED record stream; yield (fields, error)."""
    pos = 0
    n = len(stream)
    while pos < n:
        # skip inter-record padding some writers emit
        while pos < n and stream[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not stream[pos : pos + 5] == b"WARC/":
            yield {}, "missing_warc_version_line"
            return
        head_end = stream.find(_CRLF + _CRLF, pos)
        if head_end == -1:
            yield {}, "unterminated_header_block"
            return
        header_lines = stream[pos:head_end].split(_CRLF)
        fields: dict[str, str] = {}

        def _hdr(b: bytes) -> str:
            # ISO 28500: header values are UTF-8; fall back to the
            # lossless latin-1 byte map for non-conformant bytes so
            # the never-raise contract holds
            try:
                return b.decode("utf-8")
            except UnicodeDecodeError:
                return b.decode("latin-1")

        for line in header_lines[1:]:
            k, _, v = line.partition(b":")
            if not _:
                yield {}, f"malformed_header_line: {line[:40]!r}"
                return
            fields[_hdr(k.strip()).lower()] = _hdr(v.strip())
        try:
            clen = int(fields["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            yield fields, "bad_content_length"
            return
        body_start = head_end + 4
        if body_start + clen > n:
            yield fields, "payload_exceeds_stream"
            return
        payload = stream[body_start : body_start + clen]
        yield {**fields, "__payload": payload}, None
        pos = body_start + clen


def _parse_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from a captured HTTP response;
    (None, None, payload) when it isn't one."""
    sep = payload.find(_CRLF + _CRLF)
    if sep == -1 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep].split(_CRLF)
    parts = head[0].split(b" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            try:
                ctype = v.strip().decode("utf-8")
            except UnicodeDecodeError:
                ctype = v.strip().decode("latin-1")
    return status, ctype, payload[sep + 4 :]


def parse_warc_bytes(path: str, data: bytes) -> Iterator[dict]:
    """All records of one WARC file (gzip multi-member or plain) as
    WARC_SCHEMA dicts; defects become error rows, never exceptions."""
    ix = 0

    def _row(**kw):
        base = {f.name: None for f in WARC_SCHEMA.fields}
        base.update(path=path, record_ix=ix, **kw)
        return base

    if data[:2] == b"\x1f\x8b":
        stream_iter = _split_gzip_members(data)
    else:
        stream_iter = iter([(data, None)])

    for member, gz_err in stream_iter:
        if gz_err is not None:
            yield _row(error=gz_err)
            return
        for fields, err in _parse_records(member):
            if err is not None:
                yield _row(
                    warc_type=fields.get("warc-type"),
                    record_id=fields.get("warc-record-id"),
                    error=err,
                )
                ix += 1
                # a framing error poisons the rest of THIS member only
                break
            payload = fields.pop("__payload")
            status, http_ctype, body = _parse_http_payload(payload)
            yield _row(
                warc_type=fields.get("warc-type"),
                record_id=fields.get("warc-record-id"),
                warc_date=fields.get("warc-date"),
                target_uri=fields.get("warc-target-uri"),
                content_type=fields.get("content-type"),
                http_status=status,
                http_content_type=http_ctype,
                payload=body,
                payload_len=len(body),
                error=None,
            )
            ix += 1


# ---------------------------------------------------------------------------
# Spark source / sink
# ---------------------------------------------------------------------------


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: ``binaryFile`` scan → per-file parse.
    One row per record (+ error rows); ``payload`` holds the HTTP body
    for captured responses, the raw record payload otherwise."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        CHUNK = 512  # records per emitted frame: payload memory is
        # bounded by the chunk, not the file (the file BYTES are
        # resident regardless — binaryFile's unit; the record walk
        # itself is incremental)
        empty = {f.name: pd.Series(dtype=object) for f in WARC_SCHEMA.fields}
        emitted = False
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                rows: list[dict] = []
                for row in parse_warc_bytes(p, bytes(content)):
                    rows.append(row)
                    if len(rows) >= CHUNK:
                        emitted = True
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    emitted = True
                    yield pd.DataFrame(rows)
        if not emitted:
            yield pd.DataFrame(empty)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_parse, WARC_SCHEMA)
    )


def write_warc(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    html_col: str = "html",
    date_col: str | None = None,
    n_files: int = 8,
) -> None:
    """Distributed WARC sink: repartition, then each task writes one
    ``part-NNNNN.warc.gz`` (leading ``warcinfo`` record + one gzip
    member per response record). Record IDs derive from md5(url) so
    output is deterministic for a deterministic input frame."""
    os.makedirs(out_dir, exist_ok=True)
    # overwrite semantics: clear prior part files so a re-run with a
    # different n_files cannot leave stale shards for the reader's glob
    for name in os.listdir(out_dir):
        if name.startswith("part-") and name.endswith(".warc.gz"):
            os.remove(os.path.join(out_dir, name))
    cols = [F.col(url_col).alias("url"), F.col(html_col).alias("html")]
    cols.append(
        (F.col(date_col) if date_col else F.lit("2024-01-01T00:00:00Z")).alias("date")
    )
    slim = df.select(*cols)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        info = build_record(
            "warcinfo",
            b"software: etfconstituentextractor_spark\r\n",
            record_id=f"warcinfo-{pid:05d}",
            content_type="application/warc-fields",
        )
        n = 0
        # stream members straight to the part file: the task's memory
        # is one record, not the whole shard (the reader-side rule,
        # applied to the writer too — round-7 review)
        with open(os.path.join(out_dir, f"part-{pid:05d}.warc.gz"), "wb") as fh:
            fh.write(gzip_member(info))
            for pdf in batches:
                for url, html, date in zip(pdf["url"], pdf["html"], pdf["date"]):
                    raw = html.encode() if isinstance(html, str) else bytes(html)
                    rec = build_http_response_record(
                        url,
                        raw,
                        record_id=hashlib.md5(url.encode()).hexdigest(),
                        date=str(date),
                    )
                    fh.write(gzip_member(rec))
                    n += 1
        yield pd.DataFrame({"n": [n]})

    # hash-repartition on url (file membership deterministic regardless
    # of upstream partitioning) + in-partition sort (byte layout
    # deterministic too); the count() drives execution
    (
        slim.repartition(n_files, "url")
        .sortWithinPartitions("url")
        .mapInPandas(_write, "n long")
        .count()
    )


# ---------------------------------------------------------------------------
# member-offset index: the >-executor-memory scale path
# ---------------------------------------------------------------------------

INDEX_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("member_ix", LongType()),
        StructField("offset", LongType()),
        StructField("comp_len", LongType()),
        StructField("error", StringType()),
    ]
)

_INDEX_READ_CHUNK = 1 << 20  # 1 MiB streaming reads


def index_warc_members(spark: SparkSession, paths: list[str]) -> DataFrame:
    """(path, member_ix, offset, comp_len) for every gzip member of
    each ``.warc.gz`` file — built by STREAMING through the file in
    1 MiB reads (decompressed bytes are discarded immediately), so
    indexing a file costs O(read-chunk) memory regardless of file
    size (decompression output is bounded per call via max_length).
    This is the external index the module docstring names as the
    scale path: with it, ONE oversized file splits across many tasks
    (`read_warc_ranges`). Indexing errors become rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                rows = []
                try:
                    with open(path, "rb") as fh:
                        abs_off = 0       # file offset of current member start
                        ix = 0
                        d = None
                        started = False   # current member received bytes
                        pending = b""     # compressed bytes not yet consumed
                        pending_off = 0   # file offset of pending[0]
                        while True:
                            if d is None:
                                d = zlib.decompressobj(16 + 15)
                                started = False
                            if not pending:
                                pending_off = fh.tell()
                                pending = fh.read(_INDEX_READ_CHUNK)
                                if not pending:
                                    break
                            try:
                                # bounded output: without max_length a
                                # 1 MiB compressed chunk can inflate
                                # ~1000x in ONE call (review r7 —
                                # exactly the OOM this API avoids);
                                # unconsumed_tail re-feeds until the
                                # chunk is drained or the member ends
                                d.decompress(pending, _INDEX_READ_CHUNK)
                                while not d.eof and d.unconsumed_tail:
                                    d.decompress(
                                        d.unconsumed_tail, _INDEX_READ_CHUNK
                                    )
                            except zlib.error as exc:
                                rows.append(
                                    (path, ix, abs_off, -1, f"bad_gzip_member: {exc}")
                                )
                                pending = b""
                                started = False
                                d = None
                                break
                            started = True
                            if d.eof:
                                consumed = len(pending) - len(d.unused_data)
                                end = pending_off + consumed
                                rows.append((path, ix, abs_off, end - abs_off, None))
                                ix += 1
                                pending = d.unused_data
                                pending_off = end
                                abs_off = end
                                d = None
                            else:
                                pending = b""
                        if started:
                            rows.append((path, ix, abs_off, -1, "truncated_gzip_member"))
                except OSError as exc:
                    rows = [(path, -1, -1, -1, f"unreadable: {exc}")]
                yield pd.DataFrame(
                    rows, columns=["path", "member_ix", "offset", "comp_len", "error"]
                )

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    return pdf.repartition(max(1, len(paths))).mapInPandas(gen, INDEX_SCHEMA)


def read_warc_ranges(
    spark: SparkSession, index: DataFrame, *, members_per_task: int = 1024
) -> DataFrame:
    """Read WARC records through a member-offset index: contiguous
    member runs group into chunks of ``members_per_task``, chunks
    hash-repartition across the cluster, and each task seeks to its
    byte span and parses only those members — ONE file larger than
    any executor's memory becomes many bounded tasks. Returns the
    same WARC_SCHEMA stream as `read_warc` (record_ix is per-chunk)."""
    if members_per_task < 1:
        raise ValueError(f"members_per_task must be >= 1, got {members_per_task}")
    chunks = (
        index.filter(F.col("error").isNull())
        .withColumn("chunk", (F.col("member_ix") / members_per_task).cast("bigint"))
        .groupBy("path", "chunk")
        .agg(
            F.min("offset").alias("offset"),
            F.sum("comp_len").alias("span_len"),
        )
        .repartition("path", "chunk")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        CHUNK = 512  # same chunked-emission rule as read_warc: payload
        # memory bounded by the chunk, not the member span
        for pdf in batches:
            for path, off, span in zip(pdf["path"], pdf["offset"], pdf["span_len"]):
                with open(path, "rb") as fh:
                    fh.seek(int(off))
                    blob = fh.read(int(span))
                rows: list[dict] = []
                for row in parse_warc_bytes(path, blob):
                    rows.append(row)
                    if len(rows) >= CHUNK:
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return chunks.mapInPandas(gen, WARC_SCHEMA)
