"""WARC (Web ARChive, ISO 28500) record plumbing — the container
format of web-crawl training corpora (Common Crawl et al.), pure
stdlib.

Writer side packs documents into multi-record WARC files (one binary
blob per file-group, records concatenated in doc_id order — the real
on-disk shape, exercised by the round-trip query); reader side walks a
blob record-by-record: version line, CRLF header block, exact
``Content-Length`` payload read, trailing CRLF CRLF. Corrupt blobs
yield the records parsed so far — a torn tail must not kill the stage.

Spark plumbing is Arrow-batched both ways (``applyInPandas`` to build
file blobs, ``mapInPandas`` to explode records); binary stays opaque to
Catalyst while the extracted metadata columns get pushdown/pruning as
usual — the multimodal ASSET discipline applied to a text container.

Round-trip verification: `docs_warc_roundtrip` synthesizes WARC files
from the documents table, parses them back, and hash-checks the
recovered (uri, language header, content length, payload digest)
against SQL recomputing the same fields from the source rows directly.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VERSION = b"WARC/1.0\r\n"


def synth_warc_record(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """One WARC response record with deterministic headers derived from
    the row (the corpus carries no real crawl metadata)."""
    payload = text.encode("utf-8")
    headers = (
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
        f"WARC-Target-URI: https://{source}.example.org/docs/{doc_id}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Identified-Content-Language: {lang}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode("ascii")
    return _VERSION + headers + b"\r\n" + payload + b"\r\n\r\n"


def parse_warc_records(blob: bytes | None) -> list[dict]:
    """Walk a WARC blob record-by-record; returns parsed records up to
    the first corruption (torn tails are dropped, never raised)."""
    out: list[dict] = []
    b = blob or b""
    pos = 0
    while pos < len(b):
        if b[pos : pos + len(_VERSION)] != _VERSION:
            break
        hdr_end = b.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in b[pos + len(_VERSION) : hdr_end].split(b"\r\n"):
            m = re.match(rb"([A-Za-z0-9-]+):\s*(.*)", line)
            if m:
                headers[m.group(1).decode("ascii").lower()] = m.group(
                    2
                ).decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        payload = b[body_start : body_start + clen]
        if len(payload) < clen:
            break
        out.append(
            {
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_type": headers.get("warc-type"),
                "language": headers.get("warc-identified-content-language"),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen + 4  # payload + CRLF CRLF
    return out


WARC_FILE_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("n_records", T.IntegerType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload_digest", T.StringType()),
    ]
)


def documents_to_warc_files(documents: DataFrame, docs_per_file: int = 50) -> DataFrame:
    """Pack documents into multi-record WARC file blobs (doc_id order
    within each file-group — deterministic bytes). One shuffle on the
    file-group key; blob size is bounded by docs_per_file."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob = b"".join(
            synth_warc_record(int(r.doc_id), r.text, r.lang, r.source)
            for r in pdf.itertuples()
        )
        return pd.DataFrame(
            {
                "file_id": [int(pdf["doc_id"].iloc[0]) // (docs_per_file or 1)],
                "n_records": [len(pdf)],
                "blob": [blob],
            }
        )

    return (
        documents.select("doc_id", "text", "lang", "source")
        .withColumn("file_id", (F.col("doc_id") / docs_per_file).cast("long"))
        .groupBy("file_id")
        .applyInPandas(lambda _, pdf: build(pdf), WARC_FILE_SCHEMA)
    )


def warc_records_meta(files: DataFrame) -> DataFrame:
    """Explode WARC file blobs back into per-record metadata rows:
    parse headers, verify payload length, digest the payload. Map-only
    Arrow pass; doc_id is recovered from the record id."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["blob"]):
                for rec in parse_warc_records(blob):
                    rid = rec["record_id"] or ""
                    m = re.search(r"<urn:doc:(\d+)>", rid)
                    rows.append(
                        (
                            int(fid),
                            int(m.group(1)) if m else None,
                            rec["target_uri"],
                            rec["language"],
                            rec["content_length"],
                            hashlib.md5(rec["payload"]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id",
                    "doc_id",
                    "target_uri",
                    "language",
                    "content_length",
                    "payload_digest",
                ],
            ).astype({"content_length": "Int64", "doc_id": "Int64"})

    return files.select("file_id", "blob").mapInPandas(run, WARC_RECORD_SCHEMA)
