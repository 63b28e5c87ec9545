"""WARC container source (sources/warc.py): framing, corrupt-tail
isolation, and the Spark pack→parse round-trip."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tfl_realtime_lakehouse_spark.sources.warc import (
    documents_to_warc_files,
    parse_warc_records,
    synth_warc_record,
    warc_records_meta,
)


def test_warc_record_framing_and_multibyte_lengths():
    r1 = synth_warc_record(7, "hello world", "en", "web")
    r2 = synth_warc_record(8, "text with\r\nnewlines and unicode é", "fr", "wiki")
    recs = parse_warc_records(r1 + r2)
    assert [r["record_id"] for r in recs] == ["<urn:doc:7>", "<urn:doc:8>"]
    assert recs[0]["target_uri"] == "https://web.example.org/docs/7"
    assert recs[0]["language"] == "en"
    assert recs[0]["payload"] == b"hello world"
    # Content-Length is BYTES: the é and embedded CRLF must not desync
    # the record cursor
    assert recs[1]["content_length"] == len(
        "text with\r\nnewlines and unicode é".encode()
    )


def test_warc_corrupt_tail_drops_never_raises():
    blob = synth_warc_record(1, "aaa", "en", "s") + synth_warc_record(
        2, "bbb", "en", "s"
    )
    assert len(parse_warc_records(blob[:-20])) == 1  # torn second record
    assert parse_warc_records(b"junk") == []
    assert parse_warc_records(None) == []
    # header block without terminator
    assert parse_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n") == []
    # non-numeric length
    bad = blob.replace(b"Content-Length: 3", b"Content-Length: x", 1)
    assert parse_warc_records(bad) == []


def test_warc_spark_roundtrip_recovers_every_document(spark, sf_smoke):
    from tfl_realtime_lakehouse_spark.sources.tables import read_table

    docs = read_table(spark, sf_smoke, "documents").limit(120)
    files = documents_to_warc_files(docs, docs_per_file=50)
    meta = warc_records_meta(files)
    got = {r.doc_id: r for r in meta.collect()}
    want = docs.select("doc_id", "text", "lang", "source").collect()
    assert len(got) == len(want)
    for r in want:
        m = got[r.doc_id]
        assert m.language == r.lang
        assert m.content_length == len(r.text.encode())
        assert m.payload_digest == hashlib.md5(r.text.encode()).hexdigest()
        assert m.file_id == r.doc_id // 50
    # records-per-file bookkeeping matches the group sizes
    sizes = {r.file_id: r.n_records for r in files.collect()}
    per_file = (
        docs.groupBy((F.col("doc_id") / 50).cast("long").alias("f"))
        .count()
        .collect()
    )
    assert {r.f: r["count"] for r in per_file} == sizes
