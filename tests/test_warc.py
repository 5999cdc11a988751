"""WARC ingestion: byte-exact record framing, HTTP body split,
declarative HTML->text — the crawl-to-corpus step."""

import os

from rassengine_spark.sources.warc import (parse_warc_bytes, read_warc,
                                           warc_text_documents)


def _record(rtype: str, uri: str, payload: bytes,
            ctype: str = "application/http; msgtype=response") -> bytes:
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {rtype}\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           f"Content-Type: {ctype}\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return hdr + payload + b"\r\n\r\n"


HTML = (b"<html><head><style>p{color:red}</style>"
        b"<script>var x=1<2;</script></head>"
        b"<body><h1>Caf\xc3\xa9 menu</h1><!-- hidden -->"
        b"<p>5 &lt; 6 &amp;&amp; tea</p></body></html>")
HTTP = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + HTML)


def test_parse_warc_bytes_framing():
    blob = (_record("warcinfo", "", b"software: test",
                    ctype="application/warc-fields")
            + _record("request", "http://x/a", b"GET /a HTTP/1.1\r\n\r\n")
            + _record("response", "http://x/a", HTTP))
    recs = list(parse_warc_bytes(blob, "f.warc"))
    assert [r[1] for r in recs] == ["warcinfo", "request", "response"]
    assert recs[2][2] == "http://x/a"
    assert recs[2][5] == HTTP             # byte-exact payload

    # multi-byte chars before a record must not shift framing
    assert list(parse_warc_bytes(blob + b"garbage tail"))[2][5] == HTTP


def test_warc_to_text_documents(spark, tmp_path):
    blob = (_record("request", "http://x/a", b"GET /a HTTP/1.1\r\n\r\n")
            + _record("response", "http://x/a", HTTP)
            + _record("response", "http://x/empty",
                      b"HTTP/1.1 204 No Content\r\n\r\n"))
    (tmp_path / "crawl.warc").write_bytes(blob)
    recs = read_warc(spark, str(tmp_path))
    assert recs.count() == 3

    docs = warc_text_documents(recs).collect()
    # the empty response filters out; the request record is not a doc
    assert len(docs) == 1
    d = docs[0]
    assert d.url == "http://x/a"
    assert d.text == "Café menu 5 < 6 && tea"
    assert len(d.doc_id) == 32            # md5 hex


def test_warc_gz_member_per_record(spark, tmp_path):
    """Common Crawl layout: one gzip member per record — the multi-member
    stream decompresses to the exact uncompressed framing."""
    import gzip

    blob = b"".join(
        gzip.compress(_record("response", f"http://x/{i}", HTTP))
        for i in range(3))
    (tmp_path / "crawl.warc.gz").write_bytes(blob)
    recs = read_warc(spark, str(tmp_path))
    assert recs.count() == 3
    docs = warc_text_documents(recs)
    assert docs.count() == 3
    urls = {r.url for r in docs.collect()}
    assert urls == {"http://x/0", "http://x/1", "http://x/2"}


def test_warc_corpus_feeds_prep_pipeline(spark, tmp_path):
    """Crawl-to-training-corpus end to end: WARC responses -> text docs
    -> the prep pipeline (dedup drops the byte-identical page)."""
    from pyspark.sql import functions as F

    from rassengine_spark.llmops.prep import prepare_training_corpus
    pages = [
        (b"<p>alpha page with plenty of words to keep one</p>", "a"),
        (b"<p>alpha page with plenty of words to keep one</p>", "b"),
        (b"<p>beta page distinct content and words two</p>", "c"),
    ]
    blob = b"".join(
        _record("response", f"http://x/{u}",
                b"HTTP/1.1 200 OK\r\n\r\n" + html)
        for html, u in pages)
    (tmp_path / "crawl.warc").write_bytes(blob)
    docs = (warc_text_documents(read_warc(spark, str(tmp_path)))
            .select(F.col("doc_id"), "text"))
    out, report = prepare_training_corpus(
        docs, None, text_col="text", id_col="doc_id",
        min_quality=0.0, redact=False)
    stages = dict(report)
    assert stages["input"] == 3 and stages["exact_dedup"] == 2
    assert out.count() == 2


def test_warc_latin1_body_does_not_abort(spark, tmp_path):
    """ANSI-mode decode() aborts on the first latin-1 page; the cast path
    substitutes replacement chars and the job survives."""
    latin1 = b"HTTP/1.1 200 OK\r\n\r\n<p>caf\xe9 latin-1 page words</p>"
    blob = (_record("response", "http://x/l1", latin1)
            + _record("response", "http://x/ok", HTTP))
    (tmp_path / "crawl.warc").write_bytes(blob)
    docs = {r.url: r.text for r in
            warc_text_documents(read_warc(spark, str(tmp_path))).collect()}
    assert len(docs) == 2
    assert "latin-1 page words" in docs["http://x/l1"]
    assert "�" in docs["http://x/l1"]      # lossy, not lost


def test_warc_negative_content_length_terminates():
    hostile = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: -54\r\n\r\npayload\r\n\r\n")
    assert list(parse_warc_bytes(hostile)) == []


def test_parse_warc_stream_chunk_boundaries_match_bytes():
    # a 1-byte-per-read file-like forces every boundary case (CRLF pair,
    # header block, payload) to straddle a refill; output must be
    # byte-identical to whole-buffer parsing
    import io

    from rassengine_spark.sources.warc import parse_warc_stream

    class Dribble(io.RawIOBase):
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def read(self, n=-1):
            return self._b.read(1)

    blob = (_record("warcinfo", "", b"software: test",
                    ctype="application/warc-fields")
            + _record("request", "http://x/a", b"GET /a HTTP/1.1\r\n\r\n")
            + _record("response", "http://x/a", HTTP))
    whole = list(parse_warc_bytes(blob, "f"))
    dribbled = list(parse_warc_stream(Dribble(blob), "f"))
    assert dribbled == whole

    # truncated payload tail: both paths yield the partial record
    cut = blob[:-(len(HTTP) // 2)]
    assert (list(parse_warc_stream(Dribble(cut), "f"))
            == list(parse_warc_bytes(cut, "f")))


def test_parse_warc_stream_bounded_on_hostile_input():
    # a garbage tail with no CRLFCRLF must be rejected on its first 5
    # bytes, not buffered to EOF
    import io

    from rassengine_spark.sources.warc import parse_warc_stream

    class CountingIO(io.RawIOBase):
        def __init__(self, data):
            self._b = io.BytesIO(data)
            self.reads = 0

        def read(self, n=-1):
            self.reads += 1
            return self._b.read(1 << 10)

    good = _record("response", "http://x/a", HTTP)
    tail = CountingIO(good + b"<html>error page with no crlf" * 100000)
    recs = list(parse_warc_stream(tail, "f"))
    assert len(recs) == 1
    # one read services the record; the garbage stops at the magic check
    # without draining the stream
    assert tail.reads < 10

    # a hostile Content-Length must not buffer toward 256 MB
    big = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: 999999999999\r\n\r\n" + b"x" * 100)
    assert list(parse_warc_stream(CountingIO(big), "f")) == []


def test_warc_member_index_and_ranged_read(spark, tmp_path):
    """Record-level split points: the member index finds every gzip
    member's compressed extent; ranged reads over the index reproduce
    the whole-file read exactly, member by member."""
    import gzip

    from rassengine_spark.sources.warc import (build_warc_member_index,
                                               read_warc_ranged)

    members = [gzip.compress(_record("response", f"http://x/{i}", HTTP))
               for i in range(5)]
    blob = b"".join(members)
    (tmp_path / "crawl.warc.gz").write_bytes(blob)

    idx = build_warc_member_index(spark, str(tmp_path))
    rows = sorted(idx.collect(), key=lambda r: r.offset)
    # extents tile the file and match the per-member byte lengths
    assert [r.length for r in rows] == [len(m) for m in members]
    assert rows[0].offset == 0
    for a, b in zip(rows, rows[1:]):
        assert b.offset == a.offset + a.length

    whole = {(r.target_uri, bytes(r.payload))
             for r in read_warc(spark, str(tmp_path)).collect()}
    ranged = read_warc_ranged(spark, idx, n_partitions=5)
    assert ranged.rdd.getNumPartitions() == 5     # range = unit of work
    assert {(r.target_uri, bytes(r.payload))
            for r in ranged.collect()} == whole


def test_warc_coalesced_ranges_parse_identically(spark, tmp_path):
    """Adjacent members grouped into ~target_bytes ranges decompress as
    one gzip stream — batched range fetches, same records."""
    import gzip

    from rassengine_spark.sources.warc import (build_warc_member_index,
                                               coalesce_member_ranges,
                                               read_warc_ranged)

    blob = b"".join(
        gzip.compress(_record("response", f"http://x/{i}", HTTP))
        for i in range(6))
    (tmp_path / "crawl.warc.gz").write_bytes(blob)

    idx = build_warc_member_index(spark, str(tmp_path))
    one = idx.collect()[0].length
    # target of ~2 members per range -> 3 ranges covering all 6 members
    ranges = coalesce_member_ranges(idx, target_bytes=2 * one)
    got = sorted(ranges.collect(), key=lambda r: r.offset)
    assert sum(r.n_members for r in got) == 6
    assert len(got) == 3
    assert sum(r.length for r in got) == len(blob)

    urls = {r.target_uri
            for r in read_warc_ranged(spark, ranges).collect()}
    assert urls == {f"http://x/{i}" for i in range(6)}


def test_warc_member_walk_bounds_and_truncation():
    """The member walk discards plaintext (no decompressed buffering)
    and drops a truncated final member instead of yielding garbage."""
    import gzip
    import io

    from rassengine_spark.sources.warc import _walk_gzip_members

    members = [gzip.compress(_record("response", f"http://x/{i}",
                                     b"y" * 50000)) for i in range(3)]
    blob = b"".join(members)
    exts = list(_walk_gzip_members(io.BytesIO(blob)))
    assert [ln for _, ln in exts] == [len(m) for m in members]

    # truncated final member: first two still index, the partial is dropped
    cut = blob[:len(members[0]) + len(members[1]) + 10]
    exts = list(_walk_gzip_members(io.BytesIO(cut)))
    assert [ln for _, ln in exts] == [len(members[0]), len(members[1])]

    # non-gzip garbage yields nothing (and terminates)
    assert list(_walk_gzip_members(io.BytesIO(b"not gzip at all"))) == []
