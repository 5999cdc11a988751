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
