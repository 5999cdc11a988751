"""WARC (Web ARChive, ISO 28500) ingestion — the container format web
crawls (Common Crawl) actually ship, i.e. the raw input of a pretraining
text pipeline. Public format:

    WARC/1.0\\r\\n
    <header: value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of payload>\\r\\n\\r\\n

Spark shape: files come in through the ``binaryFile`` source (payload
offsets are BYTE-accurate, so records parse from bytes — a text read
would corrupt lengths on multi-byte characters); one Arrow pass splits
records (a per-file generator — record framing is inherently sequential
WITHIN a file, files parallelize across the cluster); everything after
that (HTTP body split, HTML->text) is declarative Column work.

Uncompressed WARC only: per-record gzip members (the .warc.gz layout)
need a streaming gzip splitter; at scale Common Crawl is re-packed to
splittable storage before Spark anyway. The seam is the records schema —
a .warc.gz reader drops in behind the same columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_RECORD_SCHEMA = ("path string, record_type string, target_uri string, "
                      "warc_date string, content_type string, "
                      "payload binary")


def parse_warc_bytes(content: bytes, path: str = ""):
    """Yield (path, record_type, target_uri, warc_date, content_type,
    payload) per WARC record. Pure function of the bytes (unit-testable
    without Spark); tolerant of trailing garbage — parsing stops at the
    first frame that no longer starts with a WARC version line."""
    pos = 0
    n = len(content)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and content[pos:pos + 2] == b"\r\n":
            pos += 2
        if not content.startswith(b"WARC/", pos):
            break
        hdr_end = content.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in content[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            break          # corrupt/hostile framing must not rewind pos
        body_start = hdr_end + 4
        payload = content[body_start:body_start + length]
        yield (path,
               headers.get("warc-type", ""),
               headers.get("warc-target-uri", ""),
               headers.get("warc-date", ""),
               headers.get("content-type", ""),
               payload)
        pos = body_start + length


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc*") -> DataFrame:
    """(path, record_type, target_uri, warc_date, content_type, payload)
    for every record in every .warc / .warc.gz file under `path`.

    .warc.gz is the Common Crawl layout: one gzip MEMBER per record;
    Python's gzip reader concatenates members transparently, so the
    decompressed stream is exactly the uncompressed framing. The
    decompression is per-file in executor memory — size
    maxPartitionBytes / executor memory for the crawl's file size (CC
    segments are ~1 GB compressed)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))

    def run(batches):
        import gzip
        import io

        import pandas as pd
        cols = ["path", "record_type", "target_uri", "warc_date",
                "content_type", "payload"]
        for pdf in batches:
            # one DataFrame PER FILE: peak executor memory is bounded by
            # a single file's records, not the whole Arrow batch (files
            # decompress to GB scale on real crawls)
            for p, c in zip(pdf["path"], pdf["content"]):
                blob = bytes(c)
                if blob[:2] == b"\x1f\x8b":
                    with gzip.GzipFile(fileobj=io.BytesIO(blob)) as f:
                        blob = f.read()
                rows = list(parse_warc_bytes(blob, p))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, WARC_RECORD_SCHEMA)


def http_body(payload: Column) -> Column:
    """The HTTP response body: bytes after the first CRLFCRLF (response
    records carry full HTTP messages). Declarative: one positional split
    on the decoded-latin1 string (a bijective byte<->char mapping, so
    offsets stay byte-exact) then re-encode."""
    s = F.decode(payload, "ISO-8859-1")
    body = F.substring(s, F.instr(s, "\r\n\r\n") + 4, 1 << 30)
    return F.when(F.instr(s, "\r\n\r\n") > 0,
                  F.encode(body, "ISO-8859-1")).otherwise(payload)


def html_to_text(col: Column) -> Column:
    """Declarative HTML -> text for crawl payloads: script/style blocks
    drop WITH their content, comments and tags strip, common entities
    decode (&amp; last), whitespace collapses. A regexp-chain projection
    (stays in codegen) — the full-fidelity parser seam is
    sources/textfiles.py's markdown path."""
    from .textfiles import decode_entities_and_collapse
    c = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"<!--[\s\S]*?-->", " ")
    c = F.regexp_replace(c, r"</?[A-Za-z!][^>]*>", " ")
    return decode_entities_and_collapse(c)


def warc_text_documents(records: DataFrame) -> DataFrame:
    """Response records -> (doc_id, url, warc_date, text): the
    crawl-to-corpus step. doc_id = md5(url + date) — deterministic and
    stable across re-parses, the key the dedup/curation tiers expect."""
    resp = records.filter(F.col("record_type") == "response")
    # cast, not decode: the binary->string CAST substitutes replacement
    # characters for invalid UTF-8 while ANSI-mode decode() ABORTS the
    # job on the first latin-1 page — and real crawls always have one
    text = html_to_text(http_body(F.col("payload")).cast("string"))
    return (resp.select(
                F.md5(F.concat(F.col("target_uri"), F.lit("@"),
                               F.col("warc_date"))).alias("doc_id"),
                F.col("target_uri").alias("url"),
                "warc_date",
                text.alias("text"))
            .filter(F.col("text").isNotNull()))
