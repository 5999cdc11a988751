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

The record parser is STREAMING: it reads the (decompressed) byte stream
incrementally and never holds more than one record plus a read chunk —
at crawl scale a .warc.gz segment is ~1 GB compressed / ~4 GB
decompressed, and materializing the decompressed file per task is the
difference between fitting 32 concurrent tasks in executor memory and
not. The compressed blob itself still comes through ``binaryFile``
whole (that source is not splittable); the stream bounds everything
downstream of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

WARC_RECORD_SCHEMA = ("path string, record_type string, target_uri string, "
                      "warc_date string, content_type string, "
                      "payload binary")

_READ_CHUNK = 1 << 20
# WARC headers are a handful of short lines; a frame whose terminator is
# not inside this many bytes is garbage, not a header (and searching on
# for it would buffer the rest of the stream)
_MAX_HEADER_BYTES = 1 << 20
# a corrupt Content-Length must not make the fill loop buffer the whole
# remaining stream; real CC payloads are ~MBs, this bounds the damage
_MAX_RECORD_BYTES = 256 << 20


def parse_warc_stream(f, path: str = ""):
    """Yield (path, record_type, target_uri, warc_date, content_type,
    payload) per WARC record from a binary file-like, incrementally:
    the buffer holds the current record's bytes plus at most one read
    chunk, whatever the stream's total size. Tolerant of trailing
    garbage — parsing stops at the first frame that no longer starts
    with a WARC version line, and the magic check runs BEFORE the
    header-terminator search so a garbage tail is rejected after 5
    bytes, never buffered to EOF. Corrupt lengths (negative, or past
    _MAX_RECORD_BYTES) and overlong headers also stop parsing without
    rewinding."""
    buf = bytearray()
    eof = False

    def _fill() -> None:
        nonlocal eof
        chunk = f.read(_READ_CHUNK)
        if chunk:
            buf.extend(chunk)      # bytearray: amortized O(1) append
        else:
            eof = True

    while True:
        # skip inter-record CRLFs (refill so a pair never hides across a
        # chunk boundary)
        while True:
            if len(buf) < 2 and not eof:
                _fill()
                continue
            if buf[:2] == b"\r\n":
                del buf[:2]
                continue
            break
        # magic first: 5 bytes decide whether this is a record at all
        while len(buf) < 5 and not eof:
            _fill()
        if not buf.startswith(b"WARC/"):
            return
        # resume the terminator search where the last scan ended (minus
        # the 3 bytes a split terminator can straddle) — linear, not
        # quadratic, in header size
        scanned = 0
        while True:
            hdr_end = buf.find(b"\r\n\r\n", max(0, scanned - 3))
            if hdr_end >= 0 or eof or len(buf) > _MAX_HEADER_BYTES:
                break
            scanned = len(buf)
            _fill()
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in bytes(buf[:hdr_end]).split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0 or length > _MAX_RECORD_BYTES:
            return         # corrupt/hostile framing must not rewind
        body_start = hdr_end + 4
        while len(buf) < body_start + length and not eof:
            _fill()
        # a truncated tail yields its partial payload, then the loop ends
        yield (path,
               headers.get("warc-type", ""),
               headers.get("warc-target-uri", ""),
               headers.get("warc-date", ""),
               headers.get("content-type", ""),
               bytes(buf[body_start:body_start + length]))
        del buf[:body_start + length]


def parse_warc_bytes(content: bytes, path: str = ""):
    """`parse_warc_stream` over in-memory bytes (the unit-test surface
    and the one framing implementation — byte semantics live in the
    stream parser only)."""
    import io

    yield from parse_warc_stream(io.BytesIO(content), path)


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc*") -> DataFrame:
    """(path, record_type, target_uri, warc_date, content_type, payload)
    for every record in every .warc / .warc.gz file under `path`.

    .warc.gz is the Common Crawl layout: one gzip MEMBER per record;
    Python's gzip reader concatenates members transparently, so the
    decompressed STREAM is exactly the uncompressed framing — and it is
    consumed as a stream: records parse incrementally and leave in
    `chunk_records`-row frames, so peak executor memory per task is the
    compressed blob + the current record + up to chunk_records buffered
    rows (~64 MB at CC's ~1 MB response records), never the decompressed
    file (~4x the blob on real crawls)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))
    chunk_records = 64

    def run(batches):
        import gzip
        import io

        import pandas as pd
        cols = ["path", "record_type", "target_uri", "warc_date",
                "content_type", "payload"]
        for pdf in batches:
            for p, c in zip(pdf["path"], pdf["content"]):
                raw = bytes(c)
                f = (gzip.GzipFile(fileobj=io.BytesIO(raw))
                     if raw[:2] == b"\x1f\x8b" else io.BytesIO(raw))
                rows = []
                for rec in parse_warc_stream(f, p):
                    rows.append(rec)
                    if len(rows) >= chunk_records:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, WARC_RECORD_SCHEMA)


def _walk_gzip_members(f):
    """Yield (offset, length) of each gzip MEMBER in a byte stream,
    incrementally (the stream is decompressed member-by-member and the
    plaintext discarded — only the compressed extents are kept). A
    .warc.gz in the Common Crawl layout has one member per record, so
    these extents ARE the record-level split points."""
    import zlib

    pos = 0
    pending = b""
    eof = False
    while True:
        if not pending:
            if eof:
                return
            pending = f.read(_READ_CHUNK)
            if not pending:
                return
        d = zlib.decompressobj(wbits=31)     # gzip framing, single member
        start = pos
        while True:
            try:
                d.decompress(pending)        # plaintext discarded
            except zlib.error:
                return                       # corrupt member — stop cleanly
            consumed = len(pending) - len(d.unused_data)
            pos += consumed
            pending = d.unused_data
            if d.eof:
                break
            if pending:                      # corrupt: bytes left but no
                return                       # member end — stop cleanly
            chunk = f.read(_READ_CHUNK)
            if not chunk:
                eof = True
                return                       # truncated final member
            pending = chunk
        yield (start, pos - start)


def _local_path(path: str) -> str:
    """binaryFile reports file:/abs/path URIs; strip to a filesystem
    path (the local-opener case — remote stores go through `opener`)."""
    if path.startswith("file:"):
        p = path[5:]
        while p.startswith("//"):
            p = p[1:]
        return p
    return path


def build_warc_member_index(spark: SparkSession, path: str,
                            glob: str = "*.warc.gz") -> DataFrame:
    """(path, offset, length) for every gzip member of every .warc.gz
    under `path` — the engine-built analog of Common Crawl's published
    cluster.idx/CDX index. Building it costs one sequential decompress
    pass per file (inherent: member boundaries are only discoverable by
    decompressing), which is why CC publishes the index; consumers with
    a published index should load THAT into this schema and skip the
    build. Memory per task is one read chunk + zlib state — the member
    walk never materializes plaintext or the whole blob twice."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))

    def run(batches):
        import io

        import pandas as pd
        for pdf in batches:
            for p, c in zip(pdf["path"], pdf["content"]):
                rows = [(p, off, ln) for off, ln
                        in _walk_gzip_members(io.BytesIO(bytes(c)))]
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["path", "offset", "length"])

    return files.mapInPandas(run, "path string, offset long, length long")


def coalesce_member_ranges(index: DataFrame,
                           target_bytes: int = 1 << 20) -> DataFrame:
    """Group CONTIGUOUS members of the same file into ~target_bytes fetch
    ranges: (path, offset, length, n_members). Concatenated gzip members
    decompress as one stream, so a ranged fetch spanning several members
    parses exactly like the file would — this is how real CC consumers
    batch record fetches (one ~1 MB range request instead of thousands of
    tiny ones). The window sort is partition-local per file. Members of a
    well-formed .warc.gz tile the file with no gaps; the grouped length
    is max(offset+length)-min(offset), so a gap (filtered index rows)
    widens the range to COVER it rather than corrupting framing — the
    in-between members are simply parsed too."""
    w = Window.partitionBy("path").orderBy("offset")
    binned = index.withColumn(
        "_bin", F.floor((F.sum("length").over(w) - F.col("length"))
                        / F.lit(target_bytes)))
    return (binned.groupBy("path", "_bin")
            .agg(F.min("offset").alias("offset"),
                 (F.max(F.col("offset") + F.col("length"))
                  - F.min("offset")).alias("length"),
                 F.count(F.lit(1)).alias("n_members"))
            .drop("_bin"))


def read_warc_ranged(spark: SparkSession, index: DataFrame,
                     opener=None, n_partitions: int | None = None
                     ) -> DataFrame:
    """WARC records from RANGED reads driven by a member index
    (build_warc_member_index or coalesce_member_ranges output): each
    (path, offset, length) row is fetched independently — seek + read of
    the compressed extent, never the whole file — so parallelism is
    record/range-level instead of file-level, and a 1000-executor
    cluster saturates on a handful of huge crawl segments. Same output
    schema and framing semantics as read_warc (the stream parser is
    shared). `opener(path) -> file-like` is the remote-store seam (an
    HTTP/S3 range client at production; default opens local paths).
    `n_partitions` repartitions the index first — ranges, not files, are
    the unit of work."""
    cols = ["path", "offset", "length"]
    idx = index.select(*cols)
    if n_partitions:
        idx = idx.repartition(n_partitions)
    chunk_records = 64

    def run(batches):
        import gzip
        import io

        import pandas as pd
        out_cols = ["path", "record_type", "target_uri", "warc_date",
                    "content_type", "payload"]
        for pdf in batches:
            for p, off, ln in zip(pdf["path"], pdf["offset"],
                                  pdf["length"]):
                if opener is not None:
                    fh = opener(p)
                else:
                    fh = open(_local_path(p), "rb")
                try:
                    fh.seek(int(off))
                    raw = fh.read(int(ln))
                finally:
                    fh.close()
                f = (gzip.GzipFile(fileobj=io.BytesIO(raw))
                     if raw[:2] == b"\x1f\x8b" else io.BytesIO(raw))
                rows = []
                for rec in parse_warc_stream(f, p):
                    rows.append(rec)
                    if len(rows) >= chunk_records:
                        yield pd.DataFrame(rows, columns=out_cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)

    return idx.mapInPandas(run, WARC_RECORD_SCHEMA)


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
