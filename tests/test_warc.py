"""WARC source (SURVEY R69): distributed record split via lineSep,
pure-Catalyst record parse, corpus-schema output, pipeline e2e."""

import datetime

from pii_spark.spark.warc import make_warc_bytes, read_warc

PAGES = [
    (
        "https://a.example.com/article",
        "2017-03-22T17:22:30Z",
        "<html><head><title>T</title><style>b{}</style></head><body>"
        "<p>The quick brown fox jumps over the lazy dog near the "
        "river.</p><p>Contact jane.doe@gmail.com for details "
        "today.</p></body></html>",
    ),
    (
        "https://b.example.com/page",
        "2018-06-01T08:00:00Z",
        "<html><body><h1>Heading</h1><p>Second page body text with "
        "enough words to be a real paragraph of content.</p>"
        "</body></html>",
    ),
]


def _write(tmp_path, n_files=1):
    d = tmp_path / "warc"
    d.mkdir()
    per = max(1, len(PAGES) // n_files)
    for i in range(n_files):
        chunk = PAGES[i * per:(i + 1) * per] or PAGES[:1]
        (d / f"part{i}.warc").write_bytes(make_warc_bytes(chunk))
    return str(d)


def test_read_warc_parses_responses_only(spark, tmp_path):
    df = read_warc(spark, _write(tmp_path)).orderBy("url")
    rows = df.collect()
    # the warcinfo record and file preamble are filtered out
    assert [r.url for r in rows] == [u for u, _, _ in PAGES]
    assert rows[0].warc_ts == datetime.datetime(2017, 3, 22, 17, 22, 30)
    # html carries the raw HTTP body bytes EXACTLY — no leaked record
    # terminator (review r5c pinned: parse emits the body, not
    # body + '\r\n\r\n')
    assert bytes(rows[0].html) == PAGES[0][2].encode()
    assert b"jane.doe@gmail.com" in bytes(rows[0].html)
    # text is the regex-tier extraction: tags/style gone, text kept
    assert "quick brown fox" in rows[0].text
    assert "<p>" not in rows[0].text and "b{}" not in rows[0].text
    assert rows[1].text.startswith("Heading")
    assert rows[0].lang is None
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_read_warc_multifile_and_pipeline_e2e(spark, tmp_path):
    from pii_spark.spark.pipeline import run_pipeline

    corpus = read_warc(spark, _write(tmp_path, n_files=2))
    out = {r.url: r for r in run_pipeline(corpus).collect()}
    a = out["https://a.example.com/article"]
    # the crawled page flows through the full quality+scrub chain:
    # the email is scrubbed, the page text survives
    assert "jane.doe@gmail.com" not in a.scrubbed_text
    assert "quick brown fox" in a.scrubbed_text


def test_variant_dates_never_abort_the_job(spark, tmp_path):
    """Review r5c: under ANSI mode a plain to_timestamp would throw on
    one bad date and kill the whole ingest. Fractional seconds (legal
    WARC, warcio/wget emit them) must parse; a missing/garbage date
    must yield NULL, never an exception."""
    pages = [
        ("https://f.example.com/frac", "2017-03-22T17:22:30.123456Z",
         "<html><body><p>fractional seconds page body here</p></body></html>"),
        ("https://g.example.com/bad", "not-a-date",
         "<html><body><p>garbage date page body right here</p></body></html>"),
        ("https://h.example.com/off1", "2017-03-22T17:22:30+00:00",
         "<html><body><p>colon offset page body goes here</p></body></html>"),
        ("https://i.example.com/off2", "2017-03-22T18:22:30+0100",
         "<html><body><p>compact offset page body goes here</p></body></html>"),
    ]
    d = tmp_path / "wd"
    d.mkdir()
    (d / "p.warc").write_bytes(make_warc_bytes(pages))
    rows = {r.url: r for r in read_warc(spark, str(d)).collect()}
    assert rows["https://f.example.com/frac"].warc_ts == \
        datetime.datetime(2017, 3, 22, 17, 22, 30)
    assert rows["https://g.example.com/bad"].warc_ts is None
    assert "garbage date page" in rows["https://g.example.com/bad"].text
    # numeric UTC offsets (colon and compact) parse, not NULL: both
    # name the same instant, 17:22:30 UTC
    same = datetime.datetime(2017, 3, 22, 17, 22, 30)
    assert rows["https://h.example.com/off1"].warc_ts == same
    assert rows["https://i.example.com/off2"].warc_ts == same


def test_content_length_not_trusted_for_split(spark, tmp_path):
    """A record whose body CONTAINS the delimiter bytes would split
    wrong under lineSep — assert the honest behavior: the record
    parses as two chunks and the poisoned tail is dropped (no crash,
    no silent corruption of other records)."""
    poison = [(
        "https://c.example.com/poison",
        "2019-01-01T00:00:00Z",
        "before WARC/1.0\r\n after",  # delimiter inside the body
    )]
    d = tmp_path / "w2"
    d.mkdir()
    (d / "p.warc").write_bytes(make_warc_bytes(poison + PAGES[:1]))
    rows = read_warc(spark, str(d)).collect()
    urls = sorted(r.url for r in rows)
    # the clean record still parses; the poisoned one keeps its head
    assert "https://a.example.com/article" in urls
    assert "https://c.example.com/poison" in urls
    body = [r.text for r in rows if r.url.endswith("poison")][0]
    assert body.startswith("before")
    assert "after" not in body


def test_content_length_guard_drops_gross_truncation(spark, tmp_path):
    """Review r5 ADVICE: Content-Length is now parsed as a corruption
    guard. A record losing >3/4 of its payload to an in-band delimiter
    (payload_chars*4 < Content-Length is impossible for any UTF-8
    decode) is dropped rather than emitted truncated; mild truncation
    still follows the keep-the-head behavior pinned above."""
    poison = [(
        "https://d.example.com/gross",
        "2019-01-01T00:00:00Z",
        "tiny WARC/1.0\r\n" + "y" * 5000,  # head keeps ~70 of ~5100
    )]
    d = tmp_path / "w3"
    d.mkdir()
    (d / "p.warc").write_bytes(make_warc_bytes(poison + PAGES[:1]))
    urls = sorted(r.url for r in read_warc(spark, str(d)).collect())
    assert urls == ["https://a.example.com/article"]


def test_mixed_case_warc_headers_roundtrip(spark, tmp_path):
    """VERDICT r5 #4: header NAMES are case-insensitive (RFC field
    semantics; non-CC writers emit Warc-Target-Uri). Same fixture,
    re-cased headers — identical parse."""
    raw = make_warc_bytes(PAGES)
    cased = (raw.replace(b"WARC-Type", b"Warc-Type")
                .replace(b"WARC-Target-URI", b"Warc-Target-Uri")
                .replace(b"WARC-Date", b"wArC-dAtE"))
    assert cased != raw
    d1, d2 = tmp_path / "canon", tmp_path / "cased"
    d1.mkdir(), d2.mkdir()
    (d1 / "p.warc").write_bytes(raw)
    (d2 / "p.warc").write_bytes(cased)
    a = {r.url: (r.warc_ts, r.text) for r in read_warc(spark, str(d1)).collect()}
    b = {r.url: (r.warc_ts, r.text) for r in read_warc(spark, str(d2)).collect()}
    assert a == b and len(a) == len(PAGES)


def test_per_record_gzip_reader_byte_parity(spark, tmp_path):
    """VERDICT r5 #3: Common Crawl's actual distribution format is
    .warc.gz with ONE gzip member per record. The binaryFile reader
    must emit byte-identical output to the uncompressed lineSep
    reader on the same records."""
    import gzip

    from pii_spark.spark.warc import make_warc_records, read_warc_binary

    recs = make_warc_records(PAGES)
    d1, d2 = tmp_path / "plain", tmp_path / "gz"
    d1.mkdir(), d2.mkdir()
    (d1 / "p.warc").write_bytes(b"".join(recs))
    (d2 / "p.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )
    plain = {r.url: (r.warc_ts, bytes(r.html), r.text)
             for r in read_warc(spark, str(d1)).collect()}
    gz = {r.url: (r.warc_ts, bytes(r.html), r.text)
          for r in read_warc_binary(spark, str(d2)).collect()}
    assert gz == plain and len(gz) == len(PAGES)
    # the binary reader also reads UNcompressed files byte-identically
    # (magic detection per file)
    binplain = {r.url: (r.warc_ts, bytes(r.html), r.text)
                for r in read_warc_binary(spark, str(d1)).collect()}
    assert binplain == plain


def test_charset_aware_decode_on_binary_path(spark, tmp_path):
    """VERDICT r5 #5: a Latin-1 page (charset declared in the HTTP
    Content-Type) survives with correct text on the binaryFile path;
    UTF-8 corpora are byte-identical to the lineSep reader."""
    from pii_spark.spark.warc import make_warc_bytes, read_warc_binary

    latin = [(
        "https://l.example.com/café",
        "2020-05-05T05:05:05Z",
        "<html><body><p>Le café à la crème coûte "
        "très cher près de la gare aujourd'hui.</p>"
        "</body></html>",
    )]
    d = tmp_path / "lat"
    d.mkdir()
    (d / "p.warc").write_bytes(make_warc_bytes(latin, charset="iso-8859-1"))
    rows = read_warc_binary(spark, str(d)).collect()
    assert len(rows) == 1
    assert "café à la crème coûte très cher" in rows[0].text
    # the lineSep reader on the same file mojibakes (documented UTF-8
    # caveat) — the binary path is the fix, not a silent no-op
    mojibake = read_warc(spark, str(d)).collect()[0].text
    assert "caf�" in mojibake


def test_streaming_warc_ingest_with_resume(spark, tmp_path):
    """Streaming twin: files landing in a watched dir flow through the
    same parse into a checkpointed sink; a restart processes ONLY the
    newly landed file (file-granular exactly-once)."""
    from pii_spark.spark.warc import read_warc_stream

    src = tmp_path / "stream"
    src.mkdir()
    (src / "a.warc").write_bytes(make_warc_bytes(PAGES[:1]))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (read_warc_stream(spark, str(src))
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    got = spark.read.parquet(out)
    assert [r.url for r in got.collect()] == [PAGES[0][0]]
    # second file lands; restart ingests just it (no re-processing)
    (src / "b.warc").write_bytes(make_warc_bytes(PAGES[1:]))
    drain()
    urls = sorted(r.url for r in spark.read.parquet(out).collect())
    assert urls == sorted(u for u, _, _ in PAGES)
    # parse parity with the batch reader
    batch = {r.url: r.text for r in read_warc(spark, str(src)).collect()}
    stream = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert batch == stream


def test_whole_file_gzip_reads_via_binary_path(spark, tmp_path):
    """VERDICT r6 #2: a misframed .warc.gz (ONE gzip member over the
    whole multi-record file — not CC's member-per-record framing) must
    still parse correctly through read_warc_binary, with the member
    stream cut on the delimiter at bounded memory, byte-identical to
    the uncompressed parse."""
    import gzip

    from pii_spark.spark.warc import read_warc_binary

    raw = make_warc_bytes(PAGES)
    d1, d2 = tmp_path / "plain", tmp_path / "whole"
    d1.mkdir(), d2.mkdir()
    (d1 / "p.warc").write_bytes(raw)
    (d2 / "p.warc.gz").write_bytes(gzip.compress(raw))  # single member
    plain = {r.url: (r.warc_ts, bytes(r.html), r.text)
             for r in read_warc(spark, str(d1)).collect()}
    whole = {r.url: (r.warc_ts, bytes(r.html), r.text)
             for r in read_warc_binary(spark, str(d2)).collect()}
    assert whole == plain and len(whole) == len(PAGES)


def test_corrupt_gzip_member_costs_a_suffix_not_the_job(spark, tmp_path):
    """ADVICE r6: one corrupt gzip member mid-shard must not fail the
    whole read (and its task retries) — records before the corruption
    parse, the remainder of the file is treated as a truncated tail."""
    import gzip

    from pii_spark.spark.warc import make_warc_records, read_warc_binary

    recs = make_warc_records(PAGES)  # warcinfo + 2 responses
    good = [gzip.compress(r) for r in recs]
    # corrupt the LAST member's deflate stream (keep the gzip header so
    # the member starts parsing, then dies mid-stream)
    bad = bytearray(good[-1])
    for i in range(12, min(len(bad) - 9, 40)):
        bad[i] ^= 0xFF
    d = tmp_path / "corrupt"
    d.mkdir()
    (d / "p.warc.gz").write_bytes(b"".join(good[:-1]) + bytes(bad))
    rows = read_warc_binary(spark, str(d)).collect()
    # first response survives; the corrupted trailing record is gone
    urls = sorted(r.url for r in rows)
    assert PAGES[0][0] in urls
    assert PAGES[1][0] not in urls


def test_truncation_diagnostics_columns(spark, tmp_path):
    """ADVICE r6: the 4x Content-Length guard only drops records that
    lost >75% of their payload; with_diagnostics=True exposes
    content_length + payload_chars so an audit can census the
    near-threshold residue (mildly truncated records that pass)."""
    poison = [(
        "https://m.example.com/mild",
        "2019-01-01T00:00:00Z",
        "head text before WARC/1.0\r\n" + "z" * 20,  # mild: keeps most
    )]
    d = tmp_path / "diag"
    d.mkdir()
    (d / "p.warc").write_bytes(make_warc_bytes(poison + PAGES[:1]))
    df = read_warc(spark, str(d), with_diagnostics=True)
    assert df.columns == [
        "url", "warc_ts", "html", "text", "lang",
        "content_length", "payload_chars",
    ]
    rows = {r.url: r for r in df.collect()}
    mild = rows["https://m.example.com/mild"]
    clean = rows[PAGES[0][0]]
    # the truncated record passed the 4x guard but its census ratio
    # betrays it; the clean record decodes ~all its declared bytes
    assert mild.payload_chars * 4 >= mild.content_length
    assert mild.payload_chars < 0.9 * mild.content_length
    assert clean.payload_chars > 0.9 * clean.content_length
    # default schema unchanged (the pipeline contract)
    assert read_warc(spark, str(d)).columns == [
        "url", "warc_ts", "html", "text", "lang",
    ]


def test_streaming_gz_landing_dir_with_restart(spark, tmp_path):
    """VERDICT r6 missing #3: a live crawl lands per-record-gzip
    .warc.gz files; the binaryFile streaming source ingests them with
    file-granular exactly-once (restart processes ONLY the new file)
    and byte parity with the batch read_warc_binary parse."""
    import gzip

    from pii_spark.spark.warc import (
        make_warc_records,
        read_warc_binary,
        read_warc_stream_binary,
    )

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in make_warc_records(PAGES[:1]))
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (read_warc_stream_binary(spark, str(src))
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    assert [r.url for r in spark.read.parquet(out).collect()] == \
        [PAGES[0][0]]
    (src / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in make_warc_records(PAGES[1:]))
    )
    drain()
    stream = {r.url: (r.warc_ts, bytes(r.html), r.text)
              for r in spark.read.parquet(out).collect()}
    batch = {r.url: (r.warc_ts, bytes(r.html), r.text)
             for r in read_warc_binary(spark, str(src)).collect()}
    assert stream == batch and len(stream) == len(PAGES)
