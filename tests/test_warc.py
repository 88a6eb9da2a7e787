"""WARC source (sources/warc.py): record framing, per-record gzip
members, HTTP splitting, HTML text extraction, and the distributed
binaryFile + mapInPandas reader."""

import glob
import os

import pytest

from fluxgraph_spark.sources import warc as W


def _recs(n=3):
    return [
        {
            "url": f"https://x.example/p/{i}",
            "date": "2024-02-0%dT00:00:00Z" % (i + 1),
            "payload": (
                "<html><head><title>t%d</title><style>p{color:red}</style>"
                "</head><body><p>body &amp; text %d</p>"
                "<script>var x = 1 &lt; 2;</script></body></html>" % (i, i)
            ).encode(),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(tmp_path, compress):
    p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    W.write_warc(_recs(), p, compress=compress)
    got = list(W.parse_warc(open(p, "rb").read()))
    assert [h["WARC-Type"] for h, _ in got] == ["warcinfo"] + ["response"] * 3
    for i, (h, payload) in enumerate(got[1:]):
        assert h["WARC-Target-URI"] == f"https://x.example/p/{i}"
        assert int(h["Content-Length"]) == len(payload)
        body = W.http_response_body(payload).decode()
        # entities resolved, script/style contents dropped, title kept
        assert W.html_to_text(body, collapse=False) == f"t{i}body & text {i}"
        assert W.html_to_text(body) == f"t{i}body & text {i}"
    # gzip framing: one member per record -> splittable
    if compress:
        data = open(p, "rb").read()
        assert data.count(b"\x1f\x8b\x08") >= 4


def test_warc_parse_rejects_garbage_and_truncation(tmp_path):
    with pytest.raises(ValueError, match="not a WARC record"):
        list(W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnope"))
    p = str(tmp_path / "t.warc")
    W.write_warc(_recs(1), p)
    data = open(p, "rb").read()
    with pytest.raises(ValueError, match="truncated"):
        list(W.parse_warc(data[:-20]))


def test_read_warc_distributed(spark, tmp_path):
    """The executor-side parse over binaryFile: every response record of
    every file comes back typed; warcinfo filtered by default; record
    parallelism is per file."""
    d = str(tmp_path / "crawl")
    os.makedirs(d)
    for f in range(3):
        W.write_warc(_recs(4), os.path.join(d, f"part-{f}.warc.gz"), compress=True)
    df = W.read_warc(spark, d + "/*.warc.gz")
    rows = df.collect()
    assert len(rows) == 12
    assert {r["record_type"] for r in rows} == {"response"}
    assert all(r["url"].startswith("https://x.example/p/") for r in rows)
    every = W.read_warc(spark, d + "/*.warc.gz", record_type=None)
    assert every.count() == 15  # + one warcinfo per file

    txt = {r["url"]: r["text"] for r in W.extract_text(df).collect()}
    assert txt["https://x.example/p/1"] == "t1body & text 1"


def test_warc_files_from_documents_packing(spark, tmp_path):
    from fluxgraph_spark.sources.tpch import read_tables

    docs = read_tables(spark, "/root/testdata/sf0.001")["documents"]
    d = str(tmp_path / "fx")
    n_files = W.warc_files_from_documents(docs, d, every=17, per_file=8)
    files = sorted(glob.glob(d + "/*.warc.gz"))
    assert len(files) == n_files
    n_docs = docs.where("doc_id % 17 = 0").count()
    assert n_files == -(-n_docs // 8)
    total = W.read_warc(spark, d + "/*.warc.gz").count()
    assert total == n_docs
