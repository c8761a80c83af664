"""PDF source tests: stdlib extractor round-trips, spec escapes, dispatch
opt-in scoping, and the pipeline E2E.

The reference never shipped PDF (parser_adapter.rs:54-57 rejects it) — the
default-registry tests in test_pipeline.py still pin that rejection; these
tests cover the opt-in tier that exceeds it.
"""

from __future__ import annotations

import zlib

import pytest

from data_ingestion_spark.errors import ParseError
from data_ingestion_spark.pipeline import IngestionPipeline
from data_ingestion_spark.rules import IngestionConfigRule, RuleSet
from data_ingestion_spark.sources import dispatch
from data_ingestion_spark.sources.pdf_source import (
    pdf_encode_simple,
    pdf_extract_text_lines,
    pdf_metadata,
    pdf_parser_registered,
    read_pdf,
)


def test_pdf_roundtrip_two_pages():
    pages = [["Hello world", "Second line"], ["Page two only line"]]
    data = pdf_encode_simple(pages)
    assert pdf_metadata(data) == {
        "version": "1.4",
        "n_pages": 2,
        "page_tree": True,
        "encrypted": False,
    }
    got = pdf_extract_text_lines(data)
    assert got == [
        (1, 1, "Hello world"),
        (1, 2, "Second line"),
        (2, 1, "Page two only line"),
    ]


def test_pdf_string_escapes_roundtrip():
    lines = ["parens (nested (deep)) ok", "back\\slash", "a(b)c"]
    got = pdf_extract_text_lines(pdf_encode_simple([lines]))
    assert [s for _, _, s in got] == lines


def test_pdf_literal_escapes_and_hex_and_tj_array():
    # hand-built content stream: octal escape, \n escape, hex string, TJ
    # array with kern numbers, ' next-line-show operator
    content = (
        b"BT /F1 12 Tf 72 720 Td"
        b" (oct\\101l) Tj"            # \101 = 'A'
        b" 0 -14 Td [(ke) -120 (rned)] TJ"
        b" (quoted)'"
        b" <48657821> Tj"
        b" ET"
    )
    payload = zlib.compress(content)
    # wrap in a minimal one-page document by swapping the content object
    doc = pdf_encode_simple([["placeholder"]])
    start = doc.index(b"5 0 obj")
    end = doc.index(b"endobj", start)
    new_obj = (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\n"
        % (len(payload), payload)
    )
    # rebuild without fixing xref offsets: extractor scans objects directly
    doc = doc[:start] + new_obj + doc[end:]
    got = [s for _, _, s in pdf_extract_text_lines(doc)]
    assert got == ["octAl", "kerned", "quotedHex!"]


def test_pdf_uncompressed_stream_and_fallback_page_order():
    # no trailer /Root resolvable -> object-order fallback, raw stream
    doc = (
        b"%PDF-1.1\n"
        b"1 0 obj\n<< /Length 40 >>\nstream\n"
        b"BT (raw stream text) Tj ET"
        b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    assert pdf_extract_text_lines(doc) == [(1, 1, "raw stream text")]
    meta = pdf_metadata(doc)
    assert meta["page_tree"] is False


def test_pdf_rejections():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_extract_text_lines(b"plain text")
    enc = pdf_encode_simple([["x"]]).replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(ValueError, match="encrypted"):
        pdf_extract_text_lines(enc)
    bad_filter = pdf_encode_simple([["x"]]).replace(b"/FlateDecode", b"/LZWDecode")
    with pytest.raises(ValueError, match="unsupported PDF stream filter"):
        pdf_extract_text_lines(bad_filter)
    assert pdf_metadata(b"not a pdf") is None


def test_read_pdf_distributed_over_files(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(pdf_encode_simple([["a1", "a2"]]))
    (tmp_path / "b.pdf").write_bytes(pdf_encode_simple([["b1"], ["b2"]]))
    out = read_pdf(spark, str(tmp_path)).collect()
    assert sorted((r["page_number"], r["line_number"], r["content"]) for r in out) == [
        (1, 1, "a1"),
        (1, 1, "b1"),
        (1, 2, "a2"),
        (2, 1, "b2"),
    ]


def test_pdf_dispatch_opt_in_is_scoped(spark, tmp_path):
    # default registry rejects pdf (reference parity)...
    with pytest.raises(ParseError, match="Unsupported file type: pdf"):
        dispatch.parse_file(spark, str(tmp_path / "x.pdf"), "pdf")
    # ...inside the context it parses...
    f = tmp_path / "x.pdf"
    f.write_bytes(pdf_encode_simple([["scoped"]]))
    with pdf_parser_registered():
        got = dispatch.parse_file(spark, str(f), "pdf").collect()
        assert [r["content"] for r in got] == ["scoped"]
    # ...and the registry is restored afterwards
    with pytest.raises(ParseError, match="Unsupported file type: pdf"):
        dispatch.parse_file(spark, str(f), "pdf")


def test_pdf_pipeline_end_to_end(spark, tmp_path):
    bucket = tmp_path / "landing" / "pdf-bucket" / "docs"
    bucket.mkdir(parents=True)
    (bucket / "report.pdf").write_bytes(
        pdf_encode_simple([["Q1 revenue up", "Q2 flat"], ["appendix"]])
    )
    (bucket / "garbage.pdf").write_bytes(b"%PDF-1.4\nnot really")
    rules = RuleSet([IngestionConfigRule(r".*\.pdf$", "pdf_data")])
    pipe = IngestionPipeline(
        spark,
        warehouse_dir=str(tmp_path / "wh"),
        rules=rules,
        base_dir=str(tmp_path / "landing"),
    )
    with pdf_parser_registered():
        res = pipe.process_key("pdf-bucket", "docs/report.pdf")
        assert res.status == "Success" and res.rows == 3
        # a stream-less PDF yields zero rows (nothing extractable) but is
        # still a well-formed parse: Success with rows == 0
        res2 = pipe.process_key("pdf-bucket", "docs/garbage.pdf")
        assert res2.status == "Success" and res2.rows == 0
    table = pipe.sink.read_table("pdf_data")
    rows = {
        (r["page_number"], r["line_number"]): r["content"] for r in table.collect()
    }
    assert rows[(1, 1)] == "Q1 revenue up" and rows[(2, 1)] == "appendix"
    assert all(r["file_name"] == "pdf-bucket/docs/report.pdf" for r in table.collect())
