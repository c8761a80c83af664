"""XML parser fidelity (FIXTURES A6, xml_parser.rs semantics)."""

from __future__ import annotations

import pytest

from data_ingestion_spark.errors import ParseError
from data_ingestion_spark.sources import read_xml
from data_ingestion_spark.sources.xml_source import parse_xml_records

A6 = """<?xml version="1.0" encoding="UTF-8"?>
<data>
  <record id="1">
    <name>John Doe</name>
    <age>30</age>
    <email>john.doe@example.com</email>
  </record>
  <record id="2">
    <name>Jane Roe</name>
    <age>25</age>
    <email>jane.roe@example.com</email>
  </record>
</data>
"""


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_record_extraction_unit():
    docs = parse_xml_records(A6.encode())
    assert docs == [
        {"id": "1", "name": "John Doe", "age": "30", "email": "john.doe@example.com"},
        {"id": "2", "name": "Jane Roe", "age": "25", "email": "jane.roe@example.com"},
    ]


def test_record_extraction_spark(spark, tmp_path):
    p = write(tmp_path, "a6.xml", A6)
    df = read_xml(spark, p)
    assert sorted(df.columns) == ["age", "email", "id", "name"]
    rows = sorted((r.asDict() for r in df.collect()), key=lambda r: r["id"])
    assert rows[0] == {
        "id": "1", "name": "John Doe", "age": "30", "email": "john.doe@example.com",
    }
    assert all(isinstance(v, str) for r in rows for v in r.values())


def test_repeated_tags_overwrite():
    # xml_parser.rs:42 — Map insert semantics: later value wins
    xml = "<d><record><t>first</t><t>second</t></record></d>"
    assert parse_xml_records(xml.encode()) == [{"t": "second"}]


def test_non_record_elements_ignored():
    xml = "<d><meta><t>x</t></meta><record a='1'><b>2</b></record></d>"
    assert parse_xml_records(xml.encode()) == [{"a": "1", "b": "2"}]


def test_zero_records_is_error(spark, tmp_path):
    # xml_parser.rs:66-69
    p = write(tmp_path, "empty.xml", "<data><other>x</other></data>")
    with pytest.raises(ParseError, match="No records found"):
        read_xml(spark, p)


def test_heterogeneous_records(spark, tmp_path):
    xml = "<d><record a='1'><x>1</x></record><record b='2'><y>2</y></record></d>"
    p = write(tmp_path, "het.xml", xml)
    df = read_xml(spark, p)
    assert sorted(df.columns) == ["a", "b", "x", "y"]
    rows = sorted((r.asDict() for r in df.collect()), key=lambda r: r["a"] is None)
    assert rows[0] == {"a": "1", "x": "1", "b": None, "y": None}
    assert rows[1] == {"a": None, "x": None, "b": "2", "y": "2"}
