"""Sinks (reference: src/infrastructure/{mongodb,couchdb,documentdb}/data_repo.rs).

The reference bulk-inserts JSON documents into a NoSQL collection. The
rebuild's canonical sink is a parquet table per ``target_table`` (what the
correctness harness reads); the document sink renders each row to a JSON
line — the same wire shape the reference sends to Mongo's insert_many — and
ships it via a connector when one is on the classpath.
"""

from .parquet_sink import ParquetSink
from .document_sink import (
    DocumentSink,
    JsonLinesWriter,
    make_couchdb_writer,
    make_mongo_writer,
)

__all__ = [
    "ParquetSink",
    "DocumentSink",
    "JsonLinesWriter",
    "make_couchdb_writer",
    "make_mongo_writer",
]
