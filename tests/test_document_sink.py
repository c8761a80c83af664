"""NoSQL bulk-writer connectors: batching + wire-payload shape, driven by
fake clients/transports (the container ships no pymongo / no CouchDB).

Reference parity targets:
- mongodb/data_repo.rs:32-59  — insert_many batches, one client per writer
- couchdb/data_repo.rs:22-59  — POST {db}/_bulk_docs with {"docs": [...]}
"""

from __future__ import annotations

import json

import pytest

from data_ingestion_spark.sinks import (
    DocumentSink,
    JsonLinesWriter,
    make_couchdb_writer,
    make_mongo_writer,
)


class FakeCollection:
    def __init__(self, log):
        self.log = log

    def insert_many(self, batch):
        self.log.append(list(batch))


class FakeMongoClient:
    def __init__(self, log):
        self.log = log
        self.closed = False
        self.dbs: dict = {}

    def __getitem__(self, db):
        return self.dbs.setdefault(db, {})

    def close(self):
        self.closed = True


def make_fake_mongo():
    inserts: list = []
    client = FakeMongoClient(inserts)

    class _DB(dict):
        def __missing__(self, coll):
            c = FakeCollection(inserts)
            self[coll] = c
            return c

    client.dbs["testdb"] = _DB()
    return client, inserts


def docs(n):
    return iter(json.dumps({"i": i, "name": f"doc{i}"}) for i in range(n))


def test_mongo_batch_flush_boundaries():
    client, inserts = make_fake_mongo()
    writer = make_mongo_writer(
        "mongodb://unused", "testdb", batch_size=2, client_factory=lambda: client
    )
    writer("events", docs(5))
    assert [len(b) for b in inserts] == [2, 2, 1]  # full, full, remainder
    assert inserts[0][0] == {"i": 0, "name": "doc0"}
    assert inserts[-1][-1] == {"i": 4, "name": "doc4"}
    assert client.closed


def test_mongo_exact_multiple_no_empty_batch():
    client, inserts = make_fake_mongo()
    writer = make_mongo_writer(
        "mongodb://unused", "testdb", batch_size=3, client_factory=lambda: client
    )
    writer("events", docs(6))
    assert [len(b) for b in inserts] == [3, 3]  # no trailing empty insert


def test_mongo_empty_iterator_no_insert():
    client, inserts = make_fake_mongo()
    writer = make_mongo_writer(
        "mongodb://unused", "testdb", batch_size=3, client_factory=lambda: client
    )
    writer("events", iter([]))
    assert inserts == []
    assert client.closed


def test_couchdb_bulk_docs_payload_shape():
    calls: list = []

    def transport(url, body):
        calls.append((url, json.loads(body.decode("utf-8"))))

    writer = make_couchdb_writer(
        "http://couch:5984/", batch_size=2, transport=transport
    )
    writer("mytable", docs(3))
    assert [u for u, _ in calls] == ["http://couch:5984/mytable/_bulk_docs"] * 2
    assert all(set(p.keys()) == {"docs"} for _, p in calls)  # _bulk_docs shape
    assert [len(p["docs"]) for _, p in calls] == [2, 1]
    assert calls[0][1]["docs"][0] == {"i": 0, "name": "doc0"}


def test_couchdb_empty_iterator_no_post():
    calls: list = []
    writer = make_couchdb_writer(
        "http://couch:5984", batch_size=2, transport=lambda u, b: calls.append(u)
    )
    writer("t", iter([]))
    assert calls == []


def test_document_sink_renders_rows_to_json(spark, tmp_path):
    # end-to-end through foreachPartition with the filesystem-backed writer
    # (fake clients can't cross the executor process boundary)
    df = spark.createDataFrame(
        [(1, "Alice"), (2, "Bob")], "id bigint, name string"
    ).coalesce(1)
    sink = DocumentSink(JsonLinesWriter(str(tmp_path)))
    sink.insert_documents("people", df)
    out = []
    for p in (tmp_path / "people").glob("*.jsonl"):
        out += [json.loads(line) for line in p.read_text().splitlines()]
    assert sorted(out, key=lambda d: d["id"]) == [
        {"id": 1, "name": "Alice"},
        {"id": 2, "name": "Bob"},
    ]


# ---------------------------------------------------------------------------
# Live-Mongo seam: real-wire coverage the day the environment provides a DB
# (reference CI tests against live Mongo 7, .github/workflows/ci-cd.yml).
# Skipped when pymongo is absent or no mongod answers a 500ms ping.
# ---------------------------------------------------------------------------
def _mongo_uri_if_reachable():
    import os

    try:
        import pymongo
    except ImportError:
        return None
    uri = os.environ.get("MONGO_URI", "mongodb://localhost:27017")
    try:
        client = pymongo.MongoClient(uri, serverSelectionTimeoutMS=500)
        client.admin.command("ping")
        client.close()
        return uri
    except Exception:
        return None


_LIVE_MONGO_URI = _mongo_uri_if_reachable()


@pytest.mark.skipif(
    _LIVE_MONGO_URI is None, reason="pymongo not installed or no mongod reachable"
)
def test_mongo_live_round_trip(spark):
    import uuid

    import pymongo

    coll_name = f"rt_{uuid.uuid4().hex[:12]}"
    df = spark.createDataFrame(
        [(1, "Alice", 9.5), (2, "Bob", 7.25)], "id bigint, name string, score double"
    ).coalesce(1)
    sink = DocumentSink(make_mongo_writer(_LIVE_MONGO_URI, "di_spark_test"))
    sink.insert_documents(coll_name, df)

    client = pymongo.MongoClient(_LIVE_MONGO_URI)
    try:
        docs = sorted(
            (
                {k: v for k, v in d.items() if k != "_id"}
                for d in client["di_spark_test"][coll_name].find()
            ),
            key=lambda d: d["id"],
        )
        assert docs == [
            {"id": 1, "name": "Alice", "score": 9.5},
            {"id": 2, "name": "Bob", "score": 7.25},
        ]
    finally:
        client["di_spark_test"].drop_collection(coll_name)
        client.close()
