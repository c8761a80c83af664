"""Document-store sink: rows → JSON documents → bulk insert.

The reference's Mongo/CouchDB/DocumentDB repos all do the same thing: render
each record as a JSON document and bulk-insert into a named collection
(mongodb/data_repo.rs:32-59, couchdb/data_repo.rs:22-59 `_bulk_docs`,
documentdb/data_repo.rs:17-44). The rebuild expresses that as:

    df → to_json(struct(*))  [JVM-side render, one string column]
      → foreachPartition(bulk insert of batches)

The connector layer is pluggable and import-gated: with pymongo installed,
``MongoBulkWriter`` ships batches via insert_many (one connection per
partition, batched — never per-row); without it, ``JsonLinesWriter`` lands
the same wire payload as .jsonl files so the dataflow stays testable in this
container. Both run executor-side and scale with partition count.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable, Iterable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BulkWriter = Callable[[str, Iterator[str]], None]


class JsonLinesWriter:
    """Default bulk 'connector': one .jsonl part per partition batch.

    Stands in for the NoSQL wire protocol in environments without a driver;
    the payload per document is byte-identical to what insert_many would
    receive.
    """

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir

    def __call__(self, target_table: str, docs: Iterator[str]) -> None:
        table_dir = os.path.join(self.out_dir, target_table)
        os.makedirs(table_dir, exist_ok=True)
        part = os.path.join(table_dir, f"part-{uuid.uuid4().hex}.jsonl")
        wrote = False
        with open(part, "w", encoding="utf-8") as fh:
            for doc in docs:
                fh.write(doc)
                fh.write("\n")
                wrote = True
        if not wrote:
            os.remove(part)


def make_mongo_writer(uri: str, database: str, batch_size: int = 1000) -> BulkWriter:
    """Bulk writer over pymongo, import-gated (not in this container)."""
    try:
        import pymongo  # noqa: F401
    except ImportError as ex:  # pragma: no cover - container has no pymongo
        raise NotImplementedError(
            "pymongo is not installed; use JsonLinesWriter or add the "
            "mongo-spark-connector jar and write via df.write.format('mongodb')"
        ) from ex
    import json

    def _write(target_table: str, docs: Iterator[str]) -> None:  # pragma: no cover
        import pymongo

        client = pymongo.MongoClient(uri)
        coll = client[database][target_table]
        batch = []
        for doc in docs:
            batch.append(json.loads(doc))
            if len(batch) >= batch_size:
                coll.insert_many(batch)
                batch = []
        if batch:
            coll.insert_many(batch)
        client.close()

    return _write


class DocumentSink:
    def __init__(self, bulk_writer: BulkWriter) -> None:
        self.bulk_writer = bulk_writer

    def insert_documents(self, target_table: str, df: DataFrame) -> None:
        """Render rows to JSON docs JVM-side, bulk-insert per partition."""
        docs = df.select(F.to_json(F.struct(*df.columns)).alias("doc"))
        writer = self.bulk_writer

        def _per_partition(rows: Iterable) -> None:
            writer(target_table, (r["doc"] for r in rows))

        docs.foreachPartition(_per_partition)
