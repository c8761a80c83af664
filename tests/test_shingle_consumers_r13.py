"""Round-13 shingle-base re-plumbs (the r12 verdict's task 6, after
same-session A/B at sf0.1: decontaminate 1.5 s inline → 0.5 s stored,
split-leakage 0.48 → 0.42 s): decontaminate_docs and
split_leakage_ngram_docs now read their gram streams from the committed
shingle base. The stored path must emit exactly the inline
tokenize-per-query rows, and the plans must scan the committed vtab_
tables for the gram stream."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F


def _doc_corpus(spark, tmp_path, n=120, seed=31):
    rnd = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(n):
        # a few sub-3-token docs: no grams on either path, but they
        # still count in split-leakage's n_test denominators
        if i % 37 == 0:
            k = 2
        else:
            k = rnd.randrange(4, 28)
        text = " ".join(rnd.choices(vocab, k=k))
        if i % 10 == 5:
            # planted gram overlap with the %97 pseudo-benchmark slice
            # (doc 0) and across split buckets, so both consumers'
            # non-empty regimes are exercised
            text = "alpha beta gamma delta " + text
        rows.append((i, text, "en", f"s{i % 3}", len(text)))
    rows[0] = (0, "alpha beta gamma delta", "en", "s0", 22)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_decontaminate_stored_equals_inline(spark, tmp_path):
    from data_ingestion_spark.operators import dedup
    from data_ingestion_spark.operators.registry import decontaminate_docs
    from data_ingestion_spark.session import load_table

    sf = _doc_corpus(spark, tmp_path)
    got = {tuple(r) for r in decontaminate_docs(spark, sf).collect()}
    docs = load_table(spark, sf, "documents")
    inline = {
        tuple(r)
        for r in dedup.contamination(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "doc_id",
            "text",
            k=3,
        )
        .withColumnRenamed("id", "doc_id")
        .collect()
    }
    assert got == inline and got


def test_split_leakage_stored_equals_inline(spark, tmp_path):
    from data_ingestion_spark.functions import md5_hash60, tokens, word_shingles
    from data_ingestion_spark.operators.registry3 import (
        split_leakage_ngram_docs,
    )
    from data_ingestion_spark.session import load_table

    sf = _doc_corpus(spark, tmp_path, n=200, seed=33)
    got = {tuple(r) for r in split_leakage_ngram_docs(spark, sf).collect()}
    docs = load_table(spark, sf, "documents")
    sp = docs.select(
        "doc_id", "source", "text",
        (md5_hash60(F.col("doc_id").cast("string")) % 100).alias("b"),
    )
    grams = sp.select(
        "doc_id", "b", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id", "b",
        F.explode(F.array_distinct(word_shingles(F.col("toks"), 3))).alias(
            "gram"
        ),
    ).select("doc_id", "b", md5_hash60(F.col("gram")).alias("gram_h"))
    train_g = grams.filter(F.col("b") < 80).select("gram_h").distinct()
    leaked = (
        grams.filter(F.col("b") >= 90)
        .join(train_g, "gram_h")
        .select("doc_id")
        .distinct()
    )
    test_docs = sp.filter(F.col("b") >= 90).select("doc_id", "source")
    inline = {
        tuple(r)
        for r in test_docs.join(
            leaked.withColumn("leak", F.lit(1)), "doc_id", "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.coalesce(F.col("leak"), F.lit(0)))
            .cast("long")
            .alias("n_leaked"),
        )
        .select(
            "source", "n_test", "n_leaked",
            F.expr("(1000000 * n_leaked) div n_test")
            .cast("long")
            .alias("leak_micro"),
        )
        .collect()
    }
    assert got == inline and got


def test_plumbed_consumers_scan_vtab(spark, tmp_path):
    """Plan pins: decontaminate's gram stream comes ENTIRELY from the
    committed base (no documents.parquet scan at all); split-leakage
    reads grams from the base and documents.parquet only for the cheap
    (doc_id, source) projection — its parquet scan must not read
    text."""
    from data_ingestion_spark.operators.registry import decontaminate_docs
    from data_ingestion_spark.operators.registry3 import (
        split_leakage_ngram_docs,
    )

    sf = _doc_corpus(spark, tmp_path, n=90, seed=35)
    plan = (
        decontaminate_docs(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "vtab_" in plan
    assert "documents.parquet" not in plan
    plan2 = (
        split_leakage_ngram_docs(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "vtab_" in plan2
    # the remaining parquet scan projects ids/source only — no scan in
    # the whole plan reads the text column anymore
    import re

    for m in re.finditer(r"ReadSchema: ([^\n]*)", plan2):
        assert "text:" not in m.group(1), m.group(1)
