"""Round-13 (r12 verdict task #3, closing SELFREVIEW_r12 #11): the embsig
Arrow build workers must treat NULL embeddings EXACTLY as the inline SQL
path does. The measured inline semantics (pinned here so a Spark upgrade
that changes them fails loudly): sig = 0L (every per-plane
``CASE WHEN <null dot> > 0`` takes the ELSE 0L branch — NOT a NULL sig,
correcting the r12 self-review's recollection), nrm = NULL
(fold-over-NULL-array is NULL), and list_id = 0 in BOTH semantic_assign
regimes (ivf_assign's array_sort puts the NULL-negd structs first,
tie-break idx → 0; the max_by branch's all-NULL d tie-breaks on -cid → 0).
Before r13 the workers RAISED on a NULL vector (np.stack over None) —
latent only because the embeddings fixture is non-nullable end-to-end."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

#: NULL plants: 50 and 100 hit vec_id % 50 == 0, so a NULL row also flows
#: through the _planted_embeddings twin arithmetic (NULL twin in, NULL
#: twin out); the rest are scattered. All >= 20 so the 8+ lowest-id
#: centroid seeds stay non-null under ivf_centroids_from_sample's
#: isNotNull guard.
_NULL_IDS = {37, 50, 73, 99, 100}


def _nullable_emb_corpus(spark, tmp_path, n=120, dim=64, seed=7):
    rnd = random.Random(seed)
    rows = [
        (
            i,
            None if i in _NULL_IDS else [rnd.uniform(-1, 1) for _ in range(dim)],
            i % 3,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


def test_inline_null_semantics_pin(spark):
    """The ground truth the workers replicate: sig 0L / nrm NULL /
    list_id 0 in both assign regimes, measured on the engine itself."""
    from data_ingestion_spark.functions.vector_functions import l2_norm
    from data_ingestion_spark.operators import similarity

    planes = similarity._deterministic_hyperplanes(4, 6, seed=42)
    df = spark.createDataFrame(
        [(0, [0.5, -0.2, 0.1, 0.9]), (1, None)],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: (r["sig"], r["nrm"])
        for r in df.select(
            "vec_id",
            similarity.hyperplane_signature("embedding", planes).alias("sig"),
            l2_norm(F.col("embedding")).alias("nrm"),
        ).collect()
    }
    assert rows[1] == (0, None)
    cents8 = [[float(i == j) for i in range(4)] for j in range(8)]
    cents70 = [[float(i == j % 4) for i in range(4)] for j in range(70)]
    for cents in (cents8, cents70):
        got = {
            r["vec_id"]: r["list_id"]
            for r in similarity.semantic_assign(df, cents).select(
                "vec_id", "list_id"
            ).collect()
        }
        assert got[1] == 0, len(cents)


def test_embsig_base_nulls_match_inline(spark, tmp_path):
    """Stored (sig, nrm, v) on a nullable corpus — including a NULL twin
    flowing through the plant arithmetic — must equal the inline fold
    row-for-row."""
    from data_ingestion_spark.functions.vector_functions import l2_norm
    from data_ingestion_spark.operators import registry as R
    from data_ingestion_spark.operators import similarity

    sf = _nullable_emb_corpus(spark, tmp_path)
    base, _ = R.embedding_signature_probe(spark, sf)
    got = {
        r["id"]: (r["sig"], r["nrm"], tuple(r["v"]) if r["v"] is not None else None)
        for r in base.collect()
    }
    planes = similarity._deterministic_hyperplanes(64, 60, seed=42)
    inline = R._planted_embeddings(spark, sf).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        similarity.hyperplane_signature("embedding", planes).alias("sig"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    want = {
        r["id"]: (r["sig"], r["nrm"], tuple(r["v"]) if r["v"] is not None else None)
        for r in inline.collect()
    }
    assert got == want and got
    # the NULL rows (and the two NULL twins) are present with the pinned
    # inline semantics, not silently dropped
    for i in sorted(_NULL_IDS):
        assert got[i] == (0, None, None)
    for i in (50, 100):
        assert got[i + 1_000_000_000] == (0, None, None)


def test_embsig_assign_nulls_match_inline_both_regimes(spark, tmp_path):
    """Stored list_id on a nullable corpus equals semantic_assign in the
    k <= 64 store path AND the k > 64 worker-vs-max_by path."""
    from data_ingestion_spark.operators import registry as R
    from data_ingestion_spark.operators import similarity
    from data_ingestion_spark.session import load_table

    sf = _nullable_emb_corpus(spark, tmp_path, n=200)
    _, assign = R.embedding_signature_probe(spark, sf)
    got = {r["vec_id"]: r["list_id"] for r in assign.collect()}
    emb = load_table(spark, sf, "embeddings")
    cents = similarity.ivf_centroids_from_sample(emb, n_lists=8)
    want = {
        r["vec_id"]: r["list_id"]
        for r in similarity.semantic_assign(emb, cents).collect()
    }
    assert got == want and got
    assert all(got[i] == 0 for i in _NULL_IDS)
    cents70 = similarity.ivf_centroids_from_sample(emb, n_lists=70)
    assert len(cents70) == 70
    want70 = {
        r["vec_id"]: r["list_id"]
        for r in similarity.semantic_assign(emb, cents70).collect()
    }
    pdf = emb.select("vec_id", "embedding").toPandas()
    got70 = {}
    for out in R._embsig_assign_batches(cents70)([pdf]):
        got70.update(dict(zip(out["vec_id"], out["list_id"])))
    got70 = {int(k): int(v) for k, v in got70.items()}
    assert got70 == want70 and got70


def test_lsh_and_semdedup_consumers_nulls_match_inline(spark, tmp_path):
    """End-to-end on the nullable corpus: the stored-probe consumers
    equal their inline derivations — NULL vectors band-join via sig 0
    but never verify (NULL cosine fails the threshold) on BOTH paths,
    and SemDeDup counts them in list 0 without dropping them on BOTH
    paths."""
    from data_ingestion_spark.operators import registry as R
    from data_ingestion_spark.operators import similarity
    from data_ingestion_spark.session import load_table

    sf = _nullable_emb_corpus(spark, tmp_path, n=150, seed=11)
    emb = load_table(spark, sf, "embeddings")
    inline16 = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in similarity.hyperplane_lsh_pairs(
            emb, bits=16, band_bits=4, threshold=0.35, dim=64
        ).collect()
    }
    got16 = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in R.knn_lsh_pairs(spark, sf).collect()
    }
    assert got16 == inline16 and got16
    assert not any(
        a in _NULL_IDS or b in _NULL_IDS for a, b, _ in got16
    )
    got = {tuple(r) for r in R.semantic_dedup_embeddings(spark, sf).collect()}
    n = emb.count()
    cents = similarity.ivf_centroids_from_sample(emb, n_lists=max(8, n // 64))
    assigned, dropped = similarity.semantic_dedup(
        emb, cents, threshold_micro=300000
    )
    want = {
        tuple(r)
        for r in (
            assigned.join(
                dropped.withColumn("_d", F.lit(1)).select("vec_id", "_d"),
                "vec_id",
                "left",
            )
            .groupBy(F.col("list_id").cast("long").alias("list_id"))
            .agg(
                F.count(F.lit(1)).alias("n_vectors"),
                F.sum(F.coalesce(F.col("_d"), F.lit(0)))
                .cast("long")
                .alias("n_dropped"),
            )
            .collect()
        )
    }
    assert got == want and got
