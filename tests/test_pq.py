"""Product-quantization ANN (operators/pq.py).

Correctness here; the zero-shuffle encode plan is asserted in
tests/test_plans.py (the 100 TB contract), and the exact train/encode/
search replay is value-hash checked against DuckDB via the
`pq_ann_topk` oracle entry.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from osm_pt_validator_spark.operators.pq import pq_adc_topk, pq_encode, pq_train

M, DIM, K_CODES = 4, 64, 8


@pytest.fixture(scope="module")
def emb(spark, sf001):
    return spark.read.parquet(f"{sf001}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebooks(emb):
    cb = pq_train(emb, m=M, k=K_CODES, iters=1, dim=DIM)
    cb.cache().count()
    return cb


def test_codebook_shape(codebooks):
    rows = codebooks.collect()
    # <= k per subspace (empty Lloyd clusters may drop), every subspace present
    assert {r["m"] for r in rows} == set(range(M))
    for r in rows:
        assert 0 <= r["cid"] < K_CODES
        assert len(r["cv"]) == DIM // M


def test_encode_codes_in_range_and_total(emb, codebooks):
    codes = pq_encode(emb, codebooks, m=M, dim=DIM)
    rows = codes.collect()
    assert len(rows) == emb.count()
    valid = {(r["m"], r["cid"]) for r in codebooks.collect()}
    for r in rows[:50]:
        assert len(r["codes"]) == M
        for j, c in enumerate(r["codes"]):
            assert (j, c) in valid


def test_adc_topk_shape_and_order(emb, codebooks):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = pq_adc_topk(emb, queries, codebooks, k=5, m=M, dim=DIM)
    rows = top.orderBy("query_id", "rank").collect()
    assert len(rows) == 15
    for qid in range(3):
        qrows = [r for r in rows if r["query_id"] == qid]
        assert [r["rank"] for r in qrows] == [1, 2, 3, 4, 5]
        dists = [r["adc_dist"] for r in qrows]
        assert dists == sorted(dists) and dists[0] >= 0


def test_adc_deterministic_across_runs(emb, codebooks):
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = pq_adc_topk(emb, queries, codebooks, k=3, m=M, dim=DIM).collect()
    b = pq_adc_topk(emb, queries, codebooks, k=3, m=M, dim=DIM).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_adc_recall_vs_exact_quantized_metric(emb, codebooks):
    """PQ is approximate, but on this corpus the true NN (excluding the
    query itself, which PQ finds trivially) should appear in the ADC
    top-5 for most queries — a recall floor that catches sign/indexing
    bugs without overfitting to one seed."""
    import numpy as np

    pdf = emb.orderBy("vec_id").toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = pq_adc_topk(emb, queries, codebooks, k=5, m=M, dim=DIM).collect()
    got = {}
    for r in top:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = 0
    for qid in range(8):
        q = vecs[ids == qid][0]
        d = ((vecs - q) ** 2).sum(axis=1)
        d[ids == qid] = np.inf
        true_nn = int(ids[int(d.argmin())])
        hits += true_nn in got[qid]
    assert hits >= 4, f"ADC top-5 recalled true NN for only {hits}/8 queries"
