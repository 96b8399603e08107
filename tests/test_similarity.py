"""ANN similarity search over embeddings: exact brute-force baseline +
LSH-bucketed approximate path."""

from __future__ import annotations

import numpy as np
import pytest

from datachecker_spark.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    lsh_cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    """3 well-separated clusters of 20 vectors each, dim=16, deterministic."""
    rng = np.random.default_rng(123)
    centers = rng.standard_normal((3, 16)) * 5
    rows = []
    for ci, c in enumerate(centers):
        for j in range(20):
            v = c + rng.standard_normal(16) * 0.3
            rows.append((ci * 100 + j, [float(x) for x in v], ci))
    # one exact duplicate pair for near-dup detection
    rows.append((999, rows[0][1], 0))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def _numpy_topk(rows, qid, k):
    vecs = {r[0]: np.array(r[1]) for r in rows}
    q = vecs[qid]
    sims = {
        i: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for i, v in vecs.items()
        if i != qid
    }
    return sorted(sims, key=lambda i: (-round(sims[i], 6), i))[:k]


def test_cosine_topk_matches_numpy(emb, spark):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    queries = emb.where("vec_id in (0, 100, 200)")
    got = cosine_topk(emb, queries, k=5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in (0, 100, 200):
        expect = _numpy_topk(rows, qid, 5)
        ordered = [n for _, n in sorted(by_q[qid])]
        assert ordered == expect, f"query {qid}: {ordered} != {expect}"


def test_topk_same_cluster(emb):
    queries = emb.where("vec_id in (5, 105, 205)")
    got = cosine_topk(emb, queries, k=5).collect()
    for r in got:
        assert r["neighbor_id"] // 100 == r["query_id"] // 100 or r["neighbor_id"] == 999


def test_lsh_recall_vs_exact(emb):
    queries = emb.where("vec_id in (0, 100, 200)")
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_cosine_topk(emb, queries, k=5, dim=16, planes=16, bands=4, seed=7)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # well-separated clusters: banded LSH must recover nearly all true neighbors
    assert recall >= 0.8, f"recall {recall}: {sorted(e - a)} missed"


def test_cosine_near_dup_pairs(emb):
    pairs = cosine_near_dup_pairs(emb, threshold=0.999, dim=16, planes=16, bands=4, seed=7)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 999) in got  # the planted exact duplicate
    # no cross-cluster pair can be near-identical
    assert all(a // 100 == b // 100 or b == 999 for a, b in got)


def test_ivf_recall_vs_exact(emb):
    from datachecker_spark.similarity import ivf_cosine_topk

    queries = emb.where("vec_id in (0, 100, 200)")
    exact = cosine_topk(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx = ivf_cosine_topk(
        emb, queries, k=5, n_cells=6, n_probe=3, seed=7,
        train_sample=64, iters=8,
    )
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # co-location argument: assignment and probing share one quantizer, so a
    # query's cluster lands in the cells the query probes first
    assert recall >= 0.8, f"recall {recall}: {sorted(e - a)} missed"
    # n_probe == n_cells degenerates to exhaustive search → exact equality
    # (same rounding, same (cos desc, id asc) tie order as cosine_topk)
    full = ivf_cosine_topk(
        emb, queries, k=5, n_cells=6, n_probe=6, seed=7,
        train_sample=64, iters=8,
    )
    f = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f == e
