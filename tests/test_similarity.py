"""ANN operators: multi-probe recall dominance and IVF-flat structure."""

from __future__ import annotations

from local_search_engine_spark.operators import similarity as SIM

SF0001 = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet")


def _qvec(spark, vid=0):
    row = _emb(spark).filter(f"vec_id = {vid}").first()
    return [float(x) for x in row["embedding"]]


def test_multiprobe_dominates_single_bucket(spark):
    """probe_hamming=1 candidates are a superset of probe_hamming=0, so
    top-k cosine at r=1 is pointwise >= the r=0 top-k."""
    emb = _emb(spark).cache()
    q = _qvec(spark)
    k = 10
    r0 = SIM.srp_lsh_topk(emb, q, k, dim=64, bits=4, probe_hamming=0).collect()
    r1 = SIM.srp_lsh_topk(emb, q, k, dim=64, bits=4, probe_hamming=1).collect()
    emb.unpersist()
    assert len(r1) >= len(r0)
    for a, b in zip(r1, r0):
        assert a["cosine"] >= b["cosine"] - 1e-12


def test_ivf_topk_structure_and_recall(spark):
    """IVF candidates come only from probed clusters; probing ALL
    clusters reproduces the exact brute-force top-k; nprobe=4/16 keeps
    reasonable recall on the fixture."""
    emb = _emb(spark).cache()
    q = _qvec(spark)
    k = 10
    cents = SIM.ivf_train_centroids(emb, 16, 64, iters=1)
    exact = [r["id"] for r in SIM.cosine_topk(emb, q, k, exclude_id=0).collect()]
    allprobe = [
        r["id"]
        for r in SIM.ivf_topk(
            emb.filter("vec_id <> 0"), q, k, cents, nprobe=16
        ).collect()
    ]
    assert allprobe == exact  # nprobe = n_centroids degenerates to exact
    approx = [
        r["id"]
        for r in SIM.ivf_topk(
            emb.filter("vec_id <> 0"), q, k, cents, nprobe=4
        ).collect()
    ]
    assigns = {
        r["id"]: r["cluster"]
        for r in SIM.ivf_assignments(emb, cents).collect()
    }
    # structure: every returned candidate sits in one of the 4 probed lists
    qd = sorted(
        (sum((a - b) * (a - b) for a, b in zip(q, c)), i)
        for i, c in enumerate(cents)
    )
    probed = {i for _, i in qd[:4]}
    assert all(assigns[i] in probed for i in approx)
    recall = len(set(approx) & set(exact)) / k
    assert recall >= 0.5, f"recall@10 collapsed: {recall}"
    emb.unpersist()


def test_ivf_persisted_prunes_partitions(spark, tmp_path):
    """The persisted inverted file is cluster-partitioned: a probe scan
    carries PartitionFilters (whole directories pruned), and results
    match the in-memory ivf_topk."""
    emb = _emb(spark).cache()
    q = _qvec(spark)
    cents = [[round(x, 6) for x in c] for c in SIM.ivf_train_centroids(emb, 16, 64, iters=1)]
    idx_dir = str(tmp_path / "ivf")
    SIM.persist_ivf_index(emb.filter("vec_id <> 0"), cents, idx_dir)
    out = SIM.ivf_topk_persisted(spark, idx_dir, q, 10, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    mem = SIM.ivf_topk(emb.filter("vec_id <> 0"), q, 10, cents, nprobe=4)
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in mem.collect()]
    emb.unpersist()


def test_ivf_empty_cluster_keeps_seed(spark):
    """Training with more centroids than distinct vectors must not
    divide by zero — empty clusters keep their previous centroid."""
    rows = [(i, [float(i)] * 4) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = SIM.ivf_train_centroids(df, 3, 4, iters=2)
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)
