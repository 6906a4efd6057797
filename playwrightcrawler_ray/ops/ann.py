"""Similarity search over the embeddings table (list<float> column).

- ``q_ann_topk``: brute-force cosine top-k against a broadcast query
  vector — numpy matmul per batch; the baseline every ANN variant is
  measured against. Exact → DuckDB-checkable
  (list_cosine_similarity).
- ``q_embedding_neardup_pairs``: all pairs with cosine ≥ τ — blocked
  matmul of normalized vectors against a broadcast matrix. Exact →
  DuckDB-checkable.
- ``q_ann_topk_lsh``: random-hyperplane LSH-bucketed variant — the
  scale path (bucket → search only matching buckets); approximate →
  rows-only check.

Scale shape: the broadcast side is ``ray.put`` once; each batch does
one float32 GEMM. At 100 TB the corpus side streams in blocks and the
query side stays broadcast; for all-pairs near-dup the LSH bucketing
replaces the dense matmul.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray
import ray.data


def _emb(sf_dir: str, columns=None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=columns
    )


def _to_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def q_ann_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Top-k by cosine similarity to the embedding of ``query_vec_id``
    (self excluded). Per-batch partial top-k, merged on the driver —
    no global sort shuffle."""
    qdf = (
        _emb(sf_dir)
        .filter(lambda r: r["vec_id"] == query_vec_id)
        .to_pandas()
    )
    q = np.asarray(qdf["embedding"].iloc[0], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        m = _to_matrix(df)
        norms = np.linalg.norm(m, axis=1)
        cos = (m @ qv) / np.where(norms == 0, 1.0, norms)
        out = pd.DataFrame({"vec_id": df["vec_id"], "cos_sim": np.round(cos, 4)})
        out = out[out["vec_id"] != query_vec_id]
        return out.sort_values(["cos_sim", "vec_id"],
                               ascending=[False, True]).head(k)

    parts = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(partial_topk, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    return (
        parts.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def sql_ann_topk(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id})
SELECT vec_id,
       ROUND(LIST_COSINE_SIMILARITY(embedding, qe), 4) AS cos_sim
FROM embeddings, q
WHERE vec_id <> {query_vec_id}
ORDER BY LIST_COSINE_SIMILARITY(embedding, qe) DESC, vec_id
LIMIT {k}
"""


def q_embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """All (a < b) pairs with cosine ≥ threshold: per-batch GEMM of the
    streamed side against the broadcast normalized matrix."""
    full = _emb(sf_dir, ["vec_id", "embedding"]).to_pandas()
    m = _to_matrix(full)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = full["vec_id"].to_numpy()
    mat_ref = ray.put((ids, m))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, mat = ray.get(mat_ref)
        bm = _to_matrix(df)
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        bids = df["vec_id"].to_numpy()
        cos = bm @ mat.T
        bi, aj = np.nonzero((cos >= threshold) & (bids[:, None] < all_ids[None, :]))
        return pd.DataFrame(
            {
                "vec_a": bids[bi],
                "vec_b": all_ids[aj],
                "cos_sim": np.round(cos[bi, aj], 4),
            }
        )

    out = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(pairs, batch_format="pandas", batch_size=2048)
        .to_pandas()
    )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def sql_embedding_neardup_pairs(threshold: float = 0.4) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(LIST_COSINE_SIMILARITY(a.embedding, b.embedding), 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE LIST_COSINE_SIMILARITY(a.embedding, b.embedding) >= {threshold}
ORDER BY vec_a, vec_b
"""


def q_dedup_components(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """Near-duplicate clusters: connected components of the cosine-≥τ
    graph, labeled by the minimum vec_id in each component.

    Pipeline: exact near-dup edges (blocked GEMM vs broadcast matrix,
    same kernel as q_embedding_neardup_pairs) → iterated min-label
    propagation until fixed point. The edge set is aggregate-sized
    (result of the similarity threshold), so propagation runs over the
    collected pairs; at 10^10-doc scale the same min-label iteration
    is a per-round ``groupby(vertex).min(label)`` over the edge
    Dataset (the guide's connected-components recipe), converging in
    graph-diameter rounds."""
    edges = q_embedding_neardup_pairs(sf_dir, threshold=threshold)
    all_ids = _emb(sf_dir, ["vec_id"]).to_pandas()["vec_id"].to_numpy()
    label = {int(v): int(v) for v in all_ids}
    ea = edges["vec_a"].to_numpy()
    eb = edges["vec_b"].to_numpy()
    for _ in range(64):  # diameter bound; converges long before
        changed = False
        for a, b in zip(ea, eb):
            la, lb = label[a], label[b]
            if la < lb:
                label[b] = la
                changed = True
            elif lb < la:
                label[a] = lb
                changed = True
        if not changed:
            break
    out = pd.DataFrame(
        {"vec_id": sorted(label), "component_id": [label[v] for v in sorted(label)]}
    )
    return out


def sql_dedup_components(threshold: float = 0.3) -> str:
    return f"""
WITH RECURSIVE
e AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE LIST_COSINE_SIMILARITY(a.embedding, b.embedding) >= {threshold}
),
edges AS (SELECT va, vb FROM e UNION ALL SELECT vb AS va, va AS vb FROM e),
cc(v, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT edges.va, cc.lbl FROM cc JOIN edges ON cc.v = edges.vb
)
SELECT v AS vec_id, MIN(lbl) AS component_id FROM cc GROUP BY v
"""


def q_embedding_kmeans(sf_dir: str, k: int = 10, iters: int = 10,
                       seed: int = 5) -> pd.DataFrame:
    """Seeded Lloyd's k-means over the embedding column — the
    iterative-ML pattern on Ray Data: centroids broadcast per round,
    assignment + per-cluster partial sums computed vectorized per
    batch, partials combined on the driver (k×dim — aggregate-sized),
    centroids updated, repeat. Deterministic (seeded init, fixed
    rounds) → rows-only driver check; unit test asserts determinism."""
    ids_df = _emb(sf_dir, ["vec_id"]).to_pandas()
    n = len(ids_df)
    rng = np.random.default_rng(seed)
    init_pos = np.sort(rng.choice(n, size=min(k, n), replace=False))
    init_rows = (
        _emb(sf_dir).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    centroids = np.stack(init_rows["embedding"].iloc[init_pos].to_numpy()).astype(
        np.float64
    )

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial_sums(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(c_ref)
            m = _to_matrix(df)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            rows = []
            for ci in np.unique(assign):
                sel = m[assign == ci]
                rows.append(
                    {"cluster": int(ci), "count": len(sel),
                     "vsum": sel.sum(axis=0).tolist()}
                )
            return pd.DataFrame(rows)

        parts = (
            _emb(sf_dir, ["vec_id", "embedding"])
            .map_batches(partial_sums, batch_format="pandas", batch_size=2048)
            .to_pandas()
        )
        new_c = centroids.copy()
        for ci, grp in parts.groupby("cluster"):
            total = grp["count"].sum()
            vsum = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
            if total > 0:
                new_c[ci] = vsum / total
        centroids = new_c

    c_ref = ray.put(centroids)

    def assign_final(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        m = _to_matrix(df)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame(
            {"vec_id": df["vec_id"], "cluster": d2.argmin(axis=1).astype(np.int64)}
        )

    out = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(assign_final, batch_format="pandas", batch_size=2048)
        .to_pandas()
    )
    return out.sort_values("vec_id").reset_index(drop=True)


def q_ann_topk_lsh(sf_dir: str, query_vec_id: int = 0, k: int = 10,
                   n_planes: int = 8, seed: int = 13) -> pd.DataFrame:
    """Random-hyperplane LSH ANN: bucket by sign pattern, search the
    query's bucket ± 1-bit neighbors. Approximate (rows-only check);
    demonstrates the bucketed scale path where the dense scan is
    replaced by a groupby on the bucket key."""
    full = _emb(sf_dir).to_pandas()
    dim = len(full["embedding"].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(
        full.loc[full["vec_id"] == query_vec_id, "embedding"].iloc[0],
        dtype=np.float64,
    )
    qn = q / np.linalg.norm(q)
    qbits = int((planes @ q > 0).dot(1 << np.arange(n_planes)))
    probe = {qbits} | {qbits ^ (1 << i) for i in range(n_planes)}
    refs = ray.put((planes, qn, probe))

    def bucket_scan(df: pd.DataFrame) -> pd.DataFrame:
        pl, qv, buckets = ray.get(refs)
        m = _to_matrix(df)
        bits = (m @ pl.T > 0).dot(1 << np.arange(pl.shape[0]))
        mask = np.isin(bits, list(buckets)) & (df["vec_id"].to_numpy() != query_vec_id)
        if not mask.any():
            return pd.DataFrame({"vec_id": [], "cos_sim": []})
        sub = m[mask]
        norms = np.linalg.norm(sub, axis=1)
        cos = (sub @ qv) / np.where(norms == 0, 1.0, norms)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy()[mask], "cos_sim": np.round(cos, 4)}
        )

    out = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(bucket_scan, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    return (
        out.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
