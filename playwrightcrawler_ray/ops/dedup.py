"""Near-duplicate detection family over the documents table:

- exact n-gram Jaccard pairs (shingle-explode → groupby-shingle →
  pair-count → verify) — deterministic, DuckDB-checkable;
- MinHash + LSH banding (shingle → minhash sig → band buckets →
  candidate pairs → exact-Jaccard verify) — the 100 TB scale path;
- SimHash-64 signatures.

Scale shape: every stage is a ``map_batches`` / ``groupby`` over keys
that hash-partition evenly (shingle hash, band hash); the quadratic
pair space is never materialized — only pairs sharing a shingle/bucket
appear, and hot shingles can be salted or capped (logged, not silent).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _shingles(text: str, w: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < w:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def _shingle_rows(df: pd.DataFrame, w: int) -> pd.DataFrame:
    doc_ids, hashes = [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        for s in _shingles(text, w):
            doc_ids.append(doc_id)
            hashes.append(
                int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
                )
                - (1 << 63)
            )
    return pd.DataFrame({"doc_id": doc_ids, "shingle": hashes})


def q_ngram_jaccard_top_pairs(sf_dir: str, w: int = 3, k: int = 20) -> pd.DataFrame:
    """Exact word-``w``-gram Jaccard: top-``k`` most similar pairs.

    Pipeline: distinct (doc, shingle-hash) rows → per-shingle doc lists
    → co-occurrence pair counts (intersection sizes) → Jaccard via
    broadcast per-doc shingle counts → global top-k. Only pairs sharing
    ≥1 shingle exist; everything else has J=0 and cannot reach top-k
    (assuming ≥k sharing pairs, true for word-soup corpora)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    shingled = ds.map_batches(
        lambda df: _shingle_rows(df, w), batch_format="pandas"
    )
    # per-doc shingle counts: small (one row per doc) → broadcast
    counts = (
        shingled.groupby("doc_id").aggregate(Count(alias_name="n_sh")).to_pandas()
    )
    counts_ref = ray.put(dict(zip(counts["doc_id"], counts["n_sh"])))

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(g["doc_id"].unique())
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ia, ib = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ia], "b": docs[ib]})

    inter = (
        shingled.groupby("shingle")
        .map_groups(pairs_of_group, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="inter"))
    )

    def jaccard(df: pd.DataFrame) -> pd.DataFrame:
        n = ray.get(counts_ref)
        na = df["a"].map(n).astype(float)
        nb = df["b"].map(n).astype(float)
        df = df.copy()
        # half-up: integer-ratio jaccard values land on exact boundaries
        df["jaccard"] = (
            np.floor(df["inter"] / (na + nb - df["inter"]) * 10000 + 0.5) / 10000
        )
        return df

    scored = inter.map_batches(jaccard, batch_format="pandas").to_pandas()
    top = scored.sort_values(["jaccard", "a", "b"],
                             ascending=[False, True, True]).head(k)
    return top.rename(columns={"a": "doc_a", "b": "doc_b"})[
        ["doc_a", "doc_b", "jaccard"]
    ].reset_index(drop=True)


def sql_ngram_jaccard_top_pairs(w: int = 3, k: int = 20) -> str:
    join_expr = " || ' ' || ".join(f"ws[i+{j}]" for j in range(w))
    return f"""
WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {join_expr} AS s
  FROM d, UNNEST(RANGE(1, LEN(ws) - {w - 2})) AS t(i)
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS i
  FROM sh x JOIN sh y USING (s)
  WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b,
       FLOOR(i * 1.0 / (ca.n + cb.n - i) * 10000 + 0.5) / 10000 AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT {k}
"""


# --- MinHash + LSH (approximate scale path; rows-only check) ---

_N_HASHES = 128
_N_BANDS = 32  # 4 rows per band


def _minhash_sig(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """128 universal-hash minima over the shingle set (vectorized)."""
    x = shingle_hashes.astype(np.uint64)[:, None]
    hv = (x * a[None, :] + b[None, :]) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return hv.min(axis=0)


def _hash_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=_N_HASHES, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=_N_HASHES, dtype=np.uint64)
    return a, b


def q_minhash_lsh_pairs(sf_dir: str, w: int = 3, threshold: float = 0.5) -> pd.DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.
    Returns verified pairs with jaccard ≥ threshold. Approximate recall
    (banding may miss borderline pairs) → rows-only driver check; the
    exact top-pairs query above is the SQL-verified twin."""
    a_par, b_par = _hash_params()
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "band": [], "bucket": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sh = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
                    )
                    for s in _shingles(text, w)
                ),
                dtype=np.uint64,
            )
            if sh.size == 0:
                continue
            sig = _minhash_sig(sh, a_par, b_par)
            rows = sig.reshape(_N_BANDS, -1)
            for band_i in range(_N_BANDS):
                bucket = hash(tuple(int(v) for v in rows[band_i])) & 0x7FFFFFFF
                out["doc_id"].append(doc_id)
                out["band"].append(band_i)
                out["bucket"].append(bucket)
        return pd.DataFrame(out)

    banded = ds.map_batches(sig_rows, batch_format="pandas")

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(g["doc_id"].unique())
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ia, ib = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ia], "b": docs[ib]})

    cand = (
        banded.groupby(["band", "bucket"])
        .map_groups(pairs_of_bucket, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    cand = cand.drop_duplicates()
    # exact verify against broadcast shingle sets (candidate set is small)
    texts = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    shingle_sets = {d: _shingles(t, w) for d, t in zip(texts["doc_id"], texts["text"])}
    rows = []
    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0
        if j >= threshold:
            rows.append({"doc_a": int(a), "doc_b": int(b), "jaccard": round(j, 4)})
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def q_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash of each document's token multiset (near-dup
    signature; Hamming-close signatures ⇒ similar docs). Rows-only."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sim(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            acc = np.zeros(64, dtype=np.int64)
            for tok in text.split():
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                    )
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            val = 0
            for i in range(64):
                if acc[i] > 0:
                    val |= 1 << i
            out.append({"doc_id": doc_id, "simhash": val - (1 << 63)})
        return pd.DataFrame(out)

    return ds.map_batches(sim, batch_format="pandas").to_pandas()
