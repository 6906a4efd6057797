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


def _docs(sf_dir: str, columns):
    from .io import read_table

    return read_table(sf_dir, "documents", columns)


def _shingles(text: str, w: int = 3) -> set[str]:
    """Word-``w``-gram shingle set. Documents with fewer than ``w``
    tokens yield NO shingles (matching the SQL oracle's empty RANGE),
    and tokenization is whitespace-run splitting on both sides (the
    oracle uses regexp_split_to_array + empty-segment filter)."""
    toks = text.split()
    if len(toks) < w:
        return set()
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


_MIX = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for shingle mixing


def _shingle_hash_arrays(texts, w: int, tok_cache: dict[str, int] | None = None
                         ) -> list[np.ndarray]:
    """Vectorized distinct-shingle hashes per text: each UNIQUE token is
    blake2b-hashed once (cached — natural text reuses tokens heavily),
    then every w-gram hash is a positional multiply-xor mix of the token
    hashes, computed with w numpy ops over the whole token array instead
    of one digest per shingle string. Equality of shingle hashes ≡
    equality of shingle strings modulo ~2^-64 collisions, which is all
    the Jaccard/minhash kernels observe."""
    cache = tok_cache if tok_cache is not None else {}

    def tok_hash(tok: str) -> int:
        v = cache.get(tok)
        if v is None:
            v = cache[tok] = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
            )
        return v

    out = []
    for text in texts:
        toks = text.split()
        n = len(toks) - w + 1
        if n <= 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        th = np.fromiter((tok_hash(t) for t in toks), dtype=np.uint64,
                         count=len(toks))
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(w):
            acc = (acc * _MIX) ^ th[j : j + n]
        out.append(np.unique(acc))
    return out


def _shingle_rows(df: pd.DataFrame, w: int) -> pd.DataFrame:
    doc_ids, hashes = [], []
    for doc_id, sh in zip(df["doc_id"],
                          _shingle_hash_arrays(df["text"], w)):
        doc_ids.extend([doc_id] * len(sh))
        hashes.extend(sh.view(np.int64).tolist())
    return pd.DataFrame({"doc_id": doc_ids, "shingle": hashes})


def _doc_shingle_arrays(df: pd.DataFrame, w: int) -> list[tuple[int, np.ndarray]]:
    arrays = _shingle_hash_arrays(df["text"], w)
    return [(int(d), a) for d, a in zip(df["doc_id"], arrays)]


def q_ngram_jaccard_top_pairs(sf_dir: str, w: int = 3, k: int = 20) -> pd.DataFrame:
    """Exact word-``w``-gram Jaccard: top-``k`` most similar pairs.

    Shape: one small pass builds the global shingle vocabulary + a
    compressed (doc → shingle-index) structure, broadcast once; then a
    single ``map_batches`` pass over doc blocks computes exact
    intersection counts via chunked float32 GEMM against the broadcast
    set matrix, emits each block's local top-k (a pair belongs to the
    block of its *smaller* doc id, so the union of block top-ks
    contains the global top-k), and the driver merges. No shuffle, no
    quadratic materialization. At 100 TB the broadcast side no longer
    fits — that regime is ``q_minhash_lsh_pairs`` (banded buckets); this
    exact kernel then runs per LSH bucket instead of globally."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    # pass 1: per-doc shingle sets hashed in parallel, collected as the
    # (small) broadcast structure: one row of int64 hashes per doc
    def to_rows(df: pd.DataFrame) -> pd.DataFrame:
        arr = _doc_shingle_arrays(df, w)
        # int64-wrapped transport (Arrow list<int64>); unwrapped below
        return pd.DataFrame(
            {
                "doc_id": [d for d, _ in arr],
                "sh": [a.astype(np.int64).tolist() for _, a in arr],
            }
        )

    per_doc: list[tuple[int, np.ndarray]] = []
    for df in ds.map_batches(to_rows, batch_format="pandas").iter_batches(
        batch_format="pandas", batch_size=4096
    ):
        per_doc.extend(
            (int(d), np.asarray(a, dtype=np.int64).astype(np.uint64))
            for d, a in zip(df["doc_id"], df["sh"])
        )
    per_doc.sort(key=lambda t: t[0])
    ids = np.array([d for d, _ in per_doc], dtype=np.int64)
    vocab = np.unique(np.concatenate([a for _, a in per_doc]))
    indptr = np.zeros(len(ids) + 1, dtype=np.int64)
    cols = []
    for i, (_, a) in enumerate(per_doc):
        idx = np.searchsorted(vocab, a)
        cols.append(idx.astype(np.int32))
        indptr[i + 1] = indptr[i] + len(idx)
    col_idx = np.concatenate(cols) if cols else np.zeros(0, np.int32)
    set_sizes = np.diff(indptr).astype(np.float64)
    # inverted index: shingle-index → sorted doc positions (CSR)
    order = np.argsort(col_idx, kind="stable")
    inv_cols = np.repeat(np.arange(len(ids)), np.diff(indptr))[order].astype(np.int32)
    inv_iptr = np.zeros(len(vocab) + 1, dtype=np.int64)
    np.cumsum(np.bincount(col_idx, minlength=len(vocab)), out=inv_iptr[1:])
    bc = ray.put((ids, set_sizes, vocab, inv_iptr, inv_cols))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        """Document-at-a-time posting counting: per doc, concatenate the
        inverted-index postings of its shingles and bincount — cost is
        Σ df(shingle), not |docs|² (the sparse structure the GEMM
        alternative wastes)."""
        all_ids, sizes, voc, iiptr, icols = ray.get(bc)
        n_docs = len(all_ids)
        rows = _doc_shingle_arrays(df, w)
        out_a, out_b, out_j = [], [], []
        for bid, sh in rows:
            sidx = np.searchsorted(voc, sh)
            postings = np.concatenate(
                [icols[iiptr[s] : iiptr[s + 1]] for s in sidx]
            ) if len(sidx) else np.zeros(0, np.int32)
            cnt = np.bincount(postings, minlength=n_docs).astype(np.float64)
            union = len(sh) + sizes - cnt
            valid = (cnt > 0) & (bid < all_ids)
            if not valid.any():
                continue
            vi = np.nonzero(valid)[0]
            jac = cnt[vi] / union[vi]
            out_a.append(np.full(len(vi), bid, dtype=np.int64))
            out_b.append(all_ids[vi])
            out_j.append(jac)
        if not out_a:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        # half-up 4-decimals to match the DuckDB oracle exactly
        jr = np.floor(np.concatenate(out_j) * 10000 + 0.5) / 10000
        out = pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "jaccard": jr,
            }
        )
        return out.sort_values(["jaccard", "doc_a", "doc_b"],
                               ascending=[False, True, True]).head(k)

    parts = ds.map_batches(
        block_topk, batch_format="pandas", batch_size=256
    ).to_pandas()
    return (
        parts.sort_values(["jaccard", "doc_a", "doc_b"],
                          ascending=[False, True, True])
        .head(k)
        .astype({"doc_a": "int64", "doc_b": "int64"})
        .reset_index(drop=True)
    )


def sql_ngram_jaccard_top_pairs(w: int = 3, k: int = 20) -> str:
    join_expr = " || ' ' || ".join(f"ws[i+{j}]" for j in range(w))
    return f"""
WITH d AS (SELECT doc_id,
                  LIST_FILTER(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
           FROM documents),
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
        arrays = _shingle_hash_arrays(df["text"], w)
        for doc_id, sh in zip(df["doc_id"], arrays):
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

    def pairs_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair generation over a whole hash partition of
        (band, bucket) groups — one pandas sort + run detection instead
        of one map_groups call per tiny bucket (which at 32 bands ×
        n_docs buckets is pure per-group overhead)."""
        g = g.sort_values(["band", "bucket", "doc_id"])
        key = g["band"].astype(np.int64) * (1 << 32) + g["bucket"].astype(np.int64)
        arr = g["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, key.to_numpy()[1:] != key.to_numpy()[:-1]])
        ends = np.r_[starts[1:], len(arr)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            run = np.unique(arr[s:e])
            if len(run) > 1:
                ia, ib = np.triu_indices(len(run), k=1)
                out_a.append(run[ia])
                out_b.append(run[ib])
        if not out_a:
            return pd.DataFrame({"a": [], "b": []})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = df["bucket"] % 64
        return df

    cand = (
        banded.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(pairs_of_partition, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    cand = cand.drop_duplicates()
    # exact verify WITHOUT materializing the corpus on the driver
    # (VERDICT round 1 item 3): broadcast only the candidate id set, do
    # a semi-filtered second pass over the documents that re-shingles
    # just the candidate docs inside map_batches, then verify pairs
    # against the (candidate-sized) broadcast shingle map.
    cand_ids = np.unique(
        np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])
    ).astype(np.int64)
    ids_ref = ray.put(cand_ids)

    def shingle_candidates(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(ids_ref)
        sel = df[df["doc_id"].isin(wanted)]
        if sel.empty:
            return pd.DataFrame({"doc_id": [], "sh": []})
        return pd.DataFrame(
            {
                "doc_id": sel["doc_id"].to_numpy(),
                "sh": [
                    a.view(np.int64).tolist()
                    for a in _shingle_hash_arrays(sel["text"], w)
                ],
            }
        )

    cand_sh = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(shingle_candidates, batch_format="pandas")
        .to_pandas()
    )
    sets_ref = ray.put(
        {int(d): np.asarray(s, dtype=np.int64) for d, s in
         zip(cand_sh["doc_id"], cand_sh["sh"])}
    )
    pairs_ds = ray.data.from_pandas(cand.reset_index(drop=True))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ss = ray.get(sets_ref)
        rows = []
        for a, b in zip(df["a"], df["b"]):
            sa, sb = ss.get(int(a)), ss.get(int(b))
            if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                rows.append(
                    {"doc_a": int(a), "doc_b": int(b), "jaccard": round(j, 4)}
                )
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    out = pairs_ds.map_batches(verify, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def q_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash of each document's token multiset (near-dup
    signature; Hamming-close signatures ⇒ similar docs). Rows-only."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sim(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch token→±1 bit-vector cache: natural text has heavy
        # token reuse, so hashing is amortized across the batch
        bit_cache: dict[str, np.ndarray] = {}
        shifts = np.arange(64, dtype=np.uint64)

        def bits_of(tok: str) -> np.ndarray:
            v = bit_cache.get(tok)
            if v is None:
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                        "big",
                    )
                )
                v = np.where((h >> shifts) & np.uint64(1) == 1, 1, -1).astype(
                    np.int64
                )
                bit_cache[tok] = v
            return v

        out = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.split()
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                acc += bits_of(tok)
            val = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            out.append({"doc_id": doc_id, "simhash": val - (1 << 63)})
        return pd.DataFrame(out)

    return ds.map_batches(sim, batch_format="pandas").to_pandas()
