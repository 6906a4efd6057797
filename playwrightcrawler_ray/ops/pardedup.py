"""Cross-document paragraph-level exact deduplication — the
RefinedWeb / Dolma curation stage: every paragraph that occurs
anywhere earlier in the corpus is removed from later documents, and
documents are reassembled from their surviving paragraphs (dropping
documents that lose every paragraph).

The reference crawler dedups whole pages by ``sha256(url)`` /
pixel-hash (playwrightcrawler.py:1431-1456, :3858) but has no
sub-document dedup; this is the standard extra stage a 100 TB
training-data pipeline runs between exact-doc dedup and near-dup
collapse.

Paragraph tokenizer: real crawled text splits on blank lines; the
synthetic documents table is single-line, so the unit here is a
deterministic fixed-width chunk of ``chunk_words`` whitespace tokens
(non-overlapping, last chunk short) — same policy in the Ray kernel
and the SQL oracle, so the op stays value-hash comparable.

Scale shape (100 TB): two shuffles, zero broadcast, no all-pairs —
 (1) explode docs into (paragraph, doc_id, idx) rows, hash-partition
     on the paragraph hash, and pick the global first occurrence
     (lexicographic min over (doc_id, idx)) per EXACT paragraph
     string inside each partition;
 (2) hash-partition the flagged rows back on doc_id and reassemble
     each document from its kept paragraphs in original order.
Both group stages see only their partition (edge-sized state); the
winner choice compares full paragraph strings, so 64-bit partition
hash collisions cannot merge distinct paragraphs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _explode_paragraphs(df: pd.DataFrame, chunk_words: int,
                        n_parts: int) -> pd.DataFrame:
    """(doc_id, text) batch → one row per paragraph chunk with a
    deterministic 64-bit partition key."""
    out_doc, out_idx, out_par, out_part = [], [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        words = text.split(" ")
        doc_id = int(doc_id)
        for idx in range(0, (len(words) + chunk_words - 1) // chunk_words):
            par = " ".join(words[idx * chunk_words:(idx + 1) * chunk_words])
            h = int.from_bytes(
                hashlib.blake2b(par.encode("utf-8"), digest_size=8).digest(),
                "big",
            )
            out_doc.append(doc_id)
            out_idx.append(idx)
            out_par.append(par)
            out_part.append(h % n_parts)
    return pd.DataFrame(
        {
            "doc_id": pd.array(out_doc, dtype="int64"),
            "idx": pd.array(out_idx, dtype="int64"),
            "par": pd.array(out_par, dtype="string[pyarrow]"),
            "part": pd.array(out_part, dtype="int32"),
        }
    )


def q_docs_paragraph_dedup(sf_dir: str, chunk_words: int = 8,
                           n_parts: int = 64) -> pd.DataFrame:
    """Global paragraph-exact dedup over the documents table.

    Returns one row per surviving document:
    ``(doc_id, text, n_pars, n_dropped)`` — ``text`` is the document
    rebuilt from its kept paragraphs, ``n_pars`` the original
    paragraph count, ``n_dropped`` how many were removed as
    duplicates of an earlier (doc_id, idx) occurrence.
    """
    from .textstats import _docs

    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return _explode_paragraphs(df, chunk_words, n_parts)

    def flag_winners(g: pd.DataFrame) -> pd.DataFrame:
        """Within one paragraph-hash partition: keep the global first
        (doc_id, idx) occurrence of each exact paragraph string."""
        g = g.sort_values(["par", "doc_id", "idx"], kind="stable")
        keep = ~g["par"].duplicated(keep="first").to_numpy()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "idx": g["idx"].to_numpy(),
                "par": g["par"].to_numpy(),
                "keep": keep,
                # re-key the second shuffle on the document
                "part2": (g["doc_id"].to_numpy() % n_parts).astype(np.int32),
            }
        )

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        """Within one doc-id partition: rebuild each document from its
        kept paragraphs in original order; drop fully-deduped docs."""
        g = g.sort_values(["doc_id", "idx"], kind="stable")
        rows = []
        for doc_id, sub in g.groupby("doc_id", sort=True):
            kept = sub[sub["keep"]]
            if not len(kept):
                continue
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "text": " ".join(kept["par"]),
                    "n_pars": len(sub),
                    "n_dropped": int((~sub["keep"]).sum()),
                }
            )
        if not rows:
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64"), "text": [],
                 "n_pars": pd.array([], dtype="int64"),
                 "n_dropped": pd.array([], dtype="int64")}
            )
        out = pd.DataFrame(rows)
        out["n_pars"] = out["n_pars"].astype("int64")
        return out

    out = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("part")
        .map_groups(flag_winners, batch_format="pandas")
        .groupby("part2")
        .map_groups(reassemble, batch_format="pandas")
        .to_pandas()
    )
    return (
        out[["doc_id", "text", "n_pars", "n_dropped"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def sql_docs_paragraph_dedup(chunk_words: int = 8) -> str:
    """DuckDB twin: same chunking, same global first-occurrence
    policy (ROW_NUMBER over (doc_id, idx)), same reassembly."""
    return f"""
WITH words AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
), expl AS (
  SELECT doc_id, i, w[i] AS word
  FROM words,
       (SELECT UNNEST(GENERATE_SERIES(1, (SELECT MAX(LEN(w)) FROM words)))
               AS i) seq
  WHERE i <= LEN(w)
), pars AS (
  SELECT doc_id, (i - 1) // {chunk_words} AS idx,
         STRING_AGG(word, ' ' ORDER BY i) AS par
  FROM expl GROUP BY doc_id, (i - 1) // {chunk_words}
), ranked AS (
  SELECT doc_id, idx, par,
         ROW_NUMBER() OVER (PARTITION BY par ORDER BY doc_id, idx) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_pars
  FROM pars
)
SELECT doc_id,
       STRING_AGG(par, ' ' ORDER BY idx) AS text,
       ANY_VALUE(n_pars) AS n_pars,
       CAST(ANY_VALUE(n_pars) - COUNT(*) AS BIGINT) AS n_dropped
FROM ranked
WHERE rn = 1
GROUP BY doc_id
"""
