"""Text analysis over the documents table: token counting, quality
scoring, language distribution, exact dedup, language-ID and document
fingerprinting (the training-data text operators; SURVEY.md build
brief "text analysis").

Vectorized where a pandas/pyarrow kernel exists (token counts, length
stats); per-row Python only for the heuristics (langid, fingerprints),
kept inside ``map_batches``.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.text import detect_language, fingerprint64


def _docs(sf_dir: str, columns: list[str]):
    from .io import read_table

    return read_table(sf_dir, "documents", columns)


def q_token_counts(sf_dir: str) -> pd.DataFrame:
    """Whitespace token count per document — pure pyarrow kernel:
    count split parts without materializing Python strings."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow").to_pandas()


SQL_TOKEN_COUNTS = """
SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def q_quality_signals(sf_dir: str) -> pd.DataFrame:
    """Length-based quality stats (SQL-checkable subset; the richer
    punctuation/stopword signals are in q_langid_quality, rows-only)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def signals(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        n_tokens = pc.cast(
            pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64()
        )
        ratio = pc.divide(
            pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
            pc.cast(n_tokens, pa.float64()),
        )
        # explicit half-UP rounding: integer ratios land exactly on
        # .00005 boundaries where pyarrow (half-even) and DuckDB
        # (half-away) disagree — FLOOR(x*1e4+0.5)/1e4 on both sides
        mean_len = pc.divide(
            pc.floor(pc.add(pc.multiply(ratio, 10000.0), 0.5)), 10000.0
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars2": n_chars,
                "n_tokens": n_tokens,
                "mean_token_len": mean_len,
            }
        )

    return ds.map_batches(signals, batch_format="pyarrow").to_pandas()


SQL_QUALITY_SIGNALS = """
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars2,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
       FLOOR((LENGTH(text) - (LEN(STRING_SPLIT(text, ' ')) - 1)) * 1.0
             / LEN(STRING_SPLIT(text, ' ')) * 10000 + 0.5) / 10000
         AS mean_token_len
FROM documents
"""


def q_lang_distribution(sf_dir: str) -> pd.DataFrame:
    from .aggutil import partial_grouped_agg

    ds = _docs(sf_dir, ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lang", as_index=False, sort=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", as_index=False, sort=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
        )
        g["avg_chars"] = g["total_chars"] / g["n_docs"]
        return g

    out = partial_grouped_agg(ds, partial, combine)
    import numpy as np

    # half-up: integer-sum / integer-count ratios hit rounding boundaries
    out["avg_chars"] = np.floor(out["avg_chars"] * 10000 + 0.5) / 10000
    return out[["lang", "n_docs", "total_chars", "avg_chars"]]


SQL_LANG_DISTRIBUTION = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       FLOOR(AVG(n_chars) * 10000 + 0.5) / 10000 AS avg_chars
FROM documents GROUP BY lang
"""


def q_docs_by_source(sf_dir: str) -> pd.DataFrame:
    from .aggutil import partial_grouped_agg

    ds = _docs(sf_dir, ["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False, sort=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False, sort=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
        )

    return partial_grouped_agg(ds, partial, combine)


SQL_DOCS_BY_SOURCE = """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
"""


def q_doc_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact text dedup: content-hash column added vectorized, then
    hash-partitioned groupby keeping min doc_id (the D1 exact-dedup
    pattern over documents; at 100 TB this is the same
    hash-partition + per-group-first with the hash as shuffle key)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text_hash": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]
                ],
            }
        )

    from .aggutil import partial_grouped_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_hash", as_index=False, sort=False).agg(
            keeper_doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_hash", as_index=False, sort=False).agg(
            keeper_doc_id=("keeper_doc_id", "min"), n_copies=("n_copies", "sum")
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    out = partial_grouped_agg(hashed, partial, combine)
    return out[["text_hash", "keeper_doc_id", "n_copies"]]


SQL_DOC_EXACT_DEDUP = """
SELECT MD5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY MD5(text)
"""


def q_langid_quality(sf_dir: str) -> pd.DataFrame:
    """Heuristic language-ID + rich quality signals (rows-only check:
    the n-gram heuristic is not SQL-expressible)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import quality_signals

        rows = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            q = quality_signals(text)
            rows.append(
                {
                    "doc_id": doc_id,
                    "pred_lang": detect_language(text),
                    "stopword_ratio": round(q["stopword_ratio"], 4),
                    "punct_ratio": round(q["punct_ratio"], 4),
                    "alpha_ratio": round(q["alpha_ratio"], 4),
                }
            )
        return pd.DataFrame(rows)

    return ds.map_batches(score, batch_format="pandas").to_pandas()


def q_doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """64-bit identity + rolling similarity fingerprints per document
    (rows-only: blake2b/rolling-hash not SQL-expressible)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import rolling_min_fingerprint

        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": [
                    fingerprint64(t) - (1 << 63) for t in df["text"]
                ],  # shift into int64 range
                "sim_fingerprint": [
                    rolling_min_fingerprint(t) - (1 << 63) for t in df["text"]
                ],
            }
        )

    return ds.map_batches(fp, batch_format="pandas").to_pandas()


def q_token_counts_bpe(sf_dir: str) -> pd.DataFrame:
    """BPE-ish subword-boundary token count: alphanumeric runs plus
    individual punctuation marks (the pre-tokenization split every
    byte-pair tokenizer starts from). Vectorized pyarrow kernel; the
    pattern is RE2/Python-re agreeing, so it has a DuckDB oracle."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    pattern = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

    def count(t: pa.Table) -> pa.Table:
        # pyarrow's count_substring_regex runs RE2 — the same engine
        # DuckDB's regexp_extract_all uses, so counts agree exactly
        n = pc.count_substring_regex(t["text"], pattern=pattern)
        return pa.table(
            {"doc_id": t["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow").to_pandas()


SQL_TOKEN_COUNTS_BPE = r"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""
