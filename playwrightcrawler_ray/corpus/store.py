"""Zero-copy broadcast form of the corpus.

``ray.put`` of a Python dict deserializes per *worker process* — at N
workers that is N× pickle cost, an anti-scaling term that grows with
cluster size. This store keeps the corpus as numpy + Arrow buffers
(plasma zero-copy mmap): a sorted uint64 key index (SHA1-64 of the
URL) plus parallel Arrow arrays; lookup is a vectorized searchsorted
per batch. The same layout is what a real deployment would use for any
broadcast lookup side (extension maps, blocklists, seen snapshots).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..urlkit.ids import url_id_64


def put_corpus_index(pages: dict[str, dict]):
    """Build + put the zero-copy index. Returns an ObjectRef."""
    urls = list(pages.keys())
    keys = np.fromiter((url_id_64(u) for u in urls), dtype=np.uint64, count=len(urls))
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    urls = [urls[i] for i in order]
    recs = [pages[u] for u in urls]
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "content_type": pa.array([r["content_type"] for r in recs], pa.string()),
            "body": pa.array(
                [r["body"] if r["status"] == 200 else b"" for r in recs], pa.binary()
            ),
            "redirect_to": pa.array(
                [r.get("redirect_to") or "" for r in recs], pa.string()
            ),
        }
    )
    status = np.array([r["status"] for r in recs], dtype=np.int32)
    return ray.put((keys, status, tbl))


class CorpusIndexReader:
    """Per-worker view over the broadcast index (zero-copy ray.get)."""

    def __init__(self, ref):
        self.keys, self.status, self.tbl = ray.get(ref)
        self._urls = self.tbl.column("url")

    def lookup(self, urls: list[str]):
        """Vectorized lookup. Returns (status, content_type, body,
        redirect) python lists aligned to ``urls``; 404/empty for
        misses."""
        h = np.fromiter((url_id_64(u) for u in urls), dtype=np.uint64,
                        count=len(urls))
        idx = np.searchsorted(self.keys, h)
        idx = np.minimum(idx, len(self.keys) - 1)
        hit = self.keys[idx] == h
        # guard against 64-bit collisions with a direct URL equality check
        out_status, out_ct, out_body, out_redir = [], [], [], []
        ct_col = self.tbl.column("content_type")
        body_col = self.tbl.column("body")
        red_col = self.tbl.column("redirect_to")
        for i, u in enumerate(urls):
            j = int(idx[i])
            if hit[i] and self._urls[j].as_py() == u:
                out_status.append(int(self.status[j]))
                out_ct.append(ct_col[j].as_py())
                out_body.append(body_col[j].as_py())
                out_redir.append(red_col[j].as_py())
            else:
                out_status.append(404)
                out_ct.append("")
                out_body.append(b"")
                out_redir.append("")
        return out_status, out_ct, out_body, out_redir
