"""Crawl pipelines: the Ray Data wave driver and the sequential
reference-semantics oracle it is verified against."""
