"""Large-scale data-processing operators over the driver's parquet
tables: analytics (groupby/join/topk/anti-join/windows), text analysis,
dedup family (exact, n-gram Jaccard, MinHash-LSH, SimHash), similarity
search (brute-force + LSH-bucketed ANN).

Every SQL-expressible operator has a DuckDB oracle string in
__ray_entry__.oracle_sql(); approximate/heuristic ones are rows-only.
"""
