"""Per-record transform functions: content-type routing, HTML parsing,
text analytics, open-directory detection. Pure functions + compiled
tables; every hot path has a vectorized batch entry point.
"""
