"""Batch-expressible streaming-semantics queries (filled in later)."""
QUERIES = {}
ORACLES = {}
