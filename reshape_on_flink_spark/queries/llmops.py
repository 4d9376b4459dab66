"""LLM-data-pipeline queries (filled in later)."""
QUERIES = {}
ORACLES = {}
