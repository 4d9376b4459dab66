"""LLM-data-pipeline operators (north star, beyond the reference surface).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search (brute-force + LSH ANN), text analysis (language ID,
quality scoring, token counting, fingerprinting), and multimodal binary
column handling — all expressed as DataFrame transforms that partition
cleanly at 100 TB.

Design rule shared by every module: the only per-row Python is in the
clearly-stubbed multimodal decoders; everything else is built-in Spark SQL
expressions (JVM codegen), so the operators run at scan speed and their
results can be hash-verified against a SQL oracle.
"""
