"""Distributed operators: tile spatial joins, kNN, dedup, similarity,
text analysis, population allocation — all declarative DataFrame plans
with vectorized-UDF refinement only where Spark lacks the primitive."""
