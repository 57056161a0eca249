"""Grouped-map / vectorized pandas-UDF kernels (the engine's only
Python-side compute; everything else stays in Catalyst/JVM)."""
