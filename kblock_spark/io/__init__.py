"""Sources/sinks: deterministic synthetic generators (no external
data allowed) and the checkpoint/lineage manifest."""
