"""Execution-plan helpers: partitioning, skew, lineage, resume."""
