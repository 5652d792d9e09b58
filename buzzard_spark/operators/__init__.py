"""Distributed operators — the Spark-first re-expression of the
reference's per-array spatial ops as DataFrame plans."""
