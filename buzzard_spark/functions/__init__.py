"""Column-level functions (JVM-side expressions + vectorized UDFs)."""
