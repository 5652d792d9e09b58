"""Pure-numpy kernels: no Spark imports — safe to ship into pandas UDFs."""
