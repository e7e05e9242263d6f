"""Pure-Python text processing core (no Spark imports).

These functions are the batch kernels that the Spark operators wrap in
Arrow-batched pandas UDFs.  They are deliberately dependency-light and
deterministic so they can be golden-tested exactly against the reference
expectations (see tests/).
"""
