"""Spark DataFrame operators wrapping the textproc/ner kernels."""
