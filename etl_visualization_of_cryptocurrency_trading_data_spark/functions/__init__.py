"""Scalar-function library (SURVEY §2.8 + text/tokenization helpers)."""
