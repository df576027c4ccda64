"""Scalar function helpers: parity hashing, text metrics, LSN codecs."""
