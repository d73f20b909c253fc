"""Scalar function library: portable time arithmetic, expressions, hashing."""
