"""Scalar/vector function layer: distance math, text analysis, vector ops."""
