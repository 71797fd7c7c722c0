"""Scalar/vector function library (Spark Column exprs + Arrow UDFs)."""
