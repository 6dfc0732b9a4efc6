"""Scalar/array function layer: text analysis and vector math, all built on
JVM-side Catalyst expressions (no Python UDFs in the hot path)."""
