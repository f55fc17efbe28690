"""Scalar/column function library: text analysis, vector math.

Everything here is built from native ``pyspark.sql.functions`` column
expressions (JVM-side, whole-stage-codegen'd) — no Python UDFs in these
hot paths. Each function also has an ANSI-SQL twin used by the DuckDB
oracles, so the semantics are pinned down cross-engine.
"""
