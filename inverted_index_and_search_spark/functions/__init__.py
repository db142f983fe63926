"""Scalar/column function library: text analysis for training-data
pipelines (language-ID, quality scoring, token counting, document
fingerprinting). All functions are built-in-expression based (JVM
codegen) with DuckDB-parity SQL fragment generators for the driver's
correctness oracle."""
