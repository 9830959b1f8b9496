"""Scalar function surface: pure-Python semantics + pandas-UDF wrappers.

Pure functions live beside their vectorized wrappers so the sequential
reference model (tests/refmodel.py) and the Spark engine share one
implementation of each *contract* while the golden fixtures (generated
independently by the fixture grammar) keep the tests non-vacuous.
"""
