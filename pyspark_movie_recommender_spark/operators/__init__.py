"""Operator library: relational core + LLM-pipeline operators.

Each module is a thin, composable layer over the DataFrame API — the
logical plan stays declarative so Catalyst/AQE own physical strategy.
"""
