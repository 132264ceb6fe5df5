"""Operator families, one module per SURVEY §2.2 group.

scans (A) · filters (B) · joins (C) · aggregates (D) · windows (E) ·
sorts (F) · sets (G) · functions_scalar (H) · windowed/event-time (I) ·
udfs (J) · llm (K). Modules self-register into the query registry.
"""
