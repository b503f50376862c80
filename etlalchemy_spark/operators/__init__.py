"""Reusable engine operators (the layer above raw DataFrame calls).

Each module implements one operator family from SURVEY.md §2, expressed
Spark-first: compositions of built-in DataFrame ops where semantics
allow, Arrow-batched Pandas UDFs only where they don't.
"""
