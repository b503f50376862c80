"""Structured Streaming operators over the events stream.

SURVEY.md §2 Table B rows "Streaming: watermark, tumbling/sliding/
session windows, late data" and "Stateful streaming ops". Each
streaming query has a batch twin in ``queries/events.py`` carrying the
DuckDB oracle; the streaming variants run the same logical plan through
``readStream`` → memory sink and are rows-only checks (SURVEY.md §5.2).
"""
