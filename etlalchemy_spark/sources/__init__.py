"""Sources & sinks: file formats (parquet/csv/json/orc/text) and JDBC.

Re-expresses S1–S2 (reflection + extract) and W1–W4 (CSV dump, SQL
dump, bulk load, DDL sink) from SURVEY.md Table A, replacing the
reference's fetchall-into-driver with partitioned distributed reads.
"""
