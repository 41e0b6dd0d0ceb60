"""End-user pipelines.

Each module exposes query functions ``fn(sf_dir) -> Dataset | DataFrame |
pa.Table`` plus an ``ORACLES`` dict mapping query name → equivalent DuckDB
SQL over the same parquet tables (omitted for non-SQL-expressible ops).
``__ray_entry__`` aggregates them all.
"""
