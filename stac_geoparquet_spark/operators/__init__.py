"""Query operators: the relational surface plus training-data ops.

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLE: dict[str, str]`` (DuckDB-runnable ANSI SQL
producing the same rows/columns). ``__spark_entry__`` merges them.
"""
