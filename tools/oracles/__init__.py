"""DuckDB oracle SQL for the driver registry, split per family out
of __spark_entry__.py (VERDICT r8 item 9).  Pure refactor: every
oracle string is byte-identical to its pre-split value (snapshot-
verified), so stamp fingerprints survive; the Spark-side queries()
callables stay in __spark_entry__.py untouched."""
