"""Operators — Spark-first re-expressions of the reference's processing
surface (SURVEY.md §2).  Each module documents which reference function it
covers and the exact window/aggregate plan it compiles to."""
