"""Spark-side registry query callables split per family out of
__spark_entry__.py (VERDICT r8 item 9, phase 2).  Source text is
verbatim, so inspect.getsource-based stamp fingerprints survive;
the registry dicts in __spark_entry__.py re-import everything."""
