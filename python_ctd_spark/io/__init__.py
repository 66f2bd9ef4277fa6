"""Sources and sinks.

Instrument ingestion (SURVEY.md §2.1): ``parsers`` holds pure-Python
per-file text parsers (run inside ``mapInPandas`` on executors);
``readers`` wires them into Spark ``binaryFile`` scans that emit wide
cast tables + a ``cast_meta`` table; ``cnv_datasource`` additionally
exposes CNV as a native ``spark.read.format("cnv")`` source.

Corpus ingestion: ``corpus_sources`` reads JSONL/CSV document shards
with explicit schemas and a corrupt-record quarantine; ``warc`` reads
`.warc`/`.warc.gz` crawl shards (one row per record, HTTP split off,
record-granular quarantine) and projects responses onto the canonical
documents shape.

``sinks``: partition-pruned parquet layouts and bucketed tables.
"""

from python_ctd_spark.io.cnv_datasource import register_cnv_source
from python_ctd_spark.io.corpus_sources import (
    DOCUMENTS_SCHEMA,
    corrupt_records,
    read_documents_csv,
    read_documents_jsonl,
    valid_records,
)
from python_ctd_spark.io.warc import (
    read_warc,
    read_warc_stream,
    warc_responses_to_documents,
)
from python_ctd_spark.io.readers import (
    from_bl,
    from_btl,
    from_castaway_csv,
    from_cnv,
    from_edf,
    from_fsi,
    rosette_summary,
)
from python_ctd_spark.io.sinks import read_table, write_bucketed, write_casts

__all__ = [
    "register_cnv_source",
    "DOCUMENTS_SCHEMA",
    "read_documents_jsonl",
    "read_documents_csv",
    "corrupt_records",
    "valid_records",
    "read_warc",
    "read_warc_stream",
    "warc_responses_to_documents",
    "write_casts",
    "write_bucketed",
    "read_table",
    "from_cnv",
    "from_btl",
    "from_edf",
    "from_fsi",
    "from_bl",
    "from_castaway_csv",
    "rosette_summary",
]
