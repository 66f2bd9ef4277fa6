"""Shared registry plumbing: table loaders, decimal aggregates,
the event-source normalizer.

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9 phase 2)."""

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

def dsum(c) -> F.Column:
    """Order-independent (exact) sum of a double expression."""
    c = c if isinstance(c, F.Column) else F.col(c)
    return F.sum(c.cast("decimal(25,6)")).cast("double")

def davg(c) -> F.Column:
    """avg via exact decimal sum / count (matches the SQL twin exactly)."""
    c = c if isinstance(c, F.Column) else F.col(c)
    return F.sum(c.cast("decimal(25,6)")).cast("double") / F.count(c)

#: cast-shaped view of the events table: user_id = cast, (ts_us, event_id)
#: = deterministic scan order, value = the physical channel.  events.parquet
#: may carry TIMESTAMP(NANOS) — read as a nanosecond long (nanosAsLong) and
#: truncated to micros, exactly DuckDB's behavior — or timestamp[us], which
#: Spark reads as TIMESTAMP_NTZ and _ev converts to naive epoch micros via a
#: UTC-pinned cast; either way both engines order and diff identical integers.
_EV_KW = {"by": "user_id", "order": ["ts_us", "event_id"], "pressure": "value"}

def _ev(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the timestamp[us] branch below casts TIMESTAMP_NTZ -> TIMESTAMP, which
    # reads the naive value in the *session* timezone; entry()/queries()
    # accept externally built sessions, so pin it rather than assume
    # session.get_spark was the builder.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    if dict(ev.dtypes).get("ts") == "bigint":
        # nanosecond-long parquet timestamps: truncate to micros
        return ev.withColumn("ts_us", F.expr("ts div 1000"))
    # timestamp[us] parquet: naive micros since epoch, matching DuckDB's
    # epoch_us(ts) (session timezone is pinned to UTC in session._DEFAULTS)
    return ev.withColumn("ts_us", F.expr("unix_micros(cast(ts as timestamp))"))

def _with_gap(ev):
    """NULL-injected channel: clicks lose their value (deterministic)."""
    return ev.withColumn(
        "v",
        F.when(F.col("event_type") == "click", F.lit(None).cast("double")).otherwise(
            F.col("value").cast("double")
        ),
    )

