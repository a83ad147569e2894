"""Synthetic load generators — streaming twins of the reference's three
data generators (SURVEY §2.1), built on the ``rate`` source + column
expressions (no Python in the row path; deterministic per ``value``):

- IoT sensor readings (examples/data_generator_iot.py:11-77): sensor_id,
  temperature/humidity with an anomaly fraction (sentinel -999.9).
- E-commerce cart events (examples/data_generator_ecommerce.py:27-103):
  event_id/user_id/event_type with the reference's 50/20/3/8/19 weights,
  product + price.
- Financial ticks (examples/data_generator_financial.py:52-108): symbol +
  a bounded pseudo-random walk standing in for the reference's GBM (the
  rate source is stateless, so the walk derives from hashed offsets —
  same schema and value ranges, not the same stochastic process).

Each returns an unbounded streaming DataFrame; rows/sec is the rate
source's knob (the reference's readings_per_second).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_platform_spark.sources.streaming import rate_source


def _unit(col):  # deterministic uniform [0,1) from a long
    return (F.pmod(F.xxhash64(col), F.lit(10**9)) / F.lit(10**9.0)).cast("double")


def iot_sensor_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    num_sensors: int = 10,
    anomaly_rate: float = 0.05,
) -> DataFrame:
    r = rate_source(spark, rows_per_second)
    u = _unit(F.col("value"))
    u2 = _unit(F.col("value") + 1_000_003)
    is_anom = _unit(F.col("value") + 7) < anomaly_rate
    return r.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("sensor_"), F.pmod(F.col("value"), F.lit(num_sensors))).alias(
            "sensor_id"
        ),
        F.when(is_anom, F.lit(-999.9))
        .otherwise(F.round(15.0 + u * 20.0, 2))
        .alias("temperature"),
        F.round(30.0 + u2 * 50.0, 2).alias("humidity"),
    )


_EVENT_TYPES = [  # cumulative weights 50/20/3/8/19 (data_generator_ecommerce.py)
    (0.50, "page_view"),
    (0.70, "add_to_cart"),
    (0.73, "remove_from_cart"),
    (0.81, "purchase"),
    (1.00, "search"),
]


def ecommerce_event_stream(
    spark: SparkSession, rows_per_second: int = 1000, num_users: int = 100
) -> DataFrame:
    r = rate_source(spark, rows_per_second)
    u = _unit(F.col("value"))
    etype = F.lit("search")
    for cum, name in reversed(_EVENT_TYPES[:-1]):
        etype = F.when(u < cum, F.lit(name)).otherwise(etype)
    return r.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("evt_"), F.col("value")).alias("event_id"),
        F.format_string("user_%04d", F.pmod(F.col("value") * 31 + 7, F.lit(num_users))).alias(
            "user_id"
        ),
        etype.alias("event_type"),
        F.concat(F.lit("prod_"), F.pmod(F.col("value") * 13 + 3, F.lit(10)) + 1).alias(
            "product_id"
        ),
        F.round(5.0 + _unit(F.col("value") + 99) * 195.0, 2).alias("price"),
    )


_SYMBOLS = ("AAPL", "GOOGL", "MSFT", "AMZN", "TSLA", "NVDA", "META", "NFLX")


def financial_tick_stream(
    spark: SparkSession, rows_per_second: int = 1000, base_price: float = 150.0
) -> DataFrame:
    r = rate_source(spark, rows_per_second)
    sym_ix = F.pmod(F.col("value"), F.lit(len(_SYMBOLS)))
    symbol = F.element_at(F.array(*[F.lit(s) for s in _SYMBOLS]), (sym_ix + 1).cast("int"))
    # bounded pseudo-random walk around base_price (±10%)
    drift = (_unit(F.col("value") * 17 + 5) - 0.5) * 0.2
    return r.select(
        F.col("timestamp").alias("ts"),
        symbol.alias("symbol"),
        F.round(F.lit(base_price) * (1.0 + drift), 2).alias("price"),
        (F.pmod(F.col("value") * 7919, F.lit(1000)) + 1).alias("volume"),
    )
