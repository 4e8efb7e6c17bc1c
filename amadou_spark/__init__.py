"""amadou_spark — a PySpark-native analytics/ETL engine.

A ground-up re-derivation (NOT a port) of the capabilities of the
reference ETL framework mediative/amadou (see /root/repo/SURVEY.md):
a Stage pipeline algebra, a date/schedule calculus for incremental
backfill, typed config loading, a reader/writer surface, monitoring
events + metrics — all expressed on top of ``pyspark.sql`` so that
Catalyst/Tungsten own every relational decision — plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.
"""

from amadou_spark.session import get_spark, stop_spark
from amadou_spark.dates import DateInterval, Schedule
from amadou_spark.stage import Stage, Context, source, transform, sink

__all__ = [
    "get_spark",
    "stop_spark",
    "DateInterval",
    "Schedule",
    "Stage",
    "Context",
    "source",
    "transform",
    "sink",
]

__version__ = "0.1.0"
