"""twitter_event_stream_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query/data-processing
capabilities catalogued in SURVEY.md (the blueprint reconstructed from the
reference `rhenium/twitter-event-stream`, whose checkout is empty — see
SURVEY.md §0.1; therefore no file:line citations into /root/reference are
possible and none appear here).

Layout:
- ``session``   — SparkSession factory pinning the engine conventions (C1)
- ``tables``    — fixture table loader / view registrar (ns-ts normalization)
- ``registry``  — query + oracle-SQL registry backing ``__spark_entry__``
- ``operators`` — one module per SURVEY §2.2 operator family (A..K)
- ``streaming`` — structured-streaming pipelines, replay fixture, state ops
- ``fsio``      — Hadoop-FS helpers for persisted-index maintenance (X119)
"""

from twitter_event_stream_spark.session import get_spark, configure_session
from twitter_event_stream_spark.tables import load_tables, TABLE_NAMES

__all__ = ["get_spark", "configure_session", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
