"""PySpark-native analytics engine with the query and data-processing
capabilities of gqvsantos/jobsity-data-pipeline, re-expressed Spark-first.

The reference (read-only at /root/reference) is a Postgres+Spark trips
ETL: CSV ingest -> staging -> keyed dedup upsert -> SQL analytics.
Here every stage is a declarative DataFrame plan so Catalyst/Tungsten
pick the physical strategy, and the surface is extended with the
relational, text-dedup, similarity-search, and streaming operators a
large-scale training-data pipeline needs (SURVEY.md §2).
"""

__version__ = "0.1.0"
