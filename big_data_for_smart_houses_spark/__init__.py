"""PySpark-native analytics engine with the capabilities of
mohamadaboria/Big-Data-for-Smart-Houses.

A medallion pipeline (Kafka JSON telemetry -> Bronze raw parquet ->
Silver validated/enriched/windowed -> Gold business aggregates ->
read-side analytics), rebuilt idiomatically on Spark DataFrames plus
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Blueprint: SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
