from .ingest import (
    parse_telemetry_json,
    telemetry_stream_from_kafka,
    kafka_sink,
    write_bronze_stream,
)
from .simulator import telemetry_stream_from_rate

__all__ = [
    "parse_telemetry_json",
    "telemetry_stream_from_kafka",
    "kafka_sink",
    "write_bronze_stream",
    "telemetry_stream_from_rate",
]
