from .parquet import load_table, read_bronze, read_silver, write_partitioned
from .csv import read_device_catalog, read_billing

__all__ = [
    "load_table",
    "read_bronze",
    "read_silver",
    "write_partitioned",
    "read_device_catalog",
    "read_billing",
]
