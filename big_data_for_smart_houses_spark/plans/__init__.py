"""Pipeline orchestration plans (the reference's process entry points,
re-expressed as pruned batch jobs and checkpointed streaming runs)."""

from .etl import (
    run_bronze_to_silver,
    run_bronze_to_silver_incremental,
    run_full_etl,
    run_silver_to_gold,
)

__all__ = [
    "run_bronze_to_silver",
    "run_bronze_to_silver_incremental",
    "run_full_etl",
    "run_silver_to_gold",
]
