from .silver import bronze_to_silver
from .gold import (
    daily_energy_consumption,
    device_health_metrics,
    daily_business_summary,
)
from .billing import monthly_usage, reconcile_billing, unbilled_statements

__all__ = [
    "bronze_to_silver",
    "daily_energy_consumption",
    "device_health_metrics",
    "daily_business_summary",
    "monthly_usage",
    "reconcile_billing",
    "unbilled_statements",
]
