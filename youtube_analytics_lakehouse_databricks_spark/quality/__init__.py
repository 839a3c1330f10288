from youtube_analytics_lakehouse_databricks_spark.quality.checks import (
    CheckResult,
    accepted_values,
    freshness,
    non_negative,
    not_null,
    relationships,
    run_checks,
    unique_grain,
    warn_unknown_values,
)

__all__ = [
    "CheckResult",
    "accepted_values",
    "freshness",
    "non_negative",
    "not_null",
    "relationships",
    "run_checks",
    "unique_grain",
    "warn_unknown_values",
]
