from youtube_analytics_lakehouse_databricks_spark.functions.exact import exact_avg, exact_sum, unit_round
from youtube_analytics_lakehouse_databricks_spark.functions.skew import salted_aggregate, salted_left_join

__all__ = ["exact_avg", "exact_sum", "unit_round", "salted_aggregate", "salted_left_join"]
