from youtube_analytics_lakehouse_databricks_spark.plans.registry import PipelineGraph, ViewDef

__all__ = ["PipelineGraph", "ViewDef"]
