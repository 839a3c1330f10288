"""Materialized-view registry: the OSS stand-in for Lakeflow MV refresh.

The reference declares 14 `CREATE OR REFRESH MATERIALIZED VIEW` statements
and lets the pipeline service topologically order them by table references
(reference: lakeflow/bronze_to_silver_pipeline.sql, databricks.yml:5-16).
OSS Spark has no MV, so a refresh here is: build each view's DataFrame in
dependency order and persist it with overwrite-saveAsTable (SURVEY.md §3.1).

Design for scale: each view body is a plain DataFrame (Catalyst plans it),
the write is a full recompute — the same semantics Lakeflow guarantees.
Independent views at the same topological depth could refresh concurrently;
at 100 TB you'd also partition the fact writes by date (partitionBy) so
downstream date-pruned reads skip files.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ViewDef:
    name: str  # unqualified table name, e.g. "silver_channels"
    schema: str  # target schema: "silver" | "gold"
    deps: tuple[str, ...]  # names of other ViewDefs this one reads
    builder: Callable[[SparkSession], DataFrame]
    partition_by: tuple[str, ...] = ()

    @property
    def fqn(self) -> str:
        return f"{self.schema}.{self.name}"


@dataclass
class PipelineGraph:
    views: dict[str, ViewDef] = field(default_factory=dict)

    def register(self, view: ViewDef) -> None:
        if view.name in self.views:
            raise ValueError(f"duplicate view {view.name}")
        self.views[view.name] = view

    def topo_order(self) -> list[ViewDef]:
        ts = TopologicalSorter({n: set(v.deps) & set(self.views) for n, v in self.views.items()})
        return [self.views[n] for n in ts.static_order()]

    def refresh(self, spark: SparkSession, only: set[str] | None = None) -> list[str]:
        """Full refresh in dependency order; returns refreshed FQNs.

        ``only`` restricts to a subset *plus* everything upstream of it,
        mirroring a scoped pipeline refresh.
        """
        order = self.topo_order()
        if only is not None:
            wanted = self._with_upstream(only)
            order = [v for v in order if v.name in wanted]
        refreshed = []
        for view in order:
            df = view.builder(spark)
            writer = df.write.mode("overwrite")
            if view.partition_by:
                writer = writer.partitionBy(*view.partition_by)
            writer.format("parquet").saveAsTable(view.fqn)
            refreshed.append(view.fqn)
        return refreshed

    def _with_upstream(self, names: set[str]) -> set[str]:
        out: set[str] = set()
        stack = list(names)
        while stack:
            n = stack.pop()
            if n in out or n not in self.views:
                continue
            out.add(n)
            stack.extend(self.views[n].deps)
        return out


def ensure_schemas(spark: SparkSession, schemas: tuple[str, ...] = ("bronze", "silver", "gold")) -> None:
    """CREATE SCHEMA IF NOT EXISTS for the medallion namespaces
    (reference: lakeflow/bootstrap_unity_catalog.sql:5-14; the reference's
    3-level Unity Catalog collapses to 2-level catalog.schema here)."""
    for s in schemas:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {s}")
