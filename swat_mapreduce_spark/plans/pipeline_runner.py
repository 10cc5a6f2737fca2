"""Local runner for Spark 4.1 Declarative Pipelines (batch subset).

``pyspark.pipelines`` (SDP) lets users declare a dataflow graph with
``@dp.materialized_view`` / ``@dp.table`` decorators; the upstream
runner ships as the ``spark-pipelines`` CLI on Spark Connect. This
module provides the engine-side execution for the BATCH subset in
classic local mode: definitions register into a
:class:`LocalGraphRegistry` via the public
``graph_element_registration_context``, and :func:`run_pipeline`
materializes every flow in dependency order.

Dependency resolution is by fixed point rather than static analysis:
a flow's query function reads upstream datasets with
``spark.read.table(name)``, so a flow whose upstreams aren't
materialized yet fails analysis and is retried after the others — no
parsing of user code, and cycles/unresolvable references surface as a
clear error listing the stuck flows. O(n²) retries worst-case on a
pathological ordering, but n is the number of PIPELINE STAGES (tens),
not data — at 100 TB the cost is in the per-stage jobs, unchanged.

Streaming elements (``create_streaming_table`` / ``append_flow``) are
out of scope here — the engine's streaming surface runs through
``streaming/jobs.py``; a production deployment would hand those to the
Connect-based runner.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)


class LocalGraphRegistry(GraphElementRegistry):
    """Collects outputs and flows declared inside the registration
    context (the storage half of the SDP contract)."""

    def __init__(self) -> None:
        self.outputs = []
        self.flows = []

    def register_output(self, output) -> None:
        self.outputs.append(output)

    def register_flow(self, flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        raise NotImplementedError(
            "SQL-file pipeline elements are not supported by the local "
            "batch runner"
        )


def run_pipeline(
    spark: SparkSession, define: "callable", view_prefix: str = ""
) -> dict[str, DataFrame]:
    """Execute a pipeline definition function and materialize every
    flow as a temp view named ``view_prefix + target``.

    ``define`` is called inside the registration context; it should
    declare datasets with ``pyspark.pipelines`` decorators. Returns
    {target_name: DataFrame} for every materialized dataset.
    """
    reg = LocalGraphRegistry()
    with graph_element_registration_context(reg):
        define()
    pending = list(reg.flows)
    done: dict[str, DataFrame] = {}
    last_err: dict[str, Exception] = {}
    while pending:
        progressed = False
        deferred = []
        for flow in pending:
            try:
                df = flow.func()
            except Exception as e:  # upstream view not materialized yet
                last_err[flow.name] = e
                deferred.append(flow)
                continue
            df.createOrReplaceTempView(view_prefix + flow.target)
            done[flow.target] = df
            progressed = True
        if not progressed:
            # Chain the first deferred flow's real exception so a
            # genuine bug inside a flow fn (TypeError, bad column)
            # surfaces with its root cause instead of being swallowed
            # as "cannot make progress".
            detail = "; ".join(
                f"{f.name}: {type(last_err[f.name]).__name__}: "
                f"{last_err[f.name]}"
                for f in deferred
                if f.name in last_err
            )
            raise RuntimeError(
                "pipeline cannot make progress; unresolved flows: "
                + detail
            ) from (last_err.get(deferred[0].name) if deferred else None)
        pending = deferred
    return done
