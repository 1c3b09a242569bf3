"""Run metrics — the reference's load-test metrics (DocumentProcessorResult.java:5-18)
generalized to pipeline accumulators: docs/spans/bytes processed + failures.

Two complementary mechanisms:
  * **Spark accumulators** (`ExtractionMetrics`) incremented inside the
    Arrow-batch UDF path — live, per-executor counters visible while the job
    runs, exactly what you watch on a 1000-executor cluster.
  * an **exact metrics row** computed from the committed output by
    aggregation and appended to the `metrics` snapshot table — the auditable
    record (accumulators may over-count under task retries; the agg row is
    exact, so the table is the source of truth and the accumulators are the
    live gauge).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark import SparkContext
from pyspark.accumulators import Accumulator


@dataclass
class ExtractionMetrics:
    docs_processed: Accumulator
    spans_emitted: Accumulator
    bytes_processed: Accumulator
    failures: Accumulator

    @classmethod
    def create(cls, sc: SparkContext) -> "ExtractionMetrics":
        return cls(
            docs_processed=sc.accumulator(0),
            spans_emitted=sc.accumulator(0),
            bytes_processed=sc.accumulator(0),
            failures=sc.accumulator(0),
        )

    def snapshot(self) -> dict[str, int]:
        return {
            "docs_processed": self.docs_processed.value,
            "spans_emitted": self.spans_emitted.value,
            "bytes_processed": self.bytes_processed.value,
            "failures": self.failures.value,
        }
