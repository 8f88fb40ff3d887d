"""Checkpointed per-partition lineage + metrics manifest (north rule:
"resumable from a checkpointed per-partition lineage + metrics manifest").

Semantics inherited from the reference linker's acquisition pattern —
chained, deduped, resumable: already-cached URLs are skipped on re-link
(reference src/linker.js:96-103). Here: already-completed partitions are
skipped on re-run; the manifest entry is written AFTER the partition's
outputs are durably committed, so a crash between partitions loses nothing
and a crash mid-partition re-runs exactly that partition (outputs are
idempotent per-partition overwrites).

Layout: one JSON file per completed partition under ``manifest_dir``
(atomic temp+rename). A file-per-partition manifest scales to O(10^4)
partitions (a year of days x host buckets) and supports concurrent
writers on real object stores better than one mutable index file.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, functions as F

from schema_fantasy_spark.engine import ValidationEngine


def _safe_key(key: str) -> str:
    return "".join(c if (c.isalnum() or c in "-_.") else "_" for c in key)


class PartitionManifest:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def completed(self) -> Dict[str, dict]:
        out = {}
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.dir, name)) as f:
                entry = json.load(f)
            out[entry["partition"]] = entry
        return out

    def mark(self, partition: str, metrics: dict) -> None:
        """Atomically record a completed partition (temp file + rename)."""
        entry = {"partition": partition, "completed_at": time.time(), **metrics}
        path = os.path.join(self.dir, f"{_safe_key(partition)}.json")
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, path)

    def summary(self) -> dict:
        done = self.completed()
        return {
            "n_partitions": len(done),
            "n_rows": sum(e.get("n_rows", 0) for e in done.values()),
            "n_invalid": sum(e.get("n_invalid", 0) for e in done.values()),
            "n_errors": sum(e.get("n_errors", 0) for e in done.values()),
            "all_pass": all(e.get("pass", False) for e in done.values()),
        }


@dataclass
class RunResult:
    processed: List[str]
    skipped: List[str]
    summary: dict


class ResumableValidationRun:
    """Validate a partitioned table partition-by-partition with resume.

    Each partition is one bounded Spark job: filter (partition-pruned at
    the source for a partition-column filter), validate, write violation
    rows (idempotent per-partition overwrite), record verdict metrics in
    the manifest. On restart, completed partitions are anti-joined away
    before any work is scheduled.
    """

    def __init__(
        self,
        engine: ValidationEngine,
        manifest_dir: str,
        partition_col: str,
        violations_dir: Optional[str] = None,
        id_cols: tuple = ("url",),
    ):
        self.engine = engine
        self.manifest = PartitionManifest(manifest_dir)
        self.partition_col = partition_col
        self.violations_dir = violations_dir
        self.id_cols = id_cols

    def partitions(self, df: DataFrame) -> List[str]:
        rows = (
            df.select(F.col(self.partition_col).cast("string").alias("p"))
            .distinct()
            .orderBy("p")
            .collect()
        )
        return [r["p"] for r in rows]

    def run(
        self,
        df: DataFrame,
        fail_after: Optional[int] = None,
        on_partition: Optional[Callable[[str], None]] = None,
    ) -> RunResult:
        """``fail_after``: test hook — raise after N partitions complete
        (simulates a mid-run crash for the resume test)."""
        done = self.manifest.completed()
        all_parts = self.partitions(df)  # one listing job, not one per use
        todo = [p for p in all_parts if p not in done]
        skipped = [p for p in all_parts if p in done]
        processed: List[str] = []
        for i, part in enumerate(todo):
            if fail_after is not None and i >= fail_after:
                raise RuntimeError(f"injected failure after {fail_after} partitions")
            t0 = time.time()
            pdf = df.filter(F.col(self.partition_col).cast("string") == part)
            validated = self.engine.apply(pdf)
            metric_cols = [
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("verdict").cast("long")).alias("n_valid"),
                F.sum((~F.col("verdict")).cast("long")).alias("n_invalid"),
                F.sum(F.size("errors")).alias("n_errors"),
            ]
            if self.violations_dir:
                # ONE pass per partition: metrics ride the violations write
                # as a CollectMetrics (observe) node — Catalyst cannot push
                # the violations filter below it, so the observation sees
                # every validated row while the write job runs
                from pyspark.sql import Observation

                obs = Observation(f"validate-{_safe_key(part)}")
                observed = validated.observe(obs, *metric_cols)
                viol = ValidationEngine.violations(observed, list(self.id_cols))
                viol.write.mode("overwrite").parquet(
                    os.path.join(self.violations_dir, f"part={_safe_key(part)}")
                )
                agg = obs.get
            else:
                agg = validated.agg(*metric_cols).collect()[0].asDict()
            metrics = {
                "n_rows": agg["n_rows"],
                "n_valid": agg["n_valid"] or 0,
                "n_invalid": agg["n_invalid"] or 0,
                "n_errors": agg["n_errors"] or 0,
                "pass": (agg["n_invalid"] or 0) == 0,
                "wall_sec": round(time.time() - t0, 3),
            }
            self.manifest.mark(part, metrics)
            processed.append(part)
            if on_partition:
                on_partition(part)
        return RunResult(processed, skipped, self.manifest.summary())
