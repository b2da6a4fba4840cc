"""Checkpoint-resumable stage orchestration with per-partition lineage.

The reference's build is single-process and restarts from zero on failure; its
only resumability is the temp-spill-run files (ref: src/indexing/
DocumentIndexer.java:194-202, 280-297). The rebuild makes resumability a
first-class contract (north rule): every stage writes its output as Parquet
plus a ``_manifest.json`` recording inputs, row counts, per-partition metrics
and wall-clock. A resumed build skips stages whose manifest is complete and
re-reads their Parquet, so a kill between any two stages loses at most one
stage of work.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    """Runs named stages; each stage = DataFrame -> Parquet + manifest."""

    def __init__(self, spark: SparkSession, checkpoint_dir: str | None):
        self.spark = spark
        self.dir = checkpoint_dir
        self.metrics: list[dict] = []

    def _paths(self, name: str) -> tuple[str, str]:
        assert self.dir is not None
        out = os.path.join(self.dir, name)
        return out, os.path.join(self.dir, f"{name}._manifest.json")

    def is_complete(self, name: str) -> bool:
        if self.dir is None:
            return False
        _, manifest = self._paths(name)
        if not os.path.exists(manifest):
            return False
        try:
            with open(manifest) as f:
                return json.load(f).get("complete", False)
        except (json.JSONDecodeError, OSError):
            return False

    def run(
        self,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
    ) -> DataFrame:
        """Execute (or resume) one stage.

        Without a checkpoint dir the stage stays a lazy DataFrame (test mode).
        With one, the stage materializes to Parquet exactly once; per-partition
        row counts are recorded as lineage. ``sort_within`` clusters rows
        inside the written files (after co-locating partition_by values) so
        Parquet row-group min/max statistics prune point/range lookups — the
        role of the reference's seek list (GenericSeekList.java:51-71).
        """
        if self.dir is None:
            return build()
        out, manifest = self._paths(name)
        if self.is_complete(name):
            return self.spark.read.parquet(out)
        t0 = time.time()
        df = build()
        if sort_within:
            if partition_by:
                df = df.repartition(*[F.col(c) for c in partition_by])
            df = df.sortWithinPartitions(*sort_within)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        result = self.spark.read.parquet(out)
        # per-partition (spark task partition) lineage: file-level row counts
        part_rows = [
            {"file": os.path.relpath(r["file"], out), "rows": r["rows"]}
            for r in result.withColumn("file", F.input_file_name())
            .groupBy("file")
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        n_rows = sum(p["rows"] for p in part_rows)
        record = {
            "stage": name,
            "complete": True,
            "rows": n_rows,
            "partitions": part_rows,
            "wall_sec": round(time.time() - t0, 3),
            "finished_at_unix": int(time.time()),
        }
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
        os.replace(tmp, manifest)  # atomic: manifest exists => stage complete
        self.metrics.append(record)
        return result
