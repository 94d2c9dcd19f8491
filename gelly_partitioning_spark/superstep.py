"""Superstep runner: driver-side iteration with checkpointing, resume, and
per-superstep metrics.

Spark has no native iteration operator (Flink delta iteration,
example/NodeSplittingConnectedComponents.java:55-83); the loop lives on the
driver and each superstep is a fresh, AQE-replanned job. Two hazards at
scale (SURVEY.md §7.4):

- *plan growth*: each superstep extends lineage; without truncation the
  analyzer cost grows ~superstep^2. Every superstep's state is
  ``localCheckpoint(eager=True)`` — materialized AND lineage-truncated in
  one pass (on a real cluster swap for reliable ``checkpoint()`` or rely on
  the parquet snapshots below).
- *resumability* (north rule): every ``checkpoint_every`` supersteps the
  state is snapshotted to parquet with a JSON manifest carrying superstep
  number, row counts, changed counts and per-partition row histograms
  ("per-partition lineage + metrics"). ``run`` resumes from the latest
  manifest automatically when ``checkpoint_dir`` is reused.

Protocol: ``step(state, i) -> DataFrame``. If the returned frame has a
boolean ``_changed`` column, the runner counts it for convergence (0 ⇒
stop) and strips it from the loop-carried state — one materialization per
superstep, no recompute.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "manifest.json"
CHANGED = "_changed"

# Broadcast-state scatter budget: the per-superstep broadcast of the vertex
# state must fit comfortably in driver + executor memory. A row-count
# threshold is the wrong unit (VERDICT r1 #6) — 10M rows of (string tag,
# double) is ~400 MB serialized, too big to re-broadcast every superstep on
# a 12g driver. Budget in BYTES, estimate row width from the schema.
DEFAULT_BROADCAST_STATE_BUDGET = 64 << 20  # 64 MiB


def estimate_row_bytes(schema) -> int:
    """Rough serialized row width: 8 B per fixed-width field, 24 B per
    string/binary (hash ids / tags), 16 B default, +16 B row overhead."""
    width = 16
    for f in schema.fields:
        t = f.dataType.typeName()
        if t in ("long", "double", "integer", "float", "boolean", "date", "timestamp"):
            width += 8
        elif t in ("string", "binary"):
            width += 24
        else:
            width += 16
    return width


def fits_broadcast_budget(
    n_rows: int, schema, budget_bytes: int = DEFAULT_BROADCAST_STATE_BUDGET
) -> bool:
    """True when a per-superstep broadcast of the state is within budget."""
    return n_rows * estimate_row_bytes(schema) <= budget_bytes


@dataclass
class SuperstepMetrics:
    superstep: int
    rows: int
    changed: Optional[int]
    wall_sec: float
    partition_rows: Optional[list] = None

    def to_dict(self):
        return {
            "superstep": self.superstep,
            "rows": self.rows,
            "changed": self.changed,
            "wall_sec": round(self.wall_sec, 4),
            "partition_rows": self.partition_rows,
        }


@dataclass
class SuperstepRunner:
    """Run ``step`` to fixpoint (``_changed`` count 0) or max_iterations."""

    spark: SparkSession
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 5
    collect_partition_metrics: bool = False
    metrics: list = field(default_factory=list)
    converged: bool = False
    # identity of the run (algorithm name + parameters). Stored in the
    # manifest; a resume from a checkpoint_dir whose manifest carries a
    # different fingerprint (or an incompatible state schema) starts fresh
    # instead of silently loading foreign state.
    fingerprint: Optional[str] = None

    def run(
        self,
        state: DataFrame,
        step: Callable[[DataFrame, int], DataFrame],
        max_iterations: int,
        start_iteration: int = 1,
    ) -> DataFrame:
        state, start_iteration = self._maybe_resume(state, start_iteration)
        state = state.localCheckpoint(eager=True)
        self.converged = False
        for i in range(start_iteration, max_iterations + 1):
            t0 = time.time()
            # lazy localCheckpoint: the convergence agg below is the one
            # materializing action per superstep — it computes the new
            # state, caches it, and truncates lineage in a single job
            new_state = step(state, i).localCheckpoint(eager=False)
            has_flag = CHANGED in new_state.columns
            if has_flag:
                agg = new_state.agg(
                    F.count("*").alias("rows"),
                    F.sum(F.col(CHANGED).cast("long")).alias("changed"),
                ).collect()[0]
                rows, changed = agg["rows"], agg["changed"] or 0
                new_state = new_state.drop(CHANGED)
            else:
                rows, changed = new_state.count(), None
            m = SuperstepMetrics(i, rows, changed, time.time() - t0)
            if self.collect_partition_metrics:
                m.partition_rows = [
                    r["c"]
                    for r in new_state.groupBy(F.spark_partition_id().alias("p"))
                    .agg(F.count("*").alias("c"))
                    .orderBy("p")
                    .collect()
                ]
            self.metrics.append(m)
            state = new_state
            if self.checkpoint_dir and (i % self.checkpoint_every == 0):
                self._snapshot(state, i)
            if changed == 0:
                self.converged = True
                break
        return state

    # -- checkpoint / resume ------------------------------------------------

    def _snapshot(self, state: DataFrame, superstep: int) -> None:
        path = os.path.join(self.checkpoint_dir, f"superstep={superstep}")
        state.write.mode("overwrite").parquet(path)
        manifest = {
            "superstep": superstep,
            "path": path,
            "schema": state.schema.json(),
            "fingerprint": self.fingerprint,
            "metrics": [m.to_dict() for m in self.metrics],
            "ts": time.time(),
        }
        tmp = os.path.join(self.checkpoint_dir, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.checkpoint_dir, MANIFEST))

    def _maybe_resume(self, state: DataFrame, start_iteration: int):
        if not self.checkpoint_dir:
            return state, start_iteration
        mpath = os.path.join(self.checkpoint_dir, MANIFEST)
        if not os.path.exists(mpath):
            os.makedirs(self.checkpoint_dir, exist_ok=True)
            return state, start_iteration
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest.get("fingerprint") != self.fingerprint:
            import warnings

            warnings.warn(
                f"checkpoint manifest at {mpath} has fingerprint "
                f"{manifest.get('fingerprint')!r} != runner fingerprint "
                f"{self.fingerprint!r}; ignoring it and starting fresh",
                stacklevel=2,
            )
            return state, start_iteration
        # compare field names + types only (nullability legitimately differs
        # between the init state and a post-join superstep state)
        from pyspark.sql.types import StructType

        stored = StructType.fromJson(json.loads(manifest["schema"]))
        shape = lambda s: [(f.name, f.dataType.simpleString()) for f in s.fields]  # noqa: E731
        if shape(stored) != shape(state.schema):
            import warnings

            warnings.warn(
                f"checkpoint manifest at {mpath} stores a different state "
                "schema than the incoming state; ignoring it and starting fresh",
                stacklevel=2,
            )
            return state, start_iteration
        resumed = self.spark.read.parquet(manifest["path"])
        self.metrics = [SuperstepMetrics(**m) for m in manifest.get("metrics", [])]
        return resumed, manifest["superstep"] + 1

    def metrics_json(self) -> str:
        return json.dumps([m.to_dict() for m in self.metrics])
