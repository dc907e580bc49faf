"""Task-level progress reporting — the reference's progress bar analog
(A8: AtomicUsize completed-count, src/validator.rs:522, 572-580; progress
callbacks wired to phases in src/main.rs:65-102).

Spark's task-truth lives in the StatusTracker; ``run_with_progress`` runs
a blocking action in a worker thread while the caller's thread polls
completed/total task counts and invokes a callback — no listener
subclassing (py4j callback servers are fragile), no accumulator in the hot
path. Granularity is the poll interval, which is what a progress bar
needs."""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import SparkSession

ProgressCallback = Callable[[int, int], None]  # (completed_tasks, total_tasks)


def run_with_progress(
    spark: SparkSession,
    action: Callable[[], object],
    callback: ProgressCallback,
    poll_s: float = 0.2,
    group: str | None = None,
):
    """Execute ``action()`` (any Spark action) while reporting task
    progress. Returns the action's result; exceptions propagate."""
    group = group or f"progress-{id(action)}"
    sc = spark.sparkContext
    result: dict = {}

    def work():
        sc.setJobGroup(group, "progress-tracked action", False)
        try:
            result["value"] = action()
        except Exception as e:  # propagate to caller
            result["error"] = e
        finally:
            sc.setJobGroup(None, None, False)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    tracker = sc.statusTracker()
    last = (-1, -1)
    while t.is_alive():
        done = total = 0
        for jid in tracker.getJobIdsForGroup(group):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                total += si.numTasks
                done += si.numCompletedTasks
        if total and (done, total) != last:
            callback(done, total)
            last = (done, total)
        t.join(timeout=poll_s)
    if "error" in result:
        raise result["error"]
    # final 100% — even when the action outran the first poll (warm JVM,
    # tiny job), the caller always observes completion
    final_total = last[1] if last != (-1, -1) else 1
    callback(final_total, final_total)
    return result.get("value")
