"""Task-granularity progress reporting for long-running ingests.

The reference reports per-row progress during INSERT/UPDATE via GUI
callbacks (tool:257-258, tool:302-303; progress bars at tool:616-626).
Spark executes a write as distributed tasks, so per-row driver
callbacks are impossible by design — the natural replacement (SURVEY
§7.2) is TASK-level completion: "k of n tasks done" for the job(s) an
ingest submits. Granularity change documented: one event per poll tick
summarising task counts, not one per row.

Mechanism: the ingest action runs inside a dedicated Spark job group;
a daemon thread polls ``SparkContext.statusTracker()`` for that
group's jobs and emits ``ProgressEvent``s to the caller's callback.
This is the pure-Python equivalent of attaching a JVM
``SparkListener`` — the statusTracker is fed BY the JVM's
AppStatusListener, and polling it avoids the py4j callback server
(fragile in embedded/driver-managed sessions). A final event with
``done=True`` and the cumulative task counts is always emitted, even
when the job finishes faster than one poll tick.

At cluster scale a 100 TB ingest is tens of thousands of tasks across
many stages; the poller reads O(stages) counters per tick from driver
memory — no extra load on executors.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class ProgressEvent:
    description: str
    tasks_done: int
    tasks_total: int
    active_stages: int
    done: bool

    @property
    def fraction(self) -> float:
        return self.tasks_done / self.tasks_total if self.tasks_total else 0.0


ProgressCallback = Callable[[ProgressEvent], None]


class ProgressReporter:
    """Reports task-level progress of Spark actions run under
    :meth:`track` to a callback. Callback is invoked from the poller
    thread (and once from the caller's thread for the final event) —
    it must be thread-safe and fast (UI enqueue, print, metric push).
    """

    def __init__(
        self,
        spark: SparkSession,
        callback: ProgressCallback,
        poll_interval: float = 0.2,
    ):
        self.spark = spark
        self.callback = callback
        self.poll_interval = poll_interval

    def _snapshot(self, group: str) -> tuple[int, int, int]:
        """(tasks_done, tasks_total, active_stages) over every job the
        tracked action has submitted in its group so far.

        A job's ``stageIds`` include stages that end up SKIPPED (their
        shuffle output was reused — common under AQE); those never run
        a task, so once the job has finished they are dropped from the
        totals — otherwise the bar ends below 100%. While the job is
        running, not-yet-started stages stay in the total (they are
        upcoming work until proven skipped)."""
        tracker = self.spark.sparkContext.statusTracker()
        done = total = active = 0
        for job_id in tracker.getJobIdsForGroup(group):
            job = tracker.getJobInfo(job_id)
            if job is None:
                continue
            finished = job.status in ("SUCCEEDED", "FAILED")
            for stage_id in job.stageIds:
                st = tracker.getStageInfo(stage_id)
                if st is None:
                    continue
                started = (
                    st.numCompletedTasks > 0
                    or st.numActiveTasks > 0
                    or st.numFailedTasks > 0
                )
                if finished and not started:
                    continue  # skipped stage: reused output, no tasks ran
                total += st.numTasks
                done += st.numCompletedTasks
                if st.numActiveTasks > 0:
                    active += 1
        return done, total, active

    @contextmanager
    def track(self, description: str):
        """Run Spark actions in a tracked job group, emitting progress
        events until the block exits; always ends with a done event."""
        sc = self.spark.sparkContext
        group = f"sparketl-ingest-{uuid.uuid4().hex[:12]}"
        stop = threading.Event()

        def poll() -> None:
            while not stop.wait(self.poll_interval):
                done, total, active = self._snapshot(group)
                if total > 0:
                    self.callback(
                        ProgressEvent(description, done, total, active, False)
                    )

        sc.setJobGroup(group, description, interruptOnCancel=False)
        poller = threading.Thread(target=poll, daemon=True)
        poller.start()
        try:
            yield
        finally:
            stop.set()
            poller.join(timeout=5)
            # job-group property is thread-local to the submitting thread
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
            done, total, active = self._snapshot(group)
            self.callback(ProgressEvent(description, done, total, active, True))
