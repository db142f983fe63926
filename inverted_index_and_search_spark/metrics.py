"""Run-level metrics sink — the engine analogue of the reference's
``collect_and_log_metrics`` (``spark/inverted_index_search.py:262-457``),
which logs executor / stage / shuffle / CPU metrics per run.

Same data as the reference reads over the monitoring REST API
(``/api/v1/applications/{app}/executors`` and ``/stages``), but sourced
from the driver's in-process ``AppStatusStore`` — the store that REST
endpoint serves — so it works with ``spark.ui.enabled=false`` and needs
no HTTP round-trip; the REST API remains as a fallback when the store
API shifts. Unlike the reference — which renders the numbers into
free-text log lines parsed back by regex scripts
(``script/logs_to_csv_spark.py``) — the sink writes one structured JSON
artifact next to the index so downstream comparisons (BASELINE.md-style)
need no parsing.

Everything degrades gracefully: if both sources fail the artifact still
records wall time, app id, and driver memory.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

from pyspark.sql import SparkSession

#: stage fields summed across the app (REST /stages), reference parity:
#: shuffle + input volume and executor CPU/run time
_STAGE_SUMS = (
    "executorRunTime", "executorCpuTime", "inputBytes", "outputBytes",
    "shuffleReadBytes", "shuffleWriteBytes", "memoryBytesSpilled",
    "diskBytesSpilled",
)

#: executor fields summed across executors (REST /executors)
_EXEC_SUMS = ("totalDuration", "totalGCTime", "totalInputBytes",
              "totalShuffleRead", "totalShuffleWrite", "memoryUsed")


def _rest_json(spark: SparkSession, endpoint: str):
    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/{endpoint}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _sum_beans(seq, fields) -> tuple[int, dict[str, int]]:
    """Sum getter-style numeric fields over a java Seq of v1 API beans."""
    tot = dict.fromkeys(fields, 0)
    n = 0
    it = seq.iterator()
    while it.hasNext():
        bean = it.next()
        n += 1
        for k in fields:
            tot[k] += int(getattr(bean, k)())
    return n, tot


def _from_status_store(spark: SparkSession) -> dict:
    """Executor/stage sums from the driver's AppStatusStore (the object
    the REST API serves) — available with the UI disabled."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    no_quantiles = sc._gateway.new_array(sc._jvm.double, 0)
    n_stages, stage_sums = _sum_beans(
        store.stageList(empty, False, False, no_quantiles, empty), _STAGE_SUMS)
    n_execs, exec_sums = _sum_beans(store.executorList(False), _EXEC_SUMS)
    _, tasks = _sum_beans(store.executorList(False), ("totalTasks",))
    return {"n_stages": n_stages, "stages": stage_sums,
            "n_executors": n_execs, "executors": exec_sums,
            "total_tasks": tasks["totalTasks"]}


def collect_run_metrics(spark: SparkSession) -> dict:
    """Snapshot of app-level execution metrics. Store/REST-sourced
    fields are best-effort; app id + driver memory always present."""
    out: dict = {
        "app_id": spark.sparkContext.applicationId,
        "spark_version": spark.version,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    try:
        import resource

        out["driver_peak_rss_mb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    except Exception:
        pass
    try:
        out.update(_from_status_store(spark))
        out["source"] = "status_store"
        return out
    except Exception as e:
        out["status_store_error"] = str(e)[:200]
    try:
        execs = _rest_json(spark, "executors") or []
        out["n_executors"] = len(execs)
        out["executors"] = {
            k: int(sum(e.get(k, 0) for e in execs)) for k in _EXEC_SUMS}
        out["total_tasks"] = int(sum(e.get("totalTasks", 0) for e in execs))
        stages = _rest_json(spark, "stages") or []
        out["n_stages"] = len(stages)
        out["stages"] = {
            k: int(sum(s.get(k, 0) for s in stages)) for k in _STAGE_SUMS}
        out["source"] = "rest"
    except Exception as e:
        out["rest_error"] = str(e)[:200]
    return out


def write_run_metrics(spark: SparkSession, out_dir: str, *,
                      wall_seconds: float, job: str = "index_build",
                      extra: dict | None = None) -> dict:
    """Write ``{out_dir}/run_metrics.json`` (atomic rename) and return
    the payload. Call once per run, after the work's actions finished —
    the artifact records cumulative app metrics at that point."""
    payload = {
        "job": job,
        "wall_seconds": round(wall_seconds, 3),
        "collected_unix": int(time.time()),
        **collect_run_metrics(spark),
    }
    if extra:
        payload["extra"] = extra
    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{out_dir}/run_metrics.json.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, f"{out_dir}/run_metrics.json")
    return payload


def read_run_metrics(out_dir: str) -> dict | None:
    path = f"{out_dir}/run_metrics.json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
