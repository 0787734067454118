"""Per-query shuffle-bytes accounting via the Spark status REST API
(VERDICT r7 item 6): local[32] wall-clock cannot price network
shuffle, so the bench and the stress harness record how many bytes
each query's stages actually wrote to / read from the shuffle — the
quantity that becomes network traffic on a real cluster. "Zero corpus
shuffle" claims are then measured invariants, not plan-shape
arguments.

The AppStatus listener that feeds these numbers runs regardless of
``spark.ui.enabled``; enabling the UI only starts the HTTP server the
REST API hangs off, so measurement does not perturb task execution.
Callers must build the session with ``spark.ui.enabled=true`` (bench
and stress do; the correctness/driver paths keep it off).
"""

from __future__ import annotations

import json
import urllib.request


def shuffle_totals(spark, after_stage_id: int = -1) -> dict | None:
    """Sum shuffle read/write bytes over completed stage attempts with
    ``stageId > after_stage_id``. Returns ``{"read": int, "write":
    int, "max_stage_id": int}``, or None when the UI server is off.

    Windowing on stage id (rather than diffing monotonic totals) keeps
    the numbers correct when the status store evicts old stages past
    ``spark.ui.retainedStages`` — eviction can only lose stages from
    PREVIOUS windows, never the one being measured (provided one
    query's stages fit the retention limit; bench raises it).
    """
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return None
    url = f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            stages = json.load(resp)
    except Exception:
        return None
    read = write = 0
    max_id = after_stage_id
    for s in stages:
        sid = s.get("stageId", -1)
        if sid > max_id:
            max_id = sid
        if sid > after_stage_id:
            read += int(s.get("shuffleReadBytes", 0))
            write += int(s.get("shuffleWriteBytes", 0))
    return {"read": read, "write": write, "max_stage_id": max_id}
