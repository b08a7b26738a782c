"""Isolated probe for the two 32x wall anomalies (VERDICT r7 item 2).

SCALE32_r07 (serialized 57-query run, heap_peak 33.5/32 GB) shows
events_session 1.07->12.98 s and asof_join_events_orders 1.35->13.92 s
for 2x data between the 16x and 32x rungs while their shuffle volume
grows linearly (46.7->90.7 MB / 79.3->156.7 MB). Hypothesis (BASELINE.md
32x section): serialized-run GC/heap pressure, not plan.

This probe runs EACH query ISOLATED — fresh JVM per (query, K), same
warm-once-then-measure protocol as scale_bench — and records wall plus
JVM GC time (ManagementFactory MX beans) and peak heap around the timed
run. If the isolated 16x->32x growth is ~2x with small GC time, the
serialized-run reading is confirmed and documented; if the jump
reproduces in isolation, it is a plan defect to fix.

Usage: PYTHONPATH=/root/repo python tools/anomaly_probe.py <scaled_dir> <K> [query ...]
Emits one JSON line per query.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERIES_DEFAULT = ["events_session", "asof_join_events_orders"]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from hadoop_mapreduce_spark import get_spark
from hadoop_mapreduce_spark.registry import QUERIES
from hadoop_mapreduce_spark.session import release_caches

scaled, name = sys.argv[1], sys.argv[2]
spark = get_spark("anomaly-probe")
spark.sparkContext.setLogLevel("ERROR")
jvm = spark.sparkContext._jvm
mf = jvm.java.lang.management.ManagementFactory

def gc_ms():
    total = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return total

def heap_gb():
    return mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() / (1 << 30)

fn = QUERIES[name]
# warm once (codegen/JIT + first touch) — scale_bench protocol
fn(spark, scaled).write.format("noop").mode("overwrite").save()
release_caches()
g0, t0 = gc_ms(), time.time()
fn(spark, scaled).write.format("noop").mode("overwrite").save()
wall = time.time() - t0
g1 = gc_ms()
release_caches()
print(json.dumps({"query": name, "wall_s": round(wall, 3),
                  "gc_ms_during": g1 - g0,
                  "heap_used_end_gb": round(heap_gb(), 2)}))
"""


def main() -> int:
    scaled = sys.argv[1]
    k = sys.argv[2]
    names = sys.argv[3:] or QUERIES_DEFAULT
    for name in names:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, scaled, name],
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, "PYTHONPATH": "/root/repo"},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if line:
            rec = json.loads(line[-1])
            rec["k"] = int(k)
            rec["isolated"] = True
            print(json.dumps(rec), flush=True)
        else:
            print(json.dumps({"query": name, "k": int(k),
                              "error": out.stderr[-500:]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
