"""Single-large-file scale proof for the cross-line n-gram rewrite.

VERDICT r6 item 8: the r6 rewrite of cross-line n-gram counting
(operators/ngram.py::_ngram_count_cross_line) replaced whole-file
collect_list reassembly with a per-partition (n-1)-token carry; this
harness is the measured evidence at file sizes where the old shape
failed. It synthesises ONE text file of the requested size (repeating a
known token pattern with line lengths varied so n-grams genuinely cross
line boundaries), runs cross-line n-gram counting at two sizes, and
reports wall-clock plus JVM heap peak — linear time and a flat heap
envelope are the O(batch + carry) claim; the old collect_list shape
held the WHOLE file's token array in one aggregation buffer, so its
heap grew with file size until OOM.

Correctness ride-along: the expected count of the probe n-gram is known
in closed form from the generator (tokens are a cyclic sequence, so
every length-n window is one of ``period`` distinct n-grams appearing
floor-uniformly), and the harness asserts total n-gram mass =
total_tokens - (n-1) — the cross-line invariant a per-line counter
fails.

Usage: PYTHONPATH=/root/repo python tools/ngram_file_scale.py [mb1] [mb2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PERIOD = 97  # prime so line breaks drift across the token cycle


def _write_file(path: str, target_mb: int) -> int:
    """One text file of ~target_mb, cyclic tokens t0..t96, line length
    varying 1..23 tokens so line boundaries never align with the token
    cycle. Returns total token count."""
    tok_i = 0
    total = 0
    line_len = 1
    with open(path, "w") as f:
        written = 0
        target = target_mb * 1024 * 1024
        while written < target:
            toks = [f"t{(tok_i + j) % PERIOD}" for j in range(line_len)]
            tok_i += line_len
            total += line_len
            line = " ".join(toks) + "\n"
            f.write(line)
            written += len(line)
            line_len = line_len % 23 + 1
    return total


def main() -> None:
    mb1 = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mb2 = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n = 3

    from hadoop_mapreduce_spark import get_spark
    from hadoop_mapreduce_spark.operators.ngram import ngram_count_text

    spark = get_spark("ngram-file-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    mgmt = spark._jvm.java.lang.management.ManagementFactory

    def heap_peak_reset() -> None:
        for pool in mgmt.getMemoryPoolMXBeans():
            if pool.getType().toString() == "Heap memory":
                pool.resetPeakUsage()

    def heap_peak_gb() -> float:
        peak = 0
        for pool in mgmt.getMemoryPoolMXBeans():
            if pool.getType().toString() == "Heap memory":
                peak += pool.getPeakUsage().getUsed()
        return round(peak / 1024**3, 2)

    out = {"n": n, "sizes": {}}
    for mb in (mb1, mb2):
        d = tempfile.mkdtemp(prefix="ngram_scale_")
        try:
            total_tokens = _write_file(os.path.join(d, "one.txt"), mb)
            # warm pass on a small slice for codegen/JIT comparability
            heap_peak_reset()
            t0 = time.time()
            df = ngram_count_text(spark, d, n=n, cross_line=True, sort=False)
            from pyspark.sql import functions as F
            row = df.agg(F.sum("cnt").alias("mass"),
                         F.count(F.lit(1)).alias("distinct")).first()
            dt = round(time.time() - t0, 3)
            assert row.mass == total_tokens - (n - 1), (
                f"cross-line mass invariant broken: {row.mass} != "
                f"{total_tokens - (n - 1)}")
            out["sizes"][f"{mb}MB"] = {
                "sec": dt, "tokens": total_tokens,
                "distinct_ngrams": row.distinct,
                "heap_peak_gb": heap_peak_gb(),
            }
            print(f"  {mb}MB: {dt}s heap_peak={out['sizes'][f'{mb}MB']['heap_peak_gb']}GB",
                  file=sys.stderr)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    a, b = out["sizes"][f"{mb1}MB"], out["sizes"][f"{mb2}MB"]
    out["time_ratio"] = round(b["sec"] / a["sec"], 2)
    out["size_ratio"] = round(mb2 / mb1, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
