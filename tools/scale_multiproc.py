"""Multi-executor scaling evidence: P separate JVM processes × C cores each.

"N vs 4N executors" modeled faithfully: each executor is its OWN JVM
(own heap, own GC, own python worker pool) — exactly how a multi-executor
cluster runs several executors per node. The parent starts P workers, each
warms up on a small slice, then a file barrier releases all at once; wall
time is go→last-finish; throughput = total_turns / wall.

Usage: python tools/scale_multiproc.py <procs> <cores_per_proc> <total_turns>
       python tools/scale_multiproc.py --worker <idx> <cores> <turns> <barrier_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(idx: int, cores: int, turns: int, barrier: str) -> None:
    os.environ["SPARK_DRIVER_MEMORY"] = os.environ.get("SCALE_HEAP", "6g")
    from beats_spark.session import get_spark
    from beats_spark.pipeline import Pipeline, fixture_config
    from beats_spark.processors.enrich import register_lookup
    from beats_spark.testdata import synthesize_transcripts, tools_lookup_df

    spark = get_spark(f"scale_w{idx}", master=f"local[{cores}]",
                      shuffle_partitions=cores,
                      extra_conf={
                          "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
                      })
    register_lookup("tools", lambda: tools_lookup_df(spark))
    cfg = fixture_config()
    cfg.processors.append(
        {"enrich": {"lookup": "tools", "on": "tool", "target": "tool_meta",
                    "default": {"tool_family": "unknown"}}})
    pipe = Pipeline(spark, cfg)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None

    def job(n):
        df = synthesize_transcripts(spark, n, max(1000, n // 200),
                                    partitions=cores * 2)
        out = tempfile.mkdtemp(prefix=f"scale_{idx}_", dir=shm)
        pipe.transform(df).write.partitionBy("_sink").mode("overwrite").parquet(out)
        import shutil
        shutil.rmtree(out, ignore_errors=True)

    # warm: 2 full-size runs (JIT convergence), excluded from timing
    job(turns)
    job(turns)
    open(os.path.join(barrier, f"ready_{idx}"), "w").write("1")
    while not os.path.exists(os.path.join(barrier, "go")):
        time.sleep(0.05)
    t0 = time.perf_counter()
    job(turns)
    dt = time.perf_counter() - t0
    open(os.path.join(barrier, f"done_{idx}"), "w").write(json.dumps({"sec": dt}))
    spark.stop()


def main() -> None:
    if sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return
    procs, cores, total = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    per = total // procs
    barrier = tempfile.mkdtemp(prefix="scale_barrier_")
    ps = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__), "--worker",
                          str(i), str(cores), str(per), barrier],
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for i in range(procs)
    ]
    while sum(os.path.exists(os.path.join(barrier, f"ready_{i}"))
              for i in range(procs)) < procs:
        time.sleep(0.2)
        if any(p.poll() not in (None,) and p.returncode not in (0, None) for p in ps):
            raise SystemExit("a worker died during warmup")
    t0 = time.perf_counter()
    open(os.path.join(barrier, "go"), "w").write("1")
    for p in ps:
        p.wait()
    wall = time.perf_counter() - t0
    secs = [json.loads(open(os.path.join(barrier, f"done_{i}")).read())["sec"]
            for i in range(procs)]
    print(json.dumps({
        "procs": procs, "cores_per_proc": cores, "total_cores": procs * cores,
        "total_turns": total, "wall_sec": round(wall, 2),
        "per_worker_secs": [round(s, 2) for s in secs],
        "throughput": round(total / wall, 1),
    }))


if __name__ == "__main__":
    main()
