"""Per-Spark-stage attribution of one ER pass (gen/prepare/block/score/
cluster), via the event log: executorRunTime, executorCpuTime, jvmGCTime,
shuffle bytes, per job group. This is the microscope for the scaling
gate's fixed-cost / CPU-inflation hunts — the TreeCpuSampler in bench.py
says a stage burned N core-s; this says WHICH Spark stage and whether it
was compute, GC, or shuffle.

Usage: python scripts/profile_er.py [cores] [entities]
Writes a human table to stdout; protocol mirrors scripts/scaling_bench.py
(APC=cores, shuffle width 32, compression off, tmpfs local dir).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    entities = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    stages_arg = sys.argv[3] if len(sys.argv) > 3 else "all"

    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    os.environ["EMBER_APC"] = str(cores)

    evdir = f"/tmp/ember_eventlog_{cores}"
    parse_only = os.environ.get("EMBER_PROFILE_PARSE_ONLY") == "1"
    os.makedirs(evdir, exist_ok=True)
    if not parse_only:
        for f in glob.glob(evdir + "/*"):
            if os.path.isfile(f):
                os.remove(f)

    if parse_only:
        _parse_and_print(evdir, cores, entities, {})
        return

    from ember_spark.session import get_spark
    from ember_spark.plans.pipeline import ERPipeline
    from ember_spark.fixtures import generate_pages, split_labels

    spark = get_spark(
        "ember_profile",
        cores=cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file:" + evdir,
        },
    )
    sc = spark.sparkContext

    def group(name):
        sc.setJobGroup(name, name)

    walls: dict[str, float] = {}

    def timed(name, fn):
        group(name)
        t0 = time.time()
        out = fn()
        walls[name] = round(time.time() - t0, 1)
        print(f"[wall] {name}: {walls[name]}s", flush=True)
        return out

    pipe = ERPipeline(spark)
    docs = timed(
        "generate",
        lambda: (lambda d: (d.count(), d)[1])(
            split_labels(generate_pages(spark, entities, seed=142))[0]
            .select("url", "text", "lang")
            .persist()
        ),
    )
    prepared = timed(
        "prepare",
        lambda: (lambda d: (d.count(), d)[1])(pipe.prepare(docs).persist()),
    )
    pairs = timed(
        "block",
        lambda: (lambda d: (d.count(), d)[1])(pipe.block(prepared).persist()),
    )
    if stages_arg == "all":
        scored = timed(
            "score",
            lambda: (lambda d: (d.count(), d)[1])(
                pipe.score(pairs, prepared).persist()
            ),
        )
        timed(
            "cluster",
            lambda: pipe.cluster(scored, prepared)
            .select("entity_id")
            .distinct()
            .count(),
        )
    spark.stop()
    time.sleep(2)
    _parse_and_print(evdir, cores, entities, walls)


def _parse_and_print(
    evdir: str, cores: int, entities: int, walls: dict[str, float]
) -> None:
    # ---- parse the event log (v1 file or v2 rolling directory) ----
    ev = sorted(glob.glob(evdir + "/*"))[-1]
    ev_files = (
        sorted(glob.glob(ev + "/events_*")) if os.path.isdir(ev) else [ev]
    )
    job_group_of_job: dict[int, str] = {}
    stage_to_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    def _lines():
        for fp in ev_files:
            if fp.endswith(".zstd"):
                import io

                import pyarrow as pa

                with pa.CompressedInputStream(
                    pa.OSFile(fp, "rb"), "zstd"
                ) as rd:
                    yield from io.TextIOWrapper(rd, encoding="utf-8")
            else:
                with open(fp) as f:
                    yield from f

    if True:
        for line in _lines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = e.get("Event")
            if k == "SparkListenerJobStart":
                jid = e["Job ID"]
                props = e.get("Properties") or {}
                job_group_of_job[jid] = props.get("spark.jobGroup.id", "?")
                for sinfo in e.get("Stage Infos", []):
                    stage_to_job[sinfo["Stage ID"]] = jid
            elif k == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in si.get("Accumulables", [])
                }

                def g(name):
                    v = acc.get(name, 0)
                    try:
                        return int(v)
                    except (TypeError, ValueError):
                        return 0

                stages[sid] = {
                    "name": si.get("Stage Name", "?")[:60],
                    "tasks": si.get("Number of Tasks", 0),
                    "run_ms": g("internal.metrics.executorRunTime"),
                    "cpu_ms": g("internal.metrics.executorCpuTime") / 1e6,
                    "gc_ms": g("internal.metrics.jvmGCTime"),
                    "deser_ms": g("internal.metrics.executorDeserializeTime"),
                    "sread_mb": g(
                        "internal.metrics.shuffle.read.localBytesRead"
                    )
                    / 1e6
                    + g("internal.metrics.shuffle.read.remoteBytesRead") / 1e6,
                    "swrite_mb": g("internal.metrics.shuffle.write.bytesWritten")
                    / 1e6,
                    "spill_mb": g("internal.metrics.memoryBytesSpilled") / 1e6,
                    "group": job_group_of_job.get(stage_to_job.get(sid, -1), "?"),
                }

    print(f"\n=== cores={cores} entities={entities} walls={walls} ===")
    print(
        f"{'grp':9s} {'sid':>4s} {'tasks':>5s} {'run_s':>7s} {'cpu_s':>7s}"
        f" {'gc_s':>6s} {'deser':>6s} {'rd_MB':>7s} {'wr_MB':>7s}"
        f" {'spill':>6s}  name"
    )
    per_group: dict[str, dict] = {}
    for sid in sorted(stages):
        s = stages[sid]
        print(
            f"{s['group'][:9]:9s} {sid:4d} {s['tasks']:5d}"
            f" {s['run_ms'] / 1e3:7.1f} {s['cpu_ms'] / 1e3:7.1f}"
            f" {s['gc_ms'] / 1e3:6.1f} {s['deser_ms'] / 1e3:6.1f}"
            f" {s['sread_mb']:7.0f} {s['swrite_mb']:7.0f}"
            f" {s['spill_mb']:6.0f}  {s['name']}"
        )
        agg = per_group.setdefault(
            s["group"], {"run": 0.0, "cpu": 0.0, "gc": 0.0, "stages": 0}
        )
        agg["run"] += s["run_ms"] / 1e3
        agg["cpu"] += s["cpu_ms"] / 1e3
        agg["gc"] += s["gc_ms"] / 1e3
        agg["stages"] += 1
    print("\nper group (JVM executor side only — python workers excluded):")
    for gname, a in per_group.items():
        print(
            f"  {gname:9s} stages={a['stages']:3d} run={a['run']:8.1f}s"
            f" cpu={a['cpu']:8.1f}s gc={a['gc']:6.1f}s wall={walls.get(gname)}"
        )


if __name__ == "__main__":
    main()
