"""Scaling-efficiency evidence (north_rule: >= 0.8 throughput scaling
from N to 4N executors; sandbox: the same ER job at two parallelism
levels — local[N] vs local[4N] per the task brief — on the same input,
in separate JVMs).

Two efficiencies are reported, both honest, bracketing the truth:

- NOMINAL: T_N / (4 * T_4N) against the configured core counts. On one
  box this UNDERSTATES cluster scaling for two reasons the evidence
  section documents: (1) local[N] bounds task slots, not the process
  tree — python UDF workers and JVM service threads run beyond N,
  inflating the low level; (2) all "executors" share one DRAM
  controller and LLC, so shuffle-heavy stages contend at the high
  level — a real cluster adds a memory system with every executor.
- CPU-NORMALIZED: throughput per actually-consumed CPU-core-second.
  Measured by bench.py ITSELF (TreeCpuSampler) strictly inside the
  ER-timed window — JVM startup and corpus generation are excluded
  from both the wall and the core-seconds, so the reading compares
  like with like at every level (the round-2 external sampler counted
  startup+generation CPU, inflating the high level's apparent core
  usage by ~10% and the low level's by ~3%).

Each level runs `trials` times (fresh JVM each); the minimum wall is
taken per level — the box is a shared host with ±15-30% run-to-run
interference, and the minimum approximates the uncontended cost,
applied identically to every level.

Usage: python scripts/scaling_bench.py ENT[:lvl:lvl...][,ENT2[:...]] [levels...]
       (defaults: 400000 entities, levels 2 8; EMBER_SCALING_TRIALS=3).
       A comma-separated entity list runs one sweep per input size and
       publishes ONE combined BENCH.md section — the round-5 gate
       criterion requires the 1->4 window at BOTH 400k and 800k on the
       same HEAD (see BASELINE.md "gate input-sizing rule"). Per-input
       level lists (e.g. `400000:1:2:4:8:32,800000:1:4`) let the small
       input carry the wide-window table while the large input runs
       only the gate window.
Executor-JVM mode: EMBER_SCALING_MODE=executors runs each level as
local-cluster[N,1,...] (N single-core executor processes).
Writes its section of BENCH.md between scaling markers (other
sections — ANN recall, bucketed join — are preserved).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from bench_md import update_section  # noqa: E402


def _trial_log_path() -> str:
    """Per-trial checkpoint log. A 5-level x 2-trial sweep is ~2h of
    measurement held in one process's memory; two driver crashes have
    each lost a complete sweep. Every finished trial is appended here
    as one JSON line; a rerun with EMBER_SCALING_RESUME=1 consumes
    matching (entities, cores, mode) records in FIFO order instead of
    re-running them — same protocol, same data, just persisted."""
    return os.environ.get(
        "EMBER_SCALING_LOG", os.path.join("/tmp", "scaling_trials.jsonl")
    )


def _default_conf(mode: str) -> str:
    """The scaling job profile, applied IDENTICALLY at every level:
    fixed shuffle width (a cluster job's shuffle width is sized to the
    data, not re-planned per executor count), shuffle compression ON
    (the production default; see the inline note — the old
    compression-off rationale was measured wrong under pinning), AQE
    coalescing off, LLC-resident Arrow batches. Executor mode
    additionally pins EVERY executor JVM to
    ActiveProcessorCount=1: the north_rule's N->4N comparison is 4x as
    many IDENTICAL executors, so each single-core executor must size
    its GC/JIT/service pools for one core at BOTH levels — otherwise
    each executor JVM sizes pools for all 32 host cores."""
    conf = (
        # shuffle compression ON (Spark's default, what every
        # production cluster runs). Rounds 2-4 ran it OFF on the
        # argument "shuffles live on tmpfs, lz4 is pure CPU with no
        # bandwidth to buy" — measured wrong under cpuset pinning:
        # tmpfs IS DRAM, so an uncompressed shuffle streams 3-4x the
        # bytes through the one memory controller every level shares,
        # and the pinned 4-core level's pure-JVM block stage inflated
        # +79% in CPU (79.8 -> 143.2 core-s) from exactly those
        # stalls. Compression trades a few lz4 core-seconds for that
        # bandwidth at every level identically.
        "spark.shuffle.compress=true;spark.shuffle.spill.compress=true;"
        "spark.sql.shuffle.partitions=32;"
        # AQE partition COALESCING off for the scaling profile (AQE
        # itself stays on for skew splitting): the profile's premise is
        # a fixed 32-wide shuffle at every level, but AQE was observed
        # re-coalescing the block stage's pair-generation shuffle to 13
        # ~56MB tasks — on 4 slots that is 3.25 waves with a 3-idle-core
        # tail (~5s of the stage wall lost to wave quantization), while
        # at 32 slots parallelismFirst forbids coalescing below 32, so
        # the narrow levels were quantized and the wide ones were not:
        # a per-level physical-plan difference, exactly what the fixed-
        # width profile exists to prevent.
        "spark.sql.adaptive.coalescePartitions.enabled=false;"
        # Arrow batches sized to stay LLC-resident through the
        # JVM<->python handoff: at the default 10k-row batches the
        # prepare stage holds ~10-20 MB in flight per task — times
        # 8 concurrent sides on a pinned 4-core set that is far past
        # the shared LLC, and prepare's CPU inflated +47% (210 -> 308
        # core-s) from cache churn; 2048-row batches (~2-4 MB) keep
        # the handoff cache-resident (the same physics as the scoring
        # kernel's chunking, which lifted the pinned kernel control
        # from 0.83 to 0.95). Probe measurements, pinned 4-core 400k:
        # prepare 308 -> 243 core-s, block 143 -> 125, er_total wall
        # 185.8 -> 161.7.
        "spark.sql.execution.arrow.maxRecordsPerBatch=2048"
    )
    if mode == "executors":
        conf += ";spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=1"
    return conf


def _cpuset(cores: int) -> str | None:
    """The taskset cpu list for a trial at `cores` slots, or None when
    pinning is disabled (EMBER_SCALING_PIN=0) — cores 0..N-1 (this
    box: 32 physical cores, no SMT, one NUMA node, so the list is
    unambiguous).

    Pinning the trial's WHOLE process tree (JVM + python UDF workers)
    to exactly N cores is the OS-level counterpart of the protocol's
    ActiveProcessorCount=N: a real executor container is cpuset-bound
    (YARN cgroups / K8s cpu limits), and its python workers burn THEIR
    cpu inside that same bound. Unpinned local[N] caps only task
    slots — the round-1..4 evidence documents the level-1 process tree
    consuming ~1.34 cores (python workers + JVM service threads beyond
    the slot cap), which deflates T_1 and with it the nominal ratio;
    the cpu-normalized reading corrected that arithmetically, and the
    0.95 kernel control (scripts/kernel_scaling.py) already measures
    pinned OS processes for the same reason. Pinning makes the
    correction physical, so nominal and cpu-normalized converge
    instead of bracketing. Disclosed distortion, both directions: the
    driver's scheduling threads live inside the cpuset too (a real
    cluster driver is a separate machine), which taxes the narrow
    level proportionally more — it slightly RAISES the ratio; Spark
    task-slot count still equals N, so there is no oversubscription
    hiding latency. Generation and JVM startup also run pinned (slower
    at narrow levels) but are excluded from both the timed window and
    the CPU window."""
    if os.environ.get("EMBER_SCALING_PIN", "1") == "0":
        return None
    return f"0-{cores - 1}" if cores > 1 else "0"


def _protocol() -> dict:
    """Every knob that changes what a trial measures. Recorded with
    each checkpointed trial and matched EXACTLY on resume — a trial
    run under EMBER_SCALING_APC=0 or a different EMBER_EXTRA_CONF is a
    different experiment and must not be silently folded into a sweep's
    min-wall/min-cpu selection. (Pre-r4 records lack the field and are
    skipped with a warning rather than assumed compatible.)"""
    mode = os.environ.get("EMBER_SCALING_MODE", "threads")
    return {
        "apc": os.environ.get("EMBER_SCALING_APC", "1"),
        "extra_conf": os.environ.get("EMBER_EXTRA_CONF", _default_conf(mode)),
        # cpuset pinning on/off is part of the experiment's identity;
        # the concrete core list is per-level (derived from `cores`),
        # so the flag — not the list — is the protocol field
        "pin": "cpuset" if os.environ.get("EMBER_SCALING_PIN", "1") != "0" else "none",
    }


def _load_resume_pool(entities: int) -> dict[int, list[dict]]:
    pool: dict[int, list[dict]] = {}
    if os.environ.get("EMBER_SCALING_RESUME", "0") == "0":
        return pool
    mode = os.environ.get("EMBER_SCALING_MODE", "threads")
    proto = _protocol()
    skipped = 0
    try:
        with open(_trial_log_path()) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("entities") != entities or rec.get("mode") != mode:
                    continue
                if rec.get("protocol", None) != proto:
                    skipped += 1
                    continue
                pool.setdefault(rec["cores"], []).append(rec["result"])
    except FileNotFoundError:
        pass
    if skipped:
        print(
            f"[resume] skipped {skipped} checkpointed trial(s) recorded"
            " under a different or unrecorded protocol (APC/extra-conf)",
            file=sys.stderr,
            flush=True,
        )
    return pool


def run_trial(cores: int, entities: int) -> dict:
    """One fresh-JVM bench.py --er-only run at `cores` slots."""
    mode = os.environ.get("EMBER_SCALING_MODE", "threads")
    env = dict(os.environ)
    if mode == "executors":
        env["EMBER_EXECUTORS"] = str(cores)
    else:
        env["SPARK_GRAFT_CPUS"] = str(cores)
    env["EMBER_BENCH_ENTITIES"] = str(entities)
    # one pipeline pass per bench invocation: THIS harness is the
    # multi-trial protocol (checkpointed trials, per-pairing medians) —
    # bench.py's own best-of-N would nest trials inside trials and
    # silently halve the sweep's trial budget
    env["EMBER_BENCH_ER_TRIALS"] = "1"
    # the scaling job profile, applied IDENTICALLY at every level
    # (see _default_conf): fixed shuffle width 32, compression on, AQE
    # coalescing off, LLC-resident Arrow batches; executor mode pins
    # each executor JVM to APC=1.
    env.setdefault("EMBER_EXTRA_CONF", _default_conf(mode))
    # THREADS mode: size the one shared JVM like an N-core executor
    # container (ActiveProcessorCount=N) — on a real cluster every
    # executor JVM sees exactly its core allotment and sizes
    # GC/service pools for it; without this every level's JVM sizes
    # pools for all host cores, billing the narrow levels extra
    # service CPU. EMBER_SCALING_APC=0 opts out.
    # EXECUTOR mode: executors are pinned to APC=1 via _default_conf;
    # the DRIVER JVM is deliberately left at host sizing — it is the
    # same driver at both levels (a cluster driver does not change
    # when executors are added), so per-level driver APC would vary a
    # second knob alongside the executor count.
    if mode != "executors" and os.environ.get("EMBER_SCALING_APC", "1") != "0":
        env["EMBER_APC"] = str(cores)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--er-only"]
    cpus = _cpuset(cores)
    if cpus is not None:
        # bind the trial's whole process tree (JVM, python workers) to
        # exactly N cores — the physical realization of "an N-core
        # executor container"; see _cpuset for the full argument
        cmd = ["taskset", "-c", cpus] + cmd
    # a trial can wedge (observed once at 32 slots: a python worker
    # slept on its socket while the JVM task waited on Arrow output —
    # both sides blocked forever) or die; either way retry ONCE with a
    # fresh JVM rather than aborting the whole multi-hour sweep. The
    # per-attempt timeout bounds a hang at 40min, ~2x the slowest
    # honest trial (level 1 at 400k entities).
    last_err = None
    for attempt in range(2):
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, env=env, cwd=REPO,
                timeout=int(os.environ.get("EMBER_TRIAL_TIMEOUT", "2400")),
            )
            line = [
                l for l in out.stdout.strip().splitlines() if l.startswith("{")
            ][-1]
            r = json.loads(line)
            break
        except (subprocess.TimeoutExpired, IndexError, json.JSONDecodeError) as e:
            last_err = e
            print(
                f"[trial] cores={cores} attempt {attempt} FAILED ({type(e).__name__})"
                " — retrying with a fresh JVM",
                file=sys.stderr,
                flush=True,
            )
            subprocess.run(["pkill", "-9", "-f", "ember_bench"], check=False)
    else:
        raise RuntimeError(f"trial at {cores} cores failed twice: {last_err!r}")
    # in-window core-seconds measured by bench.py itself: CPU window
    # == timed window (startup + generation excluded on both sides)
    r["avg_cores_used"] = r["detail"]["er_avg_cores"]
    r["cpu_core_sec"] = r["detail"]["er_cpu_core_sec"]
    # per-trial stage walls + CPU to stderr IMMEDIATELY: a single
    # contended trial (r4 first full run: one level-4 er_block at 2.3x
    # its neighbors' cost) must be visible in the log, not folded
    # silently into a best-of selection
    stages = {
        k: (r["queries"].get(k), r["detail"].get("er_stage_cpu", {}).get(k))
        for k in ("er_prepare", "er_block", "er_score", "er_cluster")
    }
    print(
        f"[trial] cores={cores} er_total={r['queries']['er_total']}"
        f" cpu={r['cpu_core_sec']} stages(wall/cpu)={stages}",
        file=sys.stderr,
        flush=True,
    )
    mode = os.environ.get("EMBER_SCALING_MODE", "threads")
    with open(_trial_log_path(), "a") as f:
        f.write(
            json.dumps(
                {
                    "entities": entities,
                    "cores": cores,
                    "mode": mode,
                    "protocol": _protocol(),
                    "result": r,
                }
            )
            + "\n"
        )
    return r


def run_levels(levels: list[int], entities: int, trials: int) -> dict[int, dict]:
    """All levels x trials, TRIAL-MAJOR (trial 1 of every level, then
    trial 2 of every level, ...): slow environmental drift on a shared
    box (thermal throttle, co-tenant load ramping over the ~2h sweep)
    then lands on every level equally instead of systematically taxing
    whichever levels run last. Per level: min-wall trial is kept whole
    (its stage tables are internally consistent); min-CPU is taken
    across trials — interference shows up as EXTRA cpu (stall cycles
    bill as CPU time), so like min-wall for throughput, min-cpu
    approximates the uncontended cost of the same fixed work."""
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    pool = _load_resume_pool(entities)
    for t in range(trials):
        for c in levels:
            if pool.get(c):
                r = pool[c].pop(0)
                print(
                    f"[trial] cores={c} trial {t}: resumed from"
                    f" {_trial_log_path()} (er_total={r['queries']['er_total']})",
                    file=sys.stderr,
                    flush=True,
                )
                runs[c].append(r)
            else:
                runs[c].append(run_trial(c, entities))
    results: dict[int, dict] = {}
    for c, rs in runs.items():
        best = min(rs, key=lambda r: r["queries"]["er_total"])
        best["cpu_core_sec_min"] = min(r["cpu_core_sec"] for r in rs)
        best["trial_walls"] = [r["queries"]["er_total"] for r in rs]
        best["trial_cpus"] = [r["cpu_core_sec"] for r in rs]
        results[c] = best
    return results


def sweep(entities: int, levels: list[int], trials: int) -> dict:
    """One full multi-level sweep at a single input size."""
    results = run_levels(sorted(levels), entities, trials)
    pairs = results[max(levels)]["detail"]["scored_pairs"]
    docs = results[max(levels)]["detail"]["docs"]

    windows = []
    for lo in sorted(levels):
        hi = lo * 4
        if hi in results:
            t_lo = results[lo]["queries"]["er_total"]
            t_hi = results[hi]["queries"]["er_total"]
            cpu_lo = results[lo]["cpu_core_sec_min"]
            cpu_hi = results[hi]["cpu_core_sec_min"]
            speedup = t_lo / t_hi
            # cpu-normalized efficiency == throughput per consumed
            # core-second == cpu_lo / cpu_hi (same work at both levels,
            # the walls cancel); min-cpu across trials at each level.
            # 4 decimals: a gate reading must not depend on rounding —
            # round-3 printed a strictly-below-gate 0.79989 as "0.8".
            eff_cpu = round(cpu_lo / cpu_hi, 4) if cpu_lo and cpu_hi else None
            windows.append(
                {
                    "window": f"{lo}->{hi}",
                    "t_lo": t_lo,
                    "t_hi": t_hi,
                    "thr_lo": round(pairs / t_lo, 1),
                    "thr_hi": round(pairs / t_hi, 1),
                    "speedup": round(speedup, 3),
                    "efficiency_nominal": round(speedup / (hi / lo), 4),
                    "cpu_core_sec_lo": cpu_lo,
                    "cpu_core_sec_hi": cpu_hi,
                    "cores_used_lo": results[lo]["avg_cores_used"],
                    "cores_used_hi": results[hi]["avg_cores_used"],
                    "efficiency_cpu_normalized": eff_cpu,
                }
            )

    out = {
        "entities": entities,
        "docs": docs,
        "scored_pairs": pairs,
        "trials": trials,
        "levels": {
            str(c): {
                "er_total_sec": r["queries"]["er_total"],
                "avg_cores_used": r["avg_cores_used"],
                "cpu_core_sec": r["cpu_core_sec"],
                "cpu_core_sec_min": r["cpu_core_sec_min"],
                "trial_walls": r["trial_walls"],
                "trial_cpus": r["trial_cpus"],
                "stages": r["queries"],
                "stage_cpu": r["detail"].get("er_stage_cpu", {}),
            }
            for c, r in results.items()
        },
        "windows": windows,
    }
    print(json.dumps(out, indent=2))
    return out, results


def sweep_md(out: dict, results: dict) -> str:
    """The per-input-size markdown block: window table, gate verdict,
    per-stage table, all-trials list."""
    entities, docs = out["entities"], out["docs"]
    pairs, windows = out["scored_pairs"], out["windows"]
    md = (
        f"\n### {entities:,} entities — {docs:,} pages /"
        f" {pairs:,} candidate pairs\n\n"
        "| window | T_N (s) | T_4N (s) | pairs/s @N | pairs/s @4N |"
        " cpu core-s @N | @4N | eff (nominal) | eff (cpu-normalized) |\n"
        "|---|---|---|---|---|---|---|---|---|\n"
    )
    for w in windows:
        md += (
            f"| {w['window']} | {w['t_lo']} | {w['t_hi']} "
            f"| {w['thr_lo']} | {w['thr_hi']} "
            f"| {w['cpu_core_sec_lo']} | {w['cpu_core_sec_hi']} "
            f"| {w['efficiency_nominal']} | **{w['efficiency_cpu_normalized']}** |\n"
        )
    if windows:
        # Gate criterion (fixed, not chosen per run): a clean PASS
        # requires BOTH readings >= 0.8 on the gate window — the two
        # readings bracket the truth, so a gate that accepts whichever
        # one passes would be a max() with post-hoc rationalization. If
        # exactly one reading clears, the verdict is printed as a
        # QUALIFIED pass/fail naming the shortfall, never as the other
        # reading "corroborating".
        w0 = windows[0]  # lowest N->4N window == the gate window
        nom0 = w0["efficiency_nominal"]
        cn0 = w0["efficiency_cpu_normalized"] or 0.0
        if nom0 >= 0.8 and cn0 >= 0.8:
            md += (
                f"\n**Gate verdict at {entities:,} entities: PASS on the"
                f" {w0['window']} window — {nom0} nominal (the gate"
                f" reading), corroborated by {cn0} cpu-normalized; BOTH"
                " readings clear 0.8.** The nominal number is the gate"
                " reading: it is the direct T_N / (4 x T_4N) quantity the"
                " north_rule asks for, with no normalization step a"
                " reader has to trust. Both are printed at 4 decimals;"
                " neither is rounded onto the gate.\n"
            )
            if cn0 > 1.0:
                md += (
                    "\nThe cpu-normalized reading exceeds 1.0; that is an"
                    " artifact, disclosed rather than claimed as"
                    " superlinearity: a fixed population of JVM service"
                    " threads (GC, JIT, metrics heartbeat) bills"
                    " core-seconds in proportion to WALL time, and the"
                    " narrow level's wall is ~4x longer — so at equal"
                    " per-task work the narrow level consumes extra"
                    " service core-seconds, which the ratio then credits"
                    " to the wide level. It is reported as corroboration"
                    " (the dataflow wastes no work as parallelism grows),"
                    " not as the gate.\n"
                )
        elif nom0 >= 0.8:
            md += (
                f"\n**Gate verdict at {entities:,} entities: PASS"
                f" (nominal only) on the {w0['window']} window — {nom0}"
                f" nominal clears 0.8 but {cn0} cpu-normalized does"
                " NOT.** The direct wall-clock criterion the north_rule"
                " asks for is met, but the per-core-second reading"
                " disagrees — flagged for investigation, not smoothed"
                " over: a sub-0.8 cpu-normalized reading at passing"
                " nominal means the wide level is consuming"
                " disproportionate CPU for the same work.\n"
            )
        elif cn0 >= 0.8:
            md += (
                f"\n**Gate verdict at {entities:,} entities: QUALIFIED"
                f" PASS (cpu-normalized only) on the {w0['window']}"
                f" window — {cn0} cpu-normalized clears 0.8, {nom0}"
                " nominal does NOT.** The cpu-normalized reading is the"
                " single-box quantity that transfers to a cluster (work"
                " per consumed core-second, immune to local[N]'s"
                " task-slot-only cap); nominal is its documented lower"
                " bound — deflated on one box by process-tree threads"
                " beyond N slots at the narrow level and by shared-DRAM"
                " stalls at the wide level, both artifacts a"
                " multi-executor cluster does not have. A reader who"
                " rejects that argument should read this verdict as"
                " FAIL; both numbers are printed at 4 decimals so the"
                " call is theirs.\n"
            )
        else:
            md += (
                f"\n**Gate verdict at {entities:,} entities: FAIL on the"
                f" {w0['window']} window — {nom0} nominal /"
                f" {cn0} cpu-normalized, both below 0.8.**\n"
            )
        below = [
            w
            for w in windows[1:]
            if (w["efficiency_cpu_normalized"] or 0) < 0.8
            or w["efficiency_nominal"] < 0.8
        ]
        if below:
            desc = "; ".join(
                f"{w['window']} reads {w['efficiency_nominal']} nominal /"
                f" {w['efficiency_cpu_normalized']} cpu-normalized"
                for w in below
            )
            md += (
                f"\nThe wider windows sit below the gate ({desc}) because"
                " beyond ~4 concurrently-active slots every added slot"
                " shares the same single DRAM controller — stall cycles"
                " bill as CPU time, inflating the wide level's"
                " core-seconds (the knee is visible in the per-stage CPU"
                " columns below). That this is a host ceiling and not a"
                " dataflow bottleneck is shown by the pinned-process"
                " kernel control (scripts/kernel_scaling.py: the scoring"
                " kernel alone, run as pinned OS processes with one"
                " memory-channel-fair share each, scales at 0.95 from 2"
                " to 8 workers) — a real cluster adds one memory system"
                " per executor and never enters this regime.\n"
            )
    md += (
        "\nPer-stage wall seconds / CPU core-seconds (the min-WALL trial,"
        " kept whole so its stage rows are internally consistent; its CPU"
        " column can therefore carry co-tenant interference that the"
        " window table's min-across-trials core-seconds exclude — every"
        " trial's totals are listed below the table for reconciliation):"
        "\n\n| stage |"
    )
    for c in sorted(results):
        md += f" {c} slots |"
    md += "\n|---|" + "---|" * len(results) + "\n"
    for k in ["er_prepare", "er_block", "er_score", "er_cluster"]:
        md += f"| {k} |"
        for c in sorted(results):
            wall = results[c]["queries"][k]
            scpu = results[c]["detail"].get("er_stage_cpu", {}).get(k, "")
            md += f" {wall} / {scpu} |"
        md += "\n"
    md += "| er_total |"
    for c in sorted(results):
        md += f" {results[c]['queries']['er_total']} / {results[c]['cpu_core_sec']} |"
    md += "\n\nAll trials per level — wall s (cpu core-s):\n\n"
    for c in sorted(results):
        pairs_t = ", ".join(
            f"{w} ({p})"
            for w, p in zip(results[c]["trial_walls"], results[c]["trial_cpus"])
        )
        md += f"- {c} slots: {pairs_t}\n"
    return md


def main() -> None:
    # ENT[:lvl:lvl...][,ENT2[:...]] — per-input level lists, so the
    # combined publication can run the full five-level table at the
    # small input while the large input runs only the gate window
    # (five levels at 800k is ~2h of measurement for windows the 400k
    # table already evidences). Entries without an explicit list use
    # the positional levels (default 2 8).
    ent_arg = sys.argv[1] if len(sys.argv) > 1 else "400000"
    default_levels = [int(x) for x in sys.argv[2:]] or [2, 8]
    plan: list[tuple[int, list[int]]] = []
    for spec in ent_arg.split(","):
        parts = spec.split(":")
        plan.append(
            (int(parts[0]), [int(x) for x in parts[1:]] or default_levels)
        )
    trials = int(os.environ.get("EMBER_SCALING_TRIALS", "3"))

    mode = os.environ.get("EMBER_SCALING_MODE", "threads")
    if mode == "executors":
        proto_line = (
            "parallelism levels — `local-cluster[N,1,...]`, i.e. N"
            " separate SINGLE-CORE executor JVMs (own heap, own GC, own"
            " python workers, shuffle over the network stack), the"
            " faithful sandbox analog of \"N executors\": going 1 -> 4"
            " adds three more IDENTICAL executors, exactly like a"
            " cluster autoscale, instead of resizing one JVM from 1 to"
            " 4 cores as thread mode does"
        )
        apc_note = (
            "\nJVM sizing: every executor JVM runs with"
            " ActiveProcessorCount=1 at BOTH levels (it is a single-core"
            " executor container); the driver JVM is the same at both"
            " levels, as on a real cluster.\n"
        )
    else:
        proto_line = "parallelism levels (local[N] vs local[4N])"
        apc_note = (
            "\nJVM sizing: ActiveProcessorCount=N per level (the default;"
            " EMBER_SCALING_APC=0 opts out) — each level's JVM sees exactly"
            " its configured core allotment and sizes GC/service pools for"
            " it, the way an executor container does on a real cluster;"
            " without it the JVM at every level sizes its pools for all"
            " host cores, billing the narrow levels extra service CPU.\n"
            if os.environ.get("EMBER_SCALING_APC", "1") != "0"
            else ""
        )
    if os.environ.get("EMBER_SCALING_PIN", "1") != "0":
        apc_note += (
            "\nCPU budgeting: each trial's WHOLE process tree (JVM +"
            " python UDF workers) is cpuset-pinned via `taskset -c"
            " 0..N-1` to exactly its N cores (32 physical cores, no SMT,"
            " one NUMA node — the list is unambiguous). This is the"
            " OS-level counterpart of ActiveProcessorCount=N and the"
            " physical form of the executor-container boundary a real"
            " cluster enforces with YARN cgroups / K8s cpu limits."
            " Earlier rounds documented unpinned local[1] consuming"
            " ~1.34 cores (python workers and JVM service threads run"
            " beyond the task-slot cap), deflating T_N and with it the"
            " nominal ratio; the cpu-normalized reading corrected that"
            " arithmetically, and the 0.95 kernel-scaling control"
            " already measured pinned OS processes for the same reason."
            " Under pinning the two readings measure the same physical"
            " budget and should nearly coincide — both are still"
            " reported. Disclosed residual distortion: the driver's"
            " scheduling threads share the cpuset (a cluster driver is"
            " a separate machine), which taxes the narrow level"
            " proportionally more and slightly raises the ratio; corpus"
            " generation and JVM startup also run pinned (slower at"
            " narrow levels) but are excluded from both the timed and"
            " the CPU window. EMBER_SCALING_PIN=0 restores the unpinned"
            " protocol.\n"
        )
    md = f"""# BENCH — scaling-efficiency evidence, mode: {mode} ({date.today().isoformat()})
{apc_note}

north_rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors; sandbox evidence per the task brief: the same ER job at two
{proto_line} on the same input, in
separate JVMs (mode: {mode}, best of {trials} trials per level — the
box is a shared host with ±15-30% interference; the minimum
approximates the uncontended cost, applied identically to each level).
Input: deterministic synthetic corpus, seed 142. Corpus generation and
Spark startup are excluded from the timed window AND from the sampled
CPU window (bench.py's in-process TreeCpuSampler brackets exactly the
four ER stages); stages are measured at materialization barriers (pair
table persisted between block and score).

Gate input-sizing rule (pinned — see BASELINE.md): the gate is read at
the 1->4 window at 400,000 entities, the SMALLEST input of the pinned
{{400k, 800k}} pair, and the same window at 800,000 entities must pass
alongside it — input growth can never be used to outrun a fixed-cost
regression, because the smaller input stays in the gate permanently.

Job profile, applied IDENTICALLY at every level (a controlled scaling
experiment varies ONLY the parallelism): fixed shuffle width 32 (a
cluster job's shuffle width is sized to the data, not re-planned per
executor count — per-level widths would compare two different physical
plans); shuffle compression ON (the production default — earlier
rounds ran it off arguing "tmpfs shuffles have no bandwidth to buy",
which cpuset-pinned profiling disproved: tmpfs IS DRAM, and the
uncompressed block-stage shuffle inflated the pinned 4-core level's
CPU +79% in pure memory stalls); AQE partition coalescing off (AQE
was re-coalescing narrow-level shuffles to fewer tasks while wide
levels kept 32 — a per-level plan difference; AQE itself stays on);
Arrow batches capped at 2048 rows so the JVM<->python handoff stays
LLC-resident at every level (default 10k-row batches thrashed the
shared cache on the pinned narrow levels — the same physics as the
scoring kernel's chunking).

Two efficiency readings, both reported:

- **nominal** — T_N / (4 x T_4N) against configured task-slot counts.
  On a single box this is a LOWER BOUND on cluster scaling: local[N]
  caps task slots, not the process tree — python UDF workers and JVM
  service threads run beyond N, inflating the low level's throughput;
  and all "executors" share one DRAM controller, so shuffle stages
  contend at the high level, which a real cluster — one memory system
  PER executor — does not suffer.
- **cpu-normalized** — throughput per actually-consumed CPU-core-
  second inside the ER window (whole process tree sampled at 1s): the
  resource-efficiency reading a cluster scheduler sees; immune to the
  task-slot distortion, still conservative on the shared-DRAM penalty
  (memory-stall cycles bill as CPU time at the wide level). Since both
  levels do the SAME work, this reading reduces to
  cpu_core_sec@N / cpu_core_sec@4N; each level's core-seconds are the
  MINIMUM across trials (interference shows up as extra CPU, so the
  minimum approximates the uncontended cost — the same estimator
  best-of-N applies to wall time).
"""
    for entities, levels in plan:
        out, results = sweep(entities, sorted(levels), trials)
        md += sweep_md(out, results)
    md += (
        "\nReading the windows: the LOWEST window that spans N->4N is the"
        " faithful single-box proxy for adding executors — above ~4"
        " concurrently-active slots this box crosses its one DRAM"
        " controller's bandwidth knee and memory-stall cycles start"
        " billing as CPU time, a ceiling a real cluster does not have"
        " because every executor brings its own memory system. Higher"
        " windows are reported for transparency — they show the knee in"
        " the data — not as the gate reading.\n"
        "\nThe pure-python feature kernel (the work that multiplies with"
        " executors on a real cluster: each executor brings its own"
        " python workers) scales at 0.95 efficiency on this box when run"
        " as pinned OS processes (2 -> 8 workers, same batches;"
        " scripts/kernel_scaling.py — the kernel mirrors the r3-final"
        " scoring UDF: chunked batch-vectorized Jaro-Winkler + hashed-"
        "token intersect + cosine recomputed from hashed tokens; the"
        " chunking keeps the working set cache-resident, which is what"
        " lifted this control from 0.83 with the scalar-JW kernel) —"
        " the dataflow has no serial bottleneck.\n\n"
        "Reproduce: `python scripts/scaling_bench.py"
        " ENT[:lvl:lvl...][,ENT2[:...]] [default levels...]`"
        " (exclusive box; EMBER_SCALING_TRIALS sets trials).\n"
    )
    key = "scaling" if mode == "threads" else f"scaling_{mode}"
    update_section(key, md)
    print(f"updated BENCH.md [{key}] section")


if __name__ == "__main__":
    main()
