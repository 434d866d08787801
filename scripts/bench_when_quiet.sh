#!/bin/bash
# Collect up to $1 (default 3) bench runs, each taken only when the
# host-noise probe reads <= 1.20; tags each output with the probe.
want=${1:-3}
got=0
tries=0
while [ $got -lt $want ] && [ $tries -lt 60 ]; do
  tries=$((tries+1))
  r=$(python scripts/noise_probe.py 2>/dev/null | grep -o 'ratio=[0-9.]*' | cut -d= -f2)
  echo "$(date +%H:%M:%S) probe ratio=$r (run $got/$want try $tries)"
  ok=$(python -c "print(1 if float('$r')<=1.20 else 0)")
  if [ "$ok" = "1" ]; then
    ts=$(date +%H%M%S)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 timeout 600 \
      python bench.py > evidence/r06/bench_quiet_${ts}.json 2> evidence/r06/bench_quiet_${ts}.log
    r2=$(python scripts/noise_probe.py 2>/dev/null | grep -o 'ratio=[0-9.]*' | cut -d= -f2)
    echo "{\"probe_before\": $r, \"probe_after\": $r2}" > evidence/r06/bench_quiet_${ts}.probe
    echo "$(date +%H:%M:%S) bench done (probe_after=$r2)"
    got=$((got+1))
  else
    sleep 240
  fi
done
echo "collected $got quiet runs in $tries tries"
