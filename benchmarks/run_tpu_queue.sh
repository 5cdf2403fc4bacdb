#!/bin/bash
# Round-3 TPU-gated measurement queue (VERDICT r2 items 2-6).
#
# The axon tunnel died mid-round; this runs the queued measurements in
# priority order the moment it is back, one at a time (1-core host),
# each under a hard timeout so a hung tunnel cannot eat the round.
# Logs land in /tmp/tpuq/, artifacts in the repo root.
#
# Usage: bash benchmarks/run_tpu_queue.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpuq

# 1-core host: timing runs are garbage under contention (CLAUDE.md).
# If a test suite or the invariant soak happens to be running when the
# tunnel comes back, stop/await them before starting the measurements.
# The stop file must PERSIST through the whole queue (a segmented soak
# loop starts a fresh process every ~15 min and would otherwise restart
# mid-queue and contend every timing run); it is removed at the end.
touch /tmp/stop_fuzz_soak   # fuzz_soak.py polls this and exits cleanly
for _ in $(seq 1 120); do
  pgrep -f "python -m pytest" >/dev/null 2>&1 \
    || pgrep -f "fuzz_soak.py" >/dev/null 2>&1 || break
  echo "$(date +%H:%M:%S) waiting for pytest/soak to finish" >> /tmp/tpuq/queue.log
  sleep 60
done

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
  timeout "$tmo" "$@" >"/tmp/tpuq/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
  tail -3 "/tmp/tpuq/$name.log" | tee -a /tmp/tpuq/queue.log
  return $rc
}

# 1. Mosaic-compiled byte-identity matrix (validates the merge tree on
#    real hardware — interpret mode != Mosaic lowering != libtpu passes).
run parity 2400 python benchmarks/tpu_parity.py --out TPU_PARITY_r03.json

# 2. Headline scoreboard (encode + mfu + mfu_wrapper + decode line).
run bench 1800 python bench.py

# 3. Pack-tier quality sweep (targets: >=950 thru q90, >=900 at q97).
run tier_sweep 2400 python benchmarks/tier_sweep.py

# 4. int8x3 kernel timing (the >=90% roofline experiment, phase B).
run int8 1800 python benchmarks/int8_experiment.py --tpu

# 5. Dynamic-table fused cost + direct-mode fused throughput
#    (the unbacked-comment measurements, VERDICT r2 weak #7).
run dynamic_cost 1800 python benchmarks/dynamic_cost.py

# 6. Rate-control exactness on hardware (probes through the Mosaic
#    kernels; CPU exactness is already test-asserted).
run rate_control 1200 python benchmarks/rc_tpu_check.py

rm -f /tmp/stop_fuzz_soak  # timing done: the soak loop may resume
echo "queue done $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
