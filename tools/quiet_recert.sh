#!/usr/bin/env bash
# Quiet-window recertification loop (VERDICT r20 next-round #1).
#
# The committed bench certification can only be refreshed on a quiet
# host, and the host offers quiet windows unpredictably. This script
# makes the poll unattended: every INTERVAL seconds it runs the
# seconds-cheap calib-only probe (`graft.Bench calib` — three
# host-state samples, no query passes); on the first quiet reading it
# fires the full bench, and commits BENCH_DETAIL.json iff the full
# run ALSO self-adjudicated quiet. Committing is safe by construction
# (round 20): the gate's reference resolver walks committed history
# newest-first and skips degraded vectors, and pin tightening is
# clamped to 20%/round — a hot vector parked on HEAD can never become
# the baseline.
#
# NOTE: never run this while another sbt invocation is active — sbt
# invocations share target/ (see .claude/skills/verify gotchas).
set -u
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}
INTERVAL=${QUIET_POLL_SECS:-900}
while true; do
  out=$(SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Bench calib" 2>/dev/null \
        | grep '"mode":"calib"' | tail -1)
  echo "$(date -Is) $out"
  case "$out" in
    *'"host_state":"quiet"'*)
      echo "$(date -Is) quiet window — firing full bench"
      start_marker=$(mktemp /tmp/quiet_start.XXXXXX)
      SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS \
        sbt -batch "runMain graft.Bench" >/tmp/quiet_bench.log 2>&1
      rc=$?
      tail -c 600 /tmp/quiet_bench.log
      # ADVICE r21 #4: commit only when THIS run (a) exited cleanly,
      # (b) printed a quiet summary line itself, and (c) actually
      # rewrote the detail file (mtime newer than the run start) —
      # a pre-existing working-tree detail that happens to say quiet
      # must not be recertified by a crashed run.
      summary=$(grep -o '{"metric".*' /tmp/quiet_bench.log | tail -1)
      if [ "$rc" -eq 0 ] \
         && printf '%s' "$summary" | grep -q '"host_state":"quiet"' \
         && printf '%s' "$summary" | grep -q '"n_failed":0' \
         && [ BENCH_DETAIL.json -nt "$start_marker" ]; then
        git add BENCH_DETAIL.json &&
          git commit -m "Quiet-window bench recertification" &&
          echo "$(date -Is) committed quiet BENCH_DETAIL.json" &&
          rm -f "$start_marker" && exit 0
      else
        echo "$(date -Is) full bench rc=$rc not committable (non-quiet, failed queries, or stale detail); resuming poll"
      fi
      rm -f "$start_marker"
      ;;
  esac
  sleep "$INTERVAL"
done
