#!/bin/bash
# Round-5 tail: runs after tools/r5_campaign_b.sh's Q2b stage.  The phase-B
# L4 slot (from-scratch beta_min_sched arm) is PREEMPTED: at ~10 s/epoch a
# deadline-truncated L4 reaches ~ep150, where the r4 curves say a
# no-geometric-cue Laplace arm is still deep in fog — near-zero signal.
# The slot goes to the two VERDICT r5 items with no other chip window:
#   T1  sphere-pretrain profile: scatter/encoding routing arms (#5)
#   T2  compressed toaster schedule-stack burn on synth_shiny2 (#9)
# Usage: r5_tail.sh <campaign_pid>
set -u
cd /root/repo
LOG=exps/r5_tail.log
DEADLINE=${R5_TAIL_DEADLINE:-$(( $(date +%s) + 17400 ))}
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

CAMP_PID="${1:-}"
log "waiting for campaign (pid ${CAMP_PID:-none}) to reach L4 or exit"
while [ -n "$CAMP_PID" ] && kill -0 "$CAMP_PID" 2>/dev/null; do
  if grep -q "start L4-betamin" exps/r5_campaign.log 2>/dev/null; then
    log "L4 started -> preempting (campaign script + stage session)"
    kill "$CAMP_PID" 2>/dev/null
    # the stage runs in its own session (setsid timeout ...): find its
    # literal PIDs via ps (never pkill -f) and kill the whole session
    for pid in $(ps -eo pid=,args= \
        | awk '/r4_laplace_betamin\.ini/ && !/awk/ {print $1}'); do
      sid=$(ps -o sid= -p "$pid" 2>/dev/null | tr -d ' ')
      log "  killing stage pid $pid (sid ${sid:-?})"
      if [ -n "${sid:-}" ] && [ "$sid" != "0" ]; then
        kill -- "-$sid" 2>/dev/null || kill "$pid" 2>/dev/null
      else
        kill "$pid" 2>/dev/null
      fi
    done
    sleep 15
    break
  fi
  sleep 30
done
# let any device process drain before taking the single-tenant tunnel
# (belt and suspenders for a wrong/forked campaign pid: NEVER start a
# stage while another envidr device process is alive)
sleep 15
while true; do
  busy=$(ps -eo args= | grep -E \
    "envidr_tpu\.apps\.cli|tools/(compare_shiny|probe_renv|profile_)" \
    | grep -cv grep)
  [ "$busy" -eq 0 ] && break
  sleep 30
done

run_stage() {  # name max_timeout logfile cmd...
  local name=$1 tmo=$2 lf=$3; shift 3
  local left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt 600 ]; then log "SKIP $name (deadline: ${left}s left)"; return 0; fi
  if [ "$tmo" -gt "$left" ]; then tmo=$left; fi
  log "start $name (timeout ${tmo}s)"
  setsid timeout "$tmo" "$@" > "$lf" 2>&1
  log "$name end rc=$?"
  return 0
}

run_stage "T1-profile-sphere" 2700 exps/r5_profile_sphere.log \
  python -u tools/profile_sphere.py

run_stage "T2-stack-burn" 4800 exps/r5_stack_burn.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny2_stack.ini \
    --max-epochs 45
log "T2 last: $(grep 'eval ep' exps/r5_stack_burn.log 2>/dev/null | tail -1)"
log "tail complete"
