#!/bin/bash
# Round-4 tail: runs after tools/r4_campaign.sh's runner exits (waits on its
# PID).  Priorities with the remaining wall clock:
#   T1  Laplace-cue continuation ep300 -> ep500 (VERDICT #2: >=28 dB target)
#   T2  march A/B profile (validates coarse_march before the driver bench)
# L3/L4 are sacrificed if the clock runs out — L1+continuation carries the
# Laplace result.
set -u
cd /root/repo
LOG=exps/r4_tail.log
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

RUNNER_PID="${1:-}"
if [ -n "$RUNNER_PID" ]; then
  log "waiting for campaign runner pid $RUNNER_PID"
  while kill -0 "$RUNNER_PID" 2>/dev/null; do sleep 30; done
  log "campaign done"
fi

log "T1 laplace continuation (resume ep300 -> ep500)"
timeout 4500 python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue_cont.ini \
  --resume > exps/r4_laplace_cue_cont.log 2>&1
log "T1 rc=$? $(grep -h '\[done\]' exps/r4_laplace_cue_cont.log | tail -1) last=$(grep 'eval ep' exps/r4_laplace_cue_cont.log | tail -1)"
cp -f exps/r4_laplace_cue/checkpoints/best.ckpt assets/r4_laplace_cue_best.ckpt 2>/dev/null

log "T2 march A/B profile"
timeout 2400 python -u tools/profile_march_r4.py > exps/profile_march_r4.log 2>&1
log "T2 rc=$? $(grep 'speedup' exps/profile_march_r4.log | tail -1)"

# T3 (time-permitting): exercise the faithful reference schedule stack
# (backsdf/cauchy weight scheds switching on at ep40, early-stop raise) in
# anger — a crash-test of the flag-transition recompiles, not a quality run
log "T3 schedule-stack burn (80 ep of r4_laplace_ref)"
timeout 3000 python -m envidr_tpu.apps.cli --config configs/r4_laplace_ref.ini \
  --max-epochs 80 > exps/r4_laplace_ref.log 2>&1
log "T3 rc=$? $(grep -h '\[done\]' exps/r4_laplace_ref.log | tail -1)"
log "tail complete"
