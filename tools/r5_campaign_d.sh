#!/bin/bash
# Round-5 phase D: budget-fairness continuation after the S3 verdict.
# S3 compared indir best@ep90 (the run was cut by a tunnel wedge at the
# ep100 checkpoint save) against base best@ep180 — at MATCHED ep90 the
# full-frame PSNRs are identical (18.698 vs 18.699), so the best-vs-best
# full gap is budget, not capability.  Phase D:
#   D1  continue the fixed indir arm from best (lr-retime path) ~+60 ep
#   D2  recompare the A/B at (closer to) matched budgets
#   D3  sphere-pretrain routing profile, short arm set   [VERDICT #5]
set -u
cd /root/repo
LOG=exps/r5_campaign.log
DEADLINE=${R5_D_DEADLINE:-$(date -d "23:30" +%s)}
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

run_stage() {  # name max_timeout logfile cmd...
  local name=$1 tmo=$2 lf=$3; shift 3
  local left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt 300 ]; then log "SKIP $name (deadline: ${left}s left)"; return 0; fi
  if [ "$tmo" -gt "$left" ]; then tmo=$left; fi
  log "start $name (timeout ${tmo}s)"
  setsid timeout "$tmo" "$@" > "$lf" 2>&1
  log "$name end rc=$? | $(grep 'eval ep' "$lf" 2>/dev/null | tail -1)"
  return 0
}

run_stage "D1-indir-cont" 1900 exps/r5_shiny3_indir_cont.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini \
    --resume --ckpt best --max-epochs 250 --eval-interval 10

run_stage "D2-shiny3-ab2" 600 exps/r5_shiny3_ab2.log \
  python tools/compare_shiny.py --config configs/scenes/shiny3_indir.ini \
    --indir-ws exps/scenes/shiny3_indir --base-ws exps/scenes/shiny3_base \
    --out exps/shiny3_ab2 --n 4

run_stage "D3-profile-sphere" 1500 exps/r5_profile_sphere.log \
  env PROFILE_SPHERE_ARMS=base_xla,sorted,cp python -u tools/profile_sphere.py

log "phase D complete"
