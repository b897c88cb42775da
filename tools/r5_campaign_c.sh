#!/bin/bash
# Round-5 phase C: rerun after the normal_image hard-norm NaN fix.
# The phase-B S1 (shiny3 indir) arm silently skipped EVERY step from the
# indirect switch-on epoch (apply_if_finite; notfinite_count 4560==total at
# ep120) — root-caused to jnp.linalg.norm's 0/0 backward at exactly-zero
# composite normals on background rays (render/scene.py geometry_only
# branch), which only the indirect pass differentiates through.  Fixed with
# the smooth _safe_normalize; probes A-D all clean on the broken ckpt.
#   S1f  shiny3 indir rerun (fix live)        — the round's #1 deliverable
#   S3   A/B compare vs the completed S2 base
#   S4   renv gradient probe on the TRAINED fixed ckpt
#   T1   sphere-pretrain routing profile (short arm set)   [VERDICT #5]
#   T2   compressed toaster-stack burn, remaining time     [VERDICT #9]
set -u
cd /root/repo
LOG=exps/r5_campaign.log
DEADLINE=${R5_C_DEADLINE:-$(date -d "23:30" +%s)}
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

# wait for the running S2 stage (and any other device process) to drain
while true; do
  busy=$(ps -eo args= | grep -E \
    "envidr_tpu\.apps\.cli|tools/(compare_shiny|probe_renv|profile_)" \
    | grep -cv grep)
  [ "$busy" -eq 0 ] && break
  sleep 30
done
sleep 10
log "device drained; phase C starts"

run_stage() {  # name max_timeout logfile cmd...
  local name=$1 tmo=$2 lf=$3; shift 3
  local left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt 600 ]; then log "SKIP $name (deadline: ${left}s left)"; return 0; fi
  if [ "$tmo" -gt "$left" ]; then tmo=$left; fi
  log "start $name (timeout ${tmo}s)"
  setsid timeout "$tmo" "$@" > "$lf" 2>&1
  log "$name end rc=$? | $(grep 'eval ep' "$lf" 2>/dev/null | tail -1)"
  return 0
}

# preserve the broken arm for the postmortem, start the fixed arm clean
if [ -d exps/scenes/shiny3_indir ] && [ ! -d exps/scenes/shiny3_indir_broken ]; then
  mv exps/scenes/shiny3_indir exps/scenes/shiny3_indir_broken
fi

run_stage "S1f-shiny3-indir-fixed" 5100 exps/r5_shiny3_indir_fixed.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini

run_stage "S3-shiny3-ab" 1500 exps/r5_shiny3_ab.log \
  python tools/compare_shiny.py --config configs/scenes/shiny3_indir.ini \
    --indir-ws exps/scenes/shiny3_indir --base-ws exps/scenes/shiny3_base \
    --out exps/shiny3_ab --n 4

run_stage "S4-probe-renv" 900 exps/r5_probe_renv_shiny3.log \
  python tools/probe_renv.py --config configs/scenes/shiny3_indir.ini \
    --out exps/probe_renv_shiny3.json

PROFILE_SPHERE_ARMS=base_xla,sorted,cp \
run_stage "T1-profile-sphere" 1500 exps/r5_profile_sphere.log \
  env PROFILE_SPHERE_ARMS=base_xla,sorted,cp python -u tools/profile_sphere.py

run_stage "T2-stack-burn" 4800 exps/r5_stack_burn.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny2_stack.ini \
    --max-epochs 45
log "phase C complete"
