#!/bin/bash
# Round-5 phase F: the regularized interreflection A/B with FAITHFULLY
# scaled anti-billboard schedules.  Phase E's /10-compressed anneals
# (built for the 45-ep burn) let backsdf/cauchy decay to ~0 by ep42 of a
# 250-ep arm — the toaster recipe holds FULL weight for 120/400+ epochs.
# Scale ~/1.8 for the 250-ep budget: start 22, hold to 66, anneal over
# 165, stop 220.  Both arms identical except the indirect pass.
set -u
cd /root/repo
LOG=exps/r5_campaign.log
DEADLINE=${R5_F_DEADLINE:-$(( $(date +%s) + 21600 ))}
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

run_stage() {
  local name=$1 tmo=$2 lf=$3; shift 3
  local left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt 600 ]; then log "SKIP $name (deadline: ${left}s left)"; return 0; fi
  if [ "$tmo" -gt "$left" ]; then tmo=$left; fi
  log "start $name (timeout ${tmo}s)"
  setsid timeout "$tmo" "$@" > "$lf" 2>&1
  log "$name end rc=$? | $(grep 'eval ep' "$lf" 2>/dev/null | tail -1)"
  return 0
}

BS_SETS=(--set backsdf_loss_weight=5e-3 --set backsdf_loss_start_iter=22
  --set backsdf_thresh=0.01 --set backsdf_mode=sum
  --set "backsdf_loss_weight_sched=[5e-3, 1e-5, 66, 165, 220]"
  --set cauchy_loss_weight=0.1 --set cauchy_loss_start_iter=22
  --set "cauchy_loss_weight_sched=[0.1, 0.001, 66, 165, 220]")

run_stage "F1-indir-bs" 7800 exps/r5_shiny3_f_indir.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini \
    --workspace exps/scenes/shiny3_f_indir "${BS_SETS[@]}"

run_stage "F2-base-bs" 5400 exps/r5_shiny3_f_base.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini \
    --workspace exps/scenes/shiny3_f_base \
    --set indir_ref_start_iter=0 --set use_renv=False \
    --set "resume_mlps=[specular, diffuse]" \
    "${BS_SETS[@]}"

run_stage "F3-ab" 900 exps/r5_shiny3_ab_f.log \
  python tools/compare_shiny.py --config configs/scenes/shiny3_indir.ini \
    --indir-ws exps/scenes/shiny3_f_indir --base-ws exps/scenes/shiny3_f_base \
    --out exps/shiny3_ab_f --n 4

run_stage "F4-probe" 900 exps/r5_probe_renv_f.log \
  python tools/probe_renv.py --config configs/scenes/shiny3_indir.ini \
    --workspace exps/scenes/shiny3_f_indir --out exps/probe_renv_f.json

WS=exps/r5_laplace
if [ -f "$WS/checkpoints/best.ckpt" ]; then
  EP=$(python3 -c "import pickle;print(pickle.load(open('$WS/checkpoints/best.ckpt','rb'))['epoch'])")
  run_stage "Q2b-rank48-hold" 4800 exps/r5_laplace_rank48.log \
    python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue.ini \
      --workspace "$WS" --resume --ckpt best --max-epochs $((EP + 80)) \
      --eval-interval 5 \
      --set "cp_rank=48" --set "beta_cap_sched=[0.01, 0.01, 1]"
fi

run_stage "T2f-stack-burn" 7200 exps/r5_stack_burn_chip.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny2_stack.ini \
    --max-epochs 45 --workspace exps/scenes/shiny2_stack_full
log "phase F complete"
