#!/bin/bash
# Round-5 phase E: the regularized interreflection A/B at full budget —
# the clean experiment the bubble diagnosis prescribes.  Both arms carry
# the toaster backsdf/cauchy stack (solid-mirror geometry, QUALITY_R5.md);
# the ONLY difference is the indirect pass.  Then the VERDICT #2 capacity
# arm and the full chip stack burn with whatever night remains.
#   E1  indir+backsdf continuation ep49 -> 250
#   E2  base+backsdf from scratch   -> 250
#   E3  A/B compare (full/mirror/contact)
#   E4  renv gradient + bubble probes on the trained E1 ckpt (CPU-light)
#   Q2b Laplace capacity arm: cp_rank 48 at cap HOLD 0.01
#   T2f full chip stack burn (45 ep)
set -u
cd /root/repo
LOG=exps/r5_campaign.log
DEADLINE=${R5_E_DEADLINE:-$(( $(date +%s) + 21600 ))}
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

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

BS_SETS=(--set backsdf_loss_weight=5e-3 --set backsdf_loss_start_iter=4
  --set backsdf_thresh=0.01 --set backsdf_mode=sum
  --set "backsdf_loss_weight_sched=[5e-3, 1e-5, 12, 30, 40]"
  --set cauchy_loss_weight=0.1 --set cauchy_loss_start_iter=4
  --set "cauchy_loss_weight_sched=[0.1, 0.001, 12, 30, 40]")

run_stage "E1-indir-bs-cont" 7200 exps/r5_shiny3_bs_cont.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini \
    --workspace exps/scenes/shiny3_bs --resume --ckpt latest \
    "${BS_SETS[@]}"

run_stage "E2-base-bs" 5400 exps/r5_shiny3_bs_base.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini \
    --workspace exps/scenes/shiny3_bs_base \
    --set indir_ref_start_iter=0 --set use_renv=False \
    --set "resume_mlps=[specular, diffuse]" \
    "${BS_SETS[@]}"

run_stage "E3-ab" 900 exps/r5_shiny3_ab_bs.log \
  python tools/compare_shiny.py --config configs/scenes/shiny3_indir.ini \
    --indir-ws exps/scenes/shiny3_bs --base-ws exps/scenes/shiny3_bs_base \
    --out exps/shiny3_ab_bs --n 4

run_stage "E4-probe" 900 exps/r5_probe_renv_bs.log \
  python tools/probe_renv.py --config configs/scenes/shiny3_indir.ini \
    --workspace exps/scenes/shiny3_bs --out exps/probe_renv_bs.json

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
log "phase E complete"
