#!/bin/bash
# Round-5 campaign, phase B (after the staged-cap falsification: caps below
# 0.01 at floor lr monotonically lose ~1.1 dB over 40 epochs, no recovery —
# exps/r5_laplace_cap0.007.log).  Pivot:
#   S1/S2  shiny3 interreflection A/B FIRST (round priority #1)
#   S3/S4  compare + trained-ckpt gradient probe
#   Q2b    Laplace capacity arm: cp_rank 48 at cap HOLD 0.01 (the capacity
#          hypothesis, decoupled from the falsified sharpness push)
#   L4     faithful beta_min_sched arm from scratch, if time remains
set -u
cd /root/repo
LOG=exps/r5_campaign.log
DEADLINE=${R5_DEADLINE:-$(( $(date +%s) + 14400 ))}
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

ckpt_epoch() {
  python3 - "$1" << 'PY'
import pickle, sys
with open(sys.argv[1] + "/checkpoints/best.ckpt", "rb") as f:
    print(pickle.load(f)["epoch"])
PY
}

mkdir -p exps

run_stage "S1-shiny3-indir" 5400 exps/r5_shiny3_indir.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini
run_stage "S2-shiny3-base" 5400 exps/r5_shiny3_base.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini \
    --set indir_ref_start_iter=0 --set use_renv=False \
    --set "resume_mlps=[specular, diffuse]" \
    --workspace exps/scenes/shiny3_base

run_stage "S3-shiny3-ab" 1800 exps/r5_shiny3_ab.log \
  python tools/compare_shiny.py --config configs/scenes/shiny3_indir.ini \
    --indir-ws exps/scenes/shiny3_indir --base-ws exps/scenes/shiny3_base \
    --out exps/shiny3_ab --n 4

run_stage "S4-probe-renv" 1800 exps/r5_probe_renv_shiny3.log \
  python tools/probe_renv.py --config configs/scenes/shiny3_indir.ini \
    --out exps/probe_renv_shiny3.json

WS=exps/r5_laplace
EP=$(ckpt_epoch "$WS")
TGT=$((EP + 80))
run_stage "Q2b-rank48-hold" 4200 "exps/r5_laplace_rank48.log" \
  python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue.ini \
    --workspace "$WS" --resume --ckpt best --max-epochs "$TGT" \
    --eval-interval 5 \
    --set "cp_rank=48" --set "beta_cap_sched=[0.01, 0.01, 1]"

run_stage "L4-betamin" 4200 exps/r5_laplace_betamin.log \
  python -m envidr_tpu.apps.cli --config configs/r4_laplace_betamin.ini \
    --workspace exps/r5_betamin --eval-interval 10

log "campaign phase B complete"
