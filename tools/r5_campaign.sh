#!/bin/bash
# Round-5 serial chip campaign (single-tenant tunnel: one device process at
# a time).  VERDICT r5 priorities: #2 Laplace -> >=28 dB via staged beta-cap
# stints now that geometry is sharp (r3's low-cap ban applies only while
# diffuse); #1 interreflection win on the shiny3 enclosure scene.
set -u
cd /root/repo
LOG=exps/r5_campaign.log
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

run_stage() {  # name timeout logfile cmd...
  local name=$1 tmo=$2 lf=$3; shift 3
  log "start $name (timeout ${tmo}s)"
  setsid timeout "$tmo" "$@" > "$lf" 2>&1
  local rc=$?
  log "$name end rc=$rc | $(grep 'eval ep' "$lf" 2>/dev/null | tail -1)"
  return 0
}

ckpt_epoch() {  # workspace -> epoch of best.ckpt
  python3 - "$1" << 'PY'
import pickle, sys
with open(sys.argv[1] + "/checkpoints/best.ckpt", "rb") as f:
    print(pickle.load(f)["epoch"])
PY
}

mkdir -p exps

# ---- Q1: Laplace staged-cap stints from the r4 26.75 dB best ----------
WS=exps/r5_laplace
if [ ! -f "$WS/checkpoints/best.ckpt" ]; then
  mkdir -p "$WS/checkpoints"
  cp assets/r4_laplace_cue_best.ckpt "$WS/checkpoints/best.ckpt"
fi
for CAP in 0.007 0.005 0.0035 0.0025; do
  EP=$(ckpt_epoch "$WS")
  TGT=$((EP + 40))
  run_stage "Q1-cap$CAP" 4200 "exps/r5_laplace_cap$CAP.log" \
    python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue.ini \
      --workspace "$WS" --resume --ckpt best --max-epochs "$TGT" \
      --eval-interval 5 \
      --set "beta_cap_sched=[$CAP, $CAP, 1]"
done

# ---- Q2: capacity-raise refinement stint (cp_rank 48) ------------------
EP=$(ckpt_epoch "$WS")
TGT=$((EP + 60))
run_stage "Q2-rank48" 6000 "exps/r5_laplace_rank48.log" \
  python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue.ini \
    --workspace "$WS" --resume --ckpt best --max-epochs "$TGT" \
    --eval-interval 5 \
    --set "cp_rank=48" --set "beta_cap_sched=[0.0025, 0.0025, 1]"

log "campaign complete"
