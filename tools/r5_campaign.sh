#!/bin/bash
# Round-5 serial chip campaign (single-tenant tunnel: one device process at
# a time).  VERDICT r5 priorities:
#   #1 interreflection win on the shiny3 enclosure scene, with the
#      roughness_act_scale=0.2 gate fix (probe_renv found renv grad == 0
#      behind the r4 gate) — indir vs base arms + compare.
#   #2 Laplace -> >=28 dB via staged beta-cap stints now that geometry is
#      sharp (r3's low-cap ban applies only while diffuse).
# A global deadline (epoch seconds in $R5_DEADLINE, default now+5h) shrinks
# or skips stages so the driver's end-of-round bench never collides.
set -u
cd /root/repo
LOG=exps/r5_campaign.log
DEADLINE=${R5_DEADLINE:-$(( $(date +%s) + 18000 ))}
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
  run_stage "Q1-cap$CAP" 2400 "exps/r5_laplace_cap$CAP.log" \
    python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue.ini \
      --workspace "$WS" --resume --ckpt best --max-epochs "$TGT" \
      --eval-interval 5 \
      --set "beta_cap_sched=[$CAP, $CAP, 1]"
done

# ---- S1/S2: shiny3 enclosure A/B --------------------------------------
run_stage "S1-shiny3-indir" 5400 exps/r5_shiny3_indir.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini
run_stage "S2-shiny3-base" 5400 exps/r5_shiny3_base.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny3_indir.ini \
    --set indir_ref_start_iter=0 --set use_renv=False \
    --set "resume_mlps=[specular, diffuse]" \
    --workspace exps/scenes/shiny3_base

# ---- S3: A/B compare (full / mirror / contact PSNR + panels) -----------
run_stage "S3-shiny3-ab" 1800 exps/r5_shiny3_ab.log \
  python tools/compare_shiny.py --config configs/scenes/shiny3_indir.ini \
    --indir-ws exps/scenes/shiny3_indir --base-ws exps/scenes/shiny3_base \
    --out exps/shiny3_ab --n 4

# ---- S4: renv gradient probe on the TRAINED shiny3 indir ckpt ----------
run_stage "S4-probe-renv" 1800 exps/r5_probe_renv_shiny3.log \
  python tools/probe_renv.py --config configs/scenes/shiny3_indir.ini \
    --out exps/probe_renv_shiny3.json

# ---- Q2: Laplace capacity-raise refinement stint (cp_rank 48) ----------
EP=$(ckpt_epoch "$WS")
TGT=$((EP + 60))
run_stage "Q2-rank48" 3600 "exps/r5_laplace_rank48.log" \
  python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue.ini \
    --workspace "$WS" --resume --ckpt best --max-epochs "$TGT" \
    --eval-interval 5 \
    --set "cp_rank=48" --set "beta_cap_sched=[0.0025, 0.0025, 1]"

log "campaign complete"
