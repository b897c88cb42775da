#!/bin/bash
# Round-4 serial chip campaign (single-tenant tunnel: one device process at a
# time).  VERDICT r3 priorities: #2 Laplace-VolSDF convergence (3 arms),
# #3 interreflection A/B on the shiny2 scene, #8 reference-budget long run
# (the faithful arm doubles as it).  Fogged Laplace arms are GATED: if the
# best val PSNR is still below a threshold by a checkpoint epoch, the arm is
# killed (round-3 showed fog plateaus are flat — no point finishing them).
set -u
cd /root/repo
LOG=exps/r4_campaign.log
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

# run_gated name timeout gate_epoch gate_psnr logfile cmd...
run_gated() {
  local name=$1 tmo=$2 gep=$3 gpsnr=$4 lf=$5; shift 5
  log "start $name (timeout ${tmo}s, gate: ep>=${gep} needs PSNR>=${gpsnr})"
  setsid timeout "$tmo" "$@" > "$lf" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local ep best
    ep=$(grep -oE '\[eval ep +[0-9]+\]' "$lf" 2>/dev/null | tail -1 | grep -oE '[0-9]+' || true)
    best=$(grep -oE 'PSNR = [0-9.]+' "$lf" 2>/dev/null | awk '{print $3}' | sort -g | tail -1)
    if [ -n "${ep:-}" ] && [ -n "${best:-}" ] && [ "$gep" -gt 0 ] && [ "$ep" -ge "$gep" ]; then
      if python3 -c "import sys; sys.exit(0 if float('$best') < float('$gpsnr') else 1)"; then
        log "$name GATED at ep$ep (best=$best < $gpsnr) — killing pgid $pid"
        kill -- "-$pid" 2>/dev/null; sleep 10; kill -9 -- "-$pid" 2>/dev/null
        break
      fi
    fi
  done
  wait "$pid" 2>/dev/null
  log "$name end rc=$? | $(grep -h '\[done\]' "$lf" 2>/dev/null | tail -1) | $(grep 'eval ep' "$lf" 2>/dev/null | tail -1)"
}

mkdir -p exps

# L1: Laplace + geometric cue (sphere SDF pre-fit) + gentle HOLD beta cap.
# The standard VolSDF escape from the fog minimum; round-3's curve says the
# cap must stop at ~0.01 while geometry organizes.
run_gated L1-laplace-cue 6600 150 16 exps/r4_laplace_cue.log \
  python -m envidr_tpu.apps.cli --config configs/r4_laplace_cue.ini

# S5: shiny2 interreflection arm (indir_ref from ep45, grad rays, renv)
run_gated S5-shiny2-indir 7200 0 0 exps/r4_shiny2_indir.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny2_indir.ini

# S6: shiny2 baseline (indir off, no renv)
run_gated S6-shiny2-base 6000 0 0 exps/r4_shiny2_base.log \
  python -m envidr_tpu.apps.cli --config configs/scenes/shiny2_indir.ini \
  --set indir_ref_start_iter=0 --set use_renv=False \
  --set resume_mlps='[specular, diffuse]' \
  --workspace exps/scenes/shiny2_base

# S5b: A/B comparison (full + mirror-masked PSNR, side-by-side panels)
log "S5b shiny2 A/B compare"
timeout 1800 python tools/compare_shiny.py \
  --config configs/scenes/shiny2_indir.ini \
  --indir-ws exps/scenes/shiny2_indir --base-ws exps/scenes/shiny2_base \
  --out exps/shiny2_ab > exps/r4_shiny2_ab.log 2>&1
log "S5b rc=$? $(tail -2 exps/r4_shiny2_ab.log | head -1)"

# L3: faithful reference-recipe Laplace (no cap, full schedule stack, 400 ep)
run_gated L3-laplace-ref 9000 200 16 exps/r4_laplace_ref.log \
  python -m envidr_tpu.apps.cli --config configs/r4_laplace_ref.ini

# L4: faithful beta_min_sched arm
run_gated L4-laplace-betamin 4800 120 16 exps/r4_laplace_betamin.log \
  python -m envidr_tpu.apps.cli --config configs/r4_laplace_betamin.ini

log "campaign complete"
