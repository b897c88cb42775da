#!/bin/bash
# Round-3 serial chip campaign (single-tenant tunnel: one device process at a
# time).  Waits for the env-sphere pretrain to finish, then runs the VERDICT
# round-3 items in priority order.  Each stage logs to exps/ and is wrapped in
# a timeout so a wedge cannot eat the round.
set -u
cd /root/repo
PRETRAIN_PID="${1:-}"

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a exps/r3_campaign.log; }

if [ -n "$PRETRAIN_PID" ]; then
  log "waiting for pretrain pid $PRETRAIN_PID"
  while kill -0 "$PRETRAIN_PID" 2>/dev/null; do sleep 30; done
  log "pretrain done"
fi

# S1: quantified env-sphere pretrain eval on the material-annotated val grid
log "S1 pretrain test eval"
timeout 2400 python -m envidr_tpu.apps.cli --config configs/neural_renderer_synth.ini \
  --test --ckpt best --test --set encoding_pos=cp --set cp_rank=32 \
  --set test_split=val > exps/env_sphere_test.log 2>&1
log "S1 rc=$? $(grep -h '\[test\]' exps/env_sphere_test.log | tail -1)"
cp -f exps/env_sphere/checkpoints/best.ckpt assets/env_sphere_pretrain_best.ckpt 2>/dev/null
mkdir -p assets/env_ckpts && cp -f exps/env_sphere/env_ckpts/* assets/env_ckpts/ 2>/dev/null

# S2: per-scene training with OUR pretrained rendering MLPs (pipeline closure)
log "S2 scene-on-our-weights"
timeout 3600 python -m envidr_tpu.apps.cli --config configs/scenes/synth_spheres_ours.ini \
  --max-epochs 80 > exps/scene_ours.log 2>&1
log "S2 rc=$? $(grep -h '\[done\]' exps/scene_ours.log | tail -1)"

# S3: relight the scene with a DIFFERENT pretrain env net (env swap)
log "S3 relight via env swap"
timeout 1200 python -m envidr_tpu.apps.cli --config configs/scenes/synth_spheres_ours.ini \
  --test --ckpt best --swap_env exps/env_sphere/env_ckpts/env_net_5.pth \
  --set test_split=val > exps/scene_ours_relight.log 2>&1
log "S3 rc=$? $(grep -h '\[test\]' exps/scene_ours_relight.log | tail -1)"

# S3b: unwrap OUR env bank (no reference weights) + env-rotation turntable
log "S3b unwrap our env bank"
mkdir -p exps/unwraps
for e in 0 3 5; do
  timeout 900 python -m envidr_tpu.apps.unwrap \
    --config configs/neural_renderer_synth.ini \
    --ckpt exps/env_sphere/checkpoints/best.ckpt \
    --set encoding_pos=cp --set cp_rank=32 \
    --out exps/unwraps/our_env${e}.png --env-index ${e} \
    >> exps/unwrap_r3.log 2>&1 || log "unwrap env${e} failed"
done
log "S3b done"
log "S3c env-rotation turntable on the scene"
timeout 1200 python -m envidr_tpu.apps.turntable \
  --config configs/scenes/synth_spheres_ours.ini --ckpt best \
  --n-frames 8 --size 256 --env-rot --out exps/scene_ours_envrot.mp4 \
  > exps/turntable_r3.log 2>&1
log "S3c rc=$?"

# S4: renv (interreflection MLP) pretrain on the mirror r_images dataset
log "S4 renv pretrain"
timeout 3600 python -m envidr_tpu.apps.cli --config configs/neural_renderer_renv.ini \
  --max-epochs 25 --set encoding_pos=cp --set cp_rank=32 > exps/renv_pretrain.log 2>&1
log "S4 rc=$? $(grep -h '\[done\]' exps/renv_pretrain.log | tail -1)"
cp -f exps/env_sphere_renv/checkpoints/best.ckpt assets/renv_pretrain_best.ckpt 2>/dev/null

# S5: interreflection A/B on the shiny scene (indir ON = config default)
log "S5a shiny scene with indir_ref"
timeout 3600 python -m envidr_tpu.apps.cli --config configs/scenes/synth_shiny_ours.ini \
  --max-epochs 60 > exps/shiny_indir.log 2>&1
log "S5a rc=$? $(grep -h '\[done\]' exps/shiny_indir.log | tail -1)"
log "S5b shiny scene baseline (indir off)"
timeout 3600 python -m envidr_tpu.apps.cli --config configs/scenes/synth_shiny_ours.ini \
  --max-epochs 60 --set indir_ref_start_iter=0 --set use_renv=False \
  --set resume_mlps='[specular, diffuse]' \
  --workspace exps/scenes/synth_shiny_base > exps/shiny_base.log 2>&1
log "S5b rc=$? $(grep -h '\[done\]' exps/shiny_base.log | tail -1)"

# S6: Laplace-VolSDF convergence via the beta-cap anneal
log "S6 laplace escape"
timeout 5400 python -m envidr_tpu.apps.cli --config configs/synth_spheres_cp_laplace.ini \
  --max-epochs 120 > exps/laplace_escape.log 2>&1
log "S6 rc=$? $(grep -h '\[done\]' exps/laplace_escape.log | tail -1)"

# S7: benches — CP default, hash/xla, hash/sorted (the scatter A/B)
log "S7 benches"
timeout 1800 python bench.py > exps/bench_cp_r3.json 2>exps/bench_cp_r3.err
log "S7 cp: $(tail -1 exps/bench_cp_r3.json)"
ENVIDR_BENCH_CONFIG=configs/synth_spheres.ini timeout 1800 python bench.py \
  > exps/bench_hash_xla_r3.json 2>exps/bench_hash_xla_r3.err
log "S7 hash-xla: $(tail -1 exps/bench_hash_xla_r3.json)"
ENVIDR_BENCH_CONFIG=configs/synth_spheres_sorted.ini timeout 1800 python bench.py \
  > exps/bench_hash_sorted_r3.json 2>exps/bench_hash_sorted_r3.err
log "S7 hash-sorted: $(tail -1 exps/bench_hash_sorted_r3.json)"
log "campaign complete"

# S8: CP step component profile (locates the next perf target)
log "S8 CP profile"
timeout 2400 python -u tools/profile_cp.py > exps/profile_cp_r3.log 2>&1
log "S8 rc=$? $(grep -h 'full step' exps/profile_cp_r3.log | tail -1)"
log "campaign complete (with S8)"
