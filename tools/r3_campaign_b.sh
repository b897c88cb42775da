#!/bin/bash
# Round-3 campaign part B: S4..S8 (after the renv resume fix).
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a exps/r3_campaign.log; }
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
