"""Config loading (incl. the reference's own .ini files) + schedule resolver."""

import os

import pytest

from envidr_tpu.config import load_options, network_config, parse_ini
from envidr_tpu.train.schedules import resolve, _exp_sched, _step_sched

REF = "/root/reference/configs"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_reference_toaster_ini_loads():
    opt = load_options(os.path.join(REF, "scenes", "toaster.ini"))
    assert opt.scale == 0.65
    assert opt.iters == 200000
    assert opt.sh_degree == 5
    assert opt.hidden_dim_env == 256
    assert opt.color_loss == "l1"            # via color_l1_loss normalization
    assert opt.use_renv                      # via indir_ref_start_iter > 0
    assert opt.resume_mlps == ("specular", "diffuse", "renv")
    assert opt.backsdf_loss_weight_sched == (5e-3, 1e-5, 120, 300, 400)
    assert opt.early_stop_steps_sched == (128, 40, 64, 400)
    cfg = network_config(opt)
    assert cfg.hidden_dim_env == 256 and cfg.sh_degree == 5
    assert cfg.color_in_dim == 12 + 3 + 12 + 1


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_reference_neural_renderer_ini_loads():
    opt = load_options(os.path.join(REF, "neural_renderer.ini"))
    assert opt.env_sph_mode and opt.num_rays == 32768
    assert opt.roughness_act_scale == 1.0
    cfg = network_config(opt)
    assert cfg.env_sph_mode
    # the env_dataset_config sub-ini supplies vary_* -> 5 material dims
    assert opt.vary_roughness and opt.vary_metallic and opt.vary_base_color
    assert cfg.sdf_in_dim == 37
    assert cfg.num_env_nets == opt.num_envs


def test_exp_sched_semantics():
    sched = (0.1, 0.001, 120, 300, 400)  # w_start w_end s_start s_iters s_stop
    assert _exp_sched(sched, 0.1, 100) == 0.1            # before start
    assert abs(_exp_sched(sched, 0.1, 120) - 0.1) < 1e-9  # at start
    mid = _exp_sched(sched, 0.1, 270)
    assert 0.001 < mid < 0.1                              # annealing
    assert abs(_exp_sched(sched, 0.1, 420) - 0.001) < 1e-9  # fully annealed
    assert _exp_sched(sched, 0.1, 121 + 400) == 0.0       # stopped


def test_step_sched_semantics():
    sched = (128, 40, 64, 400)
    assert _step_sched(sched, -1, 10) == -1
    assert _step_sched(sched, -1, 40) == 128
    assert _step_sched(sched, -1, 399) == 128
    assert _step_sched(sched, -1, 400) == 64


def test_resolve_gating_and_hash():
    opt = load_options("", use_sdf=True, eikonal_loss_weight=0.1,
                       eikonal_loss_start_iter=50, color_net_start_iter=5,
                       indir_ref_start_iter=140, grad_rays_start_iter=100,
                       normal_anneal_iters=10)
    s10 = resolve(opt, 10)
    assert not s10.flags.use_eikonal_loss and not s10.diffuse_only
    assert resolve(opt, 3).diffuse_only
    s60 = resolve(opt, 60)
    assert s60.flags.use_eikonal_loss
    assert not s60.indir_ref
    s150 = resolve(opt, 150)
    assert s150.indir_ref and not s150.grad_rays
    s245 = resolve(opt, 245)
    assert s245.grad_rays
    assert resolve(opt, 5).normal_anneal_ratio == 0.5
    # hash stability: same static fields -> same hash even if weights differ
    assert hash(s10) == hash(resolve(opt, 10))


def test_stack_burn_config_transitions():
    """The compressed toaster stack (configs/scenes/shiny2_stack.ini — every
    breakpoint of /root/reference/configs/scenes/toaster.ini divided by 10)
    crosses EVERY schedule transition inside its 45-epoch burn.  Pins the
    interplay of the full stack: weight anneals, level anneal, step caps,
    ray-count step, and the indirect-pass switch-on."""
    opt = load_options("configs/scenes/shiny2_stack.ini")
    assert opt.backsdf_loss_weight_sched == (5e-3, 1e-5, 12, 30, 40)
    # 4-element eikonal sched gets its start_iter spliced in (finalize)
    assert opt.eikonal_loss_weight_sched == (0.001, 0.01, 12, 6, -1)

    s0 = resolve(opt, 0)
    assert s0.num_rays == 2048 and s0.early_stop_steps == 64
    assert not s0.flags.use_backsdf_loss and not s0.flags.use_eikonal_loss
    assert s0.enabled_levels == 10 and not s0.indir_ref

    s1 = resolve(opt, 1)
    assert s1.num_rays == 4096            # num_rays_sched step at ep1

    s4 = resolve(opt, 4)                   # backsdf/cauchy on + step raise
    assert s4.flags.use_backsdf_loss and s4.flags.use_cauchy_loss
    assert s4.weights["backsdf"] == 5e-3 and s4.weights["cauchy"] == 0.1
    assert s4.early_stop_steps == 128

    s12 = resolve(opt, 12)                 # eikonal on; weight anneals start
    assert s12.flags.use_eikonal_loss
    assert s12.weights["eikonal"] == 0.001
    assert s12.weights["backsdf"] == 5e-3  # anneal begins this epoch
    assert 10 < resolve(opt, 7).enabled_levels < 16  # levels annealing

    s13 = resolve(opt, 13)
    assert s13.enabled_levels == 16        # levels fully enabled
    assert not s13.indir_ref

    s14 = resolve(opt, 14)
    assert s14.indir_ref and not s14.grad_rays
    s18 = resolve(opt, 18)
    assert s18.grad_rays                   # 18 - 14 > grad_rays_start (3)
    assert abs(s18.weights["eikonal"] - 0.01) < 1e-9  # 6-ep anneal done

    s40 = resolve(opt, 40)                 # step cap back down
    assert s40.early_stop_steps == 64
    s43 = resolve(opt, 43)                 # 30-ep weight anneals complete
    assert abs(s43.weights["backsdf"] - 1e-5) < 1e-9
    assert abs(s43.weights["cauchy"] - 0.001) < 1e-9

    # every flag/static transition implies a fresh jit cache entry — count
    # the distinct compiled-step variants the burn will pay for
    hashes = {hash(resolve(opt, ep)) for ep in range(0, 45)}
    assert 4 <= len(hashes) <= 8
