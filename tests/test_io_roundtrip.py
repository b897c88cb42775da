"""torch .pth export -> import roundtrip + env-ckpt extraction parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from envidr_tpu.models.network import NetworkConfig, init_network_params
from envidr_tpu.io.torch_export import save_model_pth, extract_env_ckpts
from envidr_tpu.io.torch_import import (
    load_state_dict, network_params_from_state, load_env_net)

CFG = NetworkConfig(env_sph_mode=True, num_env_nets=3,
                    in_roughness=1, in_metallic=1, in_base_color=3,
                    hidden_dim_env=32, num_levels=4, desired_resolution=64,
                    log2_hashmap_size=10, use_renv=True)


def test_pth_roundtrip(tmp_path):
    pytest.importorskip("torch")
    params = init_network_params(jax.random.PRNGKey(0), CFG)
    p = str(tmp_path / "model.pth")
    save_model_pth(params, p, extra={"epoch": 7})
    sd = load_state_dict(p)
    back = network_params_from_state(sd, CFG)
    np.testing.assert_allclose(np.asarray(back["encoder"]["embeddings"]),
                               np.asarray(params["encoder"]["embeddings"]))
    for i in range(len(params["sdf_net"])):
        np.testing.assert_allclose(np.asarray(back["sdf_net"][i]["w"]),
                                   np.asarray(params["sdf_net"][i]["w"]))
    np.testing.assert_allclose(np.asarray(back["env_nets"][0]["w"]),
                               np.asarray(params["env_nets"][0]["w"]))
    np.testing.assert_allclose(np.asarray(back["renv_net"][-1]["b"]),
                               np.asarray(params["renv_net"][-1]["b"]))


def test_extract_env_ckpts_reference_format(tmp_path):
    pytest.importorskip("torch")
    params = init_network_params(jax.random.PRNGKey(1), CFG)
    paths = extract_env_ckpts(params, str(tmp_path))
    assert len(paths) == 3
    env1 = load_env_net(paths[1])
    want = jax.tree.map(lambda a: a[1], params["env_nets"])
    for la, lb in zip(env1, want):
        np.testing.assert_allclose(np.asarray(la["w"]), np.asarray(lb["w"]),
                                   rtol=1e-6)


def test_shape_tolerant_merge():
    from envidr_tpu.train.trainer import Trainer
    big = [{"w": jnp.zeros((10, 8)), "b": jnp.zeros((8,))}]
    small = [{"w": jnp.ones((6, 4)), "b": jnp.ones((4,))}]
    merged = Trainer._merge_tolerant(big, small)
    w = np.asarray(merged[0]["w"])
    assert w[:6, :4].sum() == 24 and w[6:, :].sum() == 0 and w[:, 4:].sum() == 0
