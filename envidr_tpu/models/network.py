"""The ENVIDR neural model: SDF + materials + neural-renderer MLPs, functional.

Reimplements ``NeRFNetwork`` (``/root/reference/nerf/network.py:104-819``) as a
frozen config dataclass + param-pytree init + pure forward functions.  Key
departures from the torch original, all TPU-motivated:

  * No module state: geometry outputs (roughness, blend weight) are returned,
    never stashed on ``self``.
  * Per-environment MLPs (``env_nets``, network.py:290-295) are a *stacked*
    pytree with a leading env axis; a traced integer index selects one via
    ``tree_map(lambda a: a[i], ...)`` — no Python-level branching under jit.
  * The renv/interreflection branch (network.py:612-690) is masked dense
    compute instead of boolean gather, keeping shapes static.
  * Surface normals are ``jax.grad`` of the SDF — arbitrarily composable, so
    eikonal double-backward needs no hand-written kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envidr_tpu.ops import density as density_ops
from envidr_tpu.ops.freq import freq_encode, freq_output_dim
from envidr_tpu.ops.cp import CPSpec, cp_encode_from_world, init_cp_params
from envidr_tpu.ops.hashgrid import HashGridSpec, hash_encode_from_world, init_hash_params
from envidr_tpu.ops.ide import ide_encode, ide_output_dim
from envidr_tpu.ops.sh import sh_encode, sh_output_dim
from envidr_tpu.models.mlp import (
    apply_linear, apply_mlp, feat_act, init_linear, init_mlp, softplus_beta, unit_norm,
)


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """Structural hyper-parameters (hashable — safe as a jit static arg).

    Field names/defaults track ``nerf/options.py`` so .ini configs map 1:1.
    """

    bound: float = 1.0
    # --- position encoder -------------------------------------------------
    encoding_pos: str = "hashgrid_diff"   # 'hashgrid_diff' | 'hashgrid' | 'frequency'
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    desired_resolution: int = 2048        # scaled by bound at build time
    log2_hashmap_size: int = 19
    multires: int = 6                     # freq PE fallback
    # --- SDF net ----------------------------------------------------------
    num_layers: int = 3
    hidden_dim: int = 64
    geo_feat_dim: int = 12
    skip_layers: Tuple[int, ...] = ()
    use_sdf: bool = True
    use_neus_sdf: bool = False
    init_beta: float = 0.1
    beta_min: float = 0.0005
    beta_max: float = 1.0
    init_variance: float = 0.3
    neus_n_detach: bool = False
    geometric_init: bool = False
    inside_outside: bool = False
    geo_init_bias: float = 1.0
    mlp_bias: bool = True
    net_init: str = "xavier_uniform"
    geo_feat_act: str = "unitNorm"
    # --- material conditioning (env-sphere pretraining) -------------------
    in_roughness: int = 0
    in_metallic: int = 0
    in_base_color: int = 0
    # --- roughness head ----------------------------------------------------
    use_roughness: bool = True
    ensemble_mlp: bool = True
    learn_indir_blend: bool = False
    roughness_bias: float = -1.0
    roughness_act_scale: float = 0.2
    roughness_scale: float = 1.0
    default_roughness: float = 0.05
    bypass_roughness: bool = False
    diffuse_only: bool = False
    # --- direction encoders -------------------------------------------------
    encoding_dir: str = "frequency"
    multires_dir: int = 0
    sh_degree: int = 4                    # degree for SH *and* deg_view for IDE
    sh_degree_diffuse: int = -1
    multires_normal: int = 0
    encoding_ref: str = "integrated_dir"
    multires_refdir: int = 4
    normal_with_mlp: bool = True
    use_reflected_dir: bool = True
    use_n_dot_viewdir: bool = True
    wo_viewdir: bool = True
    detach_normal: bool = False
    # --- diffuse branch -----------------------------------------------------
    use_diffuse: bool = True
    num_layers_diffuse: int = 2
    hidden_dim_diffuse: int = 32
    diffuse_with_env: bool = True
    diffuse_env_fusion: str = "concat"    # 'concat' | 'add' | 'mul'
    diffuse_kappa_inv: float = 0.64
    split_diffuse_env: bool = False
    hidden_dim_env_diffuse: int = -1
    # --- environment MLPs ---------------------------------------------------
    use_env_net: bool = True
    env_sph_mode: bool = False
    num_env_nets: int = 1                 # >1 only in env_sph_mode
    num_layers_env: int = 4
    hidden_dim_env: int = 160
    env_feat_dim: int = 12
    env_wo_bias: bool = False
    env_feat_act: str = "unitNorm"
    # --- interreflection (renv) --------------------------------------------
    use_renv: bool = False
    train_renv: bool = False
    indir_roughness_thresh: float = 0.1
    indir_only: bool = False
    # --- specular color net -------------------------------------------------
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    color_act: str = "sigmoid"            # 'sigmoid' | 'exp'
    intensity_scale: float = 1.0
    light_intensity_scale: float = 1.0
    # --- background ---------------------------------------------------------
    bg_radius: float = -1.0
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    # --- TPU-specific -------------------------------------------------------
    # Numerical (central-difference) SDF gradients instead of autodiff
    # double-backward.  6 extra forward evals, but the eikonal/normal losses
    # then need only FIRST-order backprop — on TPU the second-order graph
    # through the hash gathers costs ~10x the whole rest of the step (and is
    # the Neuralangelo recipe: numerical grads also behave better for hash
    # grids).  The analytic path (reference parity, renderer.py:182-198)
    # remains the default.
    numerical_normals: bool = False
    numerical_normals_eps: float = 0.005
    hash_table_dtype: str = "float32"      # 'bfloat16': halve gather bytes
    hash_scatter_impl: str = "xla"         # 'mixed': Pallas VMEM scatter levels
    hash_custom_grad: bool = True          # hand-written 1st+2nd-order VJP
    cp_rank: int = 32                      # CP encoder rank (encoding_pos='cp')

    # ----- derived dims -----------------------------------------------------
    @property
    def hash_spec(self) -> HashGridSpec:
        interp = "linear" if self.encoding_pos == "hashgrid" else "smoothstep"
        indexing = "rolled_tiled" if self.encoding_pos == "rolled_tiled" else "hash"
        return HashGridSpec(
            input_dim=3, num_levels=self.num_levels, level_dim=self.level_dim,
            base_resolution=self.base_resolution,
            desired_resolution=int(self.bound * self.desired_resolution),
            log2_hashmap_size=self.log2_hashmap_size, interpolation=interp,
            indexing=indexing, table_dtype=self.hash_table_dtype,
            scatter_impl=self.hash_scatter_impl,
            custom_grad=self.hash_custom_grad)

    @property
    def cp_spec(self) -> CPSpec:
        return CPSpec(
            input_dim=3, num_levels=self.num_levels,
            level_dim=self.level_dim, rank=self.cp_rank,
            base_resolution=self.base_resolution,
            desired_resolution=int(self.bound * self.desired_resolution))

    @property
    def pos_enc_dim(self) -> int:
        if self.encoding_pos in ("hashgrid", "hashgrid_diff", "rolled_tiled",
                                 "cp"):
            return self.num_levels * self.level_dim
        return freq_output_dim(3, self.multires)

    @property
    def material_dims(self) -> int:
        return self.in_roughness + self.in_metallic + self.in_base_color

    @property
    def sdf_in_dim(self) -> int:
        return self.pos_enc_dim + self.material_dims

    @property
    def sdf_out_dim(self) -> int:
        out = 1 + self.geo_feat_dim
        if self.ensemble_mlp:
            out += int(self.use_roughness) + int(self.learn_indir_blend)
        return out

    def _dir_enc_dim(self, encoding: str, multires: int, degree: int) -> int:
        if encoding == "frequency":
            return freq_output_dim(3, multires) if multires > 0 else 3
        if encoding == "sphere_harmonics":
            return sh_output_dim(degree)
        if encoding == "integrated_dir":
            return ide_output_dim(degree)
        raise ValueError(encoding)

    @property
    def in_dim_dir(self) -> int:
        if self.wo_viewdir:
            return 0
        return self._dir_enc_dim(self.encoding_dir, self.multires_dir, self.sh_degree)

    @property
    def in_normal_dim(self) -> int:
        if not self.normal_with_mlp:
            return 0
        return self._dir_enc_dim(self.encoding_dir, self.multires_normal, self.sh_degree)

    @property
    def refdir_enc_dim(self) -> int:
        return self._dir_enc_dim(self.encoding_ref, self.multires_refdir, self.sh_degree)

    @property
    def refdir_enc_dim_diffuse(self) -> int:
        deg = self.sh_degree_diffuse if self.sh_degree_diffuse > 0 else self.sh_degree
        return self._dir_enc_dim(self.encoding_ref, self.multires_refdir, deg)

    @property
    def in_refdir_dim(self) -> int:
        """dim of the env-feature slot in the color net (network.py:263-301)."""
        if not self.use_reflected_dir:
            return 0
        return self.env_feat_dim if self.use_env_net else self.refdir_enc_dim

    @property
    def color_in_dim(self) -> int:
        return (self.in_dim_dir + self.geo_feat_dim + self.in_normal_dim
                + self.in_refdir_dim + int(self.use_n_dot_viewdir))

    @property
    def diffuse_in_dim(self) -> int:
        if self.diffuse_with_env and self.diffuse_env_fusion == "concat":
            return self.geo_feat_dim + self.env_feat_dim
        return self.geo_feat_dim


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_env_net(key, cfg: NetworkConfig, in_dim: int, hidden: int):
    dims = [in_dim] + [hidden] * (cfg.num_layers_env - 1) + [cfg.env_feat_dim]
    return init_mlp(key, dims, bias=not cfg.env_wo_bias, init=cfg.net_init or "torch_default")


def _init_sdf_net(key, cfg: NetworkConfig):
    """SDF MLP with skip support + optional geometric (sphere) init
    (network.py:177-222)."""
    layers = []
    keys = jax.random.split(key, cfg.num_layers)
    in_total = cfg.sdf_in_dim
    for l in range(cfg.num_layers):
        in_dim = in_total if l == 0 else cfg.hidden_dim
        if l in cfg.skip_layers and l > 0:
            in_dim += in_total
        if l == cfg.num_layers - 1:
            out_dim = cfg.sdf_out_dim
        elif (l + 1) in cfg.skip_layers:
            out_dim = cfg.hidden_dim - cfg.pos_enc_dim
        else:
            out_dim = cfg.hidden_dim
        bias = cfg.geometric_init or cfg.mlp_bias
        if cfg.geometric_init:
            k1, k2 = jax.random.split(keys[l])
            if l == cfg.num_layers - 1:
                sign = -1.0 if cfg.inside_outside else 1.0
                w = sign * np.sqrt(np.pi) / np.sqrt(in_dim) \
                    + 0.0001 * jax.random.normal(k1, (in_dim, out_dim))
                b = jnp.full((out_dim,), -sign * cfg.geo_init_bias)
            elif l == 0 and in_dim > 3:
                w3 = np.sqrt(2) / np.sqrt(out_dim) * jax.random.normal(k1, (3, out_dim))
                w = jnp.concatenate([w3, jnp.zeros((in_dim - 3, out_dim))], axis=0)
                b = jnp.zeros((out_dim,))
            else:
                w = np.sqrt(2) / np.sqrt(out_dim) * jax.random.normal(k1, (in_dim, out_dim))
                b = jnp.zeros((out_dim,))
            layers.append({"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)})
        else:
            gain = np.sqrt(2.0) if l < cfg.num_layers - 1 else 1.0
            layers.append(init_linear(keys[l], in_dim, out_dim, bias=bias,
                                      init=cfg.net_init or "torch_default", gain=gain))
    return layers


def init_network_params(key, cfg: NetworkConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    params: Dict[str, Any] = {}

    if cfg.encoding_pos in ("hashgrid", "hashgrid_diff", "rolled_tiled"):
        params["encoder"] = init_hash_params(next(keys), cfg.hash_spec)
    elif cfg.encoding_pos == "cp":
        params["encoder"] = init_cp_params(next(keys), cfg.cp_spec)

    if cfg.use_sdf:
        if cfg.use_neus_sdf:
            params["sdf_density"] = density_ops.init_neus_params(cfg.init_variance)
        else:
            params["sdf_density"] = density_ops.init_laplace_params(cfg.init_beta)

    params["sdf_net"] = _init_sdf_net(next(keys), cfg)

    if cfg.use_roughness and not cfg.ensemble_mlp:
        params["roughness_layer"] = init_linear(
            next(keys), cfg.geo_feat_dim, 1, init="torch_default")

    if cfg.use_diffuse:
        dims = ([cfg.diffuse_in_dim]
                + [cfg.hidden_dim_diffuse] * (cfg.num_layers_diffuse - 1) + [3])
        params["diffuse_net"] = init_mlp(
            next(keys), dims, init=cfg.net_init or "torch_default")

    dims = ([cfg.color_in_dim]
            + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1) + [3])
    params["color_net"] = init_mlp(
        next(keys), dims, bias=cfg.mlp_bias, init=cfg.net_init or "torch_default")
    if cfg.use_diffuse and cfg.mlp_bias:
        # lower initial specular (network.py:333-334)
        last = params["color_net"][-1]
        params["color_net"][-1] = {**last, "b": last["b"] - np.log(3.0)}

    if cfg.use_env_net:
        if cfg.env_sph_mode:
            nets = [_init_env_net(next(keys), cfg, cfg.refdir_enc_dim, cfg.hidden_dim_env)
                    for _ in range(cfg.num_env_nets)]
            params["env_nets"] = jax.tree.map(lambda *xs: jnp.stack(xs), *nets)
        else:
            params["env_net"] = _init_env_net(
                next(keys), cfg, cfg.refdir_enc_dim, cfg.hidden_dim_env)
            if cfg.split_diffuse_env:
                hidden = (cfg.hidden_dim_env_diffuse if cfg.hidden_dim_env_diffuse > 0
                          else cfg.hidden_dim_env)
                params["diffuse_env_net"] = _init_env_net(
                    next(keys), cfg, cfg.refdir_enc_dim_diffuse, hidden)
        if cfg.use_renv:
            # rgb (3) + roughness (1) -> env_feat ; hidden 64 x 4 (network.py:304-310)
            dims = [4, 64, 64, 64, cfg.env_feat_dim]
            params["renv_net"] = init_mlp(
                next(keys), dims, bias=not cfg.env_wo_bias,
                init=cfg.net_init or "torch_default")

    if cfg.bg_radius > 0:
        bg_spec = HashGridSpec(input_dim=2, num_levels=4, level_dim=cfg.level_dim,
                               base_resolution=16, desired_resolution=2048,
                               log2_hashmap_size=19, interpolation="linear")
        dims_bg = ([bg_spec.output_dim + sh_output_dim(4)]
                   + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1) + [3])
        params["bg"] = {
            "encoder": init_hash_params(next(keys), bg_spec),
            "net": init_mlp(next(keys), dims_bg, bias=False,
                            init=cfg.net_init or "torch_default"),
        }
    return params


# ---------------------------------------------------------------------------
# forward: geometry
# ---------------------------------------------------------------------------

def encode_position(params, cfg: NetworkConfig, xyz, level_mask=None):
    if cfg.encoding_pos in ("hashgrid", "hashgrid_diff", "rolled_tiled"):
        x = hash_encode_from_world(xyz, params["encoder"]["embeddings"],
                                   cfg.hash_spec, bound=cfg.bound)
    elif cfg.encoding_pos == "cp":
        x = cp_encode_from_world(xyz, params["encoder"], cfg.cp_spec,
                                 bound=cfg.bound)
    else:
        return freq_encode(xyz, degree=cfg.multires)
    if level_mask is not None:
        # coarse-to-fine level gating (network.py:390-393)
        x = x * jnp.repeat(level_mask, cfg.level_dim)
    return x


def _material_vec(cfg: NetworkConfig, material, like):
    feats = []
    if cfg.in_roughness:
        feats.append(jnp.broadcast_to(
            jnp.asarray(material["roughness"], like.dtype), like.shape[:-1] + (1,)))
    if cfg.in_metallic:
        feats.append(jnp.broadcast_to(
            jnp.asarray(material["metallic"], like.dtype), like.shape[:-1] + (1,)))
    if cfg.in_base_color:
        col = jnp.asarray(material["color"], like.dtype)[..., :3]
        feats.append(jnp.broadcast_to(col, like.shape[:-1] + (3,)))
    return feats


def forward_geometry(params, cfg: NetworkConfig, xyz, material=None, level_mask=None):
    """network.py:381-495 -> dict(sdf, sigma_raw, geo_feat, roughness, blend_weight).

    ``sdf`` is the raw first channel; call :func:`sdf_to_sigma` to convert.
    """
    x = encode_position(params, cfg, xyz, level_mask)
    if cfg.material_dims > 0:
        assert material is not None, "sphere mode requires material conditioning"
        x = jnp.concatenate([x] + _material_vec(cfg, material, x), axis=-1)

    h = x
    for l, layer in enumerate(params["sdf_net"]):
        if l in cfg.skip_layers and l > 0:
            h = jnp.concatenate([h, x], axis=-1) / np.sqrt(2.0)
        h = apply_linear(layer, h)
        if l != cfg.num_layers - 1:
            h = softplus_beta(h, 100.0) if cfg.geometric_init else jax.nn.relu(h)

    out: Dict[str, Any] = {}
    if cfg.use_sdf:
        out["sdf"] = h[..., 0]
    else:
        out["sigma"] = density_ops.trunc_exp(h[..., 0])

    geo_feat = feat_act(h[..., 1:1 + cfg.geo_feat_dim], cfg.geo_feat_act)
    out["geo_feat"] = geo_feat

    if cfg.use_roughness and not cfg.diffuse_only and not cfg.bypass_roughness:
        if cfg.ensemble_mlp:
            raw = h[..., 1 + cfg.geo_feat_dim:2 + cfg.geo_feat_dim]
        else:
            raw = apply_linear(params["roughness_layer"], geo_feat)
        rough = cfg.roughness_act_scale * jax.nn.softplus(raw + cfg.roughness_bias)
        out["roughness"] = rough * cfg.roughness_scale
    else:
        out["roughness"] = None  # renderer falls back to cfg.default_roughness

    if cfg.learn_indir_blend and cfg.ensemble_mlp:
        out["blend_weight"] = jax.nn.sigmoid(
            h[..., 2 + cfg.geo_feat_dim:3 + cfg.geo_feat_dim])
    else:
        out["blend_weight"] = None
    return out


def sdf_to_sigma(params, cfg: NetworkConfig, sdf, *, dirs=None, dists=None,
                 normals=None, cos_anneal_ratio: float = 1.0, beta_cap=None,
                 beta_min=None):
    """Laplace density or NeuS alpha (network.py:497-522).

    ``beta_cap``: optional traced upper bound on the effective Laplace beta
    (the beta_cap_sched anneal — forces the fog-equilibrium escape without
    recompiling; see config.py).
    ``beta_min``: optional traced override of ``cfg.beta_min`` — the
    reference anneals the density-side floor itself via beta_min_sched
    (utils.py:1822-1824), so render and loss must share the annealed value."""
    if cfg.use_neus_sdf:
        if dists is None:
            dists = 2.0 * density_ops.SQRT3 / 1024.0
        return density_ops.neus_alpha(
            sdf, params["sdf_density"]["variance"], dirs=dirs, dists=dists,
            gradients=normals, cos_anneal_ratio=cos_anneal_ratio,
            n_detach=cfg.neus_n_detach)
    beta = density_ops.laplace_beta(
        params["sdf_density"],
        cfg.beta_min if beta_min is None else beta_min, cfg.beta_max)
    if beta_cap is not None:
        beta = jnp.minimum(beta, beta_cap)
    return density_ops.laplace_density(sdf, beta)


def geometry_with_normals(params, cfg: NetworkConfig, xyz, material=None,
                          level_mask=None, *, need_normals: bool = True,
                          normal_anneal_ratio: float = 1.0):
    """forward_geometry + autodiff surface normal (renderer.py:182-198).

    Returns (geo_out, normals, raw_gradients).  ``raw_gradients`` feed the
    eikonal loss; both are differentiable (create_graph=True semantics).
    """
    if not need_normals:
        return forward_geometry(params, cfg, xyz, material, level_mask), None, None

    if cfg.numerical_normals:
        # central differences: [*, 6, 3] probe points in one batched forward
        eps = cfg.numerical_normals_eps
        offsets = jnp.concatenate([jnp.eye(3), -jnp.eye(3)]) * eps   # [6, 3]
        probe = xyz[..., None, :] + offsets                           # [*, 6, 3]
        geo_out = forward_geometry(params, cfg, xyz, material, level_mask)
        probe_geo = forward_geometry(params, cfg, probe, material, level_mask)
        f = probe_geo["sdf"] if cfg.use_sdf else -probe_geo["sigma"]  # [*, 6]
        grads = (f[..., 0:3] - f[..., 3:6]) / (2.0 * eps)             # [*, 3]
    else:
        def sdf_sum(pts):
            g = forward_geometry(params, cfg, pts, material, level_mask)
            field = g["sdf"] if cfg.use_sdf else g["sigma"]
            return jnp.sum(field), g

        grads, geo_out = jax.grad(sdf_sum, has_aux=True)(xyz)
        if not cfg.use_sdf:
            grads = -grads
    raw_gradients = grads
    normals = jax.lax.stop_gradient(grads) if cfg.detach_normal else grads
    # smooth normalization g/sqrt(|g|^2+eps^2): F.normalize's hard max(|g|,eps)
    # has an unbounded 1/|g| gradient as |g|->0, which fires ~5% non-finite
    # backward steps once the SDF sharpens (the reference leans on its AMP
    # GradScaler to skip those); the smooth form bounds the gradient at 1/eps
    # and is numerically identical for healthy |g| ~ 1.
    normals = _safe_normalize(normals)
    # ratio may be a traced per-epoch scalar (schedules ride the weights
    # dict); only skip the blend when it is STATICALLY 1.0
    if not (isinstance(normal_anneal_ratio, (int, float))
            and normal_anneal_ratio >= 1.0):
        anneal = _safe_normalize(jax.lax.stop_gradient(xyz))
        normals = _safe_normalize(
            normals * normal_anneal_ratio + (1.0 - normal_anneal_ratio) * anneal)
    return geo_out, normals, raw_gradients


def _safe_normalize(v, eps: float = 1e-4):
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)


# ---------------------------------------------------------------------------
# forward: color
# ---------------------------------------------------------------------------

def _select_env_net(params, cfg: NetworkConfig, env_index):
    if cfg.env_sph_mode:
        return jax.tree.map(lambda a: a[env_index], params["env_nets"])
    return params["env_net"]


def _apply_env_net(env_layers, cfg: NetworkConfig, x):
    y = apply_mlp(env_layers, x, act=jax.nn.relu)
    return feat_act(y, cfg.env_feat_act)


def _color_head(params, cfg: NetworkConfig, h):
    y = apply_mlp(params["color_net"], h, act=jax.nn.relu)
    if cfg.color_act == "sigmoid":
        return jax.nn.sigmoid(y)
    return density_ops.trunc_exp(y)


def encode_dir(cfg: NetworkConfig, encoding: str, multires: int, degree: int,
               dirs, roughness=0.0):
    if encoding == "frequency":
        return freq_encode(dirs, degree=multires) if multires > 0 else dirs
    if encoding == "sphere_harmonics":
        return sh_encode(dirs, degree=degree)
    if encoding == "integrated_dir":
        return ide_encode(dirs, roughness, deg_view=degree)
    raise ValueError(encoding)


def forward_color(
    params, cfg: NetworkConfig, geo_feat, dirs, normals_enc=None, w_r_enc=None,
    n_dot_w_o=None, *, env_index=0, n_env_enc=None, r_images=None, roughness=None,
    blend_weight=None,
):
    """network.py:524-698.  All-branch dense compute; returns (color, aux)."""
    aux: Dict[str, Any] = {}

    # ---------------- diffuse ----------------
    if cfg.use_diffuse:
        h = geo_feat
        if cfg.diffuse_with_env:
            if cfg.split_diffuse_env:
                env_net = params["diffuse_env_net"]
            else:
                env_net = _select_env_net(params, cfg, env_index)
            nenv = _apply_env_net(env_net, cfg, n_env_enc)
            if cfg.diffuse_env_fusion == "concat":
                h = jnp.concatenate([h, nenv], axis=-1)
            elif cfg.diffuse_env_fusion == "add":
                h = h + nenv
            elif cfg.diffuse_env_fusion == "mul":
                h = h * nenv
        y = apply_mlp(params["diffuse_net"], h, act=jax.nn.relu)
        c_diffuse = jax.nn.sigmoid(y) if cfg.color_act == "sigmoid" else density_ops.trunc_exp(y)
        # reference multiplies by self.metallic which is always 1. (network.py:493,569)
    else:
        c_diffuse = 0.0
    aux["c_diffuse"] = c_diffuse

    # ---------------- specular ----------------
    if not cfg.diffuse_only:
        if not cfg.wo_viewdir:
            d_enc = encode_dir(cfg, cfg.encoding_dir, cfg.multires_dir, cfg.sh_degree, dirs)
            h = jnp.concatenate([d_enc, geo_feat], axis=-1)
        else:
            h = geo_feat
        if cfg.normal_with_mlp:
            assert normals_enc is not None
            h = jnp.concatenate([h, normals_enc], axis=-1)

        c_env = None
        # train_renv normally routes specular through the renv branch, but an
        # eval render without per-ray r_images (render_image/unwrap paths)
        # falls back to the plain env branch — the deployment behavior of the
        # underlying pretrained renderer (sph_ray.py:214-221's no-indir path).
        if w_r_enc is not None and (not cfg.train_renv or r_images is None):
            if cfg.use_env_net:
                env_net = _select_env_net(params, cfg, env_index)
                w_r_feat = _apply_env_net(env_net, cfg, w_r_enc)
            else:
                w_r_feat = w_r_enc
            h_env = jnp.concatenate([h, w_r_feat], axis=-1)
            if cfg.use_n_dot_viewdir:
                h_env = jnp.concatenate([h_env, n_dot_w_o], axis=-1)
            c_env = _color_head(params, cfg, h_env)

        c_renv, renv_mask, blend = None, None, 1.0
        if r_images is not None and cfg.use_renv:
            if not cfg.train_renv:
                renv_mask = (roughness[..., 0] < cfg.indir_roughness_thresh)
                if r_images.shape[-1] == 4:
                    r_vis = r_images[..., 3]
                    r_images = r_images[..., :3] * jax.lax.stop_gradient(r_vis)[..., None]
                    renv_mask = renv_mask & (r_vis > 0.9)
                _rough = roughness / cfg.roughness_scale
                remap = jnp.sqrt(jnp.clip(_rough / 0.75, 0.0))
                if cfg.learn_indir_blend and blend_weight is not None:
                    blend = 0.98 * blend_weight
                else:
                    # learned blend needs the ensemble head; fall back to the
                    # reference's roughness-sigmoid otherwise (network.py:631)
                    blend = 0.95 * jax.nn.sigmoid(80.0 * (remap - 0.18))
            else:
                remap = jnp.sqrt(jnp.clip(roughness / 0.75, 0.0))
            renv_in = jnp.concatenate([r_images[..., :3], remap], axis=-1)
            renv_feat = apply_mlp(params["renv_net"], renv_in, act=jax.nn.relu)
            renv_feat = feat_act(renv_feat, cfg.env_feat_act)
            h_renv = jnp.concatenate([h, renv_feat], axis=-1)
            if cfg.use_n_dot_viewdir:
                h_renv = jnp.concatenate([h_renv, n_dot_w_o], axis=-1)
            c_renv = _color_head(params, cfg, h_renv)

        if c_env is None and c_renv is None:
            h_only = (jnp.concatenate([h, n_dot_w_o], axis=-1)
                      if cfg.use_n_dot_viewdir else h)
            c_env = _color_head(params, cfg, h_only)

        if cfg.train_renv and c_renv is not None:
            c_specular = c_renv
        else:
            c_specular = c_env
            if c_renv is not None:
                if cfg.indir_only:
                    c_specular = c_specular * 0.0
                blended = c_specular * blend + c_renv * (1.0 - blend)
                if renv_mask is not None:
                    c_specular = jnp.where(renv_mask[..., None], blended, c_specular)
                else:
                    c_specular = blended
                # observability for the renv gradient-flow probe (r5):
                # where the indirect branch is actually live, and how much
                # of the specular color it contributes (1-blend)
                aux["renv_mask"] = (renv_mask if renv_mask is not None
                                    else jnp.ones(c_renv.shape[:-1], bool))
                aux["blend"] = (blend if isinstance(blend, jnp.ndarray)
                                else jnp.full(c_renv.shape[:-1] + (1,), blend))
    else:
        c_specular = 0.0
    aux["c_specular"] = c_specular

    color = (c_diffuse + c_specular) * cfg.intensity_scale
    return color, aux


def get_color_mlp_extra_params(params, cfg: NetworkConfig, normals, dirs,
                               roughness=0.0, env_rot_radian=None):
    """renderer.py:147-180: normal enc, IDE(w_r), n.w_o, diffuse IDE(n)."""
    if normals is None:
        return None, None, None, None
    normals_enc = None
    if cfg.normal_with_mlp:
        normals_enc = encode_dir(cfg, cfg.encoding_dir, cfg.multires_normal,
                                 cfg.sh_degree, normals)
    w_o = -dirs
    w_r_enc = None
    if cfg.use_reflected_dir and not cfg.diffuse_only:
        from envidr_tpu.geometry.rays import reflect_dir
        w_r = reflect_dir(w_o, normals)
        if env_rot_radian is not None:
            w_r = w_r @ _rot_theta_mat(env_rot_radian, w_r.dtype)
        w_r_enc = encode_dir(cfg, cfg.encoding_ref, cfg.multires_refdir,
                             cfg.sh_degree, w_r, roughness)
        w_r_enc = w_r_enc * cfg.light_intensity_scale
    n_dot_w_o = None
    if cfg.use_n_dot_viewdir:
        n_dot_w_o = jnp.sum(normals * w_o, axis=-1, keepdims=True)
    n_env_enc = None
    if cfg.diffuse_with_env:
        n_rot = normals
        if env_rot_radian is not None:
            n_rot = normals @ _rot_theta_mat(env_rot_radian, normals.dtype)
        deg = cfg.sh_degree_diffuse if (cfg.split_diffuse_env and cfg.sh_degree_diffuse > 0) \
            else cfg.sh_degree
        n_env_enc = encode_dir(cfg, cfg.encoding_ref, cfg.multires_refdir, deg,
                               n_rot, cfg.diffuse_kappa_inv)
        n_env_enc = n_env_enc * cfg.light_intensity_scale
    return normals_enc, w_r_enc, n_dot_w_o, n_env_enc


def _rot_theta_mat(radian, dtype):
    c, s = jnp.cos(radian), jnp.sin(radian)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.asarray(
        [[c, zero, -s], [zero, one, zero], [s, zero, c]], dtype=dtype)


def background_color(params, cfg: NetworkConfig, sph_coords, dirs):
    """Background MLP on the bg sphere (network.py:727-742)."""
    from envidr_tpu.ops.hashgrid import hash_encode
    bg_spec = HashGridSpec(input_dim=2, num_levels=4, level_dim=cfg.level_dim,
                           base_resolution=16, desired_resolution=2048,
                           log2_hashmap_size=19, interpolation="linear")
    h = hash_encode((sph_coords + 1.0) / 2.0, params["bg"]["encoder"]["embeddings"], bg_spec)
    d = sh_encode(dirs, degree=4)
    h = jnp.concatenate([d, h], axis=-1)
    y = apply_mlp(params["bg"]["net"], h, act=jax.nn.relu)
    return jax.nn.sigmoid(y) if cfg.color_act == "sigmoid" else density_ops.trunc_exp(y)
