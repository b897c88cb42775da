"""Encoder factory — name-keyed facade mirroring ``get_encoder``
(``/root/reference/encoding.py:46-91``).

Returns ``(encode_fn, output_dim, init_fn_or_None)``.  Grid encoders carry
parameters: their ``init_fn(key) -> params`` and ``encode_fn(params, x)``;
parameter-free encoders get ``init_fn=None`` and ``encode_fn(x)``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

from envidr_tpu.ops.freq import freq_encode, freq_output_dim
from envidr_tpu.ops.hashgrid import HashGridSpec, hash_encode_from_world, init_hash_params
from envidr_tpu.ops.ide import ide_encode, ide_output_dim
from envidr_tpu.ops.sh import sh_encode, sh_output_dim


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    multires: int = 6,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    bound: float = 1.0,
    **kwargs,
) -> Tuple[Callable, int, Optional[Callable]]:
    if encoding == "None":
        return (lambda x, **kw: x), input_dim, None
    if encoding == "frequency":
        if multires == 0:
            return (lambda x, **kw: x), input_dim, None
        return (lambda x, **kw: freq_encode(x, degree=multires),
                freq_output_dim(input_dim, multires), None)
    if encoding == "sphere_harmonics":
        return (lambda x, **kw: sh_encode(x, degree=degree),
                sh_output_dim(degree), None)
    if encoding == "integrated_dir":
        return (lambda x, roughness=0.0, **kw: ide_encode(
            x, roughness, deg_view=degree), ide_output_dim(degree), None)
    if encoding in ("hashgrid", "hashgrid_diff", "tiledgrid", "rolled_tiled"):
        interp = "linear" if encoding in ("hashgrid", "tiledgrid") else "smoothstep"
        indexing = "rolled_tiled" if encoding in ("tiledgrid", "rolled_tiled") \
            else "hash"
        spec = HashGridSpec(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            interpolation=interp, indexing=indexing)

        def encode(params, x, **kw):
            return hash_encode_from_world(x, params["embeddings"], spec,
                                          bound=kw.get("bound", bound))

        def init(key):
            return init_hash_params(key, spec)

        return encode, spec.output_dim, init
    if encoding == "cp":
        from envidr_tpu.ops.cp import CPSpec, cp_encode_from_world, init_cp_params
        cspec = CPSpec(input_dim=input_dim, num_levels=num_levels,
                       level_dim=level_dim, rank=kwargs.get("rank", 32),
                       base_resolution=base_resolution,
                       desired_resolution=desired_resolution)

        def encode_cp(params, x, **kw):
            return cp_encode_from_world(x, params, cspec,
                                        bound=kw.get("bound", bound))

        def init_cp(key):
            return init_cp_params(key, cspec)

        return encode_cp, cspec.output_dim, init_cp
    raise NotImplementedError(
        f"Unknown encoding {encoding!r}; choose from [None, frequency, "
        "sphere_harmonics, integrated_dir, hashgrid, hashgrid_diff, "
        "tiledgrid, rolled_tiled, cp]")
