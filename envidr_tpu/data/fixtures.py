"""Seeded synthetic-dataset fixtures shared by bench.py and the test suite.

The committed quality checkpoints (e.g. ``assets/neus_cp_long_best.ckpt``)
were trained on the deterministic ``tools/gen_synth_scene.py`` scene at a
specific resolution; regenerating with different ``--size``/``--n-train``
makes checkpoint-vs-GT comparisons fail with confusing PSNR assertions.
This helper regenerates (or validates) the dataset with the canonical args
in one place.  Reference analogue: the reference assumes externally
downloaded scene data with fixed resolution (/root/reference/README.md:80-101).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CANONICAL_SIZE = 400
CANONICAL_N_TRAIN = 50


def ensure_synth_spheres(data_dir: str, size: int = CANONICAL_SIZE,
                         n_train: int = CANONICAL_N_TRAIN) -> str:
    """Generate data/synth_spheres if absent; verify resolution if present.

    Returns the data_dir.  Raises RuntimeError with a clear message if an
    existing dataset was generated at a different resolution than requested
    (delete the directory to regenerate).
    """
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tval = os.path.join(data_dir, "transforms_val.json")
    if not os.path.exists(tval):
        subprocess.run(
            [sys.executable, os.path.join(root, "tools", "gen_synth_scene.py"),
             data_dir, "--size", str(size), "--n-train", str(n_train)],
            check=True)
    # validate the probe image resolution matches what the caller expects
    with open(tval) as f:
        meta = json.load(f)
    frame = meta["frames"][0]
    img_path = os.path.join(data_dir, frame["file_path"])
    if not os.path.splitext(img_path)[1]:
        img_path += ".png"
    if os.path.exists(img_path):
        import imageio.v2 as imageio
        h = imageio.imread(img_path).shape[0]
        if h != size:
            raise RuntimeError(
                f"{data_dir} exists at resolution {h}px but {size}px was "
                f"requested — delete the directory to regenerate with the "
                f"canonical args (size={size}, n_train={n_train}).")
    return data_dir
