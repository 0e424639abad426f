"""Generate committed ground-truth goldens from the scalar oracle.

The oracle (tests/oracle.py) replays the reference renderer's recursive
per-pixel algorithm in scalar f32 numpy — an independent implementation of
``src/shader.rs`` semantics. Its output is committed as ground truth so
golden tests pin the framework against the *reference algorithm*, not
against the framework's own earlier output.

Regenerate (deterministic) with:
    python tools/make_oracle_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene
    from tests.oracle import OracleRenderer

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    )
    for preset in ("default", "cornell"):
        for bounces in (1, 3):
            scene = presets.PRESETS[preset]()
            scene.width, scene.height = 32, 24
            scene.nbr_of_ray_bounces = bounces
            scene.nbr_of_iterations = 4
            arrays, config = flatten_scene(scene)
            oracle = OracleRenderer(arrays, config)
            frames = np.stack(
                [oracle.render_frame(f) for f in range(2)]
            ).astype(np.float32)
            path = os.path.join(
                out_dir, f"oracle_{preset}_32x24_b{bounces}.npz"
            )
            np.savez_compressed(path, frames=frames)
            print(f"wrote {path}  max={frames.max():.4f}")


if __name__ == "__main__":
    main()
