"""Row-sharded rendering over a device mesh.

On a real TPU pod slice this shards over chips; on a CPU host run with

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_sharded.py

to exercise the same sharding on 8 virtual devices.
"""

import jax

import spectral_tpu as st
from spectral_tpu.parallel.mesh import make_mesh, row_sharding

if jax.default_backend() == "cpu" and jax.device_count() == 1:
    raise SystemExit(
        "set XLA_FLAGS=--xla_force_host_platform_device_count=8 for a CPU mesh"
    )

scene = st.presets.cornell_box()
scene.width, scene.height = 256, 256
scene.nbr_of_iterations = 32

mesh = make_mesh()  # all devices
renderer = st.Renderer(scene, sharding=row_sharding(mesh))
renderer.render()
renderer.save_image("cornell_sharded.png")
print(f"rendered on {mesh.devices.size} devices -> cornell_sharded.png")
