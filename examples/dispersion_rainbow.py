"""Dispersion demo: a bright strip seen through BK7-like glass splits
into a spectrum (the capability the reference's README motivates but
never implements).

    python examples/dispersion_rainbow.py
"""

import spectral_tpu as st

scene = st.presets.prism(n_samples=64)
scene.width, scene.height = 400, 300
scene.nbr_of_iterations = 64

renderer = st.Renderer(scene)
renderer.render(
    progress=lambda p: p.frame_id % 16 == 0
    and print(f"{p.fraction:.0%}  eta {p.eta_s:.0f}s")
)
renderer.save_image("rainbow.png")
print("wrote rainbow.png")
