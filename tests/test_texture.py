"""Procedural checker textures (schema.Checker / Material.texture).

Beyond-reference capability — the reference's materials are spatially
uniform (``UIMaterial``, reference src/main.rs:2092-2111). The checker
modulates the reflective spectrum's MAGNITUDE by world-space hit
position (scalar: spectral shape untouched), with identical op order in
the jnp integrator, the Pallas megakernel (unrolled AND material-select
fori loops) and the scalar oracle; untextured scenes compile none of it
(static ``textured_static`` gate).
"""

import numpy as np
import pytest

from spectral_tpu.render.integrator import checker_factor, integrate_frame
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene
from spectral_tpu.scene.schema import Checker, SceneError, SceneObject


def _textured_scene(n_samples=8, bounces=1):
    sc = presets.default_scene(n_samples=n_samples)
    sc.width, sc.height = 24, 16
    sc.nbr_of_ray_bounces = bounces
    sc.nbr_of_iterations = 2
    floor = next(o for o in sc.objects if o.name == "Floor")
    floor.material.texture = Checker(scale=0.7, low=0.2)
    return sc


def test_checker_factor_unit():
    import jax.numpy as jnp

    f = checker_factor
    one = jnp.float32(1.0)
    # parity flips per unit cell along each axis
    assert float(f(jnp.float32(0.5), one * 0.5, one * 0.5, one, one * 0.25)) == 1.0
    assert float(f(jnp.float32(1.5), one * 0.5, one * 0.5, one, one * 0.25)) == 0.25
    assert float(f(jnp.float32(1.5), one * 1.5, one * 0.5, one, one * 0.25)) == 1.0
    # negative coordinates continue the lattice (floor, not trunc)
    assert float(f(jnp.float32(-0.5), one * 0.5, one * 0.5, one, one * 0.25)) == 0.25
    # scale == 0 means untextured regardless of the low factor
    assert float(
        f(jnp.float32(1.5), one * 0.5, one * 0.5, jnp.float32(0.0), one * 0.25)
    ) == 1.0


def test_validation_and_round_trip(tmp_path):
    from spectral_tpu.utils import sceneio

    sc = _textured_scene()
    sc.validate()
    p = tmp_path / "tex.json"
    sceneio.save_scene(sc, p)
    back = sceneio.load_scene(p)
    floors = [m for m in back.materials if m.texture is not None]
    assert len(floors) == 1
    assert floors[0].texture == Checker(scale=0.7, low=0.2)
    a0, _ = flatten_scene(sc)
    a1, _ = flatten_scene(back)
    np.testing.assert_array_equal(
        np.asarray(a0.tex_scale), np.asarray(a1.tex_scale)
    )

    bad = _textured_scene()
    next(o for o in bad.objects
         if o.name == "Floor").material.texture = Checker(scale=0.0)
    with pytest.raises(SceneError, match="scale"):
        bad.validate()
    bad2 = _textured_scene()
    next(o for o in bad2.objects
         if o.name == "Floor").material.texture = Checker(low=1.5)
    with pytest.raises(SceneError, match="low"):
        bad2.validate()


def test_static_flag_and_image_effect():
    sc = _textured_scene()
    arrays, config = flatten_scene(sc)
    assert arrays.textured_static
    with_tex = np.asarray(integrate_frame(arrays, config, np.uint32(0)))

    next(o for o in sc.objects
         if o.name == "Floor").material.texture = None
    arrays2, config2 = flatten_scene(sc)
    assert not arrays2.textured_static
    without = np.asarray(integrate_frame(arrays2, config2, np.uint32(0)))
    # the checker darkens some floor pixels and leaves others untouched
    diff = np.abs(with_tex - without).max(axis=-1)
    assert (diff > 1e-3).any() and (diff < 1e-7).any()


def test_pallas_matches_jnp_unrolled_and_fori():
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    # unrolled loop (few objects)
    sc = _textured_scene()
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    got = np.asarray(integrate_frame_pallas(
        arrays, config, np.uint32(0), obj_types, interpret=True))
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-5

    # material-select fori loop (many objects: textured mesh)
    from spectral_tpu.scene.mesh import icosphere

    sc2 = presets.default_scene(n_samples=8)
    sc2.width, sc2.height = 24, 16
    sc2.nbr_of_ray_bounces = 1
    sc2.nbr_of_iterations = 2
    mat = sc2.objects[0].material
    mat.texture = Checker(scale=0.4, low=0.1)
    sc2.objects.append(SceneObject((0.0, 1.0, 6.0), icosphere(1.2, 2),
                                   mat, name="textured mesh"))
    arrays2, config2 = flatten_scene(sc2)
    assert config2.n_objects > 64
    obj_types2 = tuple(np.asarray(arrays2.obj_type).tolist())
    want2 = np.asarray(integrate_frame(arrays2, config2, np.uint32(0)))
    got2 = np.asarray(integrate_frame_pallas(
        arrays2, config2, np.uint32(0), obj_types2, interpret=True))
    scale2 = max(1.0, float(np.abs(want2).max()))
    assert np.abs(got2 - want2).max() / scale2 < 1e-5


def test_matches_oracle():
    from tests.oracle import OracleRenderer

    arrays, config = flatten_scene(_textured_scene(bounces=1))
    got = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    want = OracleRenderer(arrays, config).render_frame(0)
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    assert float(err.max()) < 1e-3  # grazing-silhouette envelope
    assert float(np.quantile(err, 0.99)) < 1e-5


def test_aov_albedo_carries_the_pattern():
    from spectral_tpu.render.aov import compute_aovs

    sc = _textured_scene()
    sc.width, sc.height = 64, 48
    aovs = compute_aovs(sc)
    oid = aovs["obj_id"]
    floor_idx = [i for i, o in enumerate(sc.visible_objects())
                 if o.name == "Floor"][0]
    floor_px = oid == floor_idx
    assert floor_px.sum() > 50
    lum = aovs["albedo"][floor_px].mean(axis=-1)
    # two distinct albedo levels on the floor: checker cells
    assert lum.max() > 2.0 * lum.min()


def test_cli_describe_shows_texture(tmp_path, capsys):
    from spectral_tpu.cli import main
    from spectral_tpu.utils import sceneio

    p = tmp_path / "tex.json"
    sceneio.save_scene(_textured_scene(), p)
    assert main(["describe", "--scene", str(p)]) == 0
    out = capsys.readouterr().out
    assert "checker texture (scale 0.7, low 0.2)" in out
