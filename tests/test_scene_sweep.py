"""Reference scene-tree sweep: every vision_*.json scene whose assets exist
in the snapshot must load; missing assets must degrade gracefully (the
reference snapshot is missing many models/ dirs and some HDRIs)."""
import glob
import warnings

import pytest

from vision_tpu.scene.scene import Scene

SCENES = sorted(
    p for p in glob.glob("/root/reference/res/render_scene/*/*.json")
    if "tungsten" not in p and "lumi" not in p and "bake" not in p)

# these load fully with the assets present in the snapshot
EXPECTED_LOADED = {
    "cbox/cbox-prism.json": 14172,
    "cbox/cbox.json": 14184,
    "cbox/vision_scene.json": 36,
    "classroom/vision_scene.json": 103832,
    "staircase/vision_scene.json": 262663,
    "staircase2/vision_scene.json": 30937,
    "playground/vision_scene.json": 36,
}


class TestSceneSweep:
    @pytest.mark.parametrize("path", SCENES,
                             ids=[p.split("render_scene/")[-1] for p in SCENES])
    def test_loads_or_degrades(self, path):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                sc = Scene(path)
            except FileNotFoundError:
                pytest.skip("scene assets missing from reference snapshot")
        key = path.split("render_scene/")[-1]
        if key in EXPECTED_LOADED:
            assert sc.data.tri_p0.shape[0] == EXPECTED_LOADED[key], key
        assert sc.resolution[0] > 0
        assert sc.data.materials.kd.shape[0] >= 1


def test_missing_env_substitutes_constant_sky():
    """A scene whose only light is a missing-asset HDRI must get a unit
    gray environment instead of rendering black (classroom: the env map
    was never checked into the reference repo)."""
    s = {
        "shapes": [{"type": "quad", "param": {"width": 2, "height": 2}}],
        "light_sampler": {"type": "uniform", "param": {"lights": [
            {"type": "spherical", "param": {
                "color": {"fn": "does_not_exist.exr",
                          "color_space": "linear"},
                "scale": 300}}]}},
        "camera": {"type": "pinhole", "param": {
            "radiance_collector": {"param": {"resolution": [8, 8]}}}},
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sc = Scene(s)
    lt = sc.data.lights
    assert lt.n_lights == 1
    assert int(lt.env_index) == 0
