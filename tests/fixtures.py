"""Self-contained test scenes (no external assets).

CBOX_JSON mirrors the canonical cornell box
(`/root/reference/res/render_scene/cbox/vision_scene.json`) simplified to the
BASELINE config-1 ladder: 512x512, pinhole-ish camera, diffuse walls, two
boxes, one area light.
"""

def _wall(name, mat, m):
    return {
        "type": "quad", "name": name,
        "param": {"width": 1.0, "height": 1.0, "material": mat,
                  "transform": {"type": "matrix4x4",
                                "param": {"matrix4x4": m}}},
    }


# row-vector convention matrices (translation in 4th row) as the reference uses
_FLOOR = [[0, 0, -2, 0], [0, 4, 0, 0], [2, 0, 0, 0], [0, 0, 0, 1]]
_CEIL = [[-2, 0, 0, 0], [0, -4, 0, 0], [0, 0, 2, 0], [0, 2, 0, 1]]
_BACK = [[0, 2, 0, 0], [0, 0, 4, 0], [2, 0, 0, 0], [0, 1, -1, 1]]
_LEFT = [[0, 2, 0, 0], [4, 0, 0, 0], [0, 0, -2, 0], [-1, 1, 0, 1]]
_RIGHT = [[0, 2, 0, 0], [-4, 0, 0, 0], [0, 0, 2, 0], [1, 1, 0, 1]]
_SHORT = [[-0.1703285, 0, 0.5699020, 0], [-0.5790837, 0, -0.1730727, 0],
          [0, -0.6, 0, 0], [0.328631, 0.299, 0.374592, 1]]
_TALL = [[0.5735512, 0, -0.1995971, 0], [0.1964583, 0, 0.5645317, 0],
         [0, -1.2, 0, 0], [-0.335439, 0.599, -0.291415, 1]]
_LIGHT = [[0.47, 0, 0, 0], [0, -0.1786, 0, 0], [0, 0, -0.38, 0],
          [-0.005, 1.98, -0.03, 1]]

CBOX_JSON = {
    "shapes": [
        _wall("floor", "White", _FLOOR),
        _wall("ceiling", "White", _CEIL),
        _wall("back", "White", _BACK),
        _wall("left", "Red", _LEFT),
        _wall("right", "Green", _RIGHT),
        {"type": "cube", "name": "short",
         "param": {"x": 1, "y": 1, "z": 1, "material": "White",
                   "transform": {"type": "matrix4x4",
                                 "param": {"matrix4x4": _SHORT}}}},
        {"type": "cube", "name": "tall",
         "param": {"x": 1, "y": 1, "z": 1, "material": "White",
                   "transform": {"type": "matrix4x4",
                                 "param": {"matrix4x4": _TALL}}}},
        {"type": "quad", "name": "light",
         "param": {"width": 1, "height": 1, "material": "Black",
                   "transform": {"type": "matrix4x4",
                                 "param": {"matrix4x4": _LIGHT}},
                   "emission": {"type": "area",
                                "param": {"color": {"channels": "xyz",
                                                    "node": [17, 12, 4]},
                                          "two_sided": False,
                                          "scale": 1}}}},
    ],
    "materials": [
        {"type": "diffuse", "name": "Red", "param": {"color": [0.63, 0.065, 0.05]}},
        {"type": "diffuse", "name": "Green", "param": {"color": [0.14, 0.45, 0.091]}},
        {"type": "diffuse", "name": "White", "param": {"color": [0.725, 0.71, 0.68]}},
        {"type": "diffuse", "name": "Black", "param": {"color": [0, 0, 0]}},
    ],
    "sampler": {"type": "independent", "param": {"spp": 1}},
    "camera": {
        "type": "thin_lens",
        "param": {
            "fov_y": 19.5,
            "transform": {"type": "look_at",
                          "param": {"position": [0, 1, 6.8], "up": [0, 1, 0],
                                    "target_pos": [0, 1, 0]}},
            "radiance_collector": {
                "type": "normal",
                "param": {"resolution": [512, 512],
                          "tone_mapper": {"type": "linear",
                                          "param": {"exposure": 1.0}}}},
            "filter": {"type": "box", "param": {"radius": [0.5, 0.5]}},
        },
    },
    "integrator": {"type": "pt",
                   "param": {"min_depth": 0, "max_depth": 8, "rr_threshold": 1}},
    "spectrum": {"type": "srgb", "param": {"dimension": 3}},
    "light_sampler": {"type": "uniform", "param": {"lights": []}},
    "output": {"spp": 16, "fn": "cbox_test.png"},
}


def make_glass_cbox():
    """cbox with a glass tall box + mirror short box (ladder config 2)."""
    import copy
    s = copy.deepcopy(CBOX_JSON)
    s["materials"] += [
        {"type": "glass", "name": "Glass",
         "param": {"material_name": "BK7", "roughness": [0.01, 0.01],
                   "color": [1, 1, 1]}},
        {"type": "mirror", "name": "Mirror",
         "param": {"color": [1, 1, 1], "roughness": 0.001}},
        {"type": "metal", "name": "Cu",
         "param": {"material_name": "Cu", "roughness": [0.01, 0.01]}},
    ]
    s["shapes"][5]["param"]["material"] = "Glass"
    s["shapes"][6]["param"]["material"] = "Mirror"
    return s
