"""Extract physical-constant data tables from the reference tree into .npz.

These are public measurement data (refractiveindex.info metal IORs, CIE 1931
observer curves, D65 illuminant) embedded in the reference as C arrays
(`metal_ior.inl.h`, `cie.h`). We parse the numbers only — no code is taken.
Run once at repo setup; output lands in vision_tpu/data/.
"""
import os
import re

import numpy as np

REF = "/root/reference/src"
OUT = os.path.join(os.path.dirname(__file__), "..", "vision_tpu", "data")
os.makedirs(OUT, exist_ok=True)


def extract_metals():
    text = open(f"{REF}/render_core/material/metal_ior.inl.h").read()
    metals = {}
    for m in re.finditer(r"ocarina::array (\w+)\{(.*?)\};", text, re.S):
        name, body = m.group(1), m.group(2)
        pairs = re.findall(r"make_float2\(([-0-9.eE+]+)f?,\s*([-0-9.eE+]+)f?\)", body)
        arr = np.array([[float(a), float(b)] for a, b in pairs], np.float32)
        metals[f"{name}_eta"] = arr[:, 0]
        metals[f"{name}_k"] = arr[:, 1]
    np.savez(os.path.join(OUT, "metal_ior.npz"), **metals)
    n = len([k for k in metals if k.endswith("_eta")])
    print(f"metals: {n} entries, {len(next(iter(metals.values())))} samples each")


def extract_cie():
    text = open(f"{REF}/base/color/cie.h").read()
    tables = {}
    for name in ["X", "Y", "Z", "D65"]:
        m = re.search(rf"array<float, cie_sample_count> {name} = \{{(.*?)\}};", text, re.S)
        vals = re.findall(r"([-0-9.e+]+)f", m.group(1))
        tables[name] = np.array([float(v) for v in vals], np.float32)
        assert len(tables[name]) == 471, (name, len(tables[name]))
    np.savez(os.path.join(OUT, "cie.npz"), **tables)
    print("cie: X/Y/Z/D65 471 samples (360..830nm)")




def extract_measured_ss():
    """Jensen et al. measured subsurface scattering presets
    (medium_scatter_data.h — public measurement data)."""
    text = open(f"{REF}/base/import/medium_scatter_data.h").read()
    names, ss, sa = [], [], []
    for m in re.finditer(
            r'\{"([^"]+)",\s*float3\(([^)]+)\),\s*float3\(([^)]+)\)\}', text):
        names.append(m.group(1))
        ss.append([float(v) for v in m.group(2).split(",")])
        sa.append([float(v) for v in m.group(3).split(",")])
    np.savez(os.path.join(OUT, "measured_ss.npz"),
             names=np.array(names), sigma_s=np.array(ss, np.float32),
             sigma_a=np.array(sa, np.float32))
    print(f"measured ss: {len(names)} presets")


if __name__ == "__main__":
    extract_metals()
    extract_cie()
    extract_measured_ss()
