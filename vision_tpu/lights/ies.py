"""IES photometric profile parser (IESNA LM-63).

Equivalent of `/root/reference/src/base/illumination/ies.cpp` (376 LoC
parser): reads candela distributions over (vertical, horizontal) angle grids
and resamples them to a regular lookup table usable as a spot/point angular
mask on device.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class IESProfile:
    def __init__(self, v_angles, h_angles, candela):
        self.v_angles = np.asarray(v_angles, np.float64)
        self.h_angles = np.asarray(h_angles, np.float64)
        self.candela = np.asarray(candela, np.float64)  # [H, V]
        self.max_candela = float(self.candela.max()) if self.candela.size else 1.0

    @classmethod
    def parse(cls, text):
        """Parse an IESNA LM-63 file (1991/1995/2002 headers)."""
        lines = text.splitlines()
        i = 0
        # skip header until TILT line
        while i < len(lines) and not lines[i].strip().upper().startswith("TILT"):
            i += 1
        if i >= len(lines):
            raise ValueError("not an IES file (no TILT line)")
        tilt = lines[i].split("=", 1)[-1].strip().upper()
        i += 1
        if tilt == "INCLUDE":
            # skip the 4 tilt data blocks: lamp-to-luminaire, n pairs, angles, factors
            nums = []
            while i < len(lines) and len(nums) < 2:
                nums += lines[i].split()
                i += 1
            n_pairs = int(float(nums[1]))
            need = 2 * n_pairs
            got = len(nums) - 2
            while i < len(lines) and got < need:
                got += len(lines[i].split())
                i += 1

        # remaining: all whitespace-separated numbers
        vals = []
        for line in lines[i:]:
            vals += [float(v) for v in line.replace(",", " ").split()]
        if len(vals) < 13:
            raise ValueError("truncated IES data")
        # [0]=n_lamps [1]=lumens/lamp [2]=multiplier [3]=n_v [4]=n_h
        # [5]=photometric type [6]=units [7..9]=dims [10..12]=ballast etc.
        mult = vals[2]
        n_v = int(vals[3])
        n_h = int(vals[4])
        data = vals[13:]
        v_angles = np.asarray(data[:n_v])
        h_angles = np.asarray(data[n_v:n_v + n_h])
        cd = np.asarray(data[n_v + n_h:n_v + n_h + n_v * n_h]) * mult
        candela = cd.reshape(n_h, n_v)
        return cls(v_angles, h_angles, candela)

    @classmethod
    def load(cls, path):
        with open(path, "r", errors="ignore") as f:
            return cls.parse(f.read())

    def to_table(self, n_theta=64):
        """Resample to a regular [n_theta] polar profile (azimuthally
        averaged) normalized to peak 1; device-samplable by angle."""
        thetas = np.linspace(0.0, 180.0, n_theta)
        prof_h = []
        for row in self.candela:
            prof_h.append(np.interp(thetas, self.v_angles, row,
                                    left=row[0], right=row[-1]))
        prof = np.mean(prof_h, axis=0)
        peak = max(prof.max(), 1e-9)
        return jnp.asarray((prof / peak).astype(np.float32))


def eval_ies(table, cos_theta):
    """Angular attenuation from a to_table() profile; cos measured from the
    light's principal direction."""
    n = table.shape[0]
    theta = jnp.degrees(jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0)))
    t = theta / 180.0 * (n - 1)
    i0 = jnp.clip(t.astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    f = t - i0.astype(jnp.float32)
    return table[i0] * (1 - f) + table[i1] * f
