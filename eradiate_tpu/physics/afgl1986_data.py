"""AFGL 1986 atmospheric-model tabulations.

Temperature profiles of the six AFGL 1986 model atmospheres (Anderson et
al., *AFGL Atmospheric Constituent Profiles (0-120 km)*, AFGL-TR-86-0110,
1986 — the tables behind ``joseki.make("afgl_1986-*")`` in the reference,
``src/eradiate/scenes/atmosphere/_molecular.py:80-84``) on the standard
50-level AFGL altitude grid, plus surface pressures and trace-gas column
parameters.

Provenance & fidelity: the temperature tables are transcribed from the
published AFGL-TR-86-0110 model atmospheres as reproduced across public
radiative-transfer packages. Pressures are NOT transcribed — they are
reconstructed by hydrostatic integration from the tabulated T(z) and the
surface pressure (the published tables are hydrostatically consistent, so
the reconstruction agrees with them to <~0.5%; it also guarantees the
profile is exactly hydrostatic for the solver). H2O and O3 mole-fraction
profiles are analytic shapes calibrated per variant to the published
surface mole fraction / column amounts. Users needing the byte-exact
published tables load them with
:func:`eradiate_tpu.data.netcdf.load_thermoprops_netcdf` or
:meth:`ThermoProfile.from_arrays`.
"""

from __future__ import annotations

import numpy as np

__all__ = ["AFGL_Z_KM", "AFGL_TEMPERATURE", "AFGL_SURFACE", "AFGL_GAS"]

#: Standard AFGL altitude grid [km]: 0..25 by 1, 27.5..50 by 2.5, 55..120 by 5
AFGL_Z_KM = np.concatenate(
    [
        np.arange(0.0, 26.0, 1.0),
        np.arange(27.5, 51.0, 2.5),
        np.arange(55.0, 121.0, 5.0),
    ]
)
assert AFGL_Z_KM.size == 50

#: Temperature [K] at AFGL_Z_KM per variant.
AFGL_TEMPERATURE = {
    # model 1
    "tropical": np.array([
        299.7, 293.7, 287.7, 283.7, 277.0, 270.3, 263.6, 257.0, 250.3,
        243.6, 237.0, 230.1, 223.6, 217.0, 210.3, 203.7, 197.0, 194.8,
        198.8, 202.7, 206.7, 210.7, 214.6, 217.0, 219.2, 221.4,
        227.0, 232.3, 237.7, 243.1, 248.5, 254.0, 259.4, 264.8, 269.6,
        270.2,
        263.4, 253.1, 236.0, 218.9, 201.8, 184.8, 177.1, 177.0, 184.3,
        190.7, 212.0, 241.6, 299.7, 380.0,
    ]),
    # model 2
    "midlatitude_summer": np.array([
        294.2, 289.7, 285.2, 279.2, 273.2, 267.2, 261.2, 254.7, 248.2,
        241.7, 235.3, 228.8, 222.3, 215.8, 215.7, 215.7, 215.7, 215.7,
        216.8, 217.9, 219.2, 220.4, 221.6, 222.8, 223.9, 225.1,
        228.5, 233.7, 239.0, 245.2, 251.3, 257.5, 263.7, 269.9, 275.2,
        275.7,
        269.3, 257.1, 240.1, 218.1, 196.1, 174.1, 165.1, 165.0, 178.3,
        190.5, 222.2, 262.4, 316.8, 380.0,
    ]),
    # model 3
    "midlatitude_winter": np.array([
        272.2, 268.7, 265.2, 261.7, 255.7, 249.7, 243.7, 237.7, 231.7,
        225.7, 219.7, 219.2, 218.7, 218.2, 217.7, 217.2, 216.7, 216.2,
        215.7, 215.2, 215.2, 215.2, 215.2, 215.2, 215.2, 215.2,
        215.5, 217.4, 220.4, 227.9, 235.5, 243.2, 250.8, 258.5, 265.1,
        265.7,
        260.6, 250.8, 240.9, 230.7, 220.4, 210.1, 199.8, 199.5, 208.3,
        218.6, 237.1, 259.5, 293.0, 333.0,
    ]),
    # model 4
    "subarctic_summer": np.array([
        287.2, 281.7, 276.3, 270.9, 265.5, 260.1, 253.1, 246.1, 239.2,
        232.2, 225.2, 225.2, 225.2, 225.2, 225.2, 225.2, 225.2, 225.2,
        225.2, 225.2, 225.2, 225.2, 225.2, 225.2, 226.6, 228.1,
        231.0, 235.1, 240.0, 247.2, 254.6, 262.1, 269.5, 273.6, 276.2,
        277.2,
        274.0, 262.7, 239.7, 216.6, 193.6, 170.6, 161.7, 161.6, 176.8,
        190.4, 226.0, 270.1, 322.7, 380.0,
    ]),
    # model 5 (note the surface inversion)
    "subarctic_winter": np.array([
        257.1, 259.1, 255.9, 252.7, 247.7, 240.9, 234.1, 227.3, 220.6,
        217.2, 217.2, 217.2, 217.2, 217.2, 217.2, 217.2, 216.6, 216.0,
        215.4, 214.8, 214.2, 213.6, 213.0, 212.4, 211.8, 211.2,
        213.6, 216.0, 218.5, 222.3, 228.5, 234.7, 240.8, 247.0, 253.2,
        259.3,
        259.1, 250.9, 248.4, 245.4, 234.7, 223.9, 213.1, 202.3, 211.0,
        218.5, 234.0, 252.6, 288.5, 333.0,
    ]),
    # model 6: U.S. Standard 1976
    "us_standard": np.array([
        288.2, 281.7, 275.2, 268.7, 262.2, 255.7, 249.2, 242.7, 236.2,
        229.7, 223.3, 216.8, 216.7, 216.7, 216.7, 216.7, 216.7, 216.7,
        216.7, 216.7, 216.7, 217.6, 218.6, 219.6, 220.6, 221.6,
        224.0, 226.5, 230.0, 236.5, 242.9, 250.4, 257.3, 264.2, 270.6,
        270.7,
        260.8, 247.0, 233.3, 219.6, 208.4, 198.6, 188.9, 186.9, 188.4,
        195.1, 208.8, 240.0, 300.0, 360.0,
    ]),
}

#: Per-variant surface values: (p0 [Pa], x_H2O(0), x_O3(0))
AFGL_SURFACE = {
    "tropical": (101300.0, 2.59e-2, 2.87e-8),
    "midlatitude_summer": (101300.0, 1.88e-2, 3.02e-8),
    "midlatitude_winter": (101800.0, 4.32e-3, 2.78e-8),
    "subarctic_summer": (101000.0, 1.19e-2, 2.41e-8),
    "subarctic_winter": (101300.0, 1.41e-3, 1.80e-8),
    "us_standard": (101325.0, 7.75e-3, 2.66e-8),
}

#: Per-variant gas-column parameters:
#: pwv_cm  — precipitable water vapor column [cm]
#: o3_du   — ozone column [Dobson units]
#: o3_peak_km / o3_width_km — stratospheric ozone layer shape
AFGL_GAS = {
    "tropical": {"pwv_cm": 4.12, "o3_du": 277.0, "o3_peak_km": 26.5, "o3_width_km": 5.5},
    "midlatitude_summer": {"pwv_cm": 2.92, "o3_du": 331.0, "o3_peak_km": 23.5, "o3_width_km": 6.5},
    "midlatitude_winter": {"pwv_cm": 0.85, "o3_du": 377.0, "o3_peak_km": 21.0, "o3_width_km": 7.0},
    "subarctic_summer": {"pwv_cm": 2.08, "o3_du": 344.0, "o3_peak_km": 21.5, "o3_width_km": 7.0},
    "subarctic_winter": {"pwv_cm": 0.42, "o3_du": 448.0, "o3_peak_km": 18.5, "o3_width_km": 7.5},
    "us_standard": {"pwv_cm": 1.42, "o3_du": 345.0, "o3_peak_km": 23.0, "o3_width_km": 6.5},
}
