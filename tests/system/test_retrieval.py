"""End-to-end retrieval with JVP Jacobians (system tier).

The point of forward-mode sensitivities is inversion: this test runs a
small Gauss-Newton fit recovering (surface reflectance, optical-depth
scale) from synthetic multi-angle BRF observations, using
``eradiate_tpu.sensitivity`` Jacobians — no finite differences
anywhere. Convergence to the truth within MC noise is the acceptance
gate for the whole derivative stack (detached throughput channels +
likelihood-ratio flight estimator) doing its job together.
"""

import numpy as np
import pytest

import eradiate_tpu as ert
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.sensitivity import sensitivities

SPP = 16384
ZENITHS = np.array([-60.0, -30.0, 0.0, 30.0, 60.0])


def _make(rho, tau_scale):
    # a homogeneous scattering+absorbing medium whose total depth scales
    # with the retrieved parameter (AOD-style unknown)
    return AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "azimuth": 0.0},
        measures={"type": "mdistant", "construct": "hplane",
                  "zeniths": ZENITHS, "azimuth": 0.0, "spp": SPP},
        surface={"type": "lambertian", "reflectance": float(rho)},
        atmosphere={"type": "homogeneous", "top": 10.0,
                    "sigma_s": 0.02 * float(tau_scale),
                    "sigma_a": 0.01 * float(tau_scale)},
    )


def _forward(rho, tau_scale, seed):
    """BRF values and the [N, 2] Jacobian wrt (rho, tau_scale)."""
    exp = _make(rho, tau_scale)
    res = sensitivities(
        exp, wrt=["surface.reflectance", "medium.tau_scale"], seed=seed
    )
    e = res[exp.measures[0].id]
    y = e["brf"].ravel()
    # d/d tau_scale channel is relative AT the current scale: convert to
    # absolute d/d(tau_scale) via the chain rule (theta = ds / s)
    J = np.stack(
        [
            e["jac"]["surface.reflectance"]["brf"].ravel(),
            e["jac"]["medium.tau_scale"]["brf"].ravel() / tau_scale,
        ],
        axis=1,
    )
    return y, J


@pytest.mark.slow
def test_gauss_newton_recovers_truth():
    ert.set_mode("mono_single")
    rho_true, s_true = 0.32, 1.35
    exp_obs = _make(rho_true, s_true)
    ert.root_seed_state.reset(123)
    y_obs = np.asarray(ert.run(exp_obs)["brf"]).ravel()

    x = np.array([0.5, 1.0])  # start well away from the truth
    tail = []
    for it in range(6):
        # one fixed forward-model seed: Gauss-Newton then solves a fixed
        # realized MC surface and converges instead of chasing per-
        # iteration resampling noise (the observation seed differs, so
        # the recovered optimum still carries honest MC error)
        y, J = _forward(x[0], x[1], seed=1000)
        r = y_obs - y
        # Levenberg-style damping keeps early steps sane
        dx = np.linalg.solve(J.T @ J + 1e-6 * np.eye(2), J.T @ r)
        x = x + np.clip(dx, -0.5, 0.5)
        x[0] = np.clip(x[0], 0.01, 0.95)
        x[1] = np.clip(x[1], 0.1, 3.0)
        if it >= 3:
            tail.append(x.copy())
    x_hat = np.mean(tail, axis=0)

    # MC noise at these budgets supports ~1-3% recovery
    assert abs(x_hat[0] - rho_true) < 0.015, x_hat
    assert abs(x_hat[1] - s_true) < 0.08, x_hat


def _make_gas(rho, s_h2o, db, wavelengths):
    from eradiate_tpu.physics.thermoprops import make_profile

    tp = make_profile("afgl_1986-us_standard")
    tp = type(tp)(
        z=tp.z, p=tp.p, t=tp.t, n=tp.n,
        x={k: (np.asarray(v) * s_h2o if k == "H2O" else v)
           for k, v in tp.x.items()},
        id=f"afgl_h2o_x{s_h2o}",
    )
    return AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "azimuth": 0.0},
        measures={"type": "mdistant", "construct": "hplane",
                  "zeniths": ZENITHS, "azimuth": 0.0, "spp": SPP,
                  "srf": {"type": "delta", "wavelengths": wavelengths}},
        surface={"type": "lambertian", "reflectance": float(rho)},
        atmosphere={"type": "molecular", "absorption_data": db,
                    "thermoprops": tp},
    )


@pytest.mark.slow
def test_gauss_newton_recovers_gas_column():
    """Round 5 (VERDICT r4 task #5c end to end): joint retrieval of
    (surface reflectance, H2O column scale) using the gas.H2O channel —
    the water-vapor retrieval workflow the per-species channel exists
    for. The synthetic DB carries an x_H2O axis with sigma_a
    proportional to x, so the column scale is identifiable from the
    absorption band depth."""
    from eradiate_tpu.physics.absorption import make_synthetic_mono_db

    ert.set_mode("mono_single")
    db = make_synthetic_mono_db(
        w_nm=np.linspace(500.0, 650.0, 16), base_sigma=4e-2, species="H2O"
    )
    # differential-absorption wavelength pair: the DB's strongest line
    # plus the clearest window (classic column-retrieval setup)
    surf_sigma = db._d["sigma_a"][:, -1, 5, 2]  # near-surface row
    w_ax = db._d["w"]
    wavelengths = [float(w_ax[np.argmin(surf_sigma)]),
                   float(w_ax[np.argmax(surf_sigma)])]
    rho_true, s_true = 0.32, 1.4
    exp_obs = _make_gas(rho_true, s_true, db, wavelengths)
    ert.root_seed_state.reset(321)
    y_obs = np.asarray(ert.run(exp_obs)["brf"]).ravel()

    x = np.array([0.5, 1.0])
    tail = []
    for it in range(6):
        exp = _make_gas(x[0], x[1], db, wavelengths)
        res = sensitivities(
            exp, wrt=["surface.reflectance", "gas.H2O"], seed=2000
        )
        e = res[exp.measures[0].id]
        y = e["brf"].ravel()
        J = np.stack(
            [
                e["jac"]["surface.reflectance"]["brf"].ravel(),
                # gas channel is relative at the current scale
                e["jac"]["gas.H2O"]["brf"].ravel() / x[1],
            ],
            axis=1,
        )
        r = y_obs - y
        dx = np.linalg.solve(J.T @ J + 1e-6 * np.eye(2), J.T @ r)
        x = x + np.clip(dx, -0.5, 0.5)
        x[0] = np.clip(x[0], 0.01, 0.95)
        x[1] = np.clip(x[1], 0.1, 3.0)
        if it >= 3:
            tail.append(x.copy())
    x_hat = np.mean(tail, axis=0)
    # the synthetic spectrum has no true window (baseline sigma ~0.17 at
    # the clearest channel), so rho and the column stay correlated and
    # the fixed-seed MC optimum carries a ~0.02 rho offset at this spp
    assert abs(x_hat[0] - rho_true) < 0.035, x_hat
    assert abs(x_hat[1] - s_true) < 0.12, x_hat
