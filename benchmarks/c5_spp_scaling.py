"""c5 (canopy+atm polarized) rate vs spp — is the bench fixed-cost bound?"""

import time

import numpy as np

import eradiate_tpu as ert
from eradiate_tpu.core.rng import SeedState


def make():
    from eradiate_tpu.test_tools.test_cases import create_het01_brfpp
    from eradiate_tpu.experiments import CanopyAtmosphereExperiment

    exp = create_het01_brfpp(n_vza=19)
    return CanopyAtmosphereExperiment(
        canopy=exp.canopy,
        atmosphere={"type": "molecular", "has_absorption": False},
        illumination={"type": "directional", "zenith": 20.0, "azimuth": 0.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": np.linspace(-75, 75, 19),
            "azimuth": 0.0,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.159},
        integrator={"type": "volpath", "stokes": True},
    )


def main():
    ert.set_mode("mono_polarized")
    for spp in (8192, 32768, 131072):
        exp = make()
        exp.init()
        exp.process(spp=spp, seed_state=SeedState(0), mesh=None)  # compile
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            exp.process(spp=spp, seed_state=SeedState(i + 1), mesh=None)
            best = min(best, time.perf_counter() - t0)
        n = 19 * spp
        print(
            f"spp={spp:7d}: {best*1e3:8.1f} ms  {n/best/1e6:7.2f} M samples/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
