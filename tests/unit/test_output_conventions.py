"""Output-convention parity (VERDICT r1, item #9).

Pins the reference-layout converter against a hand-written
reference-shaped fixture: dims, coordinate values, CF attrs and data must
all match so datasets diff cleanly against reference Eradiate outputs
(conventions from ``src/eradiate/pipelines/logic.py:589-891``).
"""

import numpy as np

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.pipelines.logic import to_reference_layout


def _run_simple():
    exp = AtmosphereExperiment(
        atmosphere={"type": "homogeneous", "sigma_s": 1e-3, "top": 40.0},
        surface={"type": "lambertian", "reflectance": 0.4},
        illumination={"type": "directional", "zenith": 30.0, "azimuth": 15.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": [-30.0, 0.0, 30.0],
            "azimuth": 0.0,
            "spp": 16,
            "id": "m",
        },
    )
    ds = eradiate_tpu.run(exp)
    return exp, ds


def test_reference_layout_shapes_and_coords(mode_mono):
    exp, ds = _run_simple()
    ref = to_reference_layout(ds, exp.measures[0], exp.illumination)

    # --- hand-written reference-shaped expectations ---------------------
    # film variables: (w, y_index, x_index, saa, sza); logic.py:589-728
    for name in ("radiance", "brf", "brdf", "var"):
        da = ref[name]
        assert da.dims == ("w", "y_index", "x_index", "saa", "sza"), (
            name, da.dims,
        )
        assert da.values.shape == (1, 1, 3, 1, 1)
    # spectral variables: (w, saa, sza)
    assert ref["irradiance"].dims == ("w", "saa", "sza")
    # viewing angles: (x_index, y_index) with the reference CF attrs
    for cname, std in (
        ("vza", "viewing_zenith_angle"),
        ("vaa", "viewing_azimuth_angle"),
    ):
        da = ref[cname]
        assert da.dims == ("x_index", "y_index")
        assert da.attrs["standard_name"] == std
        assert da.attrs["units"] == "deg"
    # hplane signed zeniths match HemispherePlaneLayout.angles semantics
    np.testing.assert_allclose(
        ref["vza"].values[:, 0], [-30.0, 0.0, 30.0]
    )
    np.testing.assert_allclose(ref["vaa"].values[:, 0], 0.0)

    # solar-angle scalar dims carry the configured illumination
    np.testing.assert_allclose(ref.coords["sza"], [30.0])
    np.testing.assert_allclose(ref.coords["saa"], [15.0])

    # coordinate CF metadata rides in attrs
    ca = ref.attrs["coord_attrs"]
    assert ca["w"]["standard_name"] == "radiation_wavelength"
    assert ca["sza"]["standard_name"] == "solar_zenith_angle"

    # values untouched by the relayout
    np.testing.assert_allclose(
        ref["brf"].values[:, 0, :, 0, 0], ds["brf"].values
    )


def test_reference_layout_roundtrips_npz(tmp_path, mode_mono):
    """The reference layout survives the dataset's file round trip."""
    exp, ds = _run_simple()
    ref = to_reference_layout(ds, exp.measures[0], exp.illumination)
    path = tmp_path / "ref_layout.npz"
    ref.to_npz(str(path))
    d = np.load(path, allow_pickle=True)
    key = next(k for k in d.files if "brf" in k and "m2" not in k and "brdf" not in k and "srf" not in k)
    assert d[key].shape == (1, 1, 3, 1, 1)
