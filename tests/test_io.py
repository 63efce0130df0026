"""I/O layer: AMISR reader QC semantics, coefficient-file round trip."""

import numpy as np
import h5py
import pytest

from volumetricinterp_tpu.io.amisr import read_datafile
from volumetricinterp_tpu.io.coeffs import (
    IncrementalCoeffWriter,
    load_coeff_file,
    save_coeff_file,
)
from volumetricinterp_tpu.io.synth import write_synthetic_amisr


@pytest.fixture()
def synth_file(tmp_path):
    fn = str(tmp_path / "synth.h5")
    write_synthetic_amisr(fn, nrec=4, seed=1)
    return fn


def test_reader_shapes_and_qc(synth_file):
    utime, lat, lon, alt, value, error = read_datafile(
        synth_file, "dens", [1e10, 1e13], [0.1, 10.0], [1, 2, 3, 4]
    )
    assert utime.shape == (4, 2)
    assert lat.shape == lon.shape == alt.shape
    assert value.shape == (4, lat.size)
    assert np.all(np.isfinite(alt))  # NaN-coordinate rows dropped
    # QC: error limits respected wherever data survived
    fin = np.isfinite(value)
    assert fin.any()
    assert np.all(error[fin] > 1e10) and np.all(error[fin] < 1e13)


def test_reader_qc_kills_injected_bad_points(tmp_path):
    fn = str(tmp_path / "bad.h5")
    write_synthetic_amisr(fn, nrec=2, seed=2, bad_frac=0.3, nan_frac=0.0)
    _, _, _, _, value, error = read_datafile(
        fn, "dens", [1e10, 1e13], [0.1, 10.0], [1, 2, 3, 4]
    )
    # a third of points were made QC-failing three ways; all must be NaN
    with h5py.File(fn, "r") as f:
        fitcode = f["/FittedParams/FitInfo/fitcode"][:].reshape(2, -1)
        alt = f["/Geomag/Altitude"][:].flatten()
    fc = fitcode[:, np.isfinite(alt)]
    assert np.all(np.isnan(value[fc == 7]))


def test_reader_chi2_offset_correction(tmp_path):
    """Files with median chi2 > 100 get the -369 legacy correction
    (interpolate.py:645-646): identical data survive QC either way."""
    f1 = str(tmp_path / "a.h5")
    f2 = str(tmp_path / "b.h5")
    write_synthetic_amisr(f1, nrec=2, seed=3, chi2_offset=False)
    write_synthetic_amisr(f2, nrec=2, seed=3, chi2_offset=True)
    out1 = read_datafile(f1, "dens", [1e10, 1e13], [0.1, 10.0], [1, 2, 3, 4])
    out2 = read_datafile(f2, "dens", [1e10, 1e13], [0.1, 10.0], [1, 2, 3, 4])
    np.testing.assert_array_equal(out1[4], out2[4])


def test_reader_fits_param_path(synth_file):
    """PARAM = frac_O exercises the Fits/Errors + IonMass indexing
    (interpolate.py:624-632)."""
    _, _, _, _, value, error = read_datafile(
        synth_file, "frac_O", [0.0, 1.0], [0.1, 10.0], [1, 2, 3, 4]
    )
    fin = np.isfinite(value)
    assert fin.any()
    assert np.allclose(value[fin], 0.9)


def test_reader_fits_param_missing_species(synth_file):
    """Species not in IonMass -> electron index -1 (interpolate.py:627-629)."""
    _, _, _, _, value, _ = read_datafile(
        synth_file, "temp_N2", [1.0, 1e4], [0.1, 10.0], [1, 2, 3, 4]
    )
    fin = np.isfinite(value)
    assert fin.any()
    assert np.all(value[fin] > 1000.0)  # electron temperatures


def test_coeff_file_round_trip(tmp_path):
    fn = str(tmp_path / "coef.h5")
    rng = np.random.default_rng(0)
    nrec, nb = 3, 18
    utime = np.stack([np.arange(nrec) * 60.0, np.arange(nrec) * 60.0 + 60], -1)
    C = rng.normal(size=(nrec, nb))
    dC = rng.normal(size=(nrec, nb, nb))
    chi2 = rng.normal(size=nrec)
    hull = rng.normal(size=(8, 3))
    cfg_text = "[DEFAULT]\nx = 1\n"
    save_coeff_file(
        fn, utime, C, dC, chi2, hull, ["0thorder"], "chi2",
        "raw.h5", "cfg.ini", "/tmp", cfg_text,
        reg_params=np.ones((nrec, 1)),
    )
    d = load_coeff_file(fn)
    np.testing.assert_array_equal(d["Coeffs"], C)
    np.testing.assert_array_equal(d["Covariance"], dC)
    np.testing.assert_array_equal(d["UnixTime"], utime)
    np.testing.assert_array_equal(d["hull_vert"], hull)
    assert d["reglist"] == ["0thorder"]
    assert d["regmethod"] == "chi2"
    assert d["raw_filename"] == "raw.h5"
    # the config text round-trips byte-for-byte (interpolate.py:699-708)
    assert d["config_file_text"].decode("utf-8") == cfg_text


def test_incremental_writer_resume(tmp_path):
    fn = str(tmp_path / "inc.h5")
    rng = np.random.default_rng(5)
    nrec, nb = 6, 4
    meta = dict(
        reg_list=["0thorder"], reg_method="chi2", hull_vert=np.zeros((4, 3)),
        raw_filename="raw.h5", config_name="c.ini", config_path="/tmp",
        config_contents="[DEFAULT]\n",
    )
    utime = np.stack([np.arange(nrec) * 60.0, np.arange(nrec) * 60.0 + 60], -1)
    C = rng.normal(size=(nrec, nb))
    dC = rng.normal(size=(nrec, nb, nb))
    c2 = rng.normal(size=nrec)
    rp = rng.normal(size=(nrec, 1))

    w = IncrementalCoeffWriter(fn, nrec, nb, meta)
    w.write_chunk(0, utime[:3], C[:3], dC[:3], c2[:3], rp[:3])
    w.close()

    # "crashed" after 3 records; resume
    w2 = IncrementalCoeffWriter(fn, nrec, nb, meta)
    assert w2.nrec_done == 3
    w2.write_chunk(3, utime[3:], C[3:], dC[3:], c2[3:], rp[3:])
    w2.close()

    d = load_coeff_file(fn)
    np.testing.assert_array_equal(d["Coeffs"], C)
    np.testing.assert_allclose(d["chi2"], c2)
