"""Validate workflow smoke test (headless PNG) and CLI entry points
(SURVEY.md section 4, item 6)."""

import os

import numpy as np
import pytest

from volumetricinterp_tpu import Validate
from volumetricinterp_tpu.cli import main as cli_main
from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.io.synth import write_synthetic_amisr
from volumetricinterp_tpu.models.sphharmlag import Model


@pytest.fixture(scope="module")
def validate_workspace(tmp_path_factory, small_config_text):
    tmp = tmp_path_factory.mktemp("val")
    raw = str(tmp / "synth.h5")
    out = str(tmp / "coef.h5")
    png = str(tmp / "fig.png")

    cfg0 = Config.from_text(small_config_text)
    write_synthetic_amisr(
        raw, nrec=6, t0=1480286700.0, seed=21, smooth_in_model=Model(cfg0)
    )
    text = (
        small_config_text.replace("test_input.h5", raw)
        .replace("test_output.h5", out)
        .replace("test_fig.png", png)
        .replace(
            "STARTTIME = 2016-11-27T22:45:00", "STARTTIME = 2016-11-27T22:45:00"
        )
    )
    cfgfile = str(tmp / "config.ini")
    with open(cfgfile, "w") as f:
        f.write(text)
    return dict(raw=raw, out=out, png=png, cfgfile=cfgfile)


def test_validate_workflow(validate_workspace):
    v = Validate(validate_workspace["cfgfile"])
    v.interpolate()
    v.create_plots()
    assert os.path.exists(validate_workspace["png"])
    assert os.path.getsize(validate_workspace["png"]) > 10_000


def test_validate_cartopy_branch(validate_workspace):
    """The map-projection branch of create_plots (the reference's actual
    product, reference validate.py:99,115-122) runs end-to-end against the
    cartopy stub: GeoAxes panels, PlateCarree data transforms, coastlines/
    gridlines — the branch the plain-axes fallback never covers."""
    from tests import cartopy_stub

    png = validate_workspace["png"] + ".cartopy.png"
    v = Validate(validate_workspace["cfgfile"])
    if not os.path.exists(validate_workspace["out"]):
        v.interpolate()
    else:  # reuse the module fixture's fitted window
        v.outputfilename = validate_workspace["out"]
    v.outputpng = png
    names = cartopy_stub.install()
    try:
        v.create_plots()
    finally:
        cartopy_stub.uninstall(names)
    assert os.path.exists(png)
    assert os.path.getsize(png) > 10_000
    # the projection branch really executed (not the fallback)
    assert cartopy_stub._StubGeoAxes.coastlines_calls > 0
    assert cartopy_stub._StubGeoAxes.gridlines_calls > 0


def test_cli_fit(validate_workspace, tmp_path):
    cli_main([validate_workspace["cfgfile"], "--profile"])
    assert os.path.exists(validate_workspace["out"])


def test_cli_window_and_resume(validate_workspace):
    cli_main(
        [
            validate_workspace["cfgfile"],
            "--starttime", "2016-11-27T22:45:00",
            "--endtime", "2016-11-27T22:48:00",
        ]
    )
    import h5py

    with h5py.File(validate_workspace["out"], "r") as f:
        nrec = f["/UnixTime"].shape[0]
    assert nrec == 3  # 3 one-minute records inside the window


def test_cli_validate_flag(validate_workspace):
    cli_main([validate_workspace["cfgfile"], "--validate"])
    assert os.path.exists(validate_workspace["png"])


def test_interpolate_checkpoint_resume(validate_workspace, tmp_path):
    """resume=True checkpoints per chunk; a second resumed run skips
    completed chunks and produces the same coefficients."""
    import h5py
    from volumetricinterp_tpu import Interpolate
    from volumetricinterp_tpu.config import Config

    out = str(tmp_path / "ckpt.h5")
    text = open(validate_workspace["cfgfile"]).read()
    text = text.replace(validate_workspace["out"], out)
    text += "\n[TPU]\nCHUNK_SIZE = 2\n"

    interp = Interpolate(Config.from_text(text))
    interp.calc_coeffs(resume=True)
    with h5py.File(out, "r") as f:
        assert int(f["nrec_done"][()]) == interp.Coeffs.shape[0]
    C_first = interp.Coeffs.copy()

    # resumed run: all chunks already done -> no refitting, same contents
    interp2 = Interpolate(Config.from_text(text))
    interp2.calc_coeffs(resume=True)
    np.testing.assert_array_equal(interp2.Coeffs, C_first)
