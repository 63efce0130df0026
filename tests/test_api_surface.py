"""Reference API-surface parity of the Interpolate class methods
(interpolate.py:97-469): eval_C, find_reg_param, chi2objfunct, manual."""

import numpy as np
import pytest

from volumetricinterp_tpu import Interpolate
from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from tests.oracle import oracle_chi2_param, oracle_eval_C


@pytest.fixture(scope="module")
def setup(small_config_text):
    """WELL-CONDITIONED random design: sub-cutoff directions of the real
    basis carry O(1) implementation noise in ANY solver (the reference's
    own gelsd computes them with ~30% error; docs/PARITY_NOTES.md #7), so
    tight library-surface parity is asserted on a clean problem; the real
    basis is covered by test_fit/test_end2end in the stable metrics."""
    interp = Interpolate(Config.from_text(small_config_text))
    nb = interp.model.nbasis
    rng = np.random.default_rng(12)
    npts = 400
    A = rng.normal(size=(npts, nb))
    C_true = rng.normal(size=nb)
    ne = A @ C_true
    b = ne + 0.1 * rng.normal(size=npts)
    W = np.full(npts, 100.0)
    psi = np.eye(nb) + 0.1 * np.ones((nb, nb))
    return interp, A, b, W, psi


def test_eval_C_matches_oracle(setup):
    interp, A, b, W, psi = setup
    # note: the config's regularization_list is ['0thorder']
    regs = {"0thorder": psi}
    params = {"0thorder": 1e-23}
    C, dC = (np.asarray(q) for q in interp.eval_C(A, b, W, regs, params,
                                                  calccov=True))
    C_ref, dC_ref = oracle_eval_C(A, b, W, [psi], [1e-23], calccov=True)
    assert np.allclose(C, C_ref, rtol=1e-9, atol=1e-12 * np.abs(C_ref).max())
    assert np.allclose(dC, dC_ref, rtol=1e-8, atol=1e-11 * np.abs(dC_ref).max())


def test_find_reg_param_matches_oracle(setup):
    interp, A, b, W, psi = setup
    regs = {"0thorder": psi}
    out = interp.find_reg_param(A, b, W, regs, method="chi2")
    ref = oracle_chi2_param(A, b, W, [psi], 0)
    if np.isnan(ref):
        assert np.isnan(out["0thorder"])
    else:
        assert np.isclose(out["0thorder"], ref, rtol=1e-5)


def test_chi2objfunct_matches_oracle(setup):
    interp, A, b, W, psi = setup
    from tests.oracle.ref_impl import _chi2_of

    regs = {"0thorder": psi}
    for a in [-6.0, -2.0, 0.0]:
        ours = interp.chi2objfunct(a, A, b, W, regs, nu=400.0, reg="0thorder")
        ref = _chi2_of(a, A, b, W, [psi], 0) - 400.0
        assert np.isclose(ours, ref, rtol=1e-7), a


def test_manual_method_constants(setup):
    interp, A, b, W, psi = setup
    assert interp.manual(A, b, W, {}, "curvature") == 1.0e-28
    assert interp.manual(A, b, W, {}, "0thorder") == 1.0e-23
    with pytest.raises(ValueError):
        interp.manual(A, b, W, {}, "unknown_reg")
