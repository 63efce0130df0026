"""sphharmlag model parity vs the scipy oracle."""

import numpy as np
import pytest

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from tests.oracle import oracle_basis, oracle_omega, oracle_psi


@pytest.fixture(scope="module")
def model(small_config_text):
    # module-scoped: table building is one-time per config
    return Model(Config.from_text(small_config_text))


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(7)
    lat = rng.uniform(74, 82, 200)
    lon = rng.uniform(252, 272, 200)
    alt = rng.uniform(1e5, 6e5, 200)
    return lat, lon, alt


def test_index_maps(model):
    # bijection n <-> (k, l, m)  (reference sphharmlag.py:79-99)
    seen = set()
    for n in range(model.nbasis):
        k, l, m = model.basis_numbers(n)
        k, l, m = int(k), int(l), int(m)
        assert 0 <= k < model.maxk
        assert 0 <= l < model.maxl
        assert -l <= m <= l
        seen.add((k, l, m))
    assert len(seen) == model.nbasis


def test_nu_formula(model):
    for n in [0, 3, 8, model.nbasis - 1]:
        _, l, _ = model.basis_numbers(n)
        expected = (2 * l + 0.5) * np.pi / (2 * model.cap_lim) - 0.5
        assert np.isclose(model.nu(n), expected)


def test_basis_matches_oracle(model, points):
    lat, lon, alt = points
    A = np.asarray(model.basis(lat, lon, alt))
    Aref = oracle_basis(model.maxk, model.maxl, 10.0, 78.0, 262.0, lat, lon, alt)
    assert A.shape == Aref.shape
    for n in range(model.nbasis):
        sup = np.max(np.abs(Aref[:, n])) + 1e-300
        assert np.max(np.abs(A[:, n] - Aref[:, n])) < 1e-8 * sup, n


def test_basis_preserves_input_shape(model):
    lat = np.full((3, 4, 5), 78.0)
    lon = np.full((3, 4, 5), 262.0)
    alt = np.full((3, 4, 5), 3e5)
    A = model.basis(lat, lon, alt)
    assert A.shape == (3, 4, 5, model.nbasis)


def test_grad_basis_matches_finite_differences(model):
    """Directional derivative check in cap coordinates: perturb alt (pure z)
    and lon (phi-dominant) and compare against the analytic gradient."""
    lat = np.array([78.5, 77.0, 79.0])
    lon = np.array([261.0, 263.0, 265.0])
    alt = np.array([3e5, 2.5e5, 4e5])
    G = np.asarray(model.grad_basis(lat, lon, alt))  # [npts, 3, nbasis]
    assert G.shape == (3, 3, model.nbasis)

    from volumetricinterp_tpu.constants import RE

    z, t, p = (np.asarray(v) for v in model.transform_coord(lat, lon, alt))
    r = (z / 100.0 + 1.0) * RE

    # numeric gradient via the chain through (z, t, p):
    # f(z,t,p); grad-hat components: df/dr = df/dz * 100/RE ; (1/r) df/dt ;
    # (1/(r sin t)) df/dp
    def design(z_, t_, p_):
        return np.asarray(model.design_from_ztp(z_, t_, p_))

    hz, ht, hp = 1e-6, 1e-8, 1e-8
    dz = (design(z + hz, t, p) - design(z - hz, t, p)) / (2 * hz) * 100.0 / RE
    dt = (design(z, t + ht, p) - design(z, t - ht, p)) / (2 * ht) / r[:, None]
    dp = (design(z, t, p + hp) - design(z, t, p - hp)) / (2 * hp) / (
        r * np.sin(t)
    )[:, None]

    for comp, ref in [(0, dz), (1, dt), (2, dp)]:
        sup = np.max(np.abs(ref)) + 1e-300
        err = np.max(np.abs(G[:, comp, :] - ref)) / sup
        assert err < 1e-4, (comp, err)


def test_psi_matches_oracle(small_config_text):
    cfg = Config.from_text(small_config_text)
    model = Model(cfg)
    psi = np.asarray(model.eval_psi())
    ref = oracle_psi(cfg.model.maxk, cfg.model.maxl, cfg.model.cap_lim)
    sup = np.max(np.abs(ref))
    assert psi.shape == ref.shape
    assert np.max(np.abs(psi - ref)) < 1e-8 * sup
    # symmetry + PSD (SURVEY.md section 4, item 5)
    assert np.allclose(psi, psi.T)
    w = np.linalg.eigvalsh(psi)
    assert w.min() > -1e-12 * sup


def test_psi_gauss_mode_matches_quad(small_config_text):
    cfg_q = Config.from_text(small_config_text)
    cfg_g = Config.from_text(small_config_text + "\n[TPU]\nQUAD_MODE = gauss\n")
    psi_q = np.asarray(Model(cfg_q).eval_psi())
    psi_g = np.asarray(Model(cfg_g).eval_psi())
    sup = np.max(np.abs(psi_q))
    assert np.max(np.abs(psi_q - psi_g)) < 1e-8 * sup


def test_omega_quad_mode_matches_oracle(small_config_text):
    """Curvature matrix in 'quad' mode vs the oracle's per-pair quadratures.

    NOTE: the z-integral is divergent (docs/PARITY_NOTES.md); both sides
    compute the same deterministic QUADPACK values, so they agree exactly.
    """
    cfg = Config.from_text(small_config_text)
    model = Model(cfg)
    om = np.asarray(model.eval_omega())
    ref = oracle_omega(cfg.model.maxk, cfg.model.maxl, cfg.model.cap_lim)
    sup = np.max(np.abs(ref))
    assert np.max(np.abs(om - ref)) < 1e-9 * sup


def test_psi_finite_zmax(small_config_text):
    text = small_config_text.replace("MAX_Z_INT = INF", "MAX_Z_INT = 12.5")
    cfg = Config.from_text(text)
    model = Model(cfg)
    psi = np.asarray(model.eval_psi())
    ref = oracle_psi(cfg.model.maxk, cfg.model.maxl, cfg.model.cap_lim, max_z=12.5)
    sup = np.max(np.abs(ref))
    assert np.max(np.abs(psi - ref)) < 1e-8 * sup


def test_az_daz_parity(model):
    phi = np.linspace(0, 2 * np.pi, 17)
    import scipy.special as sp

    for v, m in [(22.25, 0), (22.25, 2), (22.25, -2)]:
        kv = np.sqrt((2 * v + 1) / (4 * np.pi) * sp.gamma(v - abs(m) + 1) / sp.gamma(v + abs(m) + 1))
        if m != 0:
            kv *= np.sqrt(2)
        ref = kv * (np.sin(abs(m) * phi) if m < 0 else np.cos(abs(m) * phi))
        dref = (
            abs(m) * kv * np.cos(abs(m) * phi)
            if m < 0
            else -m * kv * np.sin(abs(m) * phi)
        )
        assert np.allclose(np.asarray(model.Az(v, m, phi)), ref, rtol=1e-10, atol=1e-12)
        assert np.allclose(np.asarray(model.dAz(v, m, phi)), dref, rtol=1e-10, atol=1e-12)


def test_series_basis_impl_matches_table(small_config_text):
    """BASIS_IMPL=series (direct hypergeometric) vs the table path, within
    the series' accuracy envelope at moderate nu."""
    cfg_t = Config.from_text(small_config_text)
    cfg_s = Config.from_text(small_config_text + "\n[TPU]\nBASIS_IMPL = series\n")
    m_t, m_s = Model(cfg_t), Model(cfg_s)
    rng = np.random.default_rng(2)
    lat = rng.uniform(74, 82, 100)
    lon = rng.uniform(252, 272, 100)
    alt = rng.uniform(1e5, 6e5, 100)
    At = np.asarray(m_t.basis(lat, lon, alt))
    As = np.asarray(m_s.basis(lat, lon, alt))
    for n in range(m_t.nbasis):
        sup = np.max(np.abs(At[:, n])) + 1e-300
        assert np.max(np.abs(At[:, n] - As[:, n])) < 1e-5 * sup, n


def test_eval_tau_gauss_matches_quad(small_config_text):
    """eval_tau's fixed-node 'gauss' mode agrees with the reference-faithful
    adaptive-quad mode on a smooth profile (reference sphharmlag.py:241-259;
    m != 0 entries vanish exactly because the azimuth integral is zero)."""
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu.models.sphharmlag import Model

    reg = lambda z: np.exp(-0.5 * (z - 2.0) ** 2)
    m_q = Model(Config.from_text(small_config_text))
    m_g = Model(Config.from_text(small_config_text +
                                 "\n[TPU]\nQUAD_MODE = gauss\n"))
    tq = np.asarray(m_q.eval_tau(reg))
    tg = np.asarray(m_g.eval_tau(reg))
    assert tq.shape == tg.shape == (m_q.nbasis, 1)
    scale = np.abs(tq).max()
    assert scale > 0
    assert np.allclose(tg, tq, atol=1e-6 * scale, rtol=1e-6)
    # quirk parity: m != 0 rows are numerically ~0 in quad mode and exactly
    # 0 in gauss mode
    mvals = np.asarray(m_q._m)
    assert np.all(np.abs(tq[mvals != 0]) < 1e-10 * scale)
    assert np.all(tg[mvals != 0] == 0.0)
