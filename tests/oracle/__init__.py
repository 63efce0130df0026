from .ref_impl import (
    oracle_basis,
    oracle_chi2_param,
    oracle_eval_C,
    oracle_fit_record,
    oracle_gcv_param,
    oracle_geodetic2ecef,
    oracle_omega,
    oracle_psi,
    oracle_transform,
)
