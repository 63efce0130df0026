"""Leave-one-beam-out cross-validation sweeps (BASELINE.json config 5).

Model-selection tooling the reference lacks: score basis orders and
regularization strengths by how well fits trained WITHOUT a radar beam
predict that beam's measurements.  The reference's only validation mode is
the human-in-the-loop Validate plots (validate.py:64-132).

TPU-first structure: everything runs on per-beam sufficient statistics.
For each record and beam b,

    AtWA_loo(b) = AtWA_total - AtWA_b,   (same for AtWb, btWb, N)

so a leave-one-beam-out fit is a [nbasis, nbasis] subtraction + solve, and
the held-out score is chi2_b = C'AtWA_b C - 2 C'AtWb_b + btWb_b — no
per-point work anywhere in the sweep.  The whole (record x beam x alpha)
grid is one vmapped jit.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ops.solve import suff_stats, sym_pinv_apply


def per_beam_stats(values, errors, A, beam_idx, nbeam):
    """Sufficient statistics per (record, beam).

    values/errors: [nrec, npoints]; A: [npoints, nb]; beam_idx: [npoints]
    int.  Returns (AtWA [nrec, nbeam, nb, nb], AtWb [nrec, nbeam, nb],
    btWb [nrec, nbeam], N [nrec, nbeam]).
    """
    beam_idx = jnp.asarray(beam_idx)

    def one_record(v, e):
        mask = jnp.isfinite(v).astype(A.dtype)
        W = jnp.where(mask > 0, e, 1.0) ** (-2)
        b = jnp.where(mask > 0, v, 0.0)

        def one_beam(bi):
            m = mask * (beam_idx == bi)
            return suff_stats(A, b, W, m)

        return jax.vmap(one_beam)(jnp.arange(nbeam))

    return jax.vmap(one_record)(jnp.asarray(values), jnp.asarray(errors))


@partial(jax.jit, static_argnames=("nbeam",))
def _lobo_scores(values, errors, A, beam_idx, R, log10_alphas, nbeam):
    """Held-out chi2 per (record, beam, alpha): [nrec, nbeam, nalpha]."""
    AtWA_b, AtWb_b, btWb_b, N_b = per_beam_stats(
        values, errors, A, beam_idx, nbeam
    )
    AtWA = AtWA_b.sum(axis=1)  # [nrec, nb, nb]
    AtWb = AtWb_b.sum(axis=1)

    alphas = 10.0 ** jnp.asarray(log10_alphas)

    def score_one(AtWA_r, AtWb_r, AtWA_rb, AtWb_rb, btWb_rb):
        # leave beam b out
        Xbase = AtWA_r[None] - AtWA_rb  # [nbeam, nb, nb]
        ybase = AtWb_r[None] - AtWb_rb  # [nbeam, nb]

        def per_alpha(a):
            def per_beam(Xb, yb, AtWA_out, AtWb_out, btWb_out):
                C, _ = sym_pinv_apply(Xb + a * R, yb, want_H=False)
                return C @ (AtWA_out @ C) - 2.0 * (C @ AtWb_out) + btWb_out

            return jax.vmap(per_beam)(Xbase, ybase, AtWA_rb, AtWb_rb, btWb_rb)

        return jax.vmap(per_alpha)(alphas).T  # [nbeam, nalpha]

    return jax.vmap(score_one)(AtWA, AtWb, AtWA_b, AtWb_b, btWb_b)


def lobo_cv(values, errors, A, beam_idx, R, log10_alphas):
    """Leave-one-beam-out CV scores summed over records and beams.

    Returns (scores [nalpha], per_beam [nrec, nbeam, nalpha]).  Lower is
    better; scores are weighted held-out chi2 (comparable to the number of
    held-out points when the model generalizes perfectly).
    """
    nbeam = int(np.max(np.asarray(beam_idx))) + 1
    per = _lobo_scores(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A),
        jnp.asarray(beam_idx), jnp.asarray(R),
        jnp.asarray(log10_alphas, dtype=jnp.float64), nbeam,
    )
    return np.asarray(per).sum(axis=(0, 1)), np.asarray(per)


def order_sweep(config, values, errors, lat, lon, alt, beam_idx,
                orders, log10_alphas, reg_name="0thorder"):
    """Sweep basis order x regularization strength by LOBO CV.

    orders: list of (maxk, maxl); returns dict with the score matrix
    [norders, nalpha] and the argmin selection.
    """
    from .config import Config
    from .models.sphharmlag import Model

    scores = np.zeros((len(orders), len(log10_alphas)))
    for i, (maxk, maxl) in enumerate(orders):
        cfg = Config.from_text(
            config.raw_text if isinstance(config, Config) else config
        )
        cfg.model.maxk = maxk
        cfg.model.maxl = maxl
        model = Model(cfg)
        A = np.asarray(model.basis(lat, lon, alt))
        if reg_name == "curvature":
            R = np.asarray(model.eval_omega())
        else:
            R = np.asarray(model.eval_psi())
        s, _ = lobo_cv(values, errors, A, beam_idx, R, log10_alphas)
        scores[i] = s
    best = np.unravel_index(np.argmin(scores), scores.shape)
    return {
        "scores": scores,
        "orders": list(orders),
        "log10_alphas": list(log10_alphas),
        "best_order": orders[best[0]],
        "best_log10_alpha": log10_alphas[best[1]],
    }
