"""Extended-precision (multi-word float32) arithmetic for f32-only TPUs.

MEASURED reality of this TPU backend (see docs/PARITY_NOTES.md): there is
no float64 anywhere — f64 arrays do not even survive a device round trip
(1.0 + 1e-12 comes back as 1.0), elementwise "f64" ops round like f32
(~8e-8), the default "f64" matmul is bf16-grade (~2.4e-3 relative!), and
precision=HIGHEST only reaches f32 (~1.3e-7).  Everything the reference
does in LAPACK f64 — sufficient statistics, the gelsd-cutoff solve, the
chi2 regularization search — therefore needs SOFTWARE extended precision
on device.

Representation: an EXPANSION is a tuple of 1-3 f32 arrays (most
significant word first) whose unevaluated sum is the value.  Three words
(72 bits) represent any f64 EXACTLY, which matters because the deep
eigenstructure the gelsd cutoff keys on (eps64 * ||X|| ~ 2e-16) lives in
bits 48-53 of the normal matrix — a two-word pair (48 bits) measurably
fails to resolve it.  Expansions are SPLIT ON THE HOST (numpy f64): f64
storage does not survive device transfer.

Building blocks, each riding verified-exact hardware behavior:

* error-free transformations: f32 add/sub/mul on this TPU are correctly
  rounded (measured: the two_sum residual identity holds exactly), so
  Knuth two_sum / Dekker two_prod give exact splits.

* Ozaki-style exact-sliced matmul on the MXU: each expansion operand is
  cut into 8-bit exponent-aligned integer-valued bf16 chunks (per-row for
  the left operand, per-column for the right), using EXACT power-of-two
  scales from exponent-bit extraction (jnp.exp2/log2 are polynomial
  approximations and off by ulps — measured).  Chunk products have
  <= 16-bit mantissas and the MXU accumulates them in f32, so every
  partial matmul with contraction length <= 256 is EXACT; partials are
  combined with a three-word EFT cascade.  Deep cancellation (e.g. the
  off-diagonal of V' X V for a true eigenbasis, 16+ decades below ||X||)
  is reproduced to f64 fidelity — no native matmul on this hardware can
  do that at any precision setting.

The fit pipeline uses these exactly where the reference needs f64:
A'WA / A'Wb (suff stats), X = AtWA + alpha R formation, the deflation
ladder's projections (ops/solve.py), and the cutoff chi^2.  The f32-grade
fast paths (pencil whitening, grid evaluation) stay plain f32 by design.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

WB = 8       # Ozaki chunk width (bits)
MAXPQ = 8    # keep chunk products with p + q <= MAXPQ (~2^-80 floor)


# ---------------------------------------------------------------------------
# error-free transformations (correctly-rounded f32, verified on this TPU)
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    t = s - a
    e = (a - (s - t)) + (b - t)
    return s, e


def quick_two_sum(a, b):
    """Dekker fast two-sum; requires |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


_SPLITTER = np.float32(4097.0)  # 2^12 + 1 for f32 Dekker split


def two_prod(a, b):
    """Dekker two-product: p + e == a * b exactly (no FMA needed)."""
    p = a * b
    aa = a * _SPLITTER
    ahi = aa - (aa - a)
    alo = a - ahi
    bb = b * _SPLITTER
    bhi = bb - (bb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# expansions: tuples of 1-3 f32 words, most significant first
# ---------------------------------------------------------------------------

def split_f64_host(x, nwords=3):
    """HOST-side split of a numpy f64 array into an f32 expansion.
    nwords=3 is EXACT for every normal f64 (24*3 > 53)."""
    x = np.asarray(x, np.float64)
    words = []
    for _ in range(nwords):
        w = x.astype(np.float32)
        words.append(w)
        x = x - w.astype(np.float64)
    return tuple(words)


def exp_value_f64(e):
    """Host-side: collapse an expansion to numpy f64."""
    out = np.zeros(np.shape(e[0]), np.float64)
    for w in reversed(e):
        out = out + np.asarray(w, np.float64)
    return out


def exp_renorm(words, nwords=3):
    """Compress a list of f32 words into a nonoverlapping expansion of
    `nwords` words (Shewchuk-style two_sum cascade, least-significant
    residuals folded into the last word)."""
    if words[0].dtype == jnp.float64:  # CPU: plain f64 sum
        out = words[0]
        for w in words[1:]:
            out = out + w
        return (out,)
    ws = list(words)
    # backward pass: accumulate from least significant
    s = ws[-1]
    tail = []
    for w in ws[-2::-1]:
        s, e = two_sum(w, s)
        tail.append(e)
    out = [s]  # most significant
    # forward passes to split off the next words
    rest = tail[::-1]
    for _ in range(nwords - 1):
        if not rest:
            out.append(jnp.zeros_like(s))
            continue
        s2 = rest[-1]
        tail2 = []
        for w in rest[-2::-1]:
            s2, e = two_sum(w, s2)
            tail2.append(e)
        out.append(s2)
        rest = tail2[::-1]
    return tuple(out)


def exp_add(a, b, nwords=3):
    """Expansion + expansion."""
    return exp_renorm(list(a) + list(b), nwords=nwords)


def exp_neg(a):
    return tuple(-w for w in a)


def exp_scale_pow2(a, c):
    """Expansion times an exact power of two (exact)."""
    return tuple(w * c for w in a)


def exp_mul_f32(a, s):
    """Expansion times a plain f32 array (each word via two_prod)."""
    if a[0].dtype == jnp.float64:  # CPU: native f64 suffices
        return (a[0] * s.astype(jnp.float64),)
    words = []
    for w in a:
        p, e = two_prod(w, s)
        words.append(p)
        words.append(e)
    return exp_renorm(words, nwords=min(3, len(a) + 1))


def exp_mul(a, b, nwords=3):
    """Expansion times expansion (elementwise), via pairwise two_prods of
    the significant word products."""
    if a[0].dtype == jnp.float64:
        return (a[0] * b[0],)
    words = []
    na, nb = len(a), len(b)
    for i in range(na):
        for j in range(nb):
            if i + j < nwords:
                p, e = two_prod(a[i], b[j])
                words.append(p)
                words.append(e)
    return exp_renorm(words, nwords=nwords)


def as_expansion(x):
    """Wrap a plain array as a 1-word expansion."""
    return (x,) if not isinstance(x, tuple) else x


def stack_x(exp):
    """Stack an expansion's words along a new leading axis (for sharding
    specs and host transfer: pytree-of-words -> one array)."""
    return jnp.stack(exp, axis=0)


def unstack_x(arr, nw=None):
    """Inverse of stack_x."""
    n = arr.shape[0] if nw is None else nw
    return tuple(arr[i] for i in range(n))


def psum_x(exp, axis_name):
    """Exact sum of an expansion over a mesh axis.

    A plain psum would round each word's cross-device sum in f32,
    destroying the expansion's extended precision; instead the word stacks
    are all_gathered and renormalized locally with exact two_sum cascades.
    1-word (CPU f64) expansions take the plain psum."""
    if len(exp) == 1:
        return (jax.lax.psum(exp[0], axis_name),)
    gathered = jax.lax.all_gather(stack_x(exp), axis_name)  # [p, nw, ...]
    words = [gathered[i, j] for i in range(gathered.shape[0])
             for j in range(gathered.shape[1])]
    return exp_renorm(words, nwords=len(exp))


def exp_hi(a):
    """Most significant word (the f32-grade approximation of the value)."""
    return a[0]


def exp_dot(a, b, nwords=3):
    """Expansion dot along the last axis: [.., 1, n] x [.., n, 1] handled
    through ozaki_mm_long; convenience for vectors."""
    ae = tuple(w[..., None, :] for w in a)
    be = tuple(w[..., :, None] for w in b)
    out = ozaki_mm_long(ae, be, nwords=nwords)
    return tuple(w[..., 0, 0] for w in out)


# ---------------------------------------------------------------------------
# Ozaki exact-sliced matmul
# ---------------------------------------------------------------------------

def _pow2_scale(mx):
    """Exact power-of-two >= 2*mx via exponent-bit extraction (f32)."""
    mx = jnp.where(mx > 0, mx, 1.0).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(mx, jnp.int32)
    e_mx = ((bits >> 23) & 0xFF) - 127  # floor(log2) for normals
    e = jnp.clip(e_mx + 2, -125, 125)   # mx/scale in [1/8, 1/2)
    return jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)


def _make_chunks(exp, axis, nchunk):
    """Exponent-aligned WB-bit integer-valued bf16 chunks of `exp` along
    rows (axis=-1) or columns (axis=-2), plus the power-of-two scale.

    Every chunk value is an integer multiple of a power of two shared
    across the row/column, magnitude <= 2^WB, exactly representable in
    bf16.  Extraction runs in exact multi-word f32 arithmetic.

    Returns (chunks [nchunk, ...] bf16 stacked on a new LEADING axis,
    scale).  The extraction loop runs under lax.scan so its body is
    traced/compiled ONCE regardless of nchunk — the per-ozaki_mm unrolled
    cascades were the dominant term in the fit graph's 100k+-op bloat
    (scripts/graph_size.py receipts; cold compiles were minutes)."""
    scale = _pow2_scale(jnp.max(jnp.abs(exp[0]), axis=axis, keepdims=True))
    words = tuple(w / scale for w in exp)  # exact power-of-two division
    c = jnp.float32(2.0 ** WB)

    def body(words, _):
        s = jnp.round(words[0] * c) / c
        chunk = (s * c).astype(jnp.bfloat16)
        # exact residual update: words <- renorm(words - s), then shift;
        # full two_sums throughout (quick_two_sum's precondition breaks
        # once a word's bits are exhausted)
        r, e1 = two_sum(words[0], -s)
        nxt = exp_renorm([r, e1] + list(words[1:]), nwords=len(words))
        return tuple(w * c for w in nxt), chunk

    _, chunks = jax.lax.scan(body, words, None, length=nchunk)
    return chunks, scale


def _nchunks_for(exp):
    """Chunks needed to cover an expansion's significant bits: 24 bits per
    word plus slack, in WB-bit chunks."""
    return min(9, -(-((24 * len(exp)) + 4) // WB))


def ozaki_mm(a_exp, b_exp, maxpq=MAXPQ, nwords=3):
    """Exact-sliced matmul of expansions: [.., m, n] @ [.., n, k] -> a
    `nwords` expansion.

    Per-entry error ~ 2^(-WB*(maxpq+2)) * rowscale_i * colscale_j (the
    chunk-product truncation floor, ~1e-24 of the operand scales at the
    defaults) — far below f64's 2^-52, so deep cancellation survives.
    Contraction lengths up to 2^(24 - 2*WB) = 256 are exact per chunk
    product; longer contractions must use ozaki_mm_long.

    The f32 body is an inner ``jax.jit``: identical-shape call sites
    share ONE traced instance via the jit trace cache instead of
    re-tracing the chunk/cascade machinery per call site — together with
    the scan-ified chunk loops this is what holds the fit graph's trace
    time and serialized size down (scripts/graph_size.py receipts)."""
    if a_exp[0].dtype == jnp.float64:
        # CPU path: native f64 exists; the expansion is a single f64 word
        # and the exact-sliced machinery is unnecessary
        return (jnp.matmul(a_exp[0], b_exp[0]),)
    return _ozaki_mm_f32(tuple(a_exp), tuple(b_exp), maxpq, nwords)


@partial(jax.jit, static_argnames=("maxpq", "nwords"))
def _ozaki_mm_f32(a_exp, b_exp, maxpq, nwords):
    # chunks beyond index maxpq can never appear in a kept term
    # (p + q <= maxpq with q, p >= 0), so don't extract them: each chunk
    # costs several elementwise passes over the full operand
    na = min(_nchunks_for(a_exp), maxpq + 1)
    nb = min(_nchunks_for(b_exp), maxpq + 1)
    ac, sa = _make_chunks(a_exp, axis=-1, nchunk=na)  # [na, .., m, n]
    bc, sb = _make_chunks(b_exp, axis=-2, nchunk=nb)  # [nb, .., n, k]
    out_shape = jnp.broadcast_shapes(
        a_exp[0].shape[:-2], b_exp[0].shape[:-2]
    ) + (a_exp[0].shape[-2], b_exp[0].shape[-1])
    # three-word cascade accumulator: partials cancel from O(rowscale *
    # colscale) down to entries 16+ decades smaller, and the two_sum
    # errors must accumulate exactly enough for the cancellation to
    # survive (a single compensation word floors at 2^-48 of the
    # INTERMEDIATE scale)
    acc_h = jnp.zeros(out_shape, jnp.float32)
    acc_m = jnp.zeros_like(acc_h)
    acc_l = jnp.zeros_like(acc_h)
    terms = [(p, q) for p in range(na) for q in range(nb)
             if p + q <= maxpq]
    terms.sort(key=lambda t: (t[0] + t[1], t[0]))
    # the term loop runs under lax.scan (ONE traced matmul + cascade body
    # per call site instead of ~25): chunk indices and the exact pow2
    # scales ride constant per-iteration arrays.  Accumulation order is
    # bit-identical to the unrolled loop (same sorted terms, same two_sum
    # cascade).
    ps = jnp.asarray([p for p, _ in terms], jnp.int32)
    qs = jnp.asarray([q for _, q in terms], jnp.int32)
    scs = jnp.asarray([2.0 ** (-WB * (p + q + 2)) for p, q in terms],
                      jnp.float32)

    def body(carry, pqs):
        acc_h, acc_m, acc_l = carry
        p, q, sc = pqs
        ap = jax.lax.dynamic_index_in_dim(ac, p, 0, keepdims=False)
        bq = jax.lax.dynamic_index_in_dim(bc, q, 0, keepdims=False)
        part = jnp.matmul(ap, bq, preferred_element_type=jnp.float32)
        part = part * sc
        acc_h, e1 = two_sum(acc_h, part)
        acc_m, e2 = two_sum(acc_m, e1)
        acc_l = acc_l + e2
        return (acc_h, acc_m, acc_l), None

    (acc_h, acc_m, acc_l), _ = jax.lax.scan(
        body, (acc_h, acc_m, acc_l), (ps, qs, scs))
    s = sa * sb  # [.., m, 1] * [.., 1, k]: exact powers of two
    out = exp_renorm([acc_h, acc_m, acc_l], nwords=nwords)
    return exp_scale_pow2(out, s)


def ozaki_mm_long(a_exp, b_exp, block=256, maxpq=MAXPQ, nwords=3):
    """ozaki_mm for contraction lengths beyond the exactness bound 256:
    the contraction axis is cut into blocks whose partial results are
    combined with expansion adds (error ~ nblocks * 2^-72).

    The block loop runs under lax.scan (one traced ozaki_mm body per call
    site instead of ceil(n/block)); the contraction axis is zero-padded to
    a block multiple, which is exact — zero columns contribute exact-zero
    chunk products and do not move the per-row/column pow2 scales."""
    n = a_exp[0].shape[-1]
    if n <= block or a_exp[0].dtype == jnp.float64:
        return ozaki_mm(a_exp, b_exp, maxpq=maxpq, nwords=nwords)
    nblk = -(-n // block)
    pad = nblk * block - n

    def blocks_of(exp, axis):
        out = []
        for w in exp:
            if pad:
                cfg = [(0, 0)] * w.ndim
                cfg[axis] = (0, pad)
                w = jnp.pad(w, cfg)
            # [.., nblk * block along axis] -> [nblk, .., block along axis]
            shape = w.shape[:axis % w.ndim] + (nblk, block) \
                + w.shape[axis % w.ndim + 1:]
            w = w.reshape(shape)
            out.append(jnp.moveaxis(w, axis % w.ndim, 0))
        return tuple(out)

    a_blk = blocks_of(a_exp, a_exp[0].ndim - 1)  # [nblk, .., m, block]
    b_blk = blocks_of(b_exp, b_exp[0].ndim - 2)  # [nblk, .., block, k]

    def body(out, ab):
        ap, bp = ab
        part = ozaki_mm(ap, bp, maxpq=maxpq, nwords=nwords)
        return exp_add(out, part, nwords=nwords), None

    zero = tuple(jnp.zeros(
        jnp.broadcast_shapes(a_exp[0].shape[:-2], b_exp[0].shape[:-2])
        + (a_exp[0].shape[-2], b_exp[0].shape[-1]), jnp.float32)
        for _ in range(nwords))
    out, _ = jax.lax.scan(body, zero, (a_blk, b_blk))
    return out
