"""Dual-backend array namespace dispatch.

The framework has two execution tiers (see README / SURVEY.md §7):

* **Compiled tier** — model programs traced under ``jax.vmap`` / ``jax.jit``;
  all distribution math runs as jnp ops that XLA fuses onto the TPU VPU/MXU.
* **Interpreter tier** — arbitrary Python (or remote PPX) programs executed
  one trace at a time on the host, exactly like the reference's per-trace
  loop (reference: pyprob/state.py:158-293).  Per-site device dispatch would
  cost ~ms per random choice, so the interpreter tier runs distribution math
  in numpy/scipy on the host.

Every distribution is written once against the small namespace below; the
namespace is chosen per-call from the argument types (JAX tracers / jnp
arrays -> jnp; python scalars / numpy -> numpy).
"""

from __future__ import annotations

import numpy as _np
import scipy.special as _sps

import jax
import jax.numpy as _jnp
import jax.scipy.special as _jsps


class _NumpyBackend:
    name = "numpy"
    np = _np

    pi = _np.pi
    inf = _np.inf
    nan = _np.nan

    asarray = staticmethod(lambda x, dtype=None: _np.asarray(x, dtype=dtype))
    exp = _np.exp
    log = _np.log
    log1p = _np.log1p
    expm1 = _np.expm1
    sqrt = _np.sqrt
    abs = _np.abs
    floor = _np.floor
    ceil = _np.ceil
    round = staticmethod(_np.round)
    clip = staticmethod(_np.clip)
    where = staticmethod(_np.where)
    sum = staticmethod(_np.sum)
    prod = staticmethod(_np.prod)
    max = staticmethod(_np.max)
    min = staticmethod(_np.min)
    maximum = _np.maximum
    minimum = _np.minimum
    sin = _np.sin
    cos = _np.cos
    tan = _np.tan
    arctan = _np.arctan
    tanh = _np.tanh
    arctanh = _np.arctanh
    sign = _np.sign
    isnan = _np.isnan
    isinf = _np.isinf
    full_like = staticmethod(_np.full_like)
    zeros_like = staticmethod(_np.zeros_like)
    ones_like = staticmethod(_np.ones_like)
    broadcast_arrays = staticmethod(_np.broadcast_arrays)
    broadcast_to = staticmethod(_np.broadcast_to)
    squeeze = staticmethod(_np.squeeze)
    reshape = staticmethod(_np.reshape)
    stack = staticmethod(_np.stack)
    arange = staticmethod(_np.arange)
    take_along_axis = staticmethod(_np.take_along_axis)
    cumsum = staticmethod(_np.cumsum)
    argmax = staticmethod(_np.argmax)
    searchsorted = staticmethod(_np.searchsorted)

    erf = staticmethod(_sps.erf)
    erfc = staticmethod(_sps.erfc)
    erfinv = staticmethod(_sps.erfinv)
    gammaln = staticmethod(_sps.gammaln)
    betaln = staticmethod(_sps.betaln)
    digamma = staticmethod(_sps.psi)

    @staticmethod
    def trigamma(a):
        return _sps.polygamma(1, _np.asarray(a, dtype=_np.float64)).astype(
            _np.result_type(a, _np.float32)
        )

    i0 = staticmethod(_sps.i0)
    i1 = staticmethod(_sps.i1)
    i0e = staticmethod(_sps.i0e)
    xlogy = staticmethod(_sps.xlogy)
    xlog1py = staticmethod(_sps.xlog1py)
    gammainc = staticmethod(_sps.gammainc)
    ndtr = staticmethod(_sps.ndtr)
    ndtri = staticmethod(_sps.ndtri)

    @staticmethod
    def logsumexp(a, axis=None, b=None, keepdims=False):
        return _sps.logsumexp(a, axis=axis, b=b, keepdims=keepdims)

    @staticmethod
    def log_softmax(a, axis=-1):
        return a - _sps.logsumexp(a, axis=axis, keepdims=True)

    @staticmethod
    def softmax(a, axis=-1):
        return _sps.softmax(a, axis=axis)

    @staticmethod
    def lgamma(a):
        return _sps.gammaln(a)

    @staticmethod
    def sigmoid(a):
        return _sps.expit(a)

    @staticmethod
    def one_hot(idx, n, dtype=_np.float32):
        idx = _np.asarray(idx, dtype=_np.int64)
        out = _np.zeros(idx.shape + (n,), dtype=dtype)
        _np.put_along_axis(out.reshape(-1, n), idx.reshape(-1, 1), 1, axis=-1)
        return out

    cholesky = staticmethod(_np.linalg.cholesky)

    @staticmethod
    def tri_solve_lower(L, b):
        """Solve L x = b for lower-triangular L; b has shape (..., k)."""
        return _np.linalg.solve(L, b[..., None])[..., 0]


class _JaxBackend:
    name = "jax"
    np = _jnp

    pi = _np.pi
    inf = _np.inf
    nan = _np.nan

    asarray = staticmethod(lambda x, dtype=None: _jnp.asarray(x, dtype=dtype))
    exp = staticmethod(_jnp.exp)
    log = staticmethod(_jnp.log)
    log1p = staticmethod(_jnp.log1p)
    expm1 = staticmethod(_jnp.expm1)
    sqrt = staticmethod(_jnp.sqrt)
    abs = staticmethod(_jnp.abs)
    floor = staticmethod(_jnp.floor)
    ceil = staticmethod(_jnp.ceil)
    round = staticmethod(_jnp.round)
    clip = staticmethod(_jnp.clip)
    where = staticmethod(_jnp.where)
    sum = staticmethod(_jnp.sum)
    prod = staticmethod(_jnp.prod)
    max = staticmethod(_jnp.max)
    min = staticmethod(_jnp.min)
    maximum = staticmethod(_jnp.maximum)
    minimum = staticmethod(_jnp.minimum)
    sin = staticmethod(_jnp.sin)
    cos = staticmethod(_jnp.cos)
    tan = staticmethod(_jnp.tan)
    arctan = staticmethod(_jnp.arctan)
    tanh = staticmethod(_jnp.tanh)
    arctanh = staticmethod(_jnp.arctanh)
    sign = staticmethod(_jnp.sign)
    isnan = staticmethod(_jnp.isnan)
    isinf = staticmethod(_jnp.isinf)
    full_like = staticmethod(_jnp.full_like)
    zeros_like = staticmethod(_jnp.zeros_like)
    ones_like = staticmethod(_jnp.ones_like)
    broadcast_arrays = staticmethod(_jnp.broadcast_arrays)
    broadcast_to = staticmethod(_jnp.broadcast_to)
    squeeze = staticmethod(_jnp.squeeze)
    reshape = staticmethod(_jnp.reshape)
    stack = staticmethod(_jnp.stack)
    arange = staticmethod(_jnp.arange)
    take_along_axis = staticmethod(_jnp.take_along_axis)
    cumsum = staticmethod(_jnp.cumsum)
    argmax = staticmethod(_jnp.argmax)
    searchsorted = staticmethod(_jnp.searchsorted)

    erf = staticmethod(_jsps.erf)
    erfc = staticmethod(_jsps.erfc)
    erfinv = staticmethod(_jsps.erfinv)
    gammaln = staticmethod(_jsps.gammaln)
    betaln = staticmethod(_jsps.betaln)
    digamma = staticmethod(_jsps.digamma)

    @staticmethod
    def trigamma(a):
        return _jsps.polygamma(1, a)

    i0 = staticmethod(_jsps.i0)
    i1 = staticmethod(_jsps.i1)
    i0e = staticmethod(_jsps.i0e)
    xlogy = staticmethod(_jsps.xlogy)
    xlog1py = staticmethod(_jsps.xlog1py)
    gammainc = staticmethod(_jsps.gammainc)
    ndtr = staticmethod(_jsps.ndtr)
    ndtri = staticmethod(_jsps.ndtri)

    @staticmethod
    def logsumexp(a, axis=None, b=None, keepdims=False):
        return _jsps.logsumexp(a, axis=axis, b=b, keepdims=keepdims)

    log_softmax = staticmethod(jax.nn.log_softmax)
    softmax = staticmethod(jax.nn.softmax)
    lgamma = staticmethod(_jsps.gammaln)
    sigmoid = staticmethod(jax.nn.sigmoid)

    @staticmethod
    def one_hot(idx, n, dtype=_jnp.float32):
        return jax.nn.one_hot(idx, n, dtype=dtype)

    @staticmethod
    def _use_blocked_linalg(n):
        # XLA:TPU's cholesky/triangular-solve expanders run an unblocked
        # masked column loop whose VPU traffic dominates at large N
        # (BASELINE.md GP studies).  ops/blocked_linalg recasts ~all the
        # FLOPs as batched MXU GEMMs; LAPACK wins on CPU, so gate to TPU
        # and large event sizes.  PYPROB_TPU_BLOCKED_CHOL=0 disables.
        import os

        if os.environ.get("PYPROB_TPU_BLOCKED_CHOL", "1") == "0":
            return False
        return n >= 128 and jax.default_backend() == "tpu"

    @staticmethod
    def cholesky(a):
        n = _jnp.shape(a)[-1] if _jnp.ndim(a) >= 2 else 0
        if _JaxBackend._use_blocked_linalg(n):
            from .ops.blocked_linalg import blocked_cholesky

            return blocked_cholesky(a)
        return _jnp.linalg.cholesky(a)

    @staticmethod
    def tri_solve_lower(L, b):
        n = _jnp.shape(L)[-1] if _jnp.ndim(L) >= 2 else 0
        if _JaxBackend._use_blocked_linalg(n):
            from .ops.blocked_linalg import solve_lower_vec

            return solve_lower_vec(L, b)
        import jax.scipy.linalg as _jsl

        return _jsl.solve_triangular(L, b[..., None], lower=True)[..., 0]


NUMPY = _NumpyBackend()
JAX = _JaxBackend()


def _is_jax(x) -> bool:
    return isinstance(x, (jax.Array, jax.core.Tracer))


def of(*args):
    """Pick the backend namespace from argument types.

    Any JAX array or tracer among the (flattened) args selects the jnp
    backend; otherwise numpy.  Python scalars alone -> numpy (host path).
    """
    for a in args:
        if a is None:
            continue
        if _is_jax(a):
            return JAX
        if isinstance(a, (list, tuple)):
            for b in a:
                if _is_jax(b):
                    return JAX
    return NUMPY


def is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)
