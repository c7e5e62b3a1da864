"""Cross-device collectives for importance-weight math.

The reference normalizes weights and computes ESS on a single host with
torch Categorical logits (reference: pyprob/distributions/empirical.py:300,
pyprob/util.py:398).  On a mesh these become ``psum``-based fused
reductions over the sharded log-weight vector, and resampling becomes a
systematic (low-variance) index pick computable from an exclusive prefix
sum — all riding ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pooled_log_weight_stats(log_weights, axis_name=None):
    """Stable (logsumexp, logsumexp of squares, count) over the full
    (possibly sharded) log-weight vector.  Inside shard_map, pass the mesh
    axis name; outside, plain single-device reduction."""
    lw = jnp.ravel(log_weights)
    m = jnp.max(lw)
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    s1 = jnp.sum(jnp.exp(lw - m))
    s2 = jnp.sum(jnp.exp(2.0 * (lw - m)))
    n = jnp.asarray(lw.size, jnp.float32)
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        n = jax.lax.psum(n, axis_name)
    log_z = m + jnp.log(s1)
    log_z2 = 2.0 * m + jnp.log(s2)
    return log_z, log_z2, n


def sharded_effective_sample_size(log_weights, axis_name=None):
    """ESS = (sum w)^2 / sum w^2 as a fused collective."""
    log_z, log_z2, _ = pooled_log_weight_stats(log_weights, axis_name)
    return jnp.exp(2.0 * log_z - log_z2)


def _normalized_weights(log_weights):
    lw = jnp.ravel(log_weights)
    w = jnp.exp(lw - jnp.max(lw))
    return w / jnp.sum(w)


def systematic_resample_indices(key, log_weights, num_samples):
    """Systematic (low-variance) resampling: indices into log_weights drawn
    with a single uniform offset across equally spaced points."""
    cdf = jnp.cumsum(_normalized_weights(log_weights))
    u0 = jax.random.uniform(key, ()) / num_samples
    points = u0 + jnp.arange(num_samples) / num_samples
    # float32 cumsum can leave cdf[-1] < 1.0: clamp so host-side (numpy)
    # consumers never see an index == size (JAX gather would clamp anyway).
    return jnp.minimum(jnp.searchsorted(cdf, points), log_weights.size - 1)


def stratified_resample_indices(key, log_weights, num_samples):
    """Stratified resampling: one independent uniform per stratum
    [i/N, (i+1)/N) — slightly higher variance than systematic but with
    provably-nonnegative correlations (Douc et al. 2005)."""
    cdf = jnp.cumsum(_normalized_weights(log_weights))
    u = jax.random.uniform(key, (num_samples,))
    points = (u + jnp.arange(num_samples)) / num_samples
    return jnp.minimum(jnp.searchsorted(cdf, points), log_weights.size - 1)


def multinomial_resample_indices(key, log_weights, num_samples):
    """Multinomial (iid) resampling — the highest-variance baseline; the
    reference's Empirical sampling is the host analogue
    (pyprob/distributions/empirical.py:392-408)."""
    cdf = jnp.cumsum(_normalized_weights(log_weights))
    u = jax.random.uniform(key, (num_samples,))
    return jnp.minimum(
        jnp.searchsorted(cdf, u), log_weights.size - 1
    )


def residual_resample_indices(key, log_weights, num_samples):
    """Residual resampling: floor(N*w_i) deterministic copies of particle i,
    then multinomial draws from the normalized residuals for the remainder.
    Fixed-shape (XLA-friendly): position j takes the deterministic copy
    while j < sum(floor counts) and a residual draw otherwise."""
    w = _normalized_weights(log_weights)
    n = w.size
    nw = num_samples * w
    # Integer bookkeeping: float32 counts/cumsums lose exactness past ~2^24
    # particles, mis-assigning boundary positions between the deterministic
    # and residual regions.
    counts = jnp.floor(nw).astype(jnp.int32)
    det_total = jnp.sum(counts)
    det_cum = jnp.cumsum(counts)
    j = jnp.arange(num_samples)
    det_idx = jnp.minimum(
        jnp.searchsorted(det_cum, j, side="right"), n - 1
    )
    resid = nw - counts
    resid = resid / jnp.maximum(jnp.sum(resid), 1e-30)
    resid_cdf = jnp.cumsum(resid)
    u = jax.random.uniform(key, (num_samples,))
    resid_idx = jnp.minimum(jnp.searchsorted(resid_cdf, u), n - 1)
    return jnp.where(j < det_total, det_idx, resid_idx)


RESAMPLING_SCHEMES = {
    "systematic": systematic_resample_indices,
    "stratified": stratified_resample_indices,
    "residual": residual_resample_indices,
    "multinomial": multinomial_resample_indices,
}


def resample_indices(key, log_weights, num_samples, scheme="systematic"):
    """Dispatch over the four classic resampling schemes (variance order:
    systematic <= stratified <= residual < multinomial)."""
    try:
        fn = RESAMPLING_SCHEMES[scheme]
    except KeyError:
        raise ValueError(
            f"Unknown resampling scheme {scheme!r}; choose one of "
            f"{sorted(RESAMPLING_SCHEMES)}"
        ) from None
    return fn(key, log_weights, num_samples)
