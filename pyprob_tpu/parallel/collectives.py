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


def systematic_resample_indices(key, log_weights, num_samples):
    """Systematic (low-variance) resampling: indices into log_weights drawn
    with a single uniform offset across equally spaced points."""
    lw = jnp.ravel(log_weights)
    m = jnp.max(lw)
    w = jnp.exp(lw - m)
    w = w / jnp.sum(w)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ()) / num_samples
    points = u0 + jnp.arange(num_samples) / num_samples
    return jnp.searchsorted(cdf, points)
