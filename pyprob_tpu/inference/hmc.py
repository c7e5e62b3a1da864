"""Hamiltonian Monte Carlo over the program's continuous latent sites.

Beyond parity: the reference's engines are IS/IC/LMH/RMH
(pyprob/util.py:49-53) — gradient-based inference is impossible there
because its trace core is an imperative per-trace interpreter.  Here the
functionalized replay machinery makes the whole model a differentiable
map from latent values to joint density: replaying forward() with every
controlled site substituted turns ``log_prob_total`` into a pure function
of the latents, and ``jax.grad`` differentiates through the program —
including through distribution parameters that depend on earlier sites.

Latents live in UNCONSTRAINED space: bounded supports (Uniform,
TruncatedNormal, Beta incl. low/high rescaling) map through a scaled
sigmoid, positive supports (Exponential, Gamma, Weibull, LogNormal)
through exp, with log-Jacobians folded into the potential.  Discrete
sites with enumerable support (Categorical/Bernoulli) are marginalized
out of the potential (logsumexp over the support grid) and redrawn from
their exact conditional p(d | z, obs) at decode time; other discrete
sites are rejected with a pointer to LMH/RMH.

The sampler runs C chains in lockstep (``vmap``) advanced by ``lax.scan``
— one compiled dispatch for the entire run — with Stan-style warmup:
dual-averaging step-size adaptation (arXiv:1111.4246 §3.2) toward a
target acceptance rate plus a diagonal mass matrix estimated by Welford
accumulation over the middle warmup window, so ill-scaled posteriors are
preconditioned automatically.
"""

from __future__ import annotations

import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .. import state, util
from ..util import TraceMode, InferenceEngine
from ..distributions import (
    Normal,
    Uniform,
    Beta,
    TruncatedNormal,
    Exponential,
    Gamma,
    Weibull,
    LogNormal,
    Laplace,
    StudentT,
    VonMises,
    MultivariateNormal,
    Mixture,
    Empirical,
    Cauchy,
    HalfCauchy,
    HalfNormal,
    Gumbel,
    Logistic,
    Chi2,
    Dirichlet,
    LKJCholesky,
    InverseGamma,
    Pareto,
)
from ..vectorized import VectorizedHandler, SiteRecord, run_traced, _TraceabilityCache

_BOUNDED = (Uniform, TruncatedNormal, Beta)
_POSITIVE = (Exponential, Gamma, Weibull, LogNormal, HalfNormal, HalfCauchy,
             Chi2, InverseGamma)
_UNBOUNDED = (Normal, Laplace, StudentT, VonMises, MultivariateNormal, Mixture,
              Cauchy, Gumbel, Logistic)


def _stick_offsets(k):
    """Stan's stick-breaking offsets: z_i = 0 maps to the uniform simplex."""
    return -jnp.log(jnp.arange(k - 1, 0, -1, dtype=util.dtype()))


def _simplex_to_x(z):
    """Stick-breaking: z (..., K-1) unconstrained -> x (..., K) on the
    simplex, plus the summed log|dx/dz| (Stan reference manual §10.7).
    Computed in log space so tiny sticks stay finite."""
    k = z.shape[-1] + 1
    zs = z + _stick_offsets(k)
    log_u = jax.nn.log_sigmoid(zs)
    log_1mu = jax.nn.log_sigmoid(-zs)
    # log remainder before each stick: [0, cumsum(log(1-u))]
    log_rem = jnp.concatenate(
        [jnp.zeros(z.shape[:-1] + (1,), util.dtype()),
         jnp.cumsum(log_1mu, -1)],
        -1,
    )
    x = jnp.concatenate(
        [jnp.exp(log_u + log_rem[..., :-1]), jnp.exp(log_rem[..., -1:])], -1
    )
    logdet = jnp.sum(log_u + log_1mu + log_rem[..., :-1])
    return x, logdet


def _simplex_to_z(x):
    """Inverse stick-breaking: x (..., K) -> z (..., K-1)."""
    k = x.shape[-1]
    head = x[..., :-1]
    rem = 1.0 - jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), util.dtype()),
         jnp.cumsum(head[..., :-1], -1)],
        -1,
    )
    u = jnp.clip(head / jnp.clip(rem, 1e-30, None), 1e-6, 1.0 - 1e-6)
    return jnp.log(u) - jnp.log1p(-u) - _stick_offsets(k)


def _chol_corr_to_x(z, d):
    """z (d(d-1)/2,) -> lower-Cholesky factor L of a correlation matrix
    via tanh canonical partial correlations (Stan manual §10.12), plus
    the summed log|dL/dz|.  The index loops unroll at trace time (d is
    static), so the compiled program is straight-line VPU code."""
    rows = [
        jnp.concatenate(
            [jnp.ones((1,), util.dtype()), jnp.zeros((d - 1,), util.dtype())]
        )
    ]
    logdet = jnp.zeros((), util.dtype())
    idx = 0
    for i in range(1, d):
        entries = []
        s = jnp.zeros((), util.dtype())
        for j in range(i):
            w = jnp.tanh(z[idx])
            rem = jnp.clip(1.0 - s, 1e-30, None)
            l = w * jnp.sqrt(rem)
            # dL_ij/dz_idx = sqrt(rem) * sech^2 = sqrt(rem) * (1 - w^2)
            logdet = logdet + 0.5 * jnp.log(rem) + jnp.log1p(-(w * w))
            s = s + l * l
            entries.append(l)
            idx += 1
        diag = jnp.sqrt(jnp.clip(1.0 - s, 1e-30, None))
        pad = jnp.zeros((d - 1 - i,), util.dtype())
        rows.append(jnp.concatenate([jnp.stack(entries), diag[None], pad]))
    return jnp.stack(rows), logdet


def _chol_corr_to_z(L, d):
    """Inverse: L -> the d(d-1)/2 unconstrained partial correlations."""
    out = []
    for i in range(1, d):
        s = jnp.zeros((), util.dtype())
        for j in range(i):
            rem = jnp.clip(1.0 - s, 1e-30, None)
            w = jnp.clip(
                L[i, j] / jnp.sqrt(rem), -1.0 + 1e-6, 1.0 - 1e-6
            )
            out.append(jnp.arctanh(w))
            s = s + L[i, j] * L[i, j]
    return jnp.stack(out)


def _unconstrained_shape(dist, x_shape):
    """Shape of a site's unconstrained image (simplex sites drop a dim;
    Cholesky-correlation sites ravel to d(d-1)/2)."""
    if isinstance(dist, Dirichlet):
        return tuple(x_shape[:-1]) + (x_shape[-1] - 1,)
    if isinstance(dist, LKJCholesky):
        if len(x_shape) != 2:
            raise NotImplementedError(
                "batched LKJCholesky sample sites are not supported in the "
                "gradient engines — sample one factor per site"
            )
        d = x_shape[-1]
        return (d * (d - 1) // 2,)
    return tuple(x_shape)


def _to_x(dist, z):
    """Unconstrained z -> support x, plus summed log|dx/dz|."""
    if isinstance(dist, Dirichlet):
        return _simplex_to_x(z)
    if isinstance(dist, LKJCholesky):
        return _chol_corr_to_x(z, dist.dim)
    if isinstance(dist, _BOUNDED):
        low = jnp.asarray(dist.low, util.dtype())
        high = jnp.asarray(dist.high, util.dtype())
        x = low + (high - low) * jax.nn.sigmoid(z)
        logdet = jnp.sum(
            jnp.log(high - low)
            + jax.nn.log_sigmoid(z)
            + jax.nn.log_sigmoid(-z)
        )
        return x, logdet
    if isinstance(dist, _POSITIVE):
        return jnp.exp(z), jnp.sum(z)
    if isinstance(dist, Pareto):
        # lower-bounded at scale m > 0: x = m * exp(z)
        m = jnp.asarray(dist.scale, util.dtype())
        x = m * jnp.exp(z)
        return x, jnp.sum(z + jnp.log(m))
    if isinstance(dist, _UNBOUNDED):
        return z, jnp.zeros((), util.dtype())
    raise NotImplementedError(
        f"HAMILTONIAN_MONTE_CARLO requires continuous sample sites; "
        f"{dist.name} is not supported — use LMH/RMH for discrete "
        f"latents."
    )


def _to_z(dist, x):
    """Support x -> unconstrained z (chain initialization)."""
    if isinstance(dist, Dirichlet):
        return _simplex_to_z(x)
    if isinstance(dist, LKJCholesky):
        return _chol_corr_to_z(x, dist.dim)
    if isinstance(dist, _BOUNDED):
        low = jnp.asarray(dist.low, util.dtype())
        high = jnp.asarray(dist.high, util.dtype())
        u = jnp.clip((x - low) / (high - low), 1e-6, 1.0 - 1e-6)
        return jnp.log(u) - jnp.log1p(-u)
    if isinstance(dist, _POSITIVE):
        return jnp.log(jnp.clip(x, 1e-30, None))
    if isinstance(dist, Pareto):
        m = jnp.asarray(dist.scale, util.dtype())
        return jnp.log(jnp.clip(x / m, 1.0 + 1e-6, None))
    if isinstance(dist, _UNBOUNDED):
        return x
    raise NotImplementedError(dist.name)


class _TransformedReplayHandler(VectorizedHandler):
    """Replay every controlled site from unconstrained values (decode), or
    record the unconstrained image of given support values (encode).
    Addresses in ``discrete`` are replayed verbatim (integer support — no
    transform, no Jacobian); their density still enters log_prob_total, so
    enumeration over a discrete grid marginalizes them exactly."""

    def __init__(
        self,
        key,
        observed,
        root_function_name,
        replay,
        encode=False,
        likelihood_importance=1.0,
        discrete=frozenset(),
    ):
        super().__init__(
            key=key,
            trace_mode=TraceMode.POSTERIOR,
            inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
            observed=observed,
            root_function_name=root_function_name,
            likelihood_importance=likelihood_importance,
        )
        self._replay = replay
        self._encode = encode
        self._discrete = discrete
        self.logdet = jnp.zeros((), util.dtype())
        self.z_values = {}

    def sample(self, distribution, name=None, address=None, control=True,
               mask=None):
        # sample(mask=) is ignored here: scoring a masked-off latent
        # against its prior is exact marginalization (padding dims keep a
        # proper prior density, so the potential stays well-conditioned
        # instead of going flat along them)
        if name is not None and name in self.observed:
            return super().sample(
                distribution, name=name, address=address, control=control,
                mask=mask,
            )
        base, full, instance = self._make_address(
            address, distribution.address_suffix
        )
        if full in self._discrete:
            value = jnp.asarray(self._replay[full])
        elif self._encode:
            value = jnp.asarray(self._replay[full], util.dtype())
            self.z_values[full] = _to_z(distribution, value)
        else:
            value, ld = _to_x(distribution, self._replay[full])
            self.logdet = self.logdet + ld
        log_prob = distribution.log_prob(value, sum=True)
        self.log_prob_total = self.log_prob_total + log_prob
        self._record(
            SiteRecord(
                address_base=base,
                address=full,
                instance=instance,
                name=name,
                control=True,
                observed=False,
                tagged=False,
                distribution_name=distribution.name,
                distribution=distribution,
            ),
            value,
            log_prob,
        )
        return value


def _run_transformed(model, key, obs, replay, encode, likelihood_importance,
                     args, kwargs, discrete=frozenset()):
    handler = _TransformedReplayHandler(
        key=key,
        observed=obs,
        root_function_name=model.forward.__code__.co_name,
        replay=replay,
        encode=encode,
        likelihood_importance=likelihood_importance,
        discrete=discrete,
    )
    prev = state._set_handler(handler)
    try:
        result = model.forward(*args, **(kwargs or {}))
    finally:
        state._set_handler(prev)
    return result, handler


_hmc_cache = {}


def vectorized_hmc_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    num_chains=None,
    burn_in=None,
    thinning_steps=None,
    leapfrog_steps=None,
    target_accept=None,
    step_size=None,
    likelihood_importance=1.0,
    mesh=None,
    return_chains=False,
    initial_state=None,
    args=(),
    kwargs=None,
):
    """HMC posterior: C vmapped chains x scanned transitions, one compiled
    dispatch.  Returns an Empirical of ``num_traces`` (uniform-weight)
    samples with acceptance-rate metadata (and ``final_gradient_state``
    for warm resumes), or None if the model is not jax-traceable (HMC has
    no interpreter tier — gradients need XLA)."""
    if leapfrog_steps is None:
        leapfrog_steps = 10
    if target_accept is None:
        target_accept = 0.75
    return _gradient_mcmc_posterior(
        model=model,
        engine_name="HAMILTONIAN_MONTE_CARLO",
        engine_label="HMC",
        builder=lambda obs_arrays, results_only: _build_hmc(
            model,
            obs_arrays,
            likelihood_importance,
            int(leapfrog_steps),
            float(target_accept),
            results_only,
            args,
            kwargs,
        ),
        builder_cache=_hmc_cache,
        cache_key_extra=(int(leapfrog_steps), float(target_accept)),
        metadata_extra={"leapfrog_steps": int(leapfrog_steps)},
        num_traces=num_traces,
        observe=observe,
        map_func=map_func,
        file_name=file_name,
        num_chains=num_chains,
        burn_in=burn_in,
        thinning_steps=thinning_steps,
        step_size=step_size,
        likelihood_importance=likelihood_importance,
        mesh=mesh,
        return_chains=return_chains,
        args=args,
        kwargs=kwargs,
        initial_state=initial_state,
    )


def _gradient_mcmc_posterior(
    model,
    engine_name,
    engine_label,
    builder,
    builder_cache,
    cache_key_extra,
    metadata_extra,
    num_traces,
    observe,
    map_func,
    file_name,
    num_chains,
    burn_in,
    thinning_steps,
    step_size,
    likelihood_importance,
    mesh,
    return_chains,
    args,
    kwargs,
    initial_state=None,
):
    """Shared driver for the gradient-based chain engines (HMC, NUTS):
    resolve chain geometry, run the compiled program (which returns kept
    unconstrained samples plus a stats dict and the chains' final
    adaptation state), decode, and materialize an Empirical (or per-chain
    Empiricals for ``return_chains``).  ``initial_state``: a
    ``GradientChainState`` from a previous run's
    ``posterior.final_gradient_state`` — resuming skips warmup by default
    and reuses the adapted step size / mass matrix."""
    if _TraceabilityCache.known_untraceable(model):
        return None
    if not observe:
        raise RuntimeError(f"{engine_name} requires observe={{...}} values")
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    t0 = time.time()
    if mesh is None and len(jax.devices()) > 1:
        from ..parallel import data_parallel_mesh

        mesh = data_parallel_mesh()
    if initial_state is not None:
        if num_chains is not None and num_chains != initial_state.num_chains:
            warnings.warn(
                f"num_chains={num_chains} ignored: the warm-start state "
                f"carries {initial_state.num_chains} chains."
            )
        num_chains = initial_state.num_chains
    elif num_chains is None:
        num_chains = int(min(max(1, num_traces // 256), 1024))
    if mesh is not None and initial_state is None:
        from ..parallel import pad_to_multiple

        num_chains = pad_to_multiple(num_chains, mesh.size)
    if burn_in is None:
        # warm start: the chains are already equilibrated and adapted
        burn_in = 0 if initial_state is not None else 200
    if thinning_steps is None:
        thinning_steps = 1
    if step_size is None:
        step_size = 0.1
    keep_steps = -(-num_traces // num_chains) * thinning_steps
    total_steps = burn_in + keep_steps

    obs_arrays = {
        k: jnp.asarray(v, util.dtype()) for k, v in observe.items()
    }
    results_only = getattr(map_func, "__name__", "") == "trace_result"
    cacheable = not args and not kwargs
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        results_only,
    ) + tuple(cache_key_extra)

    try:
        if cacheable and cache_key in builder_cache:
            program, decode_fn, sites = builder_cache[cache_key]
        else:
            program, decode_fn, sites = builder(obs_arrays, results_only)
            if cacheable:
                builder_cache[cache_key] = program, decode_fn, sites

        init = None
        if initial_state is not None:
            lat_dim = getattr(program, "latent_dim", None)
            if lat_dim is not None and initial_state.dim != lat_dim:
                raise RuntimeError(
                    f"warm-start state has latent dim {initial_state.dim} "
                    f"but the model's unconstrained space is {lat_dim}-"
                    f"dimensional"
                )
            rank = getattr(program, "state_rank", None)
            if rank is not None and initial_state.z.ndim != rank:
                raise RuntimeError(
                    f"warm-start state rank {initial_state.z.ndim} does "
                    f"not fit {engine_name} (expects rank {rank}: PT "
                    "carries a replica ladder [C, K, D]; HMC/NUTS carry "
                    "[C, D])"
                )
            init = (
                jnp.asarray(initial_state.z, util.dtype()),
                jnp.asarray(initial_state.inv_mass, util.dtype()),
                jnp.asarray(initial_state.step_size, util.dtype()),
            )
        init_keys = util.next_keys(num_chains)
        chain_keys = util.next_keys(num_chains)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("dp"))
            init_keys = jax.device_put(init_keys, shard)
            chain_keys = jax.device_put(chain_keys, shard)
            if init is not None:
                init = jax.device_put(init, shard)
        z_samples, stats, final_adapt = program(
            init_keys,
            chain_keys,
            obs_arrays,
            jnp.asarray(burn_in, jnp.int32),
            jnp.asarray(total_steps, jnp.int32),
            jnp.asarray(step_size, util.dtype()),
            init,
        )
        # [total_steps, C, ...] -> keep post-burn-in, thinned, then flatten
        # step-major (index = step * C + chain)
        keep_all = return_chains  # chain split needs the full K x C grid
        z_kept = jax.tree_util.tree_map(
            lambda a: a[burn_in::thinning_steps].reshape(
                (-1,) + a.shape[2:]
            )[: (None if keep_all else num_traces)],
            z_samples,
        )
        n_kept = int(jax.tree_util.tree_leaves(z_kept)[0].shape[0])
        decode_keys = util.next_keys(n_kept)
        outputs = decode_fn(z_kept, decode_keys, obs_arrays)
        host = jax.device_get(outputs)
        stats = {k: float(v) for k, v in jax.device_get(stats).items()}
        final_state = None
        if final_adapt is not None:
            z_fin, inv_mass_fin, eps_fin = jax.device_get(final_adapt)
            final_state = GradientChainState(
                z=np.asarray(z_fin),
                inv_mass=np.asarray(inv_mass_fin),
                step_size=np.asarray(eps_fin),
                engine_name=engine_name,
            )
    except NotImplementedError:
        raise
    except (
        jax.errors.ConcretizationTypeError,
        jax.errors.TracerArrayConversionError,
        jax.errors.TracerBoolConversionError,
        jax.errors.TracerIntegerConversionError,
    ) as e:
        util.log_print(
            f"[pyprob_tpu] model {model.name!r} is not jax-traceable "
            f"({type(e).__name__}); {engine_label} has no interpreter tier."
        )
        _TraceabilityCache.mark(model, False)
        return None
    _TraceabilityCache.mark(model, True)
    accept_rate = stats["acceptance_rate"]

    if return_chains:
        # one Empirical of kept result values per chain (step-major
        # flattening: index = step * C + chain) — feeds R-hat diagnostics
        leaves, treedef = jax.tree_util.tree_flatten(host["result"])
        leaves = [np.asarray(l) for l in leaves]
        kept_steps_out = leaves[0].shape[0] // num_chains
        chains_out = []
        for c in range(num_chains):
            vals = [
                jax.tree_util.tree_unflatten(
                    treedef, [l[k * num_chains + c] for l in leaves]
                )
                for k in range(kept_steps_out)
            ]
            chains_out.append(Empirical.from_arrays(vals))
        return chains_out

    from ..vectorized import materialize_empirical

    n_out = int(
        np.asarray(
            jax.tree_util.tree_leaves(host["log_prob_total"])[0]
        ).shape[0]
    )
    emp = materialize_empirical(
        sites, host, n_out, map_func, results_only, file_name
    )
    emp.final_gradient_state = final_state

    duration = time.time() - t0
    emp.rename(
        f"Posterior, {engine_label} (compiled, {num_chains} chains), "
        f"samples: {emp.length:,}, acceptance: {accept_rate:.2f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine=f"InferenceEngine.{engine_name}",
        num_chains=num_chains,
        burn_in=burn_in,
        thinning_steps=thinning_steps,
        acceptance_rate=accept_rate,
        final_step_size=stats["final_step_size"],
        vectorized=True,
        **metadata_extra,
        **{
            k: v
            for k, v in stats.items()
            if k not in ("acceptance_rate", "final_step_size")
        },
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[{engine_label}] {emp.length:,} samples ({num_chains} chains "
            f"x {total_steps} steps) in {duration:.3f}s, acceptance "
            f"{accept_rate:.2f}"
        )
    return emp


_MAX_ENUMERATION = 1024


class _FunctionalModel:
    """Flat-latent-vector closures shared by the gradient-based engines
    (HMC / NUTS / PT / VI):

    potential(z_vec [D], obs)      -> -log p(x(z), obs) - log|dx/dz|,
                                      with enumerable discrete sites
                                      marginalized out (logsumexp over
                                      the support grid)
    encode_single(key, obs)        -> z_vec of one fresh prior/IS draw
    decode_single(z_vec, key, obs) -> outputs dict (result, values,
                                      log_probs…); discrete sites are
                                      drawn from their exact conditional
                                      p(d | z, obs) using ``key``
    replay_logjoint(z_vec, combo, obs) -> un-marginalized log joint for
                                      one discrete combo (None = no
                                      discrete sites); used by engines
                                      that need density components (PT)
    plus dim, sites, unravel, discrete (address set), grid (dict of
    [G, ...] support arrays or None).
    """

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _functionalize(model, obs_arrays, likelihood_importance, results_only,
                   engine_name, args, kwargs):
    """Probe the model once and build its _FunctionalModel.

    Continuous latents are transformed to unconstrained space and raveled
    into one flat D-vector.  Discrete latents with enumerable support
    (Categorical / Bernoulli, grid capped at _MAX_ENUMERATION combos) are
    marginalized: the potential sums the joint over every support combo,
    so gradient-based engines work on mixed discrete-continuous programs
    — impossible in the reference, and beyond what most PPLs automate.
    """
    sites_box = []

    def fresh_single(key, obs):
        outputs, handler = run_traced(
            model,
            key,
            obs,
            TraceMode.POSTERIOR,
            InferenceEngine.IMPORTANCE_SAMPLING,
            likelihood_importance=likelihood_importance,
            args=args,
            kwargs=kwargs,
        )
        if not sites_box:
            sites_box.append(handler.sites)
        return outputs

    # static structure probe (also classifies latent sites)
    probe = jax.eval_shape(
        lambda k, o: fresh_single(k, o), jax.random.PRNGKey(0), obs_arrays
    )
    sites = sites_box[0]
    latent_addrs = [
        s.address for s in sites if s.control and not s.observed
    ]
    if not latent_addrs:
        raise RuntimeError(
            f"{engine_name} found no latent (controlled) sites"
        )
    cont_addrs, disc_addrs, disc_supports = [], [], {}
    if any(getattr(s, "rejection", False) for s in sites):
        raise NotImplementedError(
            f"{engine_name} does not support rejection_sample blocks "
            "(the acceptance indicator makes the potential discontinuous); "
            "use IS/IC/SMC or interpreter-tier LMH/RMH instead."
        )
    for s in sites:
        if s.address not in latent_addrs:
            continue
        dt = probe["values"][s.address].dtype
        # enumerable discrete first: Bernoulli samples are float-dtyped
        if s.distribution_name == "Categorical":
            disc_addrs.append(s.address)
            disc_supports[s.address] = int(s.distribution.num_categories)
        elif s.distribution_name == "Bernoulli":
            disc_addrs.append(s.address)
            disc_supports[s.address] = 2
        elif jnp.issubdtype(dt, jnp.floating):
            cont_addrs.append(s.address)
        else:
            raise NotImplementedError(
                f"{engine_name} requires continuous or enumerable "
                f"(Categorical/Bernoulli) sample sites; {s.address} "
                f"({s.distribution_name}) has dtype {dt} — use LMH/RMH "
                f"instead."
            )
    if not cont_addrs:
        raise RuntimeError(
            f"{engine_name} found no continuous latent sites (all-discrete "
            f"programs: use LMH/RMH or importance sampling)"
        )

    # enumeration grid over the product of discrete element supports
    if disc_addrs:
        elem_sizes = []
        for a in disc_addrs:
            shape = probe["values"][a].shape
            n_elem = int(np.prod(shape)) if shape else 1
            elem_sizes.extend([disc_supports[a]] * n_elem)
        n_combos = int(np.prod(elem_sizes))
        if n_combos > _MAX_ENUMERATION:
            raise NotImplementedError(
                f"{engine_name}: {n_combos} discrete support combinations "
                f"exceed the enumeration cap ({_MAX_ENUMERATION}) — use "
                f"LMH/RMH instead."
            )
        meshes = np.meshgrid(
            *[np.arange(n) for n in elem_sizes], indexing="ij"
        )
        flat_cols = [m.reshape(-1) for m in meshes]
        grid = {}
        e = 0
        for a in disc_addrs:
            shape = probe["values"][a].shape
            n_elem = int(np.prod(shape)) if shape else 1
            cols = np.stack(flat_cols[e : e + n_elem], axis=-1)
            grid[a] = jnp.asarray(
                cols.reshape((n_combos,) + tuple(shape)),
                probe["values"][a].dtype,
            )
            e += n_elem
    else:
        grid = None
    discrete_set = frozenset(disc_addrs)

    dist_by_addr = {s.address: s.distribution for s in sites}
    z_proto = {
        a: jnp.zeros(
            _unconstrained_shape(dist_by_addr[a], probe["values"][a].shape),
            util.dtype(),
        )
        for a in cont_addrs
    }
    _, unravel = ravel_pytree(z_proto)
    dim = int(ravel_pytree(z_proto)[0].shape[0])

    fixed_key = jax.random.PRNGKey(0)

    def encode_single(key, obs):
        out = fresh_single(key, obs)
        x = {a: out["values"][a] for a in latent_addrs}
        _, handler = _run_transformed(
            model, fixed_key, obs, x, True, likelihood_importance,
            args, kwargs, discrete=discrete_set,
        )
        z = {a: handler.z_values[a] for a in cont_addrs}
        return ravel_pytree(z)[0]

    def replay_logjoint(z_vec, combo, obs):
        replay = unravel(z_vec)
        if combo is not None:
            replay = {**replay, **combo}
        _, handler = _run_transformed(
            model, fixed_key, obs, replay, False,
            likelihood_importance, args, kwargs, discrete=discrete_set,
        )
        return handler.log_prob_total + handler.logdet

    def replay_logjoint_nojac(z_vec, combo, obs):
        """log p(x(z), obs) WITHOUT the transform log-Jacobian — the
        constrained-space density evaluated at x(z).  Used by MAP
        estimation (Stan `optimizing` convention: no Jacobian
        adjustment, so the mode is the constrained-space posterior
        mode)."""
        replay = unravel(z_vec)
        if combo is not None:
            replay = {**replay, **combo}
        _, handler = _run_transformed(
            model, fixed_key, obs, replay, False,
            likelihood_importance, args, kwargs, discrete=discrete_set,
        )
        return handler.log_prob_total

    if grid is None:

        def potential(z_vec, obs):
            return -replay_logjoint(z_vec, None, obs)

        def potential_nojac(z_vec, obs):
            return -replay_logjoint_nojac(z_vec, None, obs)

    else:

        def potential(z_vec, obs):
            ljs = jax.vmap(
                lambda c: replay_logjoint(z_vec, c, obs)
            )(grid)
            return -jax.scipy.special.logsumexp(ljs)

        def potential_nojac(z_vec, obs):
            ljs = jax.vmap(
                lambda c: replay_logjoint_nojac(z_vec, c, obs)
            )(grid)
            return -jax.scipy.special.logsumexp(ljs)

    def _parts_one(z_vec, combo, obs):
        """(log prior incl. |J| and discrete mass, log likelihood) for
        one discrete combo."""
        replay = unravel(z_vec)
        if combo is not None:
            replay = {**replay, **combo}
        _, handler = _run_transformed(
            model, fixed_key, obs, replay, False,
            likelihood_importance, args, kwargs, discrete=discrete_set,
        )
        ll = handler.log_prob_observed
        lp = handler.log_prob_total - ll + handler.logdet
        return lp, ll

    if grid is None:

        def potential_parts(z_vec, obs):
            """Per-discrete-combo (log prior [G], log lik [G]) vectors
            (G=1 without discrete sites).  The tempered engines (PT,
            tempered SMC) target pi_b(z) ∝ sum_k exp(lp_k + b*ll_k) —
            exact for any dependence of continuous sites on enumerated
            discrete latents — via pot_b = -logsumexp(lp + b*ll)."""
            lp, ll = _parts_one(z_vec, None, obs)
            return lp[None], ll[None]

    else:

        def potential_parts(z_vec, obs):
            lps, lls = jax.vmap(
                lambda c: _parts_one(z_vec, c, obs)
            )(grid)
            return lps, lls

    def decode_single(z_vec, key, obs):
        replay = unravel(z_vec)
        if grid is not None:
            # draw the discrete sites from their exact conditional
            # p(d | z, obs) ∝ exp(log joint(z, d))
            ljs = jax.vmap(
                lambda c: replay_logjoint(z_vec, c, obs)
            )(grid)
            gidx = jax.random.categorical(key, ljs)
            replay = {
                **replay,
                **{a: grid[a][gidx] for a in disc_addrs},
            }
        result, handler = _run_transformed(
            model, fixed_key, obs, replay, False,
            likelihood_importance, args, kwargs, discrete=discrete_set,
        )
        out = {
            "result": result,
            "log_prob_total": handler.log_prob_total,
            "log_importance_weight": handler.log_importance_weight,
            "log_prob_observed": handler.log_prob_observed,
            "values": {
                s.address: v
                for s, v in zip(handler.sites, handler.values)
                if v is not None
            },
            "log_probs": {
                s.address: lp
                for s, lp in zip(handler.sites, handler.log_probs)
                if lp is not None
            },
            "dist_leaves": {},
        }
        if results_only:
            out = {"result": out["result"], "log_prob_total": out["log_prob_total"]}
        return out

    return _FunctionalModel(
        potential=potential,
        potential_nojac=potential_nojac,
        potential_parts=potential_parts,
        encode_single=encode_single,
        decode_single=decode_single,
        replay_logjoint=replay_logjoint,
        dim=dim,
        sites=sites,
        unravel=unravel,
        discrete=discrete_set,
        grid=grid,
        disc_addrs=disc_addrs,
    )


# dual-averaging constants (arXiv:1111.4246 §3.2, Stan defaults)
_DA_GAMMA = 0.05
_DA_T0 = 10.0
_DA_KAPPA = 0.75


def _da_init(eps0):
    """(mu, log_eps, log_eps_bar, h_bar, m) dual-averaging state."""
    log_eps0 = jnp.log(eps0)
    return (
        log_eps0 + jnp.log(10.0),
        log_eps0,
        log_eps0,
        jnp.zeros((), util.dtype()),
        jnp.zeros((), util.dtype()),
    )


def _da_update(da, alpha, target_accept):
    mu, log_eps, log_eps_bar, h_bar, m = da
    m = m + 1.0
    h_bar = (1.0 - 1.0 / (m + _DA_T0)) * h_bar + (
        target_accept - alpha
    ) / (m + _DA_T0)
    log_eps = mu - jnp.sqrt(m) / _DA_GAMMA * h_bar
    w = m ** (-_DA_KAPPA)
    log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
    return (mu, log_eps, log_eps_bar, h_bar, m)


def _da_restart(da):
    """Restart averaging around the current step size (after a mass-matrix
    update the old average is for the wrong metric)."""
    mu, log_eps, _, _, _ = da
    return (
        log_eps + jnp.log(10.0),
        log_eps,
        log_eps,
        jnp.zeros((), util.dtype()),
        jnp.zeros((), util.dtype()),
    )


def _welford_init(dim):
    return (
        jnp.zeros((), util.dtype()),
        jnp.zeros((dim,), util.dtype()),
        jnp.zeros((dim,), util.dtype()),
    )


def _welford_update(wf, z):
    n, mean, m2 = wf
    n = n + 1.0
    delta = z - mean
    mean = mean + delta / n
    m2 = m2 + delta * (z - mean)
    return (n, mean, m2)


def _welford_variance(wf):
    """Regularized sample variance (Stan's shrinkage toward 1e-3)."""
    n, _, m2 = wf
    var = m2 / jnp.maximum(n - 1.0, 1.0)
    return jnp.where(
        n > 1.0,
        (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0)),
        jnp.ones_like(var),
    )


def _warmup_adapt(da, wf, inv_mass, z, alpha, t, burn_in, target_accept,
                  batched=False):
    """One step of the shared warmup schedule: dual-averaging step size
    during burn-in, Welford mass accumulation over the middle warmup
    window, mass committed + averaging restarted at the window end.
    ``batched=True`` adapts a leading axis of independent units (PT's
    temperature replicas).  Returns (da, wf, inv_mass)."""
    upd = (
        jax.vmap(_da_update, in_axes=(0, 0, None)) if batched else _da_update
    )
    wf_update = jax.vmap(_welford_update) if batched else _welford_update
    wf_var = jax.vmap(_welford_variance) if batched else _welford_variance
    restart = jax.vmap(_da_restart) if batched else _da_restart

    adapting = t < burn_in
    da_new = upd(da, alpha, target_accept)
    da = jax.tree_util.tree_map(
        lambda a, b: jnp.where(adapting, b, a), da, da_new
    )
    win_start = burn_in // 4
    win_end = (3 * burn_in) // 4
    in_window = (t >= win_start) & (t < win_end)
    wf_new = wf_update(wf, z)
    wf = jax.tree_util.tree_map(
        lambda a, b: jnp.where(in_window, b, a), wf, wf_new
    )
    set_mass = t == win_end
    inv_mass = jnp.where(set_mass, wf_var(wf), inv_mass)
    da = jax.tree_util.tree_map(
        lambda a, b: jnp.where(set_mass, b, a), da, restart(da)
    )
    return da, wf, inv_mass


class GradientChainState:
    """Warm-start snapshot of a gradient-engine run (HMC/NUTS): final
    unconstrained positions, the adapted diagonal mass matrix and the
    dual-averaged step size of every chain.  Returned as
    ``posterior.final_gradient_state`` and accepted via
    ``posterior(..., initial_trace=state)`` — resuming skips warmup
    (``burn_in`` defaults to 0) and rescoring against a CHANGED
    observation happens automatically (the potential/gradient at the
    stored positions are recomputed from the new traced observe values).
    Plain numpy arrays: pickles to disk."""

    def __init__(self, z, inv_mass, step_size, engine_name):
        # HMC/NUTS: z/inv_mass [C, D], step_size [C].  PT ensembles carry
        # the full replica ladder: z/inv_mass [C, K, D], step_size [C, K].
        self.z = np.asarray(z)
        self.inv_mass = np.asarray(inv_mass)
        self.step_size = np.asarray(step_size)
        self.engine_name = engine_name

    @property
    def num_chains(self):
        return int(self.z.shape[0])

    @property
    def dim(self):
        return int(self.z.shape[-1])

    def __repr__(self):
        return (
            f"GradientChainState({self.engine_name}, chains="
            f"{self.num_chains}, dim={self.dim}, mean step size "
            f"{float(np.mean(self.step_size)):.4g})"
        )


def _make_program_dispatch(program):
    """Per-(total_steps, warm) jit cache: scan lengths must be static, so
    each distinct total_steps compiles its own program (closing over the
    python int); the warm-start variant (``init`` carried positions/mass/
    step size) has a different argument structure and compiles separately.
    ``program(init_keys, chain_keys, obs, burn_in, total_steps:int, eps0,
    init)`` must treat total_steps as static."""
    cache = {}

    def dispatch(init_keys, chain_keys, obs, burn_in, total_steps, eps0,
                 init=None):
        n = int(total_steps)
        key = (n, init is not None)
        if key not in cache:

            def jitted(init_keys, chain_keys, obs, burn_in, eps0, init,
                       _n=n):
                return program(
                    init_keys, chain_keys, obs, burn_in, _n, eps0, init
                )

            cache[key] = jax.jit(jitted, static_argnames=())
        return cache[key](
            init_keys,
            chain_keys,
            obs,
            jnp.asarray(int(burn_in), jnp.int32),
            eps0,
            init,
        )

    return dispatch


def _build_hmc(model, obs_arrays, likelihood_importance, leapfrog_steps,
               target_accept, results_only, args, kwargs):
    """Build (program, decode_fn, sites) for _gradient_mcmc_posterior.

    program(init_keys [C], chain_keys [C], obs, burn_in, total_steps, eps0)
      -> (z samples [T, C, D], stats dict with at least
          'acceptance_rate' and 'final_step_size')
    decode_fn(z [S, D], keys [S], obs) -> outputs dict (result, values,
      log_probs, ...); the keys drive the exact-conditional redraw of
      enumerated discrete sites.
    """
    fm = _functionalize(
        model, obs_arrays, likelihood_importance, results_only,
        "HAMILTONIAN_MONTE_CARLO", args, kwargs,
    )
    potential, encode_single, decode_single, dim, sites = (
        fm.potential, fm.encode_single, fm.decode_single, fm.dim, fm.sites
    )
    grad_potential = jax.grad(potential)

    # NOTE: the scan body must be a FRESH function object per program
    # trace — lax.scan caches traced jaxprs by function identity, so a
    # shared closure reading obs/burn_in through mutable boxes would leak
    # stale tracers into the next trace (different total_steps/burn_in).
    def make_chain_step(obs, burn_in):
        def chain_step(carry, t):
            z, u, g, da, inv_mass, wf, key, acc_sum = carry
            key, k_mom, k_acc = jax.random.split(key, 3)
            # warmup uses the live step size; sampling uses the averaged one
            eps = jnp.exp(jnp.where(t < burn_in, da[1], da[2]))
            # p ~ N(0, M) with M^-1 = inv_mass (diagonal)
            p0 = jax.random.normal(k_mom, (dim,), util.dtype()) / jnp.sqrt(
                inv_mass
            )

            def kinetic(p):
                return 0.5 * jnp.sum(inv_mass * p * p)

            # leapfrog (static unroll; leapfrog_steps is small)
            p = p0 - 0.5 * eps * g
            zl, gl = z, g
            for i in range(leapfrog_steps):
                zl = zl + eps * inv_mass * p
                gl = grad_potential(zl, obs)
                scale = 0.5 * eps if i == leapfrog_steps - 1 else eps
                p = p - scale * gl
            u_new = potential(zl, obs)
            log_alpha = (u - u_new) + (kinetic(p0) - kinetic(p))
            log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
            accept = jnp.log(jax.random.uniform(k_acc, ())) < log_alpha
            z = jnp.where(accept, zl, z)
            u = jnp.where(accept, u_new, u)
            g = jnp.where(accept, gl, g)
            alpha = jnp.minimum(1.0, jnp.exp(log_alpha))

            da, wf, inv_mass = _warmup_adapt(
                da, wf, inv_mass, z, alpha, t, burn_in, target_accept
            )
            acc_sum = acc_sum + jnp.where(t < burn_in, 0.0, alpha)
            return (z, u, g, da, inv_mass, wf, key, acc_sum), z

        return chain_step

    def program(init_keys, chain_keys, obs, burn_in, total_steps, eps0,
                init=None):
        chain_step = make_chain_step(obs, burn_in)
        if init is None:
            z0 = jax.vmap(encode_single, in_axes=(0, None))(init_keys, obs)
            C = z0.shape[0]
            inv_mass0 = jnp.ones((C, dim), util.dtype())
            eps0_chain = jnp.full((C,), eps0, util.dtype())
        else:
            # warm start: stored positions/mass/step size; the potential
            # and gradient recompute below, so a changed observation is
            # rescored automatically
            z0, inv_mass0, eps0_chain = init
        u0 = jax.vmap(potential, in_axes=(0, None))(z0, obs)
        g0 = jax.vmap(grad_potential, in_axes=(0, None))(z0, obs)

        def one_chain(z, u, g, key, inv_mass_init, eps_init):
            carry0 = (
                z,
                u,
                g,
                _da_init(eps_init),
                inv_mass_init,
                _welford_init(dim),
                key,
                jnp.zeros((), util.dtype()),
            )
            (z_fin, _, _, da, inv_mass_fin, _, _, acc_sum), zs = (
                jax.lax.scan(chain_step, carry0, jnp.arange(total_steps))
            )
            return zs, acc_sum, jnp.exp(da[2]), z_fin, inv_mass_fin

        zs, acc_sums, final_eps, z_fin, inv_mass_fin = jax.vmap(one_chain)(
            z0, u0, g0, chain_keys, inv_mass0, eps0_chain
        )
        # zs: [C, T, D] -> [T, C, D]
        zs = jnp.swapaxes(zs, 0, 1)
        post_steps = jnp.maximum(total_steps - burn_in, 1)
        accept_rate = jnp.mean(acc_sums) / post_steps
        return zs, {
            "acceptance_rate": accept_rate,
            "final_step_size": jnp.mean(final_eps),
        }, (z_fin, inv_mass_fin, final_eps)

    decode_fn = jax.jit(jax.vmap(decode_single, in_axes=(0, 0, None)))
    dispatch = _make_program_dispatch(program)
    dispatch.latent_dim = dim
    dispatch.state_rank = 2  # warm-start state: z [C, D]
    return dispatch, decode_fn, sites
