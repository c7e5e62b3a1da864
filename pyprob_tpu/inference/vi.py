"""Automatic-differentiation variational inference over the program's
continuous latents (ADVI, arXiv:1603.00788).

Beyond parity: the reference's engines (pyprob/util.py:49-53) are
simulation-based only — VI is impossible in its imperative per-trace
interpreter.  Here the same functionalized-replay machinery that powers
HMC (pyprob_tpu/inference/hmc.py) makes the joint density a pure,
differentiable function of the unconstrained latents, so a Gaussian
guide can be fitted by reparameterized ELBO gradients.

Design:
- Latents map to UNCONSTRAINED space with the HMC transforms
  (sigmoid for bounded supports, exp for positive supports, identity
  otherwise) and are raveled into one flat D-vector.
- Guides: ``meanfield`` — diagonal Gaussian (mu, log_sigma);
  ``fullrank`` — Gaussian with a dense lower-triangular scale L
  (softplus-free: free strictly-lower entries + exp'd diagonal), which
  captures posterior correlations mean-field cannot; ``flow`` — a
  RealNVP normalizing flow (alternating-mask affine coupling layers
  over a meanfield base, zero-initialized to the identity), which
  captures curved/non-Gaussian posteriors no Gaussian family can —
  couplings invert in closed form so the IS reweighting stays exact.
- The Gaussian ELBOs use the closed-form entropy (lower variance than
  a sampled -log q term; the flow ELBO samples -log q) and are
  maximized by optax.adam inside ONE ``lax.scan`` — the entire fit is
  a single compiled dispatch.
- The returned posterior is *importance-reweighted*: the final
  ``num_traces`` draws from the fitted guide carry weights
  ``log p(x,obs) - log q(x)``, so the Empirical is a self-normalized
  importance sampler whose proposal is the guide — asymptotically exact
  even when the guide is imperfect, with ``posterior.log_evidence`` an
  unbiased-ish (IS) marginal-likelihood estimate alongside the ELBO.

Enumerable discrete sites (Categorical/Bernoulli) are marginalized out
of the ELBO (shared `_functionalize` machinery) and drawn from their
exact conditional p(d | z, obs) in the returned posterior; other
discrete sites and untraceable models are rejected with pointers to
LMH/RMH (VI has no interpreter tier — gradients need XLA).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from .. import util
from ..vectorized import _TraceabilityCache
from .hmc import _functionalize  # shared flat-latent machinery

_LOG_2PI = float(np.log(2.0 * np.pi))
_FLOW_LAYERS = 6

_vi_cache = {}


def vectorized_vi_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    vi_steps=None,
    vi_particles=None,
    guide=None,
    learning_rate=None,
    likelihood_importance=1.0,
    mesh=None,
    args=(),
    kwargs=None,
):
    """Fit a Gaussian guide by ADVI, then return an importance-reweighted
    Empirical of ``num_traces`` guide draws.  Returns None if the model is
    not jax-traceable (VI has no interpreter tier)."""
    if _TraceabilityCache.known_untraceable(model):
        return None
    if not observe:
        raise RuntimeError("VARIATIONAL_INFERENCE requires observe={...} values")
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    t0 = time.time()
    if vi_steps is None:
        vi_steps = 1500
    if vi_particles is None:
        vi_particles = 32
    if guide is None:
        guide = "meanfield"
    if guide not in ("meanfield", "fullrank", "flow"):
        raise ValueError(
            f"guide must be 'meanfield', 'fullrank' or 'flow', got {guide!r}"
        )
    if learning_rate is None:
        learning_rate = 0.05

    obs_arrays = {k: jnp.asarray(v, util.dtype()) for k, v in observe.items()}
    results_only = getattr(map_func, "__name__", "") == "trace_result"
    cacheable = not args and not kwargs
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        guide,
        int(vi_particles),
        results_only,
    )

    try:
        if cacheable and cache_key in _vi_cache:
            built = _vi_cache[cache_key]
        else:
            built = _build_vi(
                model,
                obs_arrays,
                likelihood_importance,
                guide,
                int(vi_particles),
                results_only,
                args,
                kwargs,
            )
            if cacheable:
                _vi_cache[cache_key] = built
        fit_fn, draw_fn, init_fn, sites, dim = built

        params0 = init_fn(util.next_key(), obs_arrays)
        params, elbo_hist = fit_fn(
            int(vi_steps),
            float(learning_rate),
            params0,
            util.next_key(),
            obs_arrays,
        )
        draw_keys = util.next_keys(num_traces)
        if mesh is None and len(jax.devices()) > 1:
            from ..parallel import data_parallel_mesh

            mesh = data_parallel_mesh()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import pad_to_multiple

            n_pad = pad_to_multiple(num_traces, mesh.size)
            draw_keys = util.next_keys(n_pad)
            draw_keys = jax.device_put(
                draw_keys, NamedSharding(mesh, P("dp"))
            )
        outputs, log_w = draw_fn(params, draw_keys, obs_arrays)
        host = jax.device_get(outputs)
        log_w = np.asarray(
            jax.device_get(log_w), dtype=np.float64
        )[:num_traces]
        elbo_hist = np.asarray(jax.device_get(elbo_hist), dtype=np.float64)
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
            f"({type(e).__name__}); VARIATIONAL_INFERENCE has no "
            f"interpreter tier."
        )
        _TraceabilityCache.mark(model, False)
        return None
    _TraceabilityCache.mark(model, True)

    final_elbo = float(elbo_hist[-1]) if len(elbo_hist) else float("nan")
    # IS estimate of the marginal likelihood from the reweighted draws
    with np.errstate(over="ignore"):
        m = np.max(log_w)
        log_evidence = float(
            m + np.log(np.mean(np.exp(log_w - m)))
        ) if np.isfinite(m) else float("-inf")

    from ..vectorized import materialize_empirical

    emp = materialize_empirical(
        sites, host, num_traces, map_func, results_only, file_name,
        log_weights=log_w,
    )

    duration = time.time() - t0
    emp.log_evidence = log_evidence
    ess = float(emp.effective_sample_size)
    emp.rename(
        f"Posterior, VI ({guide}, D={dim}, {vi_steps} steps, "
        f"ELBO {final_elbo:.3f}), IS-reweighted draws: {emp.length:,}, "
        f"ESS: {ess:,.2f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine="InferenceEngine.VARIATIONAL_INFERENCE",
        guide=guide,
        latent_dim=dim,
        vi_steps=int(vi_steps),
        vi_particles=int(vi_particles),
        learning_rate=float(learning_rate),
        final_elbo=final_elbo,
        log_evidence=log_evidence,
        effective_sample_size=ess,
        vectorized=True,
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[VI] {guide} guide over {dim} latent dim(s): ELBO "
            f"{final_elbo:.3f} after {vi_steps} steps, {emp.length:,} "
            f"reweighted draws (ESS {ess:,.1f}) in {duration:.3f}s"
        )
    return emp


def _build_vi(model, obs_arrays, likelihood_importance, guide, vi_particles,
              results_only, args, kwargs):
    """Build (fit_fn, draw_fn, init_fn, sites, dim).

    fit_fn(vi_steps, lr, params, key, obs) -> (params, elbo_history)
    draw_fn(params, keys [N], obs) -> (decoded outputs, log_w [N])
    init_fn(key, obs) -> initial guide params
    """
    fm = _functionalize(
        model, obs_arrays, likelihood_importance, results_only,
        "VARIATIONAL_INFERENCE", args, kwargs,
    )
    sites, dim = fm.sites, fm.dim
    encode_single = fm.encode_single
    n_tril = dim * (dim - 1) // 2
    tril_rows, tril_cols = np.tril_indices(dim, k=-1)

    def log_joint(z_vec, obs):
        """log p(x(z), obs) + log|dx/dz| as a pure function of flat z —
        with enumerable discrete sites marginalized out, so the guide
        covers only the continuous latents."""
        return -fm.potential(z_vec, obs)

    # ---- guide: sample z and its log-density from params -----------------
    if guide == "meanfield":

        def guide_sample(params, eps):
            mu, log_sigma = params["mu"], params["log_sigma"]
            return mu + jnp.exp(log_sigma) * eps

        def guide_entropy(params):
            return jnp.sum(params["log_sigma"]) + 0.5 * dim * (1.0 + _LOG_2PI)

        def guide_log_prob(params, z_vec):
            mu, log_sigma = params["mu"], params["log_sigma"]
            r = (z_vec - mu) * jnp.exp(-log_sigma)
            return -0.5 * jnp.sum(r * r) - jnp.sum(log_sigma) \
                - 0.5 * dim * _LOG_2PI

        def make_params(mu0):
            return {
                "mu": mu0,
                "log_sigma": jnp.full((dim,), -1.0, util.dtype()),
            }

    elif guide == "fullrank":

        def _scale_tril(params):
            L = jnp.zeros((dim, dim), util.dtype())
            if n_tril:
                L = L.at[tril_rows, tril_cols].set(params["tril"])
            return L + jnp.diag(jnp.exp(params["log_diag"]))

        def guide_sample(params, eps):
            return params["mu"] + _scale_tril(params) @ eps

        def guide_entropy(params):
            return jnp.sum(params["log_diag"]) + 0.5 * dim * (1.0 + _LOG_2PI)

        def guide_log_prob(params, z_vec):
            L = _scale_tril(params)
            r = jax.scipy.linalg.solve_triangular(
                L, z_vec - params["mu"], lower=True
            )
            return -0.5 * jnp.sum(r * r) - jnp.sum(params["log_diag"]) \
                - 0.5 * dim * _LOG_2PI

        def make_params(mu0):
            return {
                "mu": mu0,
                "log_diag": jnp.full((dim,), -1.0, util.dtype()),
                "tril": jnp.zeros((n_tril,), util.dtype()),
            }

    else:  # flow: RealNVP coupling stack over a meanfield base
        n_layers = _FLOW_LAYERS
        hidden = max(32, 2 * dim)
        masks = [
            jnp.asarray(
                [(j + l) % 2 for j in range(dim)], util.dtype()
            )
            for l in range(n_layers)
        ]

        def _st(layer, x_masked):
            """Scale/shift nets of one coupling layer (tanh-bounded scale
            for stability; identity at zero-initialized output layer)."""
            h = jnp.tanh(x_masked @ layer["w1"] + layer["b1"])
            out = h @ layer["w2"] + layer["b2"]
            return jnp.tanh(out[:dim]) * 2.0, out[dim:]

        def guide_sample_logq(params, eps):
            z = params["mu"] + jnp.exp(params["log_sigma"]) * eps
            log_q = (
                -0.5 * jnp.sum(eps * eps)
                - 0.5 * dim * _LOG_2PI
                - jnp.sum(params["log_sigma"])
            )
            for l, layer in enumerate(params["layers"]):
                m = masks[l]
                s, t = _st(layer, z * m)
                z = m * z + (1.0 - m) * (z * jnp.exp(s) + t)
                log_q = log_q - jnp.sum((1.0 - m) * s)
            return z, log_q

        def guide_sample(params, eps):
            return guide_sample_logq(params, eps)[0]

        guide_entropy = None  # no closed form: ELBO uses sampled -log q

        def guide_log_prob(params, z_vec):
            """Exact density via the inverse flow (couplings invert in
            closed form) — keeps the IS reweighting exact."""
            z = z_vec
            logdet = jnp.zeros((), util.dtype())
            for l in reversed(range(n_layers)):
                m = masks[l]
                s, t = _st(params["layers"][l], z * m)
                z = m * z + (1.0 - m) * ((z - t) * jnp.exp(-s))
                logdet = logdet + jnp.sum((1.0 - m) * s)
            eps = (z - params["mu"]) * jnp.exp(-params["log_sigma"])
            return (
                -0.5 * jnp.sum(eps * eps)
                - 0.5 * dim * _LOG_2PI
                - jnp.sum(params["log_sigma"])
                - logdet
            )

        def make_params(mu0):
            wkeys = jax.random.split(jax.random.PRNGKey(7), n_layers)
            layers = [
                {
                    # zero output layer -> every coupling starts as the
                    # identity, so the flow begins as the meanfield guide
                    "w1": 0.01
                    * jax.random.normal(k, (dim, hidden), util.dtype()),
                    "b1": jnp.zeros((hidden,), util.dtype()),
                    "w2": jnp.zeros((hidden, 2 * dim), util.dtype()),
                    "b2": jnp.zeros((2 * dim,), util.dtype()),
                }
                for k in wkeys
            ]
            return {
                "mu": mu0,
                "log_sigma": jnp.full((dim,), -1.0, util.dtype()),
                "layers": layers,
            }

    @jax.jit
    def init_fn(key, obs):
        # initialize the guide mean at the encoded image of a prior draw
        return make_params(encode_single(key, obs))

    if guide_entropy is None:

        def neg_elbo(params, key, obs):
            eps = jax.random.normal(key, (vi_particles, dim), util.dtype())
            z, log_q = jax.vmap(
                lambda e: guide_sample_logq(params, e)
            )(eps)
            lj = jax.vmap(lambda zv: log_joint(zv, obs))(z)
            return -jnp.mean(lj - log_q)

    else:

        def neg_elbo(params, key, obs):
            eps = jax.random.normal(key, (vi_particles, dim), util.dtype())
            z = jax.vmap(lambda e: guide_sample(params, e))(eps)
            lj = jax.vmap(lambda zv: log_joint(zv, obs))(z)
            return -(jnp.mean(lj) + guide_entropy(params))

    grad_neg_elbo = jax.value_and_grad(neg_elbo)

    _fit_cache = {}

    def fit_fn(vi_steps, lr, params, key, obs):
        # compile one scan program per (vi_steps, lr) pair
        sig = (int(vi_steps), float(lr))
        if sig not in _fit_cache:
            opt = optax.adam(float(lr))

            def run(params, key, obs):
                # step is defined INSIDE run: lax.scan caches jaxprs by
                # function identity, so the body must be a fresh object
                # per trace (obs is a closure constant here)
                def step(carry, k):
                    p, opt_state = carry
                    loss, g = grad_neg_elbo(p, k, obs)
                    updates, opt_state = opt.update(g, opt_state, p)
                    p = optax.apply_updates(p, updates)
                    return (p, opt_state), -loss

                keys = jax.random.split(key, int(vi_steps))
                (p, _), elbos = jax.lax.scan(
                    step, (params, opt.init(params)), keys
                )
                return p, elbos

            _fit_cache[sig] = jax.jit(run)
        return _fit_cache[sig](params, key, obs)

    def draw_one(params, key, obs):
        k_eps, k_dec = jax.random.split(key)
        eps = jax.random.normal(k_eps, (dim,), util.dtype())
        if guide == "flow":
            # the forward pass already yields log q — skip the inverse
            z_vec, log_q = guide_sample_logq(params, eps)
        else:
            z_vec = guide_sample(params, eps)
            log_q = guide_log_prob(params, z_vec)
        out = fm.decode_single(z_vec, k_dec, obs)
        # self-normalized IS weight against the marginalized joint (any
        # discrete sites in `out` are exact-conditional draws given z)
        log_w = log_joint(z_vec, obs) - log_q
        return out, log_w

    draw_fn = jax.jit(jax.vmap(draw_one, in_axes=(None, 0, None)))
    return fit_fn, draw_fn, init_fn, sites, dim
