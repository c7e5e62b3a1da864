"""Tempered SMC sampler (Del Moral, Doucet & Jasra 2006) over the
program's latent sites.

Beyond parity: a population of N particles is transported from the PRIOR
to the POSTERIOR along a likelihood-temperature ladder

    pi_b(z)  ∝  prior(z) · likelihood(z)^b ,     0 = b_0 < b_1 < ... < b_T = 1

where each next temperature is chosen ADAPTIVELY (bisection so the
incremental-weight effective sample size stays at ``resample_threshold``
of N), particles are systematically resampled every stage, and particle
diversity is restored by M Hamiltonian rejuvenation steps targeting the
current tempered density (step size tuned by dual averaging from the
observed acceptance).  The telescoping product of incremental-weight
means gives an unbiased marginal-likelihood estimate
(``posterior.log_evidence``) — the annealed counterpart of the
observe-sequence SMC engine (pyprob_tpu/inference/smc.py), and the
population counterpart of parallel tempering (pyprob_tpu/inference/pt.py):
like PT it crosses between separated posterior modes (particles spread
over all modes while b is small and are reweighted/rejuvenated as the
likelihood sharpens), but one pass also yields log Z.

TPU mapping: the whole anneal is ONE compiled dispatch — a
``lax.while_loop`` over stages (the ladder length is data-dependent),
bisection and ESS on the current log-likelihood vector, one gather for
resampling, and vmapped leapfrog rejuvenation; particles shard over the
mesh.  Enumerable discrete sites are marginalized exactly as in the
other gradient engines (the tempered likelihood is
[sum_d p(d) lik(z,d)]^b).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from ..vectorized import _TraceabilityCache
from ..parallel.collectives import RESAMPLING_SCHEMES, resample_indices
from .hmc import (
    _functionalize,
    _da_init,
    _da_update,
)

_tempered_cache = {}


def vectorized_tempered_smc_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    resample_threshold=0.5,
    resampling="systematic",
    rejuvenation_steps=None,
    leapfrog_steps=None,
    target_accept=None,
    step_size=None,
    max_stages=None,
    likelihood_importance=1.0,
    mesh=None,
    args=(),
    kwargs=None,
):
    """Anneal ``num_traces`` particles from prior to posterior; returns a
    uniform-weight Empirical with ``log_evidence``, or None if the model
    is not jax-traceable."""
    if _TraceabilityCache.known_untraceable(model):
        return None
    if not observe:
        raise RuntimeError("TEMPERED_SMC requires observe={...} values")
    if resampling not in RESAMPLING_SCHEMES:
        raise ValueError(
            f"Unknown resampling scheme {resampling!r}; choose one of "
            f"{sorted(RESAMPLING_SCHEMES)}"
        )
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    t0 = time.time()
    if rejuvenation_steps is None:
        rejuvenation_steps = 2
    if leapfrog_steps is None:
        leapfrog_steps = 10
    if target_accept is None:
        target_accept = 0.65
    if step_size is None:
        step_size = 0.1
    if max_stages is None:
        max_stages = 200
    if mesh is None and len(jax.devices()) > 1:
        from ..parallel import data_parallel_mesh

        mesh = data_parallel_mesh()
    n_particles = num_traces
    if mesh is not None:
        from ..parallel import pad_to_multiple

        n_particles = pad_to_multiple(num_traces, mesh.size)

    obs_arrays = {
        k: jnp.asarray(v, util.dtype()) for k, v in observe.items()
    }
    results_only = getattr(map_func, "__name__", "") == "trace_result"
    cacheable = not args and not kwargs
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        float(resample_threshold),
        str(resampling),
        int(rejuvenation_steps),
        int(leapfrog_steps),
        float(target_accept),
        int(max_stages),
        results_only,
    )

    try:
        if cacheable and cache_key in _tempered_cache:
            program, decode_fn, sites = _tempered_cache[cache_key]
        else:
            program, decode_fn, sites = _build_tempered_smc(
                model,
                obs_arrays,
                likelihood_importance,
                float(resample_threshold),
                int(rejuvenation_steps),
                int(leapfrog_steps),
                float(target_accept),
                int(max_stages),
                results_only,
                args,
                kwargs,
                resampling=resampling,
            )
            if cacheable:
                _tempered_cache[cache_key] = program, decode_fn, sites

        init_keys = util.next_keys(n_particles)
        decode_keys = util.next_keys(n_particles)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("dp"))
            init_keys = jax.device_put(init_keys, shard)
            decode_keys = jax.device_put(decode_keys, shard)
        z_final, stats = program(
            init_keys,
            util.next_key(),
            obs_arrays,
            jnp.asarray(step_size, util.dtype()),
        )
        outputs = decode_fn(z_final, decode_keys, obs_arrays)
        host = jax.device_get(outputs)
        stats = {k: float(v) for k, v in jax.device_get(stats).items()}
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
            f"({type(e).__name__}); TEMPERED_SMC has no interpreter tier."
        )
        _TraceabilityCache.mark(model, False)
        return None
    _TraceabilityCache.mark(model, True)

    from ..vectorized import materialize_empirical

    log_evidence = stats["log_evidence"]
    emp = materialize_empirical(
        sites, host, num_traces, map_func, results_only, file_name
    )

    duration = time.time() - t0
    emp.log_evidence = log_evidence
    n_stages = int(stats["stages"])
    emp.rename(
        f"Posterior, tempered SMC ({n_stages} adaptive stages), particles: "
        f"{emp.length:,}, log Z: {log_evidence:.3f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine="InferenceEngine.TEMPERED_SMC",
        stages=n_stages,
        final_beta=stats["final_beta"],
        log_evidence=log_evidence,
        acceptance_rate=stats["acceptance_rate"],
        final_step_size=stats["final_step_size"],
        resample_threshold=float(resample_threshold),
        resampling=resampling,
        rejuvenation_steps=int(rejuvenation_steps),
        leapfrog_steps=int(leapfrog_steps),
        vectorized=True,
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[tempered SMC] {emp.length:,} particles through {n_stages} "
            f"adaptive stages in {duration:.3f}s, log Z {log_evidence:.3f}, "
            f"rejuvenation acceptance {stats['acceptance_rate']:.2f}"
        )
    return emp


def _build_tempered_smc(model, obs_arrays, likelihood_importance,
                        resample_threshold, rejuvenation_steps,
                        leapfrog_steps, target_accept, max_stages,
                        results_only, args, kwargs,
                        resampling="systematic"):
    """Build (program, decode_fn, sites).

    program(init_keys [N], run_key, obs, eps0) -> (z_final [N, D], stats)
    """
    fm = _functionalize(
        model, obs_arrays, likelihood_importance, results_only,
        "TEMPERED_SMC", args, kwargs,
    )
    dim = fm.dim
    f32 = util.dtype()

    def pot_of(lp, ll, b):
        """Tempered potential from per-combo vectors: pi_b ∝ sum_k
        exp(lp_k + b*ll_k) — exact with discrete enumeration (G=1
        without discrete sites)."""
        return -jax.scipy.special.logsumexp(lp + b * ll)

    def pot_beta(z_vec, beta, obs):
        lp, ll = fm.potential_parts(z_vec, obs)
        return pot_of(lp, ll, beta), (lp, ll)

    grad_pot_beta = jax.value_and_grad(pot_beta, has_aux=True)

    def log_ess(w):
        """log ESS of unnormalized log-weights."""
        return 2.0 * jax.scipy.special.logsumexp(w) - \
            jax.scipy.special.logsumexp(2.0 * w)

    def program(init_keys, run_key, obs, eps0):
        n = init_keys.shape[0]
        log_target_ess = jnp.log(
            jnp.asarray(resample_threshold * n, f32)
        )
        z0 = jax.vmap(fm.encode_single, in_axes=(0, None))(init_keys, obs)
        (_, (LP0, LL0)), _ = jax.vmap(
            grad_pot_beta, in_axes=(0, None, None)
        )(z0, jnp.zeros((), f32), obs)

        def make_stage(obs):
            def stage(carry):
                (z, LP, LL, beta, log_Z, da, key, n_stages, acc_sum,
                 acc_n) = carry
                key, k_res, k_rej = jax.random.split(key, 3)

                # incremental log-weight of moving the temperature from
                # beta to b: logsumexp_k(lp+b*ll) - logsumexp_k(lp+beta*ll)
                cur = jax.scipy.special.logsumexp(
                    LP + beta * LL, axis=-1
                )

                def weights_at(b):
                    return (
                        jax.scipy.special.logsumexp(LP + b * LL, axis=-1)
                        - cur
                    )

                # ---- adaptive next temperature (bisection on ESS) ----
                def ess_at(b):
                    return log_ess(weights_at(b))

                full_ok = ess_at(jnp.ones((), f32)) >= log_target_ess

                def bis(_, lohi):
                    lo, hi = lohi
                    mid = 0.5 * (lo + hi)
                    ok = ess_at(mid) >= log_target_ess
                    return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

                lo, hi = jax.lax.fori_loop(
                    0, 26, bis, (beta, jnp.ones((), f32))
                )
                new_beta = jnp.where(full_ok, 1.0, 0.5 * (lo + hi))
                # guarantee progress even on pathological plateaus
                new_beta = jnp.maximum(new_beta, beta + 1e-5)
                new_beta = jnp.minimum(new_beta, 1.0)

                # ---- reweight + evidence increment + resample --------
                w = weights_at(new_beta)
                log_Z = log_Z + jax.scipy.special.logsumexp(w) - jnp.log(
                    jnp.asarray(n, f32)
                )
                idx = resample_indices(k_res, w, n, scheme=resampling)
                z, LP, LL = z[idx], LP[idx], LL[idx]

                # ---- M Hamiltonian rejuvenation steps at new_beta ----
                (_, _), G = jax.vmap(
                    grad_pot_beta, in_axes=(0, None, None)
                )(z, new_beta, obs)

                def hmc_once(z, LP, LL, G, key, eps):
                    def one(zp, lp, ll, g, k):
                        k_mom, k_acc = jax.random.split(k)
                        p0 = jax.random.normal(k_mom, (dim,), f32)
                        u = pot_of(lp, ll, new_beta)
                        p = p0 - 0.5 * eps * g
                        zl, gl = zp, g
                        lp_l, ll_l = lp, ll
                        u_new = u
                        for i in range(leapfrog_steps):
                            zl = zl + eps * p
                            (u_new, (lp_l, ll_l)), gl = grad_pot_beta(
                                zl, new_beta, obs
                            )
                            scale = (
                                0.5 * eps
                                if i == leapfrog_steps - 1
                                else eps
                            )
                            p = p - scale * gl
                        log_alpha = (u - u_new) + 0.5 * (
                            jnp.sum(p0 * p0) - jnp.sum(p * p)
                        )
                        log_alpha = jnp.where(
                            jnp.isnan(log_alpha), -jnp.inf, log_alpha
                        )
                        accept = (
                            jnp.log(jax.random.uniform(k_acc, (), f32))
                            < log_alpha
                        )
                        zp = jnp.where(accept, zl, zp)
                        lp = jnp.where(accept, lp_l, lp)
                        ll = jnp.where(accept, ll_l, ll)
                        g = jnp.where(accept, gl, g)
                        return zp, lp, ll, g, jnp.minimum(
                            1.0, jnp.exp(log_alpha)
                        )

                    keys = jax.random.split(key, z.shape[0])
                    return jax.vmap(one)(z, LP, LL, G, keys)

                for m in range(rejuvenation_steps):
                    k_rej, k_m = jax.random.split(k_rej)
                    eps = jnp.exp(da[1])
                    z, LP, LL, G, alphas = hmc_once(
                        z, LP, LL, G, k_m, eps
                    )
                    mean_alpha = jnp.mean(alphas)
                    da = _da_update(da, mean_alpha, target_accept)
                    acc_sum = acc_sum + mean_alpha
                    acc_n = acc_n + 1.0

                return (
                    z, LP, LL, new_beta, log_Z, da, key,
                    n_stages + 1, acc_sum, acc_n,
                )

            return stage

        def cond(carry):
            beta, n_stages = carry[3], carry[7]
            return (beta < 1.0) & (n_stages < max_stages)

        carry0 = (
            z0,
            LP0,
            LL0,
            jnp.zeros((), f32),
            jnp.zeros((), f32),
            _da_init(eps0),
            run_key,
            jnp.zeros((), jnp.int32),
            jnp.zeros((), f32),
            jnp.zeros((), f32),
        )
        (z, _, _, beta, log_Z, da, _, n_stages, acc_sum, acc_n) = (
            jax.lax.while_loop(cond, make_stage(obs), carry0)
        )
        return z, {
            "log_evidence": log_Z,
            "final_beta": beta,
            "stages": n_stages,
            "acceptance_rate": acc_sum / jnp.maximum(acc_n, 1.0),
            "final_step_size": jnp.exp(da[1]),
        }

    program = jax.jit(program)
    decode_fn = jax.jit(
        jax.vmap(fm.decode_single, in_axes=(0, 0, None))
    )
    return program, decode_fn, fm.sites
