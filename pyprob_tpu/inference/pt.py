"""Parallel tempering (replica exchange) over the program's continuous
latent sites.

Beyond parity: none of the reference's engines (pyprob/util.py:49-53)
can mix between separated posterior modes — single-site MH random walks
and (our) HMC/NUTS gradients both stay inside the mode basin they start
in.  Parallel tempering runs K replicas of the chain against a ladder of
tempered targets

    pi_k(z)  ∝  prior(z) · likelihood(z)^beta_k ,   0 = beta_0 < ... < beta_{K-1} = 1

and periodically proposes swapping configurations between adjacent
temperatures (general tempered-energy acceptance
min(1, exp(E_i(z_i)+E_j(z_j)-E_i(z_j)-E_j(z_i))), which reduces to
min(1, exp((beta_i - beta_j)(L_j - L_i))) without discrete
marginalization).  Hot replicas (small beta) see a nearly-flat
likelihood and roam freely between modes; swap moves transport those
jumps down the ladder to the cold beta=1 replica, whose samples are the
posterior draws.

TPU mapping: a whole ensemble of K replicas advances in lockstep — the
within-replica HMC move is ``vmap``ed over the temperature axis, the
even/odd alternating swap sweep is a gather/scatter on the replica
arrays, C independent ensembles are ``vmap``ed on top and sharded over
the mesh, and the full run is ONE compiled dispatch.  Each replica
adapts its own step size (dual averaging) and diagonal mass matrix
(windowed Welford) against its own tempered target.

Enumerable discrete sites (Categorical/Bernoulli) are marginalized
per-combo: the tempered target is pi_b ∝ sum_d exp(lp_d + b*ll_d) —
exact even when continuous sites' parameters depend on the discrete
latent; other discrete sites and untraceable models are rejected with
pointers to LMH/RMH (PT has no interpreter tier — gradients need XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import util
from .hmc import (
    _functionalize,
    _gradient_mcmc_posterior,
    _da_init,
    _warmup_adapt,
    _welford_init,
    _make_program_dispatch,
)

_pt_cache = {}


def vectorized_pt_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    num_chains=None,
    burn_in=None,
    thinning_steps=None,
    num_temperatures=None,
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
    """Parallel-tempering posterior: C vmapped ensembles x K tempered
    replicas x scanned transitions, one compiled dispatch.  Returns an
    Empirical of the cold (beta=1) replicas' samples with acceptance and
    swap-rate metadata, or None if the model is not jax-traceable."""
    if num_temperatures is None:
        num_temperatures = 8
    if num_temperatures < 2:
        raise ValueError(
            "PARALLEL_TEMPERING needs num_temperatures >= 2 (a single "
            "temperature is plain HMC — use HAMILTONIAN_MONTE_CARLO)"
        )
    if leapfrog_steps is None:
        leapfrog_steps = 10
    if target_accept is None:
        target_accept = 0.75
    if num_chains is None and initial_state is None:
        # ensembles cost K replica moves per kept sample — default to
        # fewer, longer chains than plain HMC (warm starts take their
        # ensemble count from the state)
        num_chains = int(min(max(1, num_traces // 1024), 256))
    return _gradient_mcmc_posterior(
        model=model,
        engine_name="PARALLEL_TEMPERING",
        engine_label="PT",
        builder=lambda obs_arrays, results_only: _build_pt(
            model,
            obs_arrays,
            likelihood_importance,
            int(num_temperatures),
            int(leapfrog_steps),
            float(target_accept),
            results_only,
            args,
            kwargs,
        ),
        builder_cache=_pt_cache,
        cache_key_extra=(
            int(num_temperatures),
            int(leapfrog_steps),
            float(target_accept),
        ),
        metadata_extra={
            "num_temperatures": int(num_temperatures),
            "leapfrog_steps": int(leapfrog_steps),
        },
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


def _build_pt(model, obs_arrays, likelihood_importance, num_temperatures,
              leapfrog_steps, target_accept, results_only, args, kwargs):
    """Build (program, decode_fn, sites) for the shared driver."""
    fm = _functionalize(
        model, obs_arrays, likelihood_importance, results_only,
        "PARALLEL_TEMPERING", args, kwargs,
    )
    encode_single, decode_single, dim, sites = (
        fm.encode_single, fm.decode_single, fm.dim, fm.sites
    )
    f32 = util.dtype()
    K = num_temperatures
    # quadratic ladder: dense near beta=1 where the target changes fastest
    betas = jnp.asarray(
        [(k / (K - 1)) ** 2 for k in range(K)], f32
    )

    potential_parts = fm.potential_parts

    def pot_of(lp, ll, b):
        """Tempered potential from per-combo vectors: pi_b ∝ sum_k
        exp(lp_k + b*ll_k).  Exact for continuous sites whose parameters
        depend on enumerated discrete latents (G=1 without them)."""
        return -jax.scipy.special.logsumexp(lp + b * ll)

    def pot_beta(z_vec, beta, obs):
        lp, ll = potential_parts(z_vec, obs)
        return pot_of(lp, ll, beta), (lp, ll)

    grad_pot_beta = jax.value_and_grad(pot_beta, has_aux=True)

    def replica_hmc_move(z, lp, ll, g, beta, da, inv_mass, key, t,
                         burn_in, obs):
        """One HMC transition against the beta-tempered target."""
        k_mom, k_acc = jax.random.split(key)
        eps = jnp.exp(jnp.where(t < burn_in, da[1], da[2]))
        p0 = jax.random.normal(k_mom, (dim,), f32) / jnp.sqrt(inv_mass)

        def kinetic(p):
            return 0.5 * jnp.sum(inv_mass * p * p)

        u = pot_of(lp, ll, beta)
        p = p0 - 0.5 * eps * g
        zl, gl = z, g
        lp_l, ll_l = lp, ll
        u_new = u
        for i in range(leapfrog_steps):
            zl = zl + eps * inv_mass * p
            (u_new, (lp_l, ll_l)), gl = grad_pot_beta(zl, beta, obs)
            scale = 0.5 * eps if i == leapfrog_steps - 1 else eps
            p = p - scale * gl
        log_alpha = (u - u_new) + (kinetic(p0) - kinetic(p))
        log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
        accept = jnp.log(jax.random.uniform(k_acc, (), f32)) < log_alpha
        z = jnp.where(accept, zl, z)
        g = jnp.where(accept, gl, g)
        lp = jnp.where(accept, lp_l, lp)
        ll = jnp.where(accept, ll_l, ll)
        alpha = jnp.minimum(1.0, jnp.exp(log_alpha))
        return z, lp, ll, g, alpha

    # fresh scan-body per program trace: lax.scan caches jaxprs by
    # function identity, so a shared closure over mutable boxes would leak
    # stale tracers into retraces (see hmc.make_chain_step)
    def make_chain_step(obs, burn_in):
        def chain_step(carry, t):
            """One ensemble transition: K replica HMC moves + one
            alternating swap sweep.  Z [K, D]; LP, LL [K, G]; G [K, D];
            per-replica adaptation states."""
            (Z, LP, LL, G, da, inv_mass, wf, key, acc_sum, swap_sum,
             swap_n) = carry
            key, k_moves, k_swap = jax.random.split(key, 3)
            move_keys = jax.random.split(k_moves, K)

            Z, LP, LL, G, alphas = jax.vmap(
                replica_hmc_move,
                in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None),
            )(Z, LP, LL, G, betas, da, inv_mass, move_keys, t, burn_in, obs)

            # ---- even/odd alternating swap sweep ------------------------
            # pairs (k, k+1) with k ≡ t (mod 2); general tempered-energy
            # acceptance (exact with discrete marginalization):
            # log a = [E_k(z_k) + E_{k+1}(z_{k+1})]
            #       - [E_k(z_{k+1}) + E_{k+1}(z_k)]
            ks = jnp.arange(K - 1)
            active = (ks % 2) == (t % 2)
            E_self = jax.vmap(pot_of)(LP, LL, betas)  # [K]
            E_lo_hi = jax.vmap(pot_of)(
                LP[ks + 1], LL[ks + 1], betas[ks]
            )  # neighbor's config at the lower temperature
            E_hi_lo = jax.vmap(pot_of)(
                LP[ks], LL[ks], betas[ks + 1]
            )
            log_a = (E_self[ks] + E_self[ks + 1]) - (E_lo_hi + E_hi_lo)
            us = jax.random.uniform(k_swap, (K - 1,), f32)
            do_swap = active & (jnp.log(us) < log_a)
            # permutation: start with identity, swap accepted pairs (disjoint
            # by the parity scheme)
            perm = jnp.arange(K)
            perm = perm.at[ks].set(jnp.where(do_swap, ks + 1, perm[ks]))
            perm = perm.at[ks + 1].set(jnp.where(do_swap, ks, perm[ks + 1]))
            Z = Z[perm]
            LP = LP[perm]
            LL = LL[perm]
            # cached gradient moved with the configuration, but it was taken
            # at the *old* beta — recombine: grad = g_pr + beta*g_lik is not
            # separable from the combined cache, so recompute in one vmapped
            # pass (cost: 1/leapfrog_steps extra grads)
            (unused, unused2), G = jax.vmap(
                grad_pot_beta, in_axes=(0, 0, None)
            )(Z, betas, obs)

            # ---- per-replica warmup adaptation --------------------------
            da, wf, inv_mass = _warmup_adapt(
                da, wf, inv_mass, Z, alphas, t, burn_in, target_accept,
                batched=True,
            )
            post = ~(t < burn_in)
            acc_sum = acc_sum + jnp.where(post, alphas[K - 1], 0.0)
            n_active = jnp.sum(active.astype(f32))
            swap_sum = swap_sum + jnp.where(
                post, jnp.sum((do_swap).astype(f32)), 0.0
            )
            swap_n = swap_n + jnp.where(post, n_active, 0.0)
            return (
                Z, LP, LL, G, da, inv_mass, wf, key, acc_sum, swap_sum,
                swap_n,
            ), Z[K - 1]

        return chain_step

    def program(init_keys, chain_keys, obs, burn_in, total_steps, eps0,
                init=None):
        chain_step = make_chain_step(obs, burn_in)
        if init is None:
            C = init_keys.shape[0]
            # independent prior inits for every replica of every ensemble
            all_init = jax.vmap(
                lambda k: jax.vmap(encode_single, in_axes=(0, None))(
                    jax.random.split(k, K), obs
                )
            )(init_keys)  # [C, K, D]
            inv_mass0 = jnp.ones((C, K, dim), f32)
            eps0_rep = jnp.full((C, K), eps0, f32)
        else:
            # warm start: the stored replica ladder; LP/LL/G recompute, so
            # a changed observation is rescored automatically
            all_init, inv_mass0, eps0_rep = init

        LP0, LL0 = jax.vmap(
            jax.vmap(potential_parts, in_axes=(0, None)), in_axes=(0, None)
        )(all_init, obs)
        (unused, unused2), G0 = jax.vmap(
            lambda Zk: jax.vmap(grad_pot_beta, in_axes=(0, 0, None))(
                Zk, betas, obs
            )
        )(all_init)

        def one_ensemble(Z, LP, LL, G, key, inv_mass_init, eps_init):
            carry0 = (
                Z,
                LP,
                LL,
                G,
                jax.vmap(_da_init)(eps_init),
                inv_mass_init,
                jax.vmap(lambda _: _welford_init(dim))(jnp.arange(K)),
                key,
                jnp.zeros((), f32),
                jnp.zeros((), f32),
                jnp.zeros((), f32),
            )
            (
                (Z_fin, _, _, _, da, inv_mass_fin, _, _, acc_sum, swap_sum,
                 swap_n),
                zs,
            ) = jax.lax.scan(chain_step, carry0, jnp.arange(total_steps))
            return (
                zs, acc_sum, swap_sum, swap_n, jnp.exp(da[2]), Z_fin,
                inv_mass_fin,
            )

        (zs, acc_sums, swap_sums, swap_ns, final_eps, Z_fin,
         inv_mass_fin) = jax.vmap(one_ensemble)(
            all_init, LP0, LL0, G0, chain_keys, inv_mass0, eps0_rep
        )
        zs = jnp.swapaxes(zs, 0, 1)  # [C, T, D] -> [T, C, D]
        post_steps = jnp.maximum(total_steps - burn_in, 1)
        return zs, {
            "acceptance_rate": jnp.mean(acc_sums) / post_steps,
            "final_step_size": jnp.mean(final_eps[:, K - 1]),
            "swap_acceptance_rate": jnp.sum(swap_sums)
            / jnp.maximum(jnp.sum(swap_ns), 1.0),
        }, (Z_fin, inv_mass_fin, final_eps)

    decode_fn = jax.jit(jax.vmap(decode_single, in_axes=(0, 0, None)))
    dispatch = _make_program_dispatch(program)
    dispatch.latent_dim = dim
    dispatch.state_rank = 3  # warm-start ladder: z [C, K, D]
    return dispatch, decode_fn, sites
