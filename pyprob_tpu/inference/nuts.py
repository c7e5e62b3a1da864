"""No-U-Turn Sampler over the program's continuous latent sites.

Beyond parity: the reference's engines are IS/IC/LMH/RMH
(pyprob/util.py:49-53) — gradient-based inference is impossible in its
imperative per-trace interpreter.  NUTS (arXiv:1111.4246) extends the
HMC engine (pyprob_tpu/inference/hmc.py) with dynamic trajectory
lengths: each transition grows a balanced binary tree of leapfrog states
by doubling until the trajectory starts to double back (a "U-turn") or
the energy error diverges, then draws the next state multinomially from
the tree's leaves weighted by exp(-H).  No hand-tuned trajectory length.

Implementation notes (all one compiled dispatch, chains vmapped, steps
scanned — XLA-friendly control flow throughout):
- ITERATIVE tree building (no recursion): the doubling loop is a
  ``lax.while_loop``; each subtree of 2^j leaves is built by an inner
  ``lax.while_loop`` of single leapfrog steps.
- U-turn checks use online checkpointing: a leaf at even in-subtree
  index i stores its momentum and the running momentum sum at stack slot
  popcount(i>>1); a leaf at odd i checks the balanced spans that end at
  it (slots idx_max-trailing_ones(i)+1 .. idx_max) — exactly the checks
  the recursive formulation performs, with O(max_tree_depth) memory.
- Multinomial (not slice) sampling over leaves, with biased progressive
  sampling between the existing tree and each new subtree — the
  variant Stan uses.
- Warmup shares HMC's machinery: dual-averaging step size toward
  ``target_accept`` (default 0.8) plus a diagonal mass matrix from
  Welford accumulation over the middle warmup window.
- Divergent transitions (energy error > 1000) reject the subtree and
  are counted in ``posterior.metadata[-1]['divergences']``.

Enumerable discrete sites (Categorical/Bernoulli) are marginalized out
of the potential as in the HMC engine; other discrete sites and
untraceable models are rejected with pointers to LMH/RMH (NUTS has no
interpreter tier — gradients need XLA).
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

_DELTA_MAX = 1000.0

_nuts_cache = {}


def vectorized_nuts_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    num_chains=None,
    burn_in=None,
    thinning_steps=None,
    max_tree_depth=None,
    target_accept=None,
    step_size=None,
    likelihood_importance=1.0,
    mesh=None,
    return_chains=False,
    initial_state=None,
    args=(),
    kwargs=None,
):
    """NUTS posterior: C vmapped chains x scanned transitions, one
    compiled dispatch.  Returns an Empirical of ``num_traces``
    (uniform-weight) samples with acceptance/tree-depth/divergence
    metadata (and ``final_gradient_state`` for warm resumes), or None if
    the model is not jax-traceable."""
    if max_tree_depth is None:
        max_tree_depth = 10
    if target_accept is None:
        target_accept = 0.8
    return _gradient_mcmc_posterior(
        model=model,
        engine_name="NO_U_TURN_SAMPLER",
        engine_label="NUTS",
        builder=lambda obs_arrays, results_only: _build_nuts(
            model,
            obs_arrays,
            likelihood_importance,
            int(max_tree_depth),
            float(target_accept),
            results_only,
            args,
            kwargs,
        ),
        builder_cache=_nuts_cache,
        cache_key_extra=(int(max_tree_depth), float(target_accept)),
        metadata_extra={"max_tree_depth": int(max_tree_depth)},
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


def _trailing_ones(i):
    """Number of contiguous low set bits of int32 i (i=0b..0111 -> 3)."""
    ip1 = i + 1
    return jax.lax.population_count((ip1 & -ip1) - 1)


def _build_nuts(model, obs_arrays, likelihood_importance, max_tree_depth,
                target_accept, results_only, args, kwargs):
    """Build (program, decode_fn, sites) for the shared driver.

    program(init_keys [C], chain_keys [C], obs, burn_in, total_steps, eps0)
      -> (z samples [T, C, D], stats dict)
    """
    fm = _functionalize(
        model, obs_arrays, likelihood_importance, results_only,
        "NO_U_TURN_SAMPLER", args, kwargs,
    )
    potential, encode_single, decode_single, dim, sites = (
        fm.potential, fm.encode_single, fm.decode_single, fm.dim, fm.sites
    )
    grad_potential = jax.grad(potential)
    f32 = util.dtype()

    # fresh scan-body per program trace: lax.scan caches jaxprs by
    # function identity, so a shared closure over mutable boxes would leak
    # stale tracers into retraces (see hmc.make_chain_step)
    def make_chain_step(obs, burn_in):
        def chain_step(carry, t):
            (z, u, g, da, inv_mass, wf, key, acc_sum, depth_sum, div_sum) = carry
            key, k_mom, k_main = jax.random.split(key, 3)
            eps = jnp.exp(jnp.where(t < burn_in, da[1], da[2]))
            p0 = jax.random.normal(k_mom, (dim,), f32) / jnp.sqrt(inv_mass)

            def kinetic(p):
                return 0.5 * jnp.sum(inv_mass * p * p)

            def is_turning(p_first, p_last, rho):
                v = inv_mass * rho
                return (jnp.dot(v, p_first) <= 0.0) | (
                    jnp.dot(v, p_last) <= 0.0
                )

            def leapfrog(zc, pc, gc, d):
                # one step of size d*eps (d = ±1 selects the tree direction)
                ph = pc - 0.5 * d * eps * gc
                zn = zc + d * eps * inv_mass * ph
                gn = grad_potential(zn, obs)
                pn = ph - 0.5 * d * eps * gn
                return zn, pn, gn

            h0 = u + kinetic(p0)

            def build_subtree(j, d, z_e, p_e, g_e, key):
                """2^j leapfrog leaves from edge state (z_e, p_e, g_e) in
                direction d, with online balanced-span U-turn checks.  Returns
                the subtree summary dict."""
                num_leaves = jax.lax.shift_left(jnp.int32(1), j)
                st0 = {
                    "i": jnp.int32(0),
                    "z_e": z_e,
                    "p_e": p_e,
                    "g_e": g_e,
                    # subtree proposal (progressive multinomial over leaves)
                    "z_prop": z_e,
                    "u_prop": jnp.zeros((), f32),
                    "g_prop": g_e,
                    "log_sum_w": jnp.full((), -jnp.inf, f32),
                    "r_sum": jnp.zeros((dim,), f32),
                    "r_ckpts": jnp.zeros((max_tree_depth, dim), f32),
                    "r_sum_ckpts": jnp.zeros((max_tree_depth, dim), f32),
                    "turning": jnp.zeros((), bool),
                    "diverging": jnp.zeros((), bool),
                    "key": key,
                    "sum_alpha": jnp.zeros((), f32),
                    "n_alpha": jnp.zeros((), f32),
                }

                def cond(st):
                    return (
                        (st["i"] < num_leaves)
                        & ~st["turning"]
                        & ~st["diverging"]
                    )

                def body(st):
                    z_n, p_n, g_n = leapfrog(st["z_e"], st["p_e"], st["g_e"], d)
                    u_n = potential(z_n, obs)
                    h_n = u_n + kinetic(p_n)
                    h_n = jnp.where(jnp.isnan(h_n), jnp.inf, h_n)
                    log_w = h0 - h_n
                    diverging = (h_n - h0) > _DELTA_MAX
                    alpha = jnp.minimum(1.0, jnp.exp(log_w))

                    # progressive multinomial: replace the subtree proposal
                    # with this leaf w.p. w_leaf / w_subtree_so_far
                    key, k_sel = jax.random.split(st["key"])
                    new_lsw = jnp.logaddexp(st["log_sum_w"], log_w)
                    take = (
                        jnp.log(jax.random.uniform(k_sel, (), f32))
                        < log_w - new_lsw
                    )
                    z_prop = jnp.where(take, z_n, st["z_prop"])
                    u_prop = jnp.where(take, u_n, st["u_prop"])
                    g_prop = jnp.where(take, g_n, st["g_prop"])

                    i = st["i"]
                    r_sub = st["r_sum"] + p_n
                    ckpt_idx = jax.lax.population_count(
                        jax.lax.shift_right_logical(i, 1)
                    )
                    even = (i & 1) == 0
                    # even leaf: open new balanced spans — checkpoint state
                    r_ckpts = jnp.where(
                        even, st["r_ckpts"].at[ckpt_idx].set(p_n), st["r_ckpts"]
                    )
                    r_sum_ckpts = jnp.where(
                        even,
                        st["r_sum_ckpts"].at[ckpt_idx].set(r_sub),
                        st["r_sum_ckpts"],
                    )
                    # odd leaf: check every balanced span ending here
                    idx_max = ckpt_idx
                    idx_min = idx_max - _trailing_ones(i) + 1

                    def check_span(k, turn):
                        valid = (k >= idx_min) & (k <= idx_max)
                        rho = r_sub - r_sum_ckpts[k] + r_ckpts[k]
                        return turn | (
                            valid & is_turning(r_ckpts[k], p_n, rho)
                        )

                    turning = jnp.where(
                        even,
                        jnp.zeros((), bool),
                        jax.lax.fori_loop(
                            0, max_tree_depth, check_span, jnp.zeros((), bool)
                        ),
                    )
                    return {
                        "i": i + 1,
                        "z_e": z_n,
                        "p_e": p_n,
                        "g_e": g_n,
                        "z_prop": z_prop,
                        "u_prop": u_prop,
                        "g_prop": g_prop,
                        "log_sum_w": new_lsw,
                        "r_sum": r_sub,
                        "r_ckpts": r_ckpts,
                        "r_sum_ckpts": r_sum_ckpts,
                        "turning": turning,
                        "diverging": diverging,
                        "key": key,
                        "sum_alpha": st["sum_alpha"] + alpha,
                        "n_alpha": st["n_alpha"] + 1.0,
                    }

                return jax.lax.while_loop(cond, body, st0)

            # ---- main doubling loop -----------------------------------------
            main0 = {
                "j": jnp.int32(0),
                "key": k_main,
                "z_left": z,
                "p_left": p0,
                "g_left": g,
                "z_right": z,
                "p_right": p0,
                "g_right": g,
                "z_prop": z,
                "u_prop": u,
                "g_prop": g,
                "r_sum": p0,
                "log_sum_w": jnp.zeros((), f32),
                "done": jnp.zeros((), bool),
                "diverged": jnp.zeros((), bool),
                "sum_alpha": jnp.zeros((), f32),
                "n_alpha": jnp.zeros((), f32),
            }

            def main_cond(ms):
                return (ms["j"] < max_tree_depth) & ~ms["done"]

            def main_body(ms):
                key, k_dir, k_sub, k_acc = jax.random.split(ms["key"], 4)
                d = jnp.where(
                    jax.random.bernoulli(k_dir), jnp.float32(1.0), jnp.float32(-1.0)
                ).astype(f32)
                fwd = d > 0
                z_e = jnp.where(fwd, ms["z_right"], ms["z_left"])
                p_e = jnp.where(fwd, ms["p_right"], ms["p_left"])
                g_e = jnp.where(fwd, ms["g_right"], ms["g_left"])
                st = build_subtree(ms["j"], d, z_e, p_e, g_e, k_sub)
                ok = ~st["turning"] & ~st["diverging"]

                # biased progressive sampling between tree and new subtree
                take = (
                    jnp.log(jax.random.uniform(k_acc, (), f32))
                    < st["log_sum_w"] - ms["log_sum_w"]
                ) & ok
                z_prop = jnp.where(take, st["z_prop"], ms["z_prop"])
                u_prop = jnp.where(take, st["u_prop"], ms["u_prop"])
                g_prop = jnp.where(take, st["g_prop"], ms["g_prop"])

                # merge (only if the subtree is valid)
                r_sum = jnp.where(ok, ms["r_sum"] + st["r_sum"], ms["r_sum"])
                log_sum_w = jnp.where(
                    ok,
                    jnp.logaddexp(ms["log_sum_w"], st["log_sum_w"]),
                    ms["log_sum_w"],
                )
                upd = ok & fwd
                z_right = jnp.where(upd, st["z_e"], ms["z_right"])
                p_right = jnp.where(upd, st["p_e"], ms["p_right"])
                g_right = jnp.where(upd, st["g_e"], ms["g_right"])
                upd = ok & ~fwd
                z_left = jnp.where(upd, st["z_e"], ms["z_left"])
                p_left = jnp.where(upd, st["p_e"], ms["p_left"])
                g_left = jnp.where(upd, st["g_e"], ms["g_left"])

                turning_full = is_turning(p_left, p_right, r_sum)
                done = ~ok | turning_full
                return {
                    "j": ms["j"] + 1,
                    "key": key,
                    "z_left": z_left,
                    "p_left": p_left,
                    "g_left": g_left,
                    "z_right": z_right,
                    "p_right": p_right,
                    "g_right": g_right,
                    "z_prop": z_prop,
                    "u_prop": u_prop,
                    "g_prop": g_prop,
                    "r_sum": r_sum,
                    "log_sum_w": log_sum_w,
                    "done": done,
                    "diverged": ms["diverged"] | st["diverging"],
                    "sum_alpha": ms["sum_alpha"] + st["sum_alpha"],
                    "n_alpha": ms["n_alpha"] + st["n_alpha"],
                }

            ms = jax.lax.while_loop(main_cond, main_body, main0)
            z = ms["z_prop"]
            u = ms["u_prop"]
            g = ms["g_prop"]
            accept_stat = ms["sum_alpha"] / jnp.maximum(ms["n_alpha"], 1.0)

            da, wf, inv_mass = _warmup_adapt(
                da, wf, inv_mass, z, accept_stat, t, burn_in, target_accept
            )
            post = ~(t < burn_in)
            acc_sum = acc_sum + jnp.where(post, accept_stat, 0.0)
            depth_sum = depth_sum + jnp.where(post, ms["j"].astype(f32), 0.0)
            div_sum = div_sum + jnp.where(
                post & ms["diverged"], 1.0, 0.0
            )
            return (
                z, u, g, da, inv_mass, wf, key, acc_sum, depth_sum, div_sum,
            ), z

        return chain_step

    def program(init_keys, chain_keys, obs, burn_in, total_steps, eps0,
                init=None):
        chain_step = make_chain_step(obs, burn_in)
        if init is None:
            z0 = jax.vmap(encode_single, in_axes=(0, None))(init_keys, obs)
            C = z0.shape[0]
            inv_mass0 = jnp.ones((C, dim), f32)
            eps0_chain = jnp.full((C,), eps0, f32)
        else:
            # warm start (GradientChainState): stored positions/mass/step
            # size; potential/gradient recompute, so a changed observation
            # is rescored automatically
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
                jnp.zeros((), f32),
                jnp.zeros((), f32),
                jnp.zeros((), f32),
            )
            (
                (z_fin, _, _, da, inv_mass_fin, _, _, acc_sum, depth_sum,
                 div_sum),
                zs,
            ) = jax.lax.scan(chain_step, carry0, jnp.arange(total_steps))
            return (
                zs, acc_sum, depth_sum, div_sum, jnp.exp(da[2]), z_fin,
                inv_mass_fin,
            )

        (zs, acc_sums, depth_sums, div_sums, final_eps, z_fin,
         inv_mass_fin) = (
            jax.vmap(one_chain)(z0, u0, g0, chain_keys, inv_mass0,
                                eps0_chain)
        )
        zs = jnp.swapaxes(zs, 0, 1)  # [C, T, D] -> [T, C, D]
        post_steps = jnp.maximum(total_steps - burn_in, 1)
        return zs, {
            "acceptance_rate": jnp.mean(acc_sums) / post_steps,
            "final_step_size": jnp.mean(final_eps),
            "mean_tree_depth": jnp.mean(depth_sums) / post_steps,
            "divergences": jnp.sum(div_sums),
        }, (z_fin, inv_mass_fin, final_eps)

    decode_fn = jax.jit(jax.vmap(decode_single, in_axes=(0, 0, None)))
    dispatch = _make_program_dispatch(program)
    dispatch.latent_dim = dim
    dispatch.state_rank = 2  # warm-start state: z [C, D]
    return dispatch, decode_fn, sites
