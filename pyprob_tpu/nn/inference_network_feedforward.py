"""Feedforward inference network: per-address proposal heads fed directly
by the observe embedding (reference: pyprob/nn/inference_network_feedforward.py:11-98)."""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from .inference_network import InferenceNetwork
from .layers import num_params
from .proposals import (
    head_kind_for,
    event_dim_for,
    head_init,
    head_apply,
    prior_param_arrays,
)


class InferenceNetworkFeedForward(InferenceNetwork):
    def __init__(self, proposal_mixture_components=10, *args, **kwargs):
        super().__init__(network_type="InferenceNetworkFeedForward", *args, **kwargs)
        self._params["proposal"] = {}
        self._head_meta = {}  # address -> {"kind", "num_categories"}
        self._proposal_mixture_components = proposal_mixture_components

    def _subclass_state(self):
        return {
            "head_meta": self._head_meta,
            "proposal_mixture_components": self._proposal_mixture_components,
        }

    def _load_subclass_state(self, state):
        self._head_meta = state["head_meta"]
        self._proposal_mixture_components = state["proposal_mixture_components"]

    def _init_layers(self):
        pass

    def _polymorph(self, batch):
        """Create heads for new addresses
        (reference: inference_network_feedforward.py:21-51)."""
        layers_changed = False
        for sub_batch in batch.sub_batches:
            example_trace = sub_batch[0]
            for variable in example_trace.variables_controlled:
                address = self._head_key(variable.address)
                if address in self._params["proposal"]:
                    continue
                distribution = variable.distribution
                kind = head_kind_for(distribution)
                if kind is None:
                    raise RuntimeError(
                        f"Distribution currently unsupported: {distribution.name}"
                    )
                num_categories = (
                    distribution.num_categories if kind == "categorical" else None
                )
                self._params["proposal"][address] = head_init(
                    util.next_key(),
                    kind,
                    self._observe_embedding_dim,
                    mixture_components=self._proposal_mixture_components,
                    num_categories=num_categories,
                    event_dim=event_dim_for(distribution),
                )
                self._head_meta[address] = {
                    "kind": kind,
                    "num_categories": num_categories,
                }
                self._head_train_iterations.setdefault(address, 0)
                layers_changed = True
                util.log_print(
                    f"New layers, address: {util.truncate_str(address)}, "
                    f"distribution: {distribution.name}"
                )
        if layers_changed:
            n = num_params(self._params)
            util.log_print(
                f"Total addresses: {len(self._params['proposal']):,}, "
                f"parameters: {n:,}"
            )
            self._history_num_params.append(n)
            self._history_num_params_trace.append(self._total_train_traces)
        return layers_changed

    # ------------------------------------------------------------------
    def _pack_sub_batch(self, sub_batch):
        example = sub_batch[0]
        packed = {"obs": self._pack_observes(sub_batch), "steps": []}
        for t in range(example.length_controlled):
            values = jnp.asarray(
                np.stack(
                    [
                        np.asarray(tr.variables_controlled[t].value)
                        for tr in sub_batch
                    ]
                )
            )
            step = {
                "values": values,
                "prior": self._sub_batch_prior_params(sub_batch, t),
            }
            sm = self._sub_batch_step_mask(sub_batch, t)
            if sm is not None:
                step["mask"] = sm
            packed["steps"].append(step)
        return packed

    def _make_sub_batch_loss(self, sub_batch):
        example = sub_batch[0]
        addrs = tuple(v.address for v in example.variables_controlled)
        dist_names = tuple(
            v.distribution.name for v in example.variables_controlled
        )
        return self._make_loss_for(addrs, dist_names)

    def _loss_params_subset(self, addrs, dist_names):
        # only the keys the FF loss reads — polymorphing a new address
        # elsewhere must not retrace this trace type's compiled loss
        return {
            "observe": self._params["observe"],
            "observe_final": self._params["observe_final"],
            "proposal": {
                k: self._params["proposal"][k]
                for k in {self._head_key(a) for a in addrs}
            },
        }

    def _make_loss_for(self, addrs, dist_names):
        keys = tuple(self._head_key(a) for a in addrs)
        for addr in keys:
            if addr not in self._params["proposal"]:
                raise RuntimeError(
                    f"Address unknown by inference network: {addr}"
                )
        embed = self._embed_observe_pure

        def loss_fn(params, packed):
            emb = embed(params, packed["obs"])
            mask = packed.get("mask")
            total = jnp.zeros((), util.dtype())
            for t, addr in enumerate(keys):
                d = head_apply(
                    params["proposal"][addr], emb, packed["steps"][t]["prior"]
                )
                lp = d.log_prob(packed["steps"][t]["values"])
                lp = jnp.clip(lp, -1e38, None)  # -inf repair (reference: lstm.py:213)
                smask = packed["steps"][t].get("mask")
                if smask is not None:  # sample(mask=) padding sites
                    lp = lp * smask
                if mask is not None:
                    lp = lp * mask
                total = total - jnp.sum(lp)
            return total

        return ("ff", addrs), loss_fn

    # ------------------------------------------------------------------
    def _infer_step(self, variable, prev_variable=None, proposal_min_train_iterations=None):
        """(reference: inference_network_feedforward.py:53-66)"""
        address = self._head_key(variable.address)
        distribution = variable.distribution
        if address not in self._params["proposal"]:
            warnings.warn(f"Using prior. No proposal for address: {address}")
            return distribution
        if proposal_min_train_iterations is not None:
            if (
                self._head_train_iterations.get(address, 0)
                < proposal_min_train_iterations
            ):
                warnings.warn(
                    f"Using prior. Proposal not sufficiently trained for "
                    f"address: {address}"
                )
                return distribution
        prior = {
            k: np.asarray(v, util.dtype()).reshape(1, -1)
            for k, v in prior_param_arrays(distribution).items()
        }
        # one jitted dispatch per site (heads with the same structure share
        # the compiled program), returning the proposal as a pytree
        # (distributions are registered pytrees); leaves come back as
        # numpy so the interpreter tier samples/scores in the numpy
        # backend — ~50 per-op jnp dispatches per site otherwise
        fn = getattr(self, "_infer_step_jit", None)
        if fn is None:
            fn = self._infer_step_jit = jax.jit(head_apply)
        d = fn(self._serving_params()["proposal"][address],
               self._infer_observe_embedding, prior)
        return jax.tree_util.tree_map(np.asarray, d)

    # ------------------------------------------------------------------
    def make_vectorized_proposal_step(self, observe=None):
        """Proposal step usable inside the compiled tier's traced forward:
        every particle's proposal at a site is one batched head apply.  The
        observe embedding is computed from the traced observed dict on the
        first site of each trace, so the compiled program is reused across
        observations."""
        params = self._serving_params()
        head_meta = self._head_meta
        head_key = self._head_key
        embed = self._embed_observe_pure
        state = {"emb": None}

        def reset():
            state["emb"] = None

        def _emb(observed):
            if state["emb"] is None:
                obs = {
                    name: jnp.reshape(
                        jnp.asarray(observed[name], util.dtype()), (1, -1)
                    )
                    for name in params["observe"].keys()
                }
                state["emb"] = embed(params, obs)
            return state["emb"]

        def proposal_step(site, distribution, key, observed, forced_value=None,
                          defensive=None, mask=None):
            # forced_value: score instead of sampling (guided SMC replay).
            # defensive=π: mixture π·q + (1−π)·prior for rejection retries
            # (caps a rejected attempt's weight factor at 1/(1−π); see the
            # LSTM counterpart)
            addr = head_key(site.address)
            if addr not in head_meta:
                if forced_value is not None:
                    return forced_value, distribution.log_prob(
                        forced_value, sum=True
                    )
                value = distribution._sample_jax(key, ())
                return value, distribution.log_prob(value, sum=True)
            prior = {
                k: jnp.reshape(jnp.asarray(v, util.dtype()), (1, -1))
                for k, v in prior_param_arrays(distribution).items()
            }
            ev = tuple(getattr(distribution, "event_shape", ()))
            d = head_apply(params["proposal"][addr], _emb(observed), prior)
            if forced_value is not None:
                value = jnp.reshape(forced_value, ev)
                plp = jnp.sum(d.log_prob(value))
            elif defensive is not None:
                kq, kp, ku = jax.random.split(key, 3)
                xq = jnp.reshape(d._sample_jax(kq, ()), ev)
                xp = jnp.reshape(distribution._sample_jax(kp, ()), ev)
                value = jnp.where(jax.random.bernoulli(ku, defensive), xq, xp)
                plp = jnp.logaddexp(
                    jnp.log(defensive) + jnp.sum(d.log_prob(value)),
                    jnp.log1p(-defensive)
                    + distribution.log_prob(value, sum=True),
                )
            elif mask is not None:
                # sample(mask=): masked-off lanes draw from the prior; the
                # caller zeroes their weight correction
                kq, kp = jax.random.split(key)
                xq = jnp.reshape(d._sample_jax(kq, ()), ev)
                xp = jnp.reshape(distribution._sample_jax(kp, ()), ev)
                value = jnp.where(mask, xq, xp)
                plp = jnp.sum(d.log_prob(value))
            else:
                value = jnp.reshape(d._sample_jax(key, ()), ev)
                plp = jnp.sum(d.log_prob(value))
            return value, plp

        def compute_embedding(observed):
            # pure: the embedding from a FULL observed dict (guided
            # scan-SMC computes it once outside the scan, where step
            # handlers only see per-step slices)
            obs = {
                name: jnp.reshape(
                    jnp.asarray(observed[name], util.dtype()), (1, -1)
                )
                for name in params["observe"].keys()
            }
            return embed(params, obs)

        def set_embedding(e):
            state["emb"] = e

        proposal_step.reset = reset
        proposal_step.compute_embedding = compute_embedding
        proposal_step.set_embedding = set_embedding
        # stateless per site (the observe embedding is a per-trace
        # constant): trivial snapshot hooks let rejection_sample retries
        # propose from the network with nothing to thread through the carry
        proposal_step.get_state = lambda: ((), ())
        proposal_step.set_state = lambda s: None
        proposal_step.supports_defensive = True
        proposal_step.supports_mask = True
        return proposal_step
