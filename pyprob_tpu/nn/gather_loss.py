"""Gather-table training loss for variable-structure models.

The per-trace-type loss (``InferenceNetworkLSTM._make_loss_for``) compiles
one XLA program per controlled-address SEQUENCE: models with
data-dependent trace shapes (rejection loops — the reference's
GUM-Marsaglia, tests/test_inference.py:249-344) emit a geometric tail of
new sequences, so fresh ~1-3 s compiles keep landing deep into training
and each minibatch pays one device dispatch per trace type.  The
reference has the same structure host-side (one packed torch LSTM call
per sub-batch, reference: pyprob/nn/inference_network_lstm.py:136-220,
sub-batching at reference: pyprob/nn/dataset.py:21-47) but pays no
compilation, so it used to win this one benchmark.

This module removes the per-sequence programs the TPU-native way —
addresses become DATA instead of code:

* per-address parameters are stacked into gatherable tables (heads and
  sample embeddings grouped by pytree structure, address / dist-type
  embeddings as [N, A] tables — the same padded address-table design
  ``interpreter_lockstep._answer`` uses per inference site);
* a minibatch of MIXED trace types packs into dense [T_pad, B_pad, ...]
  arrays of values, prior parameters and table INDICES, with a
  per-(step, trace) activity mask;
* ONE jitted loss/grad program per (pow2 length bucket, pow2 batch
  bucket, table structure) serves every trace type — compile count drops
  from O(#address sequences x #row buckets) to O(log T_max x log B), and
  each batch is ONE dispatch instead of one per sub-batch;
* gradients come back on the tables and are scattered to the canonical
  per-address parameter pytree on the host, so the optimizer, the
  checkpoint format, stepwise inference and the compiled proposal step
  are untouched.

Numerically identical to the per-type path (masked steps contribute
exactly zero loss and zero gradient); equality is asserted in
tests/test_gather_loss.py.  Batches that are not table-uniform (mixed
head structures across steps, event-shaped heads, non-uniform observe
shapes) return None and fall back to the per-type loss.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from .layers import mlp_apply, lstm_apply
from .proposals import head_apply, prior_param_arrays


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


class GatherRegistry:
    """Index maps from per-address parameter dicts to stacked tables.

    Structure-only (no device arrays): rebuilt when polymorph changes the
    layer set, cheap to build (one pass over the param dicts).  Heads and
    sample embeddings are grouped by (treedef, leaf shapes) — members of
    a group have identical math (the Static head meta is part of the
    treedef), so one gathered apply serves them all.
    """

    def __init__(self, params):
        self.head_groups, self.head_of = self._grouped(params["proposal"])
        self.semb_groups, self.semb_of = self._grouped(
            params["sample_embedding"]
        )
        self.a_addrs = list(params["address_embedding"].keys())
        self.a_of = {a: i for i, a in enumerate(self.a_addrs)}
        self.d_names = list(params["dist_type_embedding"].keys())
        self.d_of = {n: i for i, n in enumerate(self.d_names)}

    @staticmethod
    def _grouped(param_dict):
        groups = {}
        of = {}
        for addr, p in param_dict.items():
            leaves, treedef = jax.tree_util.tree_flatten(p)
            key = (treedef, tuple(l.shape for l in leaves))
            g = groups.setdefault(key, [])
            of[addr] = (key, len(g))
            g.append(addr)
        return groups, of

    @staticmethod
    def version_of(params):
        return (
            len(params["proposal"]),
            len(params["sample_embedding"]),
            len(params["address_embedding"]),
            len(params["dist_type_embedding"]),
        )


def stack_tables(params, registry, head_gkey, semb_gkey):
    """Stack the current parameter values into the table pytree the loss
    program consumes.  Re-stacked every optimizer step (values change);
    group axes pad to pow2 so address growth reuses log2-many compiled
    shapes.  Padding rows are copies that are never gathered — their
    gradients are identically zero and are dropped at scatter time."""

    def stack_group(param_dict, addrs):
        plist = [param_dict[a] for a in addrs]
        plist = plist + [plist[0]] * (_next_pow2(len(plist)) - len(plist))
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *plist)

    def stack_rows(param_dict, keys):
        rows = [param_dict[k] for k in keys]
        rows = rows + [rows[0]] * (_next_pow2(len(rows)) - len(rows))
        return jnp.stack(rows)

    return {
        "observe": params["observe"],
        "observe_final": params["observe_final"],
        "lstm": params["lstm"],
        "heads": stack_group(
            params["proposal"], registry.head_groups[head_gkey]
        ),
        "sembs": stack_group(
            params["sample_embedding"], registry.semb_groups[semb_gkey]
        ),
        "aemb": stack_rows(params["address_embedding"], registry.a_addrs),
        "demb": stack_rows(params["dist_type_embedding"], registry.d_names),
    }


def scatter_table_grads(tgrads, registry, head_gkey, semb_gkey):
    """Table gradients -> canonical per-address grad pytree (partial:
    only the group's addresses; ``_expand_grads`` zero-fills the rest).

    Tables convert to host numpy ONCE per leaf and the per-address rows
    are numpy views: slicing on-device instead costs one dispatched
    gather per (address x leaf) — measured 173 ms/step on the Marsaglia
    run, dwarfing the loss itself.  The jitted optimizer update consumes
    numpy leaves directly (one transfer each, same as device slices)."""
    to_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
    out = {
        "observe": to_np(tgrads["observe"]),
        "observe_final": to_np(tgrads["observe_final"]),
        "lstm": to_np(tgrads["lstm"]),
        "proposal": {},
        "sample_embedding": {},
        "address_embedding": {},
        "dist_type_embedding": {},
    }
    th = to_np(tgrads["heads"])
    for i, a in enumerate(registry.head_groups[head_gkey]):
        out["proposal"][a] = jax.tree_util.tree_map(lambda t: t[i], th)
    ts = to_np(tgrads["sembs"])
    for i, a in enumerate(registry.semb_groups[semb_gkey]):
        out["sample_embedding"][a] = jax.tree_util.tree_map(
            lambda t: t[i], ts
        )
    ta = np.asarray(tgrads["aemb"])
    for i, a in enumerate(registry.a_addrs):
        out["address_embedding"][a] = ta[i]
    td = np.asarray(tgrads["demb"])
    for i, n in enumerate(registry.d_names):
        out["dist_type_embedding"][n] = td[i]
    return out


def pack_batch(net, registry, batch):
    """Pack a mixed-trace-type minibatch into dense gather arrays.

    Returns (sig, packed, head_gkey, semb_gkey, addrs_present) or None if
    the batch is not table-uniform (falls back to the per-type loss).
    ``sig`` is the jit-cache key: only shape/structure, never addresses.
    """
    traces = getattr(batch, "traces", None)
    if not traces:
        return None
    head_key = net._head_key
    params = net._params
    dtype = util.dtype()

    T_max = max(t.length_controlled for t in traces)
    if T_max == 0:
        return None
    T_pad = _next_pow2(T_max)
    B = len(traces)
    B_pad = _next_pow2(B)

    head_gkey = None
    semb_gkey = None
    prior_keys = None
    Kv = None

    # observe shapes must be uniform across traces (they are traced as one
    # [B, W] array per name).  Rows MUST follow the sub_batch column
    # order used by every other packed array below — batch.traces is the
    # raw generation order, and sub_batches (grouped by trace hash)
    # permute it; packing obs in trace order paired each trace's sampled
    # values with ANOTHER trace's observations, which silently destroyed
    # the observation-conditional training signal (the r4 Marsaglia
    # regression: loss plateaued at the marginal while the per-type path
    # learned the conditional).
    ordered = [tr for sub in batch.sub_batches for tr in sub]
    obs_cols = {name: [] for name in params["observe"].keys()}
    for name in obs_cols:
        w = None
        for tr in ordered:
            v = np.asarray(tr.named_value(name), dtype=dtype).reshape(-1)
            if w is None:
                w = v.shape[0]
            elif v.shape[0] != w:
                return None
            obs_cols[name].append(v)

    head_idx = np.zeros((T_pad, B_pad), np.int32)
    a_idx = np.zeros((T_pad, B_pad), np.int32)
    d_idx = np.zeros((T_pad, B_pad), np.int32)
    semb_idx = np.zeros((T_pad, B_pad), np.int32)
    mask = np.zeros((T_pad, B_pad), dtype)
    W_loc = getattr(net, "_local_observe_dim", 0)
    local = np.zeros((T_pad, B_pad, W_loc), dtype) if W_loc else None
    values = None
    prior = None
    addrs_present = set()

    b = 0
    for sub in batch.sub_batches:
        example = sub[0]
        vars_c = example.variables_controlled
        L = len(vars_c)
        n = len(sub)
        cols = slice(b, b + n)
        # per-type indices computed once from the example trace
        for t, v in enumerate(vars_c):
            ak = head_key(v.address)
            hk = registry.head_of.get(ak)
            sk = registry.semb_of.get(ak)
            ai = registry.a_of.get(ak)
            di = registry.d_of.get(v.distribution.name)
            if hk is None or sk is None or ai is None or di is None:
                return None  # unknown address: per-type path raises
            if head_gkey is None:
                head_gkey, semb_gkey = hk[0], sk[0]
                meta = params["proposal"][ak]["meta"].value
                if meta.get("event_dim") is not None:
                    return None  # event-shaped heads: fall back
            elif hk[0] != head_gkey or sk[0] != semb_gkey:
                return None  # mixed table structures: fall back
            head_idx[t, cols] = hk[1]
            semb_idx[t, cols] = sk[1]
            a_idx[t, cols] = ai
            d_idx[t, cols] = di
            addrs_present.add(ak)
        # per-(trace, step) values / priors / activity
        for t in range(L):
            vals_t = np.stack(
                [
                    np.asarray(
                        tr.variables_controlled[t].value, dtype=dtype
                    ).reshape(-1)
                    for tr in sub
                ]
            )
            if values is None:
                Kv = vals_t.shape[1]
                values = np.zeros((T_pad, B_pad, Kv), dtype)
            elif vals_t.shape[1] != Kv:
                return None
            values[t, cols] = vals_t
            pp_rows = [
                {
                    k: np.asarray(v, dtype=dtype).reshape(-1)
                    for k, v in prior_param_arrays(
                        tr.variables_controlled[t].distribution
                    ).items()
                }
                for tr in sub
            ]
            keys = tuple(sorted(pp_rows[0].keys()))
            if prior_keys is None:
                prior_keys = keys
                prior = {}
            elif keys != prior_keys:
                return None
            for k in keys:
                col = np.stack([r[k] for r in pp_rows])
                if k not in prior:
                    prior[k] = np.zeros((T_pad, B_pad, col.shape[1]), dtype)
                elif col.shape[1] != prior[k].shape[2]:
                    return None
                prior[k][t, cols] = col
            mask[t, cols] = [
                0.0
                if getattr(tr.variables_controlled[t], "masked", False)
                else 1.0
                for tr in sub
            ]
        if local is not None:
            local[:L, cols] = net._local_obs_rows(sub)[:, :, :W_loc]
        # step padding: replicate the last real step (keeps log-densities
        # finite so masked entries cannot poison the sum with nan)
        if L < T_pad:
            head_idx[L:, cols] = head_idx[L - 1, cols]
            semb_idx[L:, cols] = semb_idx[L - 1, cols]
            a_idx[L:, cols] = a_idx[L - 1, cols]
            d_idx[L:, cols] = d_idx[L - 1, cols]
            values[L:, cols] = values[L - 1, cols]
            if local is not None:
                local[L:, cols] = local[L - 1, cols]
            for k in prior:
                prior[k][L:, cols] = prior[k][L - 1, cols]
        b += n

    # row padding: replicate the last trace, fully masked
    if B < B_pad:
        pads = [head_idx, semb_idx, a_idx, d_idx, values]
        if local is not None:
            pads.append(local)
        for arr in pads:
            arr[:, B:] = arr[:, B - 1 : B]
        for k in prior:
            prior[k][:, B:] = prior[k][:, B - 1 : B]
    obs = {}
    obs_widths = []
    for name, colsv in obs_cols.items():
        arr = np.stack(colsv)
        if B < B_pad:
            arr = np.concatenate(
                [arr, np.repeat(arr[-1:], B_pad - B, axis=0)]
            )
        obs[name] = jnp.asarray(arr)
        obs_widths.append((name, arr.shape[1]))

    # Active-cell compaction for the HEAD stage: only ~1/3 of the
    # [T_pad, B_pad] cells carry loss terms (short traces + row padding);
    # the proposal-head computation (per-item gathered MLP + mixture
    # log-pdf — the memory-heaviest stage) runs on the compacted active
    # list instead.  The LSTM still sees the full rectangle (masked
    # steps' values feed the next step's recurrent input).  The active
    # count ~ B x mean_length pads to a pow2 bucket that is stable
    # across batches, so it adds one sig dimension, not program churn.
    flat_mask = mask.reshape(-1)
    active = np.nonzero(flat_mask > 0)[0].astype(np.int32)
    A = active.shape[0]
    if A == 0:
        return None
    # bucket to pow2 FRACTIONS of the rectangle (not free pow2): the
    # active count hovers around B x mean_length, and a free pow2 bucket
    # flickers between neighbours across batches, minting programs
    TB = T_pad * B_pad
    A_pad = TB
    while A_pad // 2 >= A and A_pad > 1:
        A_pad //= 2
    active_pad_mask = np.zeros((A_pad,), dtype)
    active_pad_mask[:A] = 1.0
    if A_pad != A:
        active = np.concatenate(
            [active, np.zeros((A_pad - A,), np.int32)]
        )

    packed = {
        "obs": obs,
        "norm": jnp.asarray(float(B), dtype),
        "values": jnp.asarray(values),
        "prior": {k: jnp.asarray(v) for k, v in prior.items()},
        "head_idx": jnp.asarray(head_idx),
        "a_idx": jnp.asarray(a_idx),
        "d_idx": jnp.asarray(d_idx),
        "semb_idx": jnp.asarray(semb_idx),
        "mask": jnp.asarray(mask),
        "active_idx": jnp.asarray(active),
        "active_pad_mask": jnp.asarray(active_pad_mask),
    }
    if local is not None:
        packed["local_obs"] = jnp.asarray(local)
    # NOTE: positional sig entries are consumed by index elsewhere
    # (speculative compiles, fused-update keys) — only APPEND new ones
    sig = (
        T_pad,
        B_pad,
        A_pad,
        head_gkey,
        semb_gkey,
        prior_keys,
        tuple(prior[k].shape[2] for k in sorted(prior)),
        Kv,
        tuple(sorted(obs_widths)),
        _next_pow2(len(registry.head_groups[head_gkey])),
        _next_pow2(len(registry.semb_groups[semb_gkey])),
        _next_pow2(len(registry.a_addrs)),
        _next_pow2(len(registry.d_names)),
        W_loc,
    )
    return sig, packed, head_gkey, semb_gkey, addrs_present


def packed_shapes_with_T(packed, T2):
    """Abstract shapes of a packed batch with the step axis re-bucketed
    to ``T2`` — used to speculatively background-compile the next pow2
    length bucket's loss program before a batch needs it."""
    sds = lambda sh, dt: jax.ShapeDtypeStruct(tuple(sh), dt)
    out = {}
    for k, v in packed.items():
        if k == "obs":
            out[k] = {n: sds(x.shape, x.dtype) for n, x in v.items()}
        elif k == "prior":
            out[k] = {
                n: sds((T2,) + x.shape[1:], x.dtype) for n, x in v.items()
            }
        elif k in ("norm", "active_idx", "active_pad_mask"):
            out[k] = sds(v.shape, v.dtype)  # no step axis
        else:  # values / indices / mask: leading step axis
            out[k] = sds((T2,) + v.shape[1:], v.dtype)
    return out


def table_shapes(tables):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tables
    )


def make_gather_loss(embed_fn, A, D):
    """Build the table-driven loss.  Same math as the per-type LSTM loss
    (reference semantics: pyprob/nn/inference_network_lstm.py:136-220):
    observe embedding once per trace, per-step LSTM input =
    [obs, prev_sample_emb, prev_dist_emb, prev_addr_emb, cur_dist_emb,
    cur_addr_emb] with zeros at t=0, -sum of proposal log-probs of the
    trace values — but every per-address parameter arrives via a table
    gather indexed by the packed per-(step, trace) index arrays."""

    def loss_fn(tables, packed):
        emb = embed_fn(tables, packed["obs"])  # [B, O]
        values = packed["values"]  # [T, B, Kv]
        T, B = values.shape[0], values.shape[1]
        cur_a = tables["aemb"][packed["a_idx"]]  # [T, B, A]
        cur_d = tables["demb"][packed["d_idx"]]  # [T, B, D]
        sembs = tables["sembs"]
        flat_sidx = packed["semb_idx"].reshape(-1)
        flat_vals = values.reshape(T * B, -1)
        semb_flat = jax.vmap(
            lambda i, v: mlp_apply(
                jax.tree_util.tree_map(lambda p: p[i], sembs), v[None]
            )[0]
        )(flat_sidx, flat_vals)
        semb = semb_flat.reshape(T, B, -1)
        S = semb.shape[-1]
        z = lambda w: jnp.zeros((1, B, w), util.dtype())
        prev_semb = jnp.concatenate([z(S), semb[:-1]], axis=0)
        prev_a = jnp.concatenate([z(A), cur_a[:-1]], axis=0)
        prev_d = jnp.concatenate([z(D), cur_d[:-1]], axis=0)
        obs_b = jnp.broadcast_to(emb[None], (T,) + emb.shape)
        parts = [obs_b]
        lo = packed.get("local_obs")
        if lo is not None:
            # per-step local observations (tied Markov training): the
            # values of the observes following each controlled site
            parts.append(lo)
        parts += [prev_semb, prev_d, prev_a, cur_d, cur_a]
        lstm_in = jnp.concatenate(parts, axis=-1)
        out, _ = lstm_apply(tables["lstm"], lstm_in)  # [T, B, H]
        heads = tables["heads"]
        # head stage on ACTIVE cells only (the compacted loss-carrying
        # subset; padding cells gated by active_pad_mask AND the step
        # mask gathered at the same indices)
        ai = packed["active_idx"]
        feats_a = out.reshape(T * B, -1)[ai]
        hidx_a = packed["head_idx"].reshape(-1)[ai]
        vals_a = flat_vals[ai]
        prior_a = {
            k: v.reshape(T * B, -1)[ai] for k, v in packed["prior"].items()
        }
        mask_a = packed["mask"].reshape(-1)[ai] * packed["active_pad_mask"]

        def per_item(i, f, pr, v):
            d = head_apply(
                jax.tree_util.tree_map(lambda p: p[i], heads),
                f[None],
                {k: a[None] for k, a in pr.items()},
            )
            return jnp.sum(d.log_prob(v))

        lp = jax.vmap(per_item)(hidx_a, feats_a, prior_a, vals_a)
        lp = jnp.clip(lp, -1e38, None)
        # per-trace normalization folded in (traced scalar): gradients
        # leave the program already normalized — no host-side division
        # pass over hundreds of leaves
        return -jnp.sum(lp * mask_a) / packed["norm"]

    return loss_fn
