"""Pure-function neural layers with pytree parameters.

The reference composes torch ``nn.Module``s with per-address ModuleDicts
(reference: pyprob/nn/embedding_feedforward.py, inference_network_lstm.py).
A dynamic module set is hostile to XLA, so here every layer is a pair of
functions — ``*_init(key, ...) -> params`` and ``*_apply(params, x)`` —
over plain dict pytrees.  The per-address "polymorphism" of the reference
becomes plain dict insertion in the parameter pytree; jitted losses are
re-traced (cached per trace-type) when the dict grows.

Matmuls run in the configured compute dtype and map directly onto the TPU
MXU; the LSTM is a single fused cell scanned over time with
``jax.lax.scan`` (sequence handling per SURVEY.md §5 — no hand-scheduling,
XLA fuses the gates).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import util


class Static:
    """Wrap non-differentiable layer metadata so it lives in the pytree as
    static aux data: invisible to grad/optimizer, a retrace trigger for jit
    when it changes (which is exactly the polymorph semantics)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __repr__(self):
        return f"Static({self.value!r})"

    def __eq__(self, other):
        return isinstance(other, Static) and self.value == other.value

    def __hash__(self):
        return hash(repr(self.value))


def _static_flatten(s):
    return (), s  # the Static object itself is the (hashable) aux data


def _static_unflatten(aux, children):
    return aux


jax.tree_util.register_pytree_node(Static, _static_flatten, _static_unflatten)


def _uniform(key, shape, bound):
    return jax.random.uniform(
        key, shape, minval=-bound, maxval=bound, dtype=util.dtype()
    )


def linear_init(key, in_dim, out_dim):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(max(in_dim, 1))
    return {
        "w": _uniform(k1, (in_dim, out_dim), bound),
        "b": _uniform(k2, (out_dim,), bound),
    }


def _dot(x, w):
    """Matmul honoring the optional bf16 compute policy: operands cast to
    the compute dtype, f32 accumulation on the MXU
    (pallas_guide.md: keep matmuls large, batched, bfloat16)."""
    cd = util.compute_dtype()
    if cd is not None:
        x = x.astype(cd)
        w = w.astype(cd)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def linear_apply(params, x):
    # single-row inputs route through the squeezed vecmat (see _row_dot)
    if x.ndim >= 2 and x.shape[-2] == 1:
        return _row_dot(x, params["w"]) + params["b"]
    return _dot(x, params["w"]) + params["b"]


# ---------------------------------------------------------------------------
# MLP (counterpart of reference EmbeddingFeedForward,
# pyprob/nn/embedding_feedforward.py:7-48)
# ---------------------------------------------------------------------------


def mlp_init(key, input_shape, output_shape, num_layers=3, one_hot_dim=None):
    input_shape = tuple(np.atleast_1d(input_shape).tolist()) if not isinstance(
        input_shape, (tuple, list)
    ) else tuple(input_shape)
    output_shape = (
        (output_shape,) if isinstance(output_shape, int) else tuple(output_shape)
    )
    in_dim = int(np.prod(input_shape)) if len(input_shape) else 1
    out_dim = int(np.prod(output_shape))
    if one_hot_dim is not None:
        in_dim = one_hot_dim
    if num_layers < 1:
        raise ValueError("Expecting num_layers >= 1")
    dims = (
        [in_dim, out_dim]
        if num_layers == 1
        else [in_dim]
        + [int((in_dim + out_dim) / 2)] * (num_layers - 1)
        + [out_dim]
    )
    keys = jax.random.split(key, len(dims) - 1)
    return {
        "layers": [
            linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
        ],
        "meta": Static({
            "in_dim": in_dim,
            "out_shape": output_shape,
            "one_hot_dim": one_hot_dim,
        }),
    }


def mlp_apply(params, x, activation=jax.nn.relu, activation_last=jax.nn.relu):
    meta = params["meta"].value
    if meta["one_hot_dim"] is not None:
        x = jax.nn.one_hot(
            jnp.asarray(x, jnp.int32).reshape(-1), meta["one_hot_dim"],
            dtype=util.dtype(),
        )
    else:
        x = jnp.asarray(x, util.dtype()).reshape(-1, meta["in_dim"])
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x = linear_apply(layer, x)
        if i == n - 1:
            if activation_last is not None:
                x = activation_last(x)
        else:
            x = activation(x)
    return x.reshape((-1,) + tuple(meta["out_shape"]))


# ---------------------------------------------------------------------------
# LSTM (counterpart of reference nn.LSTM use, inference_network_lstm.py:31)
# ---------------------------------------------------------------------------


def lstm_init(key, input_dim, hidden_dim, depth=1):
    layers = []
    for d in range(depth):
        in_d = input_dim if d == 0 else hidden_dim
        k = jax.random.fold_in(key, d)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        bound = 1.0 / math.sqrt(hidden_dim)
        layers.append(
            {
                "w_ih": _uniform(k1, (in_d, 4 * hidden_dim), bound),
                "w_hh": _uniform(k2, (hidden_dim, 4 * hidden_dim), bound),
                "b_ih": _uniform(k3, (4 * hidden_dim,), bound),
                "b_hh": _uniform(k4, (4 * hidden_dim,), bound),
            }
        )
    return {"layers": layers, "meta": Static({"hidden_dim": hidden_dim, "depth": depth})}


def _row_dot_mode():
    """Lowering for vmapped single-row matmuls (the per-particle
    LSTM/embedding step).  'vecmat' squeezes the row dim into a
    vector-matrix product — under vmap a clean [N,in]@[in,out] matmul,
    2.96x the broadcast lowering on an 8-cell LSTM chain at N=65,536
    (tests/extra/chip_row_dot.py) and ~40% faster lockstep serving on
    XLA:CPU — but the FULL guided scan-SMC program with vecmat still
    SIGILLs the remote TPU compiler (r5 re-test; the r3 crash class is
    about the program, not just the op).  'pad8' tiles the row to the
    native 8-sublane M dim so the batched dot is non-degenerate:
    probe-equal to vecmat (2.87x bcast) AND compiles the full guided
    program — it cut guided scan-SMC's per-step premium from 1.9x to
    1.11x of the bootstrap filter at T=256 x 65,536 (BASELINE.md r5).
    Defaults: TPU 'pad8', CPU 'vecmat' (no padding waste, no crash
    risk on XLA:CPU).  Override: PYPROB_TPU_ROW_DOT=vecmat|bcast|pad8."""
    global _ROW_DOT_MODE
    if _ROW_DOT_MODE is None:
        mode = os.environ.get("PYPROB_TPU_ROW_DOT", "").strip().lower()
        if mode not in ("vecmat", "bcast", "pad8"):
            mode = (
                "vecmat" if jax.default_backend() == "cpu" else "pad8"
            )
        _ROW_DOT_MODE = mode
    return _ROW_DOT_MODE


_ROW_DOT_MODE = None


def _row_dot(x, w):
    """``x @ w`` for single-row ``x`` [..., 1, in] without the vmapped
    degenerate one-row MATMUL (libtpu crash, bisected r3 — see
    _row_dot_mode for the lowering choice).  Real batches keep the
    plain MXU dot."""
    if x.ndim >= 2 and x.shape[-2] == 1:
        mode = _row_dot_mode()
        cd = util.compute_dtype()
        if mode == "vecmat":
            v = x[..., 0, :]
            if cd is not None:
                v = v.astype(cd)
                w = w.astype(cd)
            return jnp.matmul(v, w, preferred_element_type=jnp.float32)[
                ..., None, :
            ]
        if mode == "pad8":
            # tile the row to the native 8-sublane M dim: the batched
            # dot is non-degenerate (MXU tile-shaped), ~probe-equal to
            # vecmat at 2.9x bcast
            xt = jnp.broadcast_to(x, x.shape[:-2] + (8,) + x.shape[-1:])
            if cd is not None:
                xt = xt.astype(cd)
                w = w.astype(cd)
            return jnp.matmul(xt, w, preferred_element_type=jnp.float32)[
                ..., :1, :
            ]
        return jnp.sum(x[..., 0, :, None] * w, axis=-2)[..., None, :]
    return _dot(x, w)


def lstm_cell(layer, x, h, c):
    """One fused LSTM cell step; gates in torch order (i, f, g, o)."""
    gates = (
        _row_dot(x, layer["w_ih"])
        + layer["b_ih"]
        + _row_dot(h, layer["w_hh"])
        + layer["b_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(params, x, state):
    """Single time step through all depth layers.  x: [..., I],
    state: (h, c) each [depth, ..., H]."""
    h_all, c_all = state
    hs, cs = [], []
    inp = x
    for d, layer in enumerate(params["layers"]):
        h_new, c_new = lstm_cell(layer, inp, h_all[d], c_all[d])
        hs.append(h_new)
        cs.append(c_new)
        inp = h_new
    return inp, (jnp.stack(hs), jnp.stack(cs))


def lstm_apply(params, xs, state=None):
    """Run over a sequence with lax.scan.  xs: [T, B, I] -> [T, B, H]."""
    meta = params["meta"].value
    hidden = meta["hidden_dim"]
    depth = meta["depth"]
    T, B = xs.shape[0], xs.shape[1]
    if state is None:
        h0 = jnp.zeros((depth, B, hidden), util.dtype())
        c0 = jnp.zeros((depth, B, hidden), util.dtype())
        state = (h0, c0)

    def step(carry, x):
        out, new_carry = lstm_step(params, x, carry)
        return new_carry, out

    final_state, outs = jax.lax.scan(step, state, xs)
    return outs, final_state


def lstm_zero_state(params, batch_shape=()):
    meta = params["meta"].value
    hidden = meta["hidden_dim"]
    depth = meta["depth"]
    shape = (depth,) + tuple(batch_shape) + (hidden,)
    return (jnp.zeros(shape, util.dtype()), jnp.zeros(shape, util.dtype()))


# ---------------------------------------------------------------------------
# CNNs (counterparts of reference EmbeddingCNN2D5C / EmbeddingCNN3D5C)
# ---------------------------------------------------------------------------


def conv_init(key, in_ch, out_ch, kernel_shape):
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * int(np.prod(kernel_shape))
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(k1, (out_ch, in_ch) + tuple(kernel_shape), bound),
        "b": _uniform(k2, (out_ch,), bound),
    }


def conv_apply(params, x, ndim):
    """x: [B, C, *spatial]; NCHW/NCDHW layout, VALID padding."""
    dn_spec = {
        2: ("NCHW", "OIHW", "NCHW"),
        3: ("NCDHW", "OIDHW", "NCDHW"),
    }[ndim]
    dn = jax.lax.conv_dimension_numbers(x.shape, params["w"].shape, dn_spec)
    out = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1,) * ndim,
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    b = params["b"].reshape((1, -1) + (1,) * ndim)
    return (out + b).astype(util.dtype())


def max_pool(x, ndim, window=2):
    dims = (1, 1) + (window,) * ndim
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, dims, "VALID"
    )


def cnn2d5c_init(key, input_shape, output_shape):
    """5x conv2d + 2 maxpool + 2 linear
    (reference: pyprob/nn/embedding_cnn_2d_5c.py:7-41)."""
    input_shape = tuple(input_shape)
    if len(input_shape) == 2:
        input_shape = (1,) + input_shape
    output_shape = (
        (output_shape,) if isinstance(output_shape, int) else tuple(output_shape)
    )
    out_dim = int(np.prod(output_shape))
    keys = jax.random.split(key, 7)
    convs = [
        conv_init(keys[0], input_shape[0], 64, (3, 3)),
        conv_init(keys[1], 64, 64, (3, 3)),
        conv_init(keys[2], 64, 128, (3, 3)),
        conv_init(keys[3], 128, 128, (3, 3)),
        conv_init(keys[4], 128, 128, (3, 3)),
    ]
    params = {"convs": convs, "meta": Static({"input_shape": input_shape, "out_shape": output_shape})}
    # probe the flattened conv output size with abstract evaluation
    cnn_out = jax.eval_shape(
        lambda p: _cnn2d_forward(p, jnp.zeros((1,) + input_shape, util.dtype())),
        {"convs": convs},
    )
    cnn_dim = int(np.prod(cnn_out.shape[1:]))
    params["lin1"] = linear_init(keys[5], cnn_dim, out_dim)
    params["lin2"] = linear_init(keys[6], out_dim, out_dim)
    return params


def _cnn2d_forward(params, x):
    x = jax.nn.relu(conv_apply(params["convs"][0], x, 2))
    x = jax.nn.relu(conv_apply(params["convs"][1], x, 2))
    x = max_pool(x, 2)
    x = jax.nn.relu(conv_apply(params["convs"][2], x, 2))
    x = jax.nn.relu(conv_apply(params["convs"][3], x, 2))
    x = jax.nn.relu(conv_apply(params["convs"][4], x, 2))
    x = max_pool(x, 2)
    return x.reshape(x.shape[0], -1)


def cnn2d5c_apply(params, x):
    meta = params["meta"].value
    B = x.shape[0]
    x = jnp.asarray(x, util.dtype()).reshape((B,) + tuple(meta["input_shape"]))
    x = _cnn2d_forward(params, x)
    x = jax.nn.relu(linear_apply(params["lin1"], x))
    x = jax.nn.relu(linear_apply(params["lin2"], x))
    return x.reshape((B,) + tuple(meta["out_shape"]))


def cnn3d5c_init(key, input_shape, output_shape):
    """conv3d variant (reference: pyprob/nn/embedding_cnn_3d_5c.py:7-43)."""
    input_shape = tuple(input_shape)
    if len(input_shape) == 3:
        input_shape = (1,) + input_shape
    output_shape = (
        (output_shape,) if isinstance(output_shape, int) else tuple(output_shape)
    )
    out_dim = int(np.prod(output_shape))
    keys = jax.random.split(key, 7)
    convs = [
        conv_init(keys[0], input_shape[0], 64, (3, 3, 3)),
        conv_init(keys[1], 64, 64, (3, 3, 3)),
        conv_init(keys[2], 64, 128, (3, 3, 3)),
        conv_init(keys[3], 128, 128, (3, 3, 3)),
        conv_init(keys[4], 128, 128, (3, 3, 3)),
    ]
    params = {"convs": convs, "meta": Static({"input_shape": input_shape, "out_shape": output_shape})}
    cnn_out = jax.eval_shape(
        lambda p: _cnn3d_forward(p, jnp.zeros((1,) + input_shape, util.dtype())),
        {"convs": convs},
    )
    cnn_dim = int(np.prod(cnn_out.shape[1:]))
    params["lin1"] = linear_init(keys[5], cnn_dim, out_dim)
    params["lin2"] = linear_init(keys[6], out_dim, out_dim)
    return params


def _cnn3d_forward(params, x):
    x = jax.nn.relu(conv_apply(params["convs"][0], x, 3))
    x = jax.nn.relu(conv_apply(params["convs"][1], x, 3))
    x = max_pool(x, 3)
    x = jax.nn.relu(conv_apply(params["convs"][2], x, 3))
    x = jax.nn.relu(conv_apply(params["convs"][3], x, 3))
    x = jax.nn.relu(conv_apply(params["convs"][4], x, 3))
    x = max_pool(x, 3)
    return x.reshape(x.shape[0], -1)


def cnn3d5c_apply(params, x):
    meta = params["meta"].value
    B = x.shape[0]
    x = jnp.asarray(x, util.dtype()).reshape((B,) + tuple(meta["input_shape"]))
    x = _cnn3d_forward(params, x)
    x = jax.nn.relu(linear_apply(params["lin1"], x))
    x = jax.nn.relu(linear_apply(params["lin2"], x))
    return x.reshape((B,) + tuple(meta["out_shape"]))


def num_params(tree):
    leaves = [
        l
        for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "size") and not isinstance(l, (str, int, float))
    ]
    return int(sum(l.size for l in leaves))
