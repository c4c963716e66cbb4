"""MLP stacks for the neural IR field.

Replaces tinycudann ``tcnn.Network`` (FullyFusedMLP / CutlassMLP,
reference/model.py:117-180,267-289) and ``LayeredTCNNWithInjection``
(reference/model.py:11-61) with a single pytree MLP that supports optional
per-layer channel-embedding injection: after each hidden linear layer a
learned per-channel bias row is added before the activation — exactly the
semantics of the reference's "add" connection type. "concat" conditioning
is handled by the field (extra input columns), not here.

The layer layout of an ``n_hidden_layers=H`` network matches tcnn: H hidden
linears of width ``n_neurons`` followed by one output linear (H+1 matmuls),
activations between hidden layers, configurable output activation.

TPU notes: matmuls run in a configurable compute dtype (bf16 by default on
the hot path) with fp32 accumulation via ``preferred_element_type``; params
stay fp32.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, list]


def _activation(name: str):
    name = (name or "none").lower()
    if name in ("none", "linear", "identity"):
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "gelu":
        return jax.nn.gelu
    if name in ("sigmoid",):
        return jax.nn.sigmoid
    if name in ("tanh",):
        return jnp.tanh
    if name in ("exponential", "exp"):
        return jnp.exp
    if name in ("squareplus",):
        return lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0))
    raise ValueError(f"unknown activation {name!r}")


@dataclass(frozen=True)
class MLPStatic:
    n_input_dims: int
    n_output_dims: int
    n_neurons: int
    n_hidden_layers: int
    activation: str = "ReLU"
    output_activation: str = "None"
    use_bias: bool = True
    inject: bool = False  # per-layer channel-embedding injection ("add")
    ch_num: int = 0

    @property
    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        dims = []
        d = self.n_input_dims
        for _ in range(self.n_hidden_layers):
            dims.append((d, self.n_neurons))
            d = self.n_neurons
        dims.append((d, self.n_output_dims))
        return tuple(dims)


def init(key: Array, static: MLPStatic, dtype=jnp.float32) -> Params:
    """He-normal weights; zero biases; ch-embeddings ~ N(0, 1/width)."""
    params: Params = {"w": [], "b": [], "emb": []}
    dims = static.layer_dims
    keys = jax.random.split(key, len(dims) + static.n_hidden_layers)
    for i, (d_in, d_out) in enumerate(dims):
        scale = jnp.sqrt(2.0 / d_in).astype(dtype)
        params["w"].append(jax.random.normal(keys[i], (d_in, d_out), dtype) * scale)
        if static.use_bias:
            params["b"].append(jnp.zeros((d_out,), dtype))
    if static.inject:
        for i in range(static.n_hidden_layers):
            # reference/model.py:34-37 — randn/sqrt(n_neurons)
            params["emb"].append(
                jax.random.normal(
                    keys[len(dims) + i], (static.ch_num, static.n_neurons), dtype
                )
                / jnp.sqrt(jnp.asarray(static.n_neurons, dtype))
            )
    return params


def _matmul(x: Array, w: Array, compute_dtype) -> Array:
    if compute_dtype is None:
        return jnp.dot(x, w, preferred_element_type=jnp.float32)
    return _matmul_cd(x, w, jnp.dtype(compute_dtype).name,
                      (x.dtype.name, w.dtype.name))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _matmul_cd(x: Array, w: Array, compute_dtype, in_dtypes) -> Array:
    """x @ w in compute_dtype with fp32 accumulation — both directions.

    Without this, the VJP matmuls contract an fp32 cotangent (the primal
    output dtype under preferred_element_type=f32) against bf16 operands;
    XLA promotes those to multi-pass fp32 MXU matmuls. Casting the
    cotangent to the compute dtype keeps the backward on single-pass bf16
    MXU throughput (fp32 accumulation retained) — gradient-grade rounding,
    consistent with the bf16 payload the hash-table scatter already uses.
    """
    return jnp.dot(
        x.astype(compute_dtype), w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def _matmul_cd_fwd(x, w, compute_dtype, in_dtypes):
    xc = x.astype(compute_dtype)
    wc = w.astype(compute_dtype)
    out = jnp.dot(xc, wc, preferred_element_type=jnp.float32)
    return out, (xc, wc)


def _matmul_cd_bwd(compute_dtype, in_dtypes, res, g):
    xc, wc = res
    x_dtype, w_dtype = in_dtypes
    gc = g.astype(compute_dtype)
    dx = jnp.dot(gc, wc.T, preferred_element_type=jnp.float32)
    nb = xc.ndim - 1  # contract all leading (batch) dims for the w-grad
    dw = jax.lax.dot_general(
        xc, gc,
        dimension_numbers=((tuple(range(nb)), tuple(range(nb))), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dx.astype(x_dtype), dw.astype(w_dtype)


_matmul_cd.defvjp(_matmul_cd_fwd, _matmul_cd_bwd)


def apply(
    params: Params,
    static: MLPStatic,
    x: Array,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Array:
    """Forward pass. x: [..., n_input_dims]; ch_idx: [...] int32 or None."""
    h = _first_preact(params, static, x, compute_dtype)
    return apply_tail(params, static, h, ch_idx=ch_idx, compute_dtype=compute_dtype)


def _first_preact(params: Params, static: MLPStatic, x: Array, compute_dtype) -> Array:
    h = _matmul(x, params["w"][0], compute_dtype)
    if static.use_bias:
        h = h + params["b"][0]
    return h


def apply_tail(
    params: Params,
    static: MLPStatic,
    h: Array,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Array:
    """Run the network given the first layer's pre-activation ``h``.

    Lets callers build ``h`` from factored input contributions (per-point /
    per-ray / per-batch parts summed into the first matmul) — the fused
    renderer's low-rank input decomposition.
    """
    act = _activation(static.activation)
    out_act = _activation(static.output_activation)
    n_layers = len(static.layer_dims)
    for layer in range(n_layers):
        if layer > 0:
            h = _matmul(h, params["w"][layer], compute_dtype)
            if static.use_bias:
                h = h + params["b"][layer]
        is_hidden = layer < n_layers - 1
        if is_hidden:
            if static.inject and ch_idx is not None:
                h = h + params["emb"][layer][ch_idx]
            h = act(h)
    return out_act(h)


def first_layer_weight(params: Params) -> Array:
    return params["w"][0]


def input_weight_slices(params: Params, sizes) -> list:
    """Split the first-layer weight rows by input-part sizes.

    With input x = concat(parts) the first pre-activation is
    Σᵢ partᵢ @ W0[rowsᵢ] — each part can be matmul'd at its natural
    granularity (per point / per ray / per batch element) and broadcast.
    """
    slices = []
    start = 0
    w0 = params["w"][0]
    for s in sizes:
        slices.append(w0[start : start + s])
        start += s
    assert start == w0.shape[0], f"part sizes {sizes} != in_dim {w0.shape[0]}"
    return slices
