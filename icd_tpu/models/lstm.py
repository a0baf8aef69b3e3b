"""LSTM primitives (PyTorch-compatible gate layout, TPU-shaped).

The reference decoders are torch ``nn.LSTM`` (baseline,
models/baseline.py:46-54) and ``nn.LSTMCell`` (attention,
models/attention.py:108-109). Here a cell is a pair of fused gate
matmuls — (B, in) x (in, 4H) and (B, H) x (H, 4H) — which XLA maps
straight onto the MXU, and a sequence is one ``lax.scan`` over time.

Gate order follows PyTorch (i, f, g, o) so converted torch weights drop
in: ``wi``/``wh`` are the *transposed* ``weight_ih``/``weight_hh``.
"""

import math

import jax
import jax.numpy as jnp


def init_lstm(key, input_size, hidden_size, dtype=jnp.float32):
    """torch LSTM/LSTMCell default init: U(-1/sqrt(H), 1/sqrt(H)) on all."""
    bound = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "wi": u(k1, (input_size, 4 * hidden_size)),
        "wh": u(k2, (hidden_size, 4 * hidden_size)),
        "bi": u(k3, (4 * hidden_size,)),
        "bh": u(k4, (4 * hidden_size,)),
    }


def from_torch_lstm(weight_ih, weight_hh, bias_ih, bias_hh):
    """Convert torch (4H, in)/(4H, H) weights to our (in, 4H)/(H, 4H)."""
    import numpy as np

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, np.float32)

    return {
        "wi": jnp.asarray(t(weight_ih).T),
        "wh": jnp.asarray(t(weight_hh).T),
        "bi": jnp.asarray(t(bias_ih)),
        "bh": jnp.asarray(t(bias_hh)),
    }


def gates_to_state(gates, c):
    """(B, 4H) pre-activation gates -> (new_h, new_c).

    The (i, f, g, o) gate order is the load-bearing PyTorch convention
    (weight-convert parity); every LSTM variant (float lstm_cell, the
    W8A8 serving cell in ops/qlinear.py) must route through this one
    implementation.
    """
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    new_c = f * c + i * g
    new_h = o * jnp.tanh(new_c)
    return new_h, new_c


def lstm_cell(params, x, h, c):
    """One LSTM step. x: (B, in), h/c: (B, H) -> (new_h, new_c)."""
    gates = x @ params["wi"] + params["bi"] + h @ params["wh"] + params["bh"]
    return gates_to_state(gates, c)


def lstm_scan(params, xs, h0=None, c0=None):
    """Run an LSTM over a batch-major sequence.

    Args:
        xs: (B, T, in).
        h0/c0: (B, H) initial state; zeros when None (torch nn.LSTM
            default, models/baseline.py:106 passes no state).

    Returns:
        (outputs (B, T, H), (h_T, c_T)).
    """
    batch = xs.shape[0]
    hidden = params["wh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((batch, hidden), xs.dtype)
    if c0 is None:
        c0 = jnp.zeros((batch, hidden), xs.dtype)

    def step(carry, x_t):
        h, c = carry
        h, c = lstm_cell(params, x_t, h, c)
        return (h, c), h

    xs_tm = jnp.swapaxes(xs, 0, 1)  # time-major for scan
    (h_t, c_t), outs = jax.lax.scan(step, (h0, c0), xs_tm)
    return jnp.swapaxes(outs, 0, 1), (h_t, c_t)
