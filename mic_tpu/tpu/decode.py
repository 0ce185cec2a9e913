"""JAX device decoders for the MICT wide-lane rANS format.

The hot loop is a ``lax.scan`` over decode steps; every step is pure
uint32 vector arithmetic over L lanes plus one table gather — exactly the
shape the VPU wants.  Tables live as device arrays (VMEM-resident inside
the fused kernel); the word stream is consumed through a single dense
cursor with an exclusive prefix-sum per step (see device_rans.py for the
format contract).

Two implementations:

* :func:`rans_decode_jax` — pure jnp/lax, runs anywhere (CPU mesh, TPU),
  used for correctness and as the traced body for sharded batch decode.
* the Pallas kernel in :mod:`mic_tpu.tpu.kernels` — the tuned TPU path
  (one-hot/MXU gathers, VMEM tables).

Bit-exactness with the numpy host decoder is enforced by tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device_rans import RANS_L, device_tables, mict_parse, slot_tables  # noqa: F401

__all__ = ["rans_decode_jax", "mict_decode_device", "DecodePlan", "make_plan"]


class DecodePlan:
    """Static decode plan for one MICT blob: device-ready tables + stream
    arrays + shape metadata.  Separating plan (host parse) from execution
    (jit) keeps the jitted function shape-stable."""

    def __init__(self, lanes, table_log, count, init_states, words, tab_sym, tab_freq, tab_bias):
        self.lanes = lanes
        self.table_log = table_log
        self.count = count
        self.init_states = init_states
        self.words = words
        self.tab_sym = tab_sym
        self.tab_freq = tab_freq
        self.tab_bias = tab_bias
        self.alias = None  # (esc_val, esc_values) for FF 41 streams

    @property
    def n_steps(self) -> int:
        return (self.count + self.lanes - 1) // self.lanes


def make_plan(blob: bytes) -> DecodePlan:
    L, tl, count, states, words, norm, _sl, alias = mict_parse(blob)
    sym, freq_slot, bias_slot, _, _ = slot_tables(norm, tl, alias)
    # Pad words by one sentinel so the gather of an exhausted cursor is safe.
    words_p = np.concatenate([words, np.zeros(1, dtype=np.uint16)])
    plan = DecodePlan(
        L,
        tl,
        count,
        states.astype(np.uint32),
        words_p.astype(np.uint32),
        sym.astype(np.uint16),
        freq_slot.astype(np.uint32),
        bias_slot.astype(np.uint32),
    )
    plan.alias = alias  # (esc_val, esc_values) for FF 41, else None
    return plan


@partial(jax.jit, static_argnames=("table_log", "n_steps", "count"))
def rans_decode_jax(
    init_states: jax.Array,  # [L] uint32
    words: jax.Array,  # [W+1] uint32 (u16 values)
    tab_sym: jax.Array,  # [2^tl] uint16
    tab_freq: jax.Array,  # [2^tl] uint32
    tab_bias: jax.Array,  # [2^tl] uint32
    *,
    table_log: int,
    n_steps: int,
    count: int,
) -> jax.Array:
    """Decode ``count`` symbols from a MICT stream.  Returns uint16[count].

    Per step: slot extract -> 3 table gathers -> u32 mul-add -> renorm via
    exclusive prefix sum over the renorm mask + word gather.
    """
    L = init_states.shape[0]
    mask = jnp.uint32((1 << table_log) - 1)
    lane = jnp.arange(L, dtype=jnp.uint32)
    renorm_thresh = jnp.uint32(RANS_L)

    def step(carry, t):
        x, cursor = carry
        active = (t * L + lane) < count
        slot = x & mask
        sym = jnp.take(tab_sym, slot, indices_are_sorted=False)
        f = jnp.take(tab_freq, slot)
        b = jnp.take(tab_bias, slot)
        x_new = f * (x >> jnp.uint32(table_log)) + b
        need = (x_new < renorm_thresh) & active
        k = jnp.cumsum(need.astype(jnp.uint32)) - need.astype(jnp.uint32)
        w = jnp.take(words, cursor + k, mode="clip")
        x_new = jnp.where(need, (x_new << jnp.uint32(16)) | w, x_new)
        cursor = cursor + jnp.sum(need.astype(jnp.uint32))
        x = jnp.where(active, x_new, x)
        return (x, cursor), sym

    (x_final, _cursor), syms = jax.lax.scan(
        step, (init_states, jnp.uint32(0)), jnp.arange(n_steps, dtype=jnp.uint32)
    )
    del x_final  # integrity (== RANS_L) checked by the host tier
    return syms.reshape(-1)[:count]


def mict_decode_device(blob: bytes) -> np.ndarray:
    """Parse + decode one MICT blob on the default JAX backend."""
    from .device_rans import alias_substitute_escapes

    p = make_plan(blob)
    out = rans_decode_jax(
        jnp.asarray(p.init_states),
        jnp.asarray(p.words),
        jnp.asarray(p.tab_sym),
        jnp.asarray(p.tab_freq),
        jnp.asarray(p.tab_bias),
        table_log=p.table_log,
        n_steps=p.n_steps,
        count=p.count,
    )
    out = np.asarray(out)
    if p.alias is not None:
        # FF 41: decoded ESC placeholders take their true values from
        # the uncoded side stream (mirrors mict_decode_numpy).
        out = alias_substitute_escapes(out, p.alias)
    return out
