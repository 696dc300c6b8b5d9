"""Expert parallelism: a mixture-of-experts FFN sharded over an 'expert'
mesh axis.

The reference has no expert (or any model) parallelism — its only strategy
is single-node DDP (ref ssc_train.py:179,351-359).  Like
:mod:`serenade_tpu.parallel.pipeline`, this is beyond-parity scale-out
infrastructure completing the dp/tp/sp/pp/ep matrix: a Switch-style
top-1-routed FFN whose E experts live one-per-device-group along an
``expert`` mesh axis.

TPU-idiomatic formulation: token routing is expressed as DENSE one-hot
dispatch/combine einsums (GShard/Switch style) — (tokens, E, capacity)
masks contracted against the token matrix — so the whole layer is three
large matmuls on the MXU with **no gather/scatter** and static shapes
(dropped tokens fall out of the capacity mask, and the residual path
carries them unchanged).  Under jit, annotating the stacked expert
weights ``P('expert')`` and the dispatched activations
``P('expert', 'data')`` makes XLA SPMD insert the all-to-all exchanges
over ICI; there is no hand-written collective to maintain, exactly like
the annotation-driven sequence parallelism in ops/attention.

Capacity semantics: each expert processes at most
``capacity = ceil(tokens/E * capacity_factor)`` tokens; overflow tokens
(beyond an expert's capacity, in token order) bypass the experts through
the residual connection — standard Switch behavior, and the property the
tests pin down.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(key, num_experts: int, d_model: int, d_ff: int,
                    dtype=jnp.float32):
    """Router + E stacked expert FFNs (leading axis = expert)."""
    kr, k1, k2 = jax.random.split(key, 3)
    s_in = 1.0 / math.sqrt(d_model)
    s_ff = 1.0 / math.sqrt(d_ff)
    return {
        "router": (jax.random.normal(kr, (d_model, num_experts)) * s_in
                   ).astype(dtype),
        "wi": (jax.random.normal(k1, (num_experts, d_model, d_ff)) * s_in
               ).astype(dtype),
        "wo": (jax.random.normal(k2, (num_experts, d_ff, d_model)) * s_ff
               ).astype(dtype),
    }


def moe_capacity(n_tokens: int, num_experts: int,
                 capacity_factor: float = 1.25) -> int:
    return max(int(math.ceil(n_tokens / num_experts * capacity_factor)), 1)


def moe_ffn(params, x, *, capacity_factor: float = 1.25,
            group_size: Optional[int] = None,
            mesh: Optional[Mesh] = None, expert_axis: str = "expert",
            data_axis: Optional[str] = "data"):
    """Switch top-1 MoE FFN.  x: (B, T, D) -> (y, aux_loss).

    Tokens route in GROUPS of ``group_size`` (default: one group per
    batch row, the GShard layout): routing queues and the capacity
    ``ceil(group_size/E * capacity_factor)`` are per group, so the dense
    dispatch/combine masks are (G, S, E, C) with C ∝ S/E — memory LINEAR
    in the token count.  A single global group (``group_size = B*T``)
    would make those masks ~(N, E, N/E) ≈ N² elements: ~1.3 GB at
    B=16, T=1024 — quadratic, OOM long before FLOPs matter.

    ``mesh`` adds the EP sharding annotations (stacked expert weights on
    ``expert_axis``; groups on ``data_axis``, experts of the dispatched
    (G, E, C, D) block on ``expert_axis``) — XLA turns the
    dispatch/combine contractions into all-to-alls.  Without a mesh it
    is the identical single-device computation (the tests' equality
    oracle).

    ``aux_loss`` is the Switch load-balancing loss (mean fraction ×
    mean router prob per expert, scaled by E) — add it to the task loss
    with a small coefficient when training.
    """
    b, t, d = x.shape
    e = params["wi"].shape[0]
    n = b * t
    s = group_size or t
    if n % s:
        raise ValueError(f"tokens {n} not divisible by group_size {s}")
    g = n // s
    cap = moe_capacity(s, e, capacity_factor)
    xg = x.reshape(g, s, d)

    logits = jnp.einsum("gsd,de->gse", xg, params["router"])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate = jnp.max(probs, axis=-1)                    # (G, S)
    choice = jnp.argmax(probs, axis=-1)               # (G, S)

    onehot = jax.nn.one_hot(choice, e, dtype=jnp.float32)      # (G, S, E)
    # position of each token within its expert's per-group queue
    pos = jnp.cumsum(onehot, axis=1) * onehot - 1.0            # (G, S, E)
    keep = (pos >= 0) & (pos < cap)
    # dispatch[g, s, e, c] = 1 iff group-g token s is slot c of expert e
    dispatch = keep[..., None] * jax.nn.one_hot(
        jnp.clip(pos, 0, cap - 1).astype(jnp.int32), cap,
        dtype=jnp.float32)                                      # (G, S, E, C)
    combine = dispatch * gate[..., None, None]                  # (G, S, E, C)

    expert_in = jnp.einsum("gsec,gsd->gecd", dispatch,
                           xg.astype(jnp.float32)).astype(x.dtype)
    if mesh is not None:
        expert_in = jax.lax.with_sharding_constraint(
            expert_in, NamedSharding(mesh, P(data_axis, expert_axis)))
    h = jax.nn.gelu(jnp.einsum("gecd,edf->gecf", expert_in, params["wi"]),
                    approximate=False)
    expert_out = jnp.einsum("gecf,efd->gecd", h, params["wo"])
    if mesh is not None:
        expert_out = jax.lax.with_sharding_constraint(
            expert_out, NamedSharding(mesh, P(data_axis, expert_axis)))

    y = jnp.einsum("gsec,gecd->gsd", combine,
                   expert_out.astype(jnp.float32))
    # residual identity: overflow tokens (combine row all-zero) pass
    # through untouched; routed tokens add their gated expert output
    y = y + xg.astype(jnp.float32)

    # Switch load-balance aux: E * sum_e f_e * p_e (over ALL tokens)
    frac = jnp.mean(onehot, axis=(0, 1))
    mean_prob = jnp.mean(probs, axis=(0, 1))
    aux = e * jnp.sum(frac * mean_prob)
    return y.reshape(b, t, d).astype(x.dtype), aux


def place_moe_params(params, mesh: Mesh, expert_axis: str = "expert"):
    """Device-put stacked expert weights so each device group holds ONLY
    its experts (leading E axis sharded on ``expert_axis``; the router is
    replicated) — the memory point of EP."""
    def put(name, leaf):
        spec = P() if name == "router" else P(expert_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return {k: put(k, v) for k, v in params.items()}


def expert_mesh(expert: int, data: int = 1):
    """A ('data', 'expert') mesh (make_mesh with a renamed second axis —
    inherits its device-count validation and topology-aware layout)."""
    from serenade_tpu.parallel.mesh import make_mesh

    return make_mesh(data=data, model=expert, axis_names=("data", "expert"))
