"""XLA cost-analysis FLOP count of the full train step at the real-length
full-budget shape (b=16, T=1280, flagship 84.3M-param config) — the MFU
denominator for docs/PROFILING.md's roofline section.  CPU-only lowering;
no TPU touch."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp

from serenade_tpu.models import Serenade
from serenade_tpu.trainers import (
    build_optimizer, build_train_step, create_train_state,
)

b, t = 16, 1280
model = Serenade(input_dim=768, output_dim=80, encoder_channels=80,
                 decoder_channels=512, gst_embed_dim=256,
                 decoder_attention_head_dim=512)
ks = jax.random.split(jax.random.key(1), 5)
batch = dict(
    x=jax.random.normal(ks[0], (b, t, 768)),
    lengths=jnp.full((b,), t, jnp.int32).at[1:].set(t - 37),
    logmel=jax.random.normal(ks[1], (b, t, 80)),
    midi=jax.random.uniform(ks[2], (b, t, 1)),
    loud=jax.random.uniform(ks[3], (b, t, 1)),
)
params = jax.eval_shape(
    lambda bt: model.init(
        {"params": jax.random.key(2)}, bt["x"], bt["lengths"],
        bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(3),
        deterministic=True,
    ),
    batch,
)
params = jax.tree_util.tree_map(
    lambda s: jnp.zeros(s.shape, s.dtype), params)
config = {
    "optimizer_type": "AdamW",
    "optimizer_params": {"lr": 8e-4, "mu_dtype": "bfloat16"},
    "scheduler_type": "MultiStepLR",
    "scheduler_params": {"gamma": 0.5, "milestones": [100000]},
    "grad_norm": 1.0,
}
tx, _ = build_optimizer(config)
state = create_train_state(params, tx)
step_fn = build_train_step(model, tx, donate=False)
lowered = step_fn.lower(state, batch, jax.random.key(4))
cost = lowered.cost_analysis()
c = cost[0] if isinstance(cost, (list, tuple)) else cost
n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"params={n_params/1e6:.1f}M flops_per_step={float(c['flops'])/1e12:.3f} TFLOP (b={b}, T={t})")
