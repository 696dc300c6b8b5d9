"""Mesh-parallelism correctness: sharded training must match single-device
numerics, and tensor-parallel sharding must not change results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from serenade_tpu.parallel import (
    infer_param_shardings,
    make_mesh,
    shard_batch,
    shard_params,
)
from serenade_tpu.trainers import (
    build_optimizer,
    build_train_step,
    create_train_state,
)

CONFIG = {
    "optimizer_type": "AdamW",
    "optimizer_params": {"lr": 1e-2},
    "scheduler_type": "ConstantLR",
    "scheduler_params": {},
    "grad_norm": 1.0,
}


class _ToyModel:
    def apply(self, params, x, *, rng, deterministic, rngs=None):
        w1 = params["params"]["w1"]  # (64, 1024)
        w2 = params["params"]["w2"]  # (1024, 64)
        h = jnp.tanh(x @ w1)
        loss = jnp.mean(jnp.square(h @ w2 - x))
        return {"cfm_loss": loss, "prior_loss": jnp.float32(0.0),
                "loss": loss}


def _setup():
    rng = np.random.default_rng(0)
    params = {"params": {
        "w1": jnp.asarray(rng.normal(size=(64, 1024)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(1024, 64)) * 0.1, jnp.float32),
    }}
    x = jnp.asarray(rng.normal(size=(8, 16, 64)), jnp.float32)
    tx, _ = build_optimizer(CONFIG)
    model = _ToyModel()
    adapter = lambda b: ((b["x"],), {})  # noqa: E731
    step = build_train_step(model, tx, batch_to_model_args=adapter,
                            donate=False)
    return model, params, tx, step, x


def _run_steps(step, state, x, n=5):
    for i in range(n):
        state, metrics = step(state, {"x": x}, jax.random.key(i))
    return jax.device_get(state.params), float(metrics["train/loss"])


def test_dp_matches_single_device():
    model, params, tx, step, x = _setup()

    # single device
    state = create_train_state(params, tx)
    p_single, l_single = _run_steps(step, state, x)

    # 4-way data parallel
    mesh = make_mesh(data=4, model=1)
    params_dp = shard_params(params, mesh)
    state = create_train_state(params_dp, tx)
    x_dp = shard_batch({"x": x}, mesh)["x"]
    p_dp, l_dp = _run_steps(step, state, x_dp)

    assert l_dp == pytest.approx(l_single, rel=1e-5)
    for k in ("w1", "w2"):
        np.testing.assert_allclose(
            np.asarray(p_dp["params"][k]), np.asarray(p_single["params"][k]),
            atol=5e-4,
        )


def test_tp_matches_single_device():
    model, params, tx, step, x = _setup()
    state = create_train_state(params, tx)
    p_single, l_single = _run_steps(step, state, x)

    mesh = make_mesh(data=2, model=2)
    shardings = infer_param_shardings(params, mesh)
    # w1 (64, 1024): 65536 elems, last dim divisible -> sharded on model
    assert shardings["params"]["w1"].spec == P(None, "model")
    params_tp = shard_params(params, mesh)
    state = create_train_state(params_tp, tx)
    x_tp = shard_batch({"x": x}, mesh)["x"]
    p_tp, l_tp = _run_steps(step, state, x_tp)

    assert l_tp == pytest.approx(l_single, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_tp["params"]["w1"]), np.asarray(p_single["params"]["w1"]),
        atol=5e-4,
    )


def test_zero1_matches_replicated_opt_state():
    """ZeRO-1 (optimizer moments sharded over 'data') must change WHERE the
    Adam math lives, not its result: params after N steps match the
    replicated-moment run, live moment arrays really carry a 'data'
    sharding, and each device holds ~1/data_size of the moment bytes.
    Reference context: torch DDP replicates optimizer state per rank
    (trainers/base.py:136-148); this is the beyond-parity memory fix."""
    from serenade_tpu.parallel.sharding import (
        infer_opt_state_shardings, shard_opt_state,
    )
    from serenade_tpu.trainers.train_step import build_train_step as bts

    model, params, tx, step, x = _setup()

    mesh = make_mesh(data=4, model=2)
    params_m = shard_params(params, mesh)
    x_m = shard_batch({"x": x}, mesh)["x"]

    # baseline: same mesh, replicated opt state
    state = create_train_state(params_m, tx)
    p_rep, l_rep = _run_steps(step, state, x_m)

    # zero1: moments sharded over data (and keeping tp's 'model' placement)
    state = create_train_state(params_m, tx)
    shardings = infer_opt_state_shardings(state.opt_state, mesh)
    # w1 moment (64, 1024): param rule puts 'model' on the output features,
    # zero1 adds 'data' on the largest remaining dim
    specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)
             if s.spec != P()]
    assert any("data" in str(s) for s in specs), "no moment got 'data'"
    assert any("model" in str(s) and "data" in str(s) for s in specs), (
        "tp-param moments lost their 'model' placement under zero1")
    state = state.__class__(params=state.params,
                            opt_state=shard_opt_state(state.opt_state, mesh),
                            step=state.step)
    adapter = lambda b: ((b["x"],), {})  # noqa: E731
    step_z = bts(model, tx, batch_to_model_args=adapter, donate=False,
                 opt_state_shardings=shardings)
    st = state
    for i in range(5):
        st, metrics = step_z(st, {"x": x_m}, jax.random.key(i))
    p_z1, l_z1 = jax.device_get(st.params), float(metrics["train/loss"])

    # the update stayed sharded across steps (the constraint held through
    # donation), and per-device moment bytes dropped ~data_size x
    big = [leaf for leaf in jax.tree_util.tree_leaves(st.opt_state)
           if hasattr(leaf, "sharding") and leaf.size >= (1 << 14)]
    assert big, "no large moment leaves found"
    for leaf in big:
        assert "data" in str(leaf.sharding.spec), leaf.sharding
        shard_elems = leaf.addressable_shards[0].data.size
        assert shard_elems <= leaf.size // 4, (
            f"moment not actually partitioned: {shard_elems}/{leaf.size}")

    assert l_z1 == pytest.approx(l_rep, rel=1e-5)
    for k in ("w1", "w2"):
        np.testing.assert_allclose(
            np.asarray(p_z1["params"][k]), np.asarray(p_rep["params"][k]),
            atol=5e-5,
        )


def test_mu_dtype_bf16_moments():
    """optimizer_params.mu_dtype=bfloat16 halves first-moment storage; the
    run stays close to the f32-moment trajectory over a few steps."""
    model, params, tx32, step32, x = _setup()
    cfg = dict(CONFIG)
    cfg["optimizer_params"] = {"lr": 1e-2, "mu_dtype": "bfloat16"}
    tx16, _ = build_optimizer(cfg)
    adapter = lambda b: ((b["x"],), {})  # noqa: E731
    from serenade_tpu.trainers.train_step import build_train_step as bts
    step16 = bts(model, tx16, batch_to_model_args=adapter, donate=False)

    s32 = create_train_state(params, tx32)
    s16 = create_train_state(params, tx16)
    mus = [leaf for leaf in jax.tree_util.tree_leaves(s16.opt_state)
           if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment leaves in opt state"
    p32, _ = _run_steps(step32, s32, x, n=3)
    p16, _ = _run_steps(step16, s16, x, n=3)
    for k in ("w1", "w2"):
        np.testing.assert_allclose(
            np.asarray(p16["params"][k]), np.asarray(p32["params"][k]),
            atol=2e-3,
        )


def test_full_model_step_tp_matches_replicated():
    """VERDICT #9: the FULL Serenade train step under a dp×tp mesh matches
    the single-device run, and the UNet's big kernels are actually sharded
    on 'model' (not silently replicated)."""
    from serenade_tpu.models import Serenade

    model = Serenade(
        input_dim=32, output_dim=8, encoder_channels=8,
        decoder_channels=256, gst_embed_dim=32,
        decoder_attention_head_dim=64, dtype=jnp.float32,
    )
    b, t = 4, 32
    ks = jax.random.split(jax.random.key(0), 5)
    batch = dict(
        x=jax.random.normal(ks[0], (b, t, 32)),
        lengths=jnp.array([t, t - 8, t, t // 2]),
        logmel=jax.random.normal(ks[1], (b, t, 8)),
        midi=jax.random.uniform(ks[2], (b, t, 1)),
        loud=jax.random.uniform(ks[3], (b, t, 1)),
    )
    params = jax.jit(
        lambda bt: model.init(
            {"params": jax.random.key(1)}, bt["x"], bt["lengths"],
            bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(2),
            deterministic=True,
        )
    )(batch)
    # SGD, not Adam: Adam's first steps are ~sign(grad)*lr, so f32
    # reduction-order noise on near-zero grads flips whole-lr updates and
    # masks real numerics; SGD keeps the diff at noise scale.
    tx, _ = build_optimizer(dict(CONFIG, optimizer_type="SGD",
                                 optimizer_params={"lr": 1e-2}))

    def run(params, batch, mesh=None):
        if mesh is not None:
            params = shard_params(params, mesh)
            batch = shard_batch(batch, mesh)
        state = create_train_state(params, tx)
        step = build_train_step(model, tx, donate=False)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.key(7))
        return state, metrics

    state_1, m_1 = run(params, batch)

    mesh = make_mesh(data=2, model=2)
    # prove real partitioning before running
    shardings = infer_param_shardings(params, mesh)
    tp_specs = [
        s.spec for s in jax.tree_util.tree_leaves(shardings)
        if "model" in str(s.spec)
    ]
    assert len(tp_specs) >= 4, "no big kernel got a 'model' sharding"
    state_2, m_2 = run(params, batch, mesh)

    # live arrays really sharded (not just requested)
    flat = jax.tree_util.tree_leaves_with_path(state_2.params)
    live_tp = [p for p, leaf in flat
               if "model" in str(getattr(leaf.sharding, "spec", ""))]
    assert live_tp, "updated params lost their tp sharding"

    assert float(m_2["train/loss"]) == pytest.approx(
        float(m_1["train/loss"]), rel=1e-5)
    p1 = jax.device_get(state_1.params)
    p2 = jax.device_get(state_2.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        p1, p2,
    )


def test_zero1_checkpoint_roundtrip(tmp_path):
    """ZeRO-1-sharded optimizer state must checkpoint like any other
    sharded array tree: each process writes its moment shards, and restore
    places them straight back onto the zero1 placement (no gather)."""
    from serenade_tpu.checkpoint import (
        abstract_like, restore_checkpoint, save_checkpoint,
    )
    from serenade_tpu.parallel.sharding import (
        infer_opt_state_shardings, shard_opt_state,
    )
    from serenade_tpu.trainers.train_step import build_train_step as bts

    model, params, tx, _, x = _setup()
    mesh = make_mesh(data=4, model=2)
    params_m = shard_params(params, mesh)
    state = create_train_state(params_m, tx)
    shardings = infer_opt_state_shardings(state.opt_state, mesh)
    state = state.__class__(params=state.params,
                            opt_state=shard_opt_state(state.opt_state, mesh),
                            step=state.step)
    adapter = lambda b: ((b["x"],), {})  # noqa: E731
    step = bts(model, tx, batch_to_model_args=adapter, donate=False,
               opt_state_shardings=shardings)
    x_m = shard_batch({"x": x}, mesh)["x"]
    for i in range(2):
        state, _ = step(state, {"x": x_m}, jax.random.key(i))

    path = save_checkpoint(str(tmp_path), 2, state.params, state.opt_state)

    # restore directly onto the zero1 placement
    template = {
        "params": abstract_like(state.params, mesh),
        "opt_state": abstract_like(state.opt_state, mesh),
        "meta": {"step": np.asarray(0), "epochs": np.asarray(0)},
    }
    restored = restore_checkpoint(path, template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))),
        restored["opt_state"], jax.device_get(state.opt_state),
    )
    # the restored moments landed sharded over 'data', not gathered
    restored_big = [
        leaf for leaf in jax.tree_util.tree_leaves(restored["opt_state"])
        if hasattr(leaf, "sharding") and leaf.size >= (1 << 14)
    ]
    assert restored_big and all(
        "data" in str(leaf.sharding.spec) for leaf in restored_big)


def test_sharded_checkpoint_roundtrip_and_reshard(tmp_path):
    """Multi-host-shaped checkpointing (SURVEY §5.4 beyond-parity): live
    sharded state saves without a host gather, and restores placed directly
    onto a DIFFERENT mesh topology (orbax reshards on read)."""
    from serenade_tpu.checkpoint import (
        abstract_like, restore_checkpoint, save_checkpoint,
    )

    model, params, tx, step, x = _setup()
    mesh = make_mesh(data=4, model=2)
    params_tp = shard_params(params, mesh)
    state = create_train_state(params_tp, tx)
    x_tp = shard_batch({"x": x}, mesh)["x"]
    for i in range(2):
        state, _ = step(state, {"x": x_tp}, jax.random.key(i))

    # some leaf is actually tp-sharded before save
    assert any(
        "model" in str(getattr(leaf.sharding, "spec", ""))
        for leaf in jax.tree_util.tree_leaves(state.params)
    )
    path = save_checkpoint(str(tmp_path), 2, state.params, state.opt_state)

    # restore onto a different topology: pure-dp mesh, everything replicated
    # across 'model'=1
    mesh2 = make_mesh(data=8, model=1)
    params2 = shard_params(params, mesh2)
    state2 = create_train_state(params2, tx)
    template = {
        "params": abstract_like(state2.params, mesh2),
        "opt_state": abstract_like(state2.opt_state, mesh2),
        "meta": {"step": np.asarray(0), "epochs": np.asarray(0)},
    }
    restored = restore_checkpoint(path, template)

    # values survive the reshard bit-for-bit
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))),
        jax.device_get(state.params), jax.device_get(restored["params"]),
    )
    # restored leaves live on the NEW mesh with the requested shardings
    got = jax.tree_util.tree_leaves(restored["params"])[0]
    want = jax.tree_util.tree_leaves(abstract_like(state2.params))[0]
    assert got.sharding == want.sharding
    assert int(restored["meta"]["step"]) == 2

    # optimizer state structure survives (optax NamedTuple, not plain dicts)
    new_state = state2.__class__(
        params=restored["params"], opt_state=restored["opt_state"],
        step=state2.step,
    )
    step(new_state, {"x": shard_batch({"x": x}, mesh2)["x"]},
         jax.random.key(9))


def test_seq_sharded_attention_matches_single_device():
    """Context parallelism (beyond reference parity, SURVEY §2.3): the
    q-time-sharded attention equals the single-device op exactly."""
    from jax.sharding import Mesh, NamedSharding

    from serenade_tpu.ops.attention import (
        multi_head_attention, seq_sharded_attention,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    rng = np.random.default_rng(5)
    b, t, h, d = 2, 256, 4, 32
    q = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    mask = jnp.asarray(
        (np.arange(t)[None, :] < np.array([[t], [t - 50]])).astype(np.float32))

    ref = multi_head_attention(q, k, v, num_heads=h, key_mask=mask)
    q_sh = jax.device_put(q, NamedSharding(mesh, P(None, "seq", None)))
    got = seq_sharded_attention(
        q_sh, k, v, num_heads=h, mesh=mesh, key_mask=mask)

    # really sharded on time
    assert "seq" in str(got.sharding.spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_full_inference_seq_sharded_matches_replicated():
    """Annotation-driven sequence sharding of the WHOLE packed CFM
    inference: shard the source time axis over an 8-way 'seq' mesh and let
    XLA SPMD insert halo exchanges / gathers; output must match the
    unsharded run."""
    from jax.sharding import Mesh, NamedSharding

    from serenade_tpu.models import Serenade

    model = Serenade(
        input_dim=32, output_dim=8, encoder_channels=8,
        decoder_channels=64, gst_embed_dim=32,
        decoder_attention_head_dim=32, dtype=jnp.float32,
    )
    b, ts, tr = 1, 128, 64
    ks = jax.random.split(jax.random.key(3), 9)
    args = (
        jax.random.normal(ks[0], (b, ts, 32)), jnp.array([ts - 16]),
        jax.random.uniform(ks[1], (b, ts, 1)),
        jax.random.uniform(ks[2], (b, ts, 1)),
        jax.random.normal(ks[3], (b, tr, 32)), jnp.array([tr - 8]),
        jax.random.normal(ks[4], (b, tr, 8)),
        jax.random.uniform(ks[5], (b, tr, 1)),
        jax.random.uniform(ks[6], (b, tr, 1)),
    )
    params = model.init(
        {"params": ks[7]}, args[0][:, :, :], args[1],
        jax.random.normal(ks[8], (b, ts, 8)), args[2], args[3],
        rng=jax.random.key(0), deterministic=True,
    )

    def infer(p, *a):
        return model.apply(p, *a, rng=jax.random.key(1), n_timesteps=2,
                           method="inference")

    ref = jax.jit(infer)(params, *args)

    mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    seq_sh = NamedSharding(mesh, P(None, "seq", None))
    args_sh = list(args)
    for i in (0, 2, 3):  # source-time streams
        args_sh[i] = jax.device_put(args[i], seq_sh)
    got = jax.jit(infer)(params, *args_sh)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_batched_inference_dp_sharded_matches_replicated():
    """Serving on a slice: shard the conversion BATCH over 'data' (each
    device converts its sub-batch; params replicated) — the batched
    decode/serving dispatch path on a pod.  Output must match the
    single-device batched run."""
    from jax.sharding import Mesh, NamedSharding

    from serenade_tpu.models import Serenade

    model = Serenade(
        input_dim=32, output_dim=8, encoder_channels=8,
        decoder_channels=64, gst_embed_dim=32,
        decoder_attention_head_dim=32, dtype=jnp.float32,
    )
    b, ts, tr = 8, 64, 32
    ks = jax.random.split(jax.random.key(5), 9)
    lens_s = jnp.array([ts - (i % 3) * 8 for i in range(b)])
    lens_r = jnp.array([tr - (i % 2) * 8 for i in range(b)])
    args = (
        jax.random.normal(ks[0], (b, ts, 32)), lens_s,
        jax.random.uniform(ks[1], (b, ts, 1)),
        jax.random.uniform(ks[2], (b, ts, 1)),
        jax.random.normal(ks[3], (b, tr, 32)), lens_r,
        jax.random.normal(ks[4], (b, tr, 8)),
        jax.random.uniform(ks[5], (b, tr, 1)),
        jax.random.uniform(ks[6], (b, tr, 1)),
    )
    params = model.init(
        {"params": ks[7]}, args[0], args[1],
        jax.random.normal(ks[8], (b, ts, 8)), args[2], args[3],
        rng=jax.random.key(0), deterministic=True,
    )

    def infer(p, *a):
        return model.apply(p, *a, rng=jax.random.key(1), n_timesteps=2,
                           method="inference")

    ref = jax.jit(infer)(params, *args)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    dp = NamedSharding(mesh, P("data"))
    args_sh = tuple(
        jax.device_put(a, NamedSharding(
            mesh, P(*(("data",) + (None,) * (a.ndim - 1)))))
        for a in args
    )
    got = jax.jit(infer)(params, *args_sh)
    assert len(got.sharding.device_set) == 8  # actually distributed
    del dp
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
