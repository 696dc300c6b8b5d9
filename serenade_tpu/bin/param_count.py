#!/usr/bin/env python3
"""serenade-param-count: parameter counts for any registered module or
saved checkpoint.

Counterpart of the reference's sifigan param-count tooling
(/root/reference/serenade/bin/sifigan_config/param_count.yaml — a hydra
surface that instantiates a generator and prints its size).  Here one
CLI covers every artifact in the framework:

  --checkpoint <dir|.pkl>   count a saved params tree (orbax or a
                            converted torch snapshot) — no init needed
  --config <config.yml>     instantiate config["model_type"] via the
                            registry and shape-evaluate its init
                            (jax.eval_shape: zero FLOPs, zero memory)

Prints per-top-level-submodule and total counts plus the f32/bf16/int8
resident sizes serving cares about.
"""

from __future__ import annotations

import argparse
import json


def count_tree(tree) -> dict:
    import jax

    flat = jax.tree_util.tree_leaves_with_path(tree)
    per = {}
    total = 0
    for path, leaf in flat:
        n = 1
        for d in leaf.shape:
            n *= int(d)
        total += n
        # group by the first two path levels (collection / top module)
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        group = "/".join(str(k) for k in keys[:2])
        per[group] = per.get(group, 0) + n
    return {"total": total, "per_module": dict(sorted(per.items()))}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--json", action="store_true",
                   help="machine-readable output")
    args = p.parse_args()
    if (args.checkpoint is None) == (args.config is None):
        raise SystemExit("give exactly one of --checkpoint / --config")

    import jax
    import jax.numpy as jnp

    if args.checkpoint:
        from serenade_tpu.checkpoint import restore_params_only

        tree = restore_params_only(args.checkpoint)
        src = args.checkpoint
    else:
        import serenade_tpu.models  # noqa: F401 (register model types)
        from serenade_tpu.config import load_config, resolve

        config = load_config(args.config)
        model = resolve("model", config["model_type"])(
            **dict(config.get("model_params", {})))
        t = 64
        tree = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.key(0)},
                jnp.zeros((1, t, 768)), jnp.array([t]),
                jnp.zeros((1, t, 80)), jnp.zeros((1, t, 1)),
                jnp.zeros((1, t, 1)), rng=jax.random.key(1),
                deterministic=True))
        src = f"{config['model_type']} ({args.config})"

    out = count_tree(tree)
    out["source"] = src
    out["size_mb"] = {"float32": round(out["total"] * 4 / 1e6, 1),
                      "bfloat16": round(out["total"] * 2 / 1e6, 1),
                      "int8": round(out["total"] / 1e6, 1)}
    if args.json:
        print(json.dumps(out, indent=2))
        return
    print(f"source: {out['source']}")
    for mod, n in out["per_module"].items():
        print(f"  {mod:<40s} {n / 1e6:10.3f} M")
    print(f"total: {out['total'] / 1e6:.3f} M params "
          f"(f32 {out['size_mb']['float32']} MB / "
          f"bf16 {out['size_mb']['bfloat16']} MB / "
          f"int8 {out['size_mb']['int8']} MB)")


if __name__ == "__main__":
    main()
