"""Checkpoint averaging: uniform mean over the last N orbax snapshots."""

import numpy as np
import jax.numpy as jnp

from serenade_tpu.checkpoint import (
    average_checkpoints,
    find_last_checkpoints,
    save_checkpoint,
)


def test_average_checkpoints(tmp_path):
    root = str(tmp_path)
    for step, scale in ((100, 1.0), (200, 2.0), (300, 6.0)):
        params = {
            "dense": {"kernel": jnp.full((3, 2), scale, jnp.float32),
                      "bias": jnp.full((2,), -scale, jnp.float32)},
            "steps_like_int": jnp.asarray(step, jnp.int32),
        }
        save_checkpoint(root, step, params)

    paths = find_last_checkpoints(root, 2)
    assert [p.endswith(f"checkpoint-{s}steps") for p, s in
            zip(paths, (200, 300))] == [True, True]

    avg = average_checkpoints(paths)
    np.testing.assert_allclose(np.asarray(avg["dense"]["kernel"]),
                               np.full((3, 2), 4.0))  # mean(2, 6)
    np.testing.assert_allclose(np.asarray(avg["dense"]["bias"]),
                               np.full((2,), -4.0))
    # non-float leaves come from the last checkpoint, not averaged
    assert int(avg["steps_like_int"]) == 300

    # N larger than available: uses everything
    all_avg = average_checkpoints(find_last_checkpoints(root, 10))
    np.testing.assert_allclose(np.asarray(all_avg["dense"]["kernel"]),
                               np.full((3, 2), 3.0))  # mean(1, 2, 6)


def test_average_window_anchors_at_checkpoint(tmp_path):
    """find_last_checkpoints(max_step=...) ends the averaging window at
    the anchor checkpoint instead of silently sliding to the newest N
    (decode --average-n pointed at an older snapshot)."""
    import os

    from serenade_tpu.checkpoint import (
        checkpoint_step, find_last_checkpoints,
    )

    for s in (100, 200, 300, 400):
        os.makedirs(tmp_path / f"checkpoint-{s}steps")
    anchor = str(tmp_path / "checkpoint-300steps")
    assert checkpoint_step(anchor) == 300
    assert checkpoint_step(anchor + "/") == 300
    assert checkpoint_step(str(tmp_path / "model.pkl")) is None
    paths = find_last_checkpoints(str(tmp_path), 2, max_step=300)
    assert [os.path.basename(p) for p in paths] == [
        "checkpoint-200steps", "checkpoint-300steps"]
    # without the anchor the newest N win (the old behavior, still the
    # right default when no step is encoded in the path)
    paths = find_last_checkpoints(str(tmp_path), 2)
    assert [os.path.basename(p) for p in paths] == [
        "checkpoint-300steps", "checkpoint-400steps"]
