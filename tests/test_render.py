"""Rendering utilities: rasterization correctness and rollout/GIF path."""

import jax
import numpy as np

from mfvae_tpu.envs.mpe import MPEState, SimpleTagEnv, make
from mfvae_tpu.envs.render import (
    BACKGROUND,
    GOOD_COLOR,
    render_state,
    rollout_frames,
    save_gif,
    save_png,
)
import jax.numpy as jnp


def test_render_draws_entities_at_positions():
    env = SimpleTagEnv(num_good_agents=1, num_adversaries=1, num_obs=1)
    state = MPEState(
        agent_pos=jnp.array([[0.5, 0.5], [-0.5, -0.5]]),  # adv, good
        agent_vel=jnp.zeros((2, 2)),
        landmark_pos=jnp.array([[0.0, 0.0]]),
        step=jnp.int32(0),
    )
    frame = render_state(env, state, size=256, extent=1.3)
    assert frame.shape == (256, 256, 3) and frame.dtype == np.uint8

    def px(x, y):
        col = int(round((x + 1.3) / 2.6 * 255))
        row = int(round((1.3 - y) / 2.6 * 255))
        return frame[row, col]

    assert tuple(px(-0.5, -0.5)) == GOOD_COLOR  # good agent disc
    assert tuple(px(0.0, 0.0)) != BACKGROUND  # landmark disc
    assert tuple(px(1.2, -1.2)) == BACKGROUND  # empty corner
    # y-axis orientation: the adversary at (+0.5, +0.5) is in the TOP half
    assert tuple(px(0.5, 0.5)) != BACKGROUND
    top = frame[: 128].astype(int).sum()
    assert top != frame[128:].astype(int).sum()


def test_rollout_frames_and_gif(tmp_path):
    for name in ("MPE_simple_tag_v3", "MPE_simple_spread_v3", "MPE_simple_world_comm_v3"):
        env = make(name, num_good_agents=2, num_adversaries=2, num_obs=1)
        frames = rollout_frames(env, jax.random.PRNGKey(0), n_steps=3, size=64)
        assert len(frames) == 4
        assert all(f.shape == (64, 64, 3) for f in frames)
        # frames change as agents move
        assert any(not np.array_equal(frames[0], f) for f in frames[1:])
    gif = save_gif(frames, str(tmp_path / "ep.gif"), fps=5)
    png = save_png(frames[0], str(tmp_path / "f0.png"))
    assert (tmp_path / "ep.gif").stat().st_size > 0
    assert (tmp_path / "f0.png").stat().st_size > 0


def test_plot_metrics(tmp_path):
    import json

    from mfvae_tpu.envs.render import plot_metrics

    jsonl = tmp_path / "metrics.jsonl"
    with open(jsonl, "w") as f:
        for step in range(5):
            for tag in ("Loss/Train", "Loss/KL_Train"):
                f.write(json.dumps({"tag": tag, "value": 1.0 / (step + 1), "step": step}) + "\n")
    out = plot_metrics(str(jsonl), str(tmp_path / "curves.png"))
    assert (tmp_path / "curves.png").stat().st_size > 0


def test_render_simple_adversary():
    """Every registered env family must rasterize (regression: the
    adversary env once fell into the tag branch and crashed on num_obs)."""
    import jax

    from mfvae_tpu.envs.mpe import make
    from mfvae_tpu.envs.render import render_state

    env = make("MPE_simple_adversary_v3", num_good_agents=2)
    obs, state = env.reset(jax.random.PRNGKey(0))
    frame = render_state(env, state, size=64)
    assert frame.shape == (64, 64, 3)
    assert frame.std() > 0  # something was drawn
