"""Event-log subsystem tests: round-trip, native/python byte parity,
corruption detection, episode splitting, and integration with a real
env rollout (trace-replay parity — SURVEY.md §5 observability row)."""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartpoleplusplus_tpu import CartPole3D, CartPoleParams
from cartpoleplusplus_tpu.env.obs import state_obs
from cartpoleplusplus_tpu.eventlog import (
    EpisodeSink,
    EventLogWriter,
    read_records,
    validate,
)
from cartpoleplusplus_tpu.eventlog._native.build import load as load_native


def _write_sample(path, use_native):
    w = EventLogWriter(str(path), metadata={"env": "cartpole3d", "n": 4},
                       use_native=use_native)
    rng = np.random.RandomState(0)
    for ep in range(3):
        t = 5 + ep
        w.write_chunk(ep, env_id=ep % 2,
                      state=rng.randn(t, 10).astype(np.float32),
                      action=rng.randn(t, 2).astype(np.float32),
                      reward=np.ones(t, np.float32),
                      done=np.arange(t) == t - 1)
    w.close()


def test_roundtrip_python(tmp_path):
    p = tmp_path / "log.cpe"
    _write_sample(p, use_native=False)
    recs = list(read_records(str(p)))
    assert recs[0][0] == "metadata"
    assert recs[0][1]["env"] == "cartpole3d"
    chunks = [r for k, r in recs if k == "chunk"]
    assert len(chunks) == 3
    assert chunks[2]["state"].shape == (7, 10)
    assert chunks[2]["done"][-1]
    assert validate(str(p)) == 4


def test_native_available_and_byte_identical(tmp_path):
    """The C++ engine must be buildable here and produce the exact same
    bytes as the Python writer (format.md is the single contract)."""
    assert load_native() is not None, "native event-log engine failed to build"
    p_nat, p_py = tmp_path / "nat.cpe", tmp_path / "py.cpe"
    _write_sample(p_nat, use_native=True)
    _write_sample(p_py, use_native=False)
    assert p_nat.read_bytes() == p_py.read_bytes()
    assert EventLogWriter(str(tmp_path / "x.cpe")).backend == "native"


def test_corruption_detected(tmp_path):
    p = tmp_path / "log.cpe"
    _write_sample(p, use_native=False)
    blob = bytearray(p.read_bytes())
    blob[60] ^= 0xFF  # flip a payload byte
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        validate(str(p))
    with pytest.raises(ValueError):
        list(read_records(str(p)))


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.cpe"
    p.write_bytes(struct.pack("<II", 0xDEAD, 1))
    with pytest.raises(ValueError):
        list(read_records(str(p)))


def test_episode_sink_splits_on_done(tmp_path):
    p = tmp_path / "sink.cpe"
    w = EventLogWriter(str(p), use_native=False)
    sink = EpisodeSink(w, num_envs=2)
    t, b = 6, 2
    state = np.zeros((t, b, 3), np.float32)
    action = np.zeros((t, b, 2), np.float32)
    reward = np.ones((t, b), np.float32)
    done = np.zeros((t, b), bool)
    done[2, 0] = True   # env 0 finishes an episode at step 2
    sink.add_rollout(state, action, reward, done)
    # Second rollout continues numbering.
    done2 = np.zeros((t, b), bool)
    sink.add_rollout(state, action, reward, done2)
    w.close()
    chunks = [r for k, r in read_records(str(p)) if k == "chunk"]
    env0 = [c for c in chunks if c["env_id"] == 0]
    env1 = [c for c in chunks if c["env_id"] == 1]
    # env0: [0..2 done] ep0, [3..5] ep1, [second rollout] ep1.
    assert [c["episode_id"] for c in env0] == [0, 1, 1]
    assert [len(c["reward"]) for c in env0] == [3, 3, 6]
    assert [c["episode_id"] for c in env1] == [0, 0]
    assert env0[0]["done"][-1] and not env0[1]["done"].any()


def test_trace_real_rollout(tmp_path):
    """Log a real env rollout and check the trace replays consistently:
    rewards in the log match what the env returned, episode boundaries
    match done flags."""
    env = CartPole3D(CartPoleParams(), num_envs=4)
    state, _ = jax.jit(env.reset)(0)

    def policy(obs, key):
        return jnp.zeros((obs.shape[0],), jnp.int32)

    state, (obs, action, reward, done) = jax.jit(
        lambda s: env.rollout(s, policy, 40))(state)

    p = tmp_path / "trace.cpe"
    with EventLogWriter(str(p), metadata={"obs": "pose_stack"}) as w:
        sink = EpisodeSink(w, num_envs=4)
        sink.add_rollout(np.asarray(obs), np.asarray(action)[..., None],
                         np.asarray(reward), np.asarray(done))
    total_logged = sum(r["reward"].sum()
                       for k, r in read_records(str(p)) if k == "chunk")
    np.testing.assert_allclose(total_logged, float(jnp.sum(reward)),
                               rtol=1e-6)
    assert validate(str(p)) >= 1


def test_sink_pixel_obs_stored_as_frames(tmp_path):
    """obs_as_frames: image observations land in the uint8 frames field
    (4x smaller than f32 state); the reader returns them losslessly to
    1/255."""
    p = tmp_path / "px.cpe"
    w = EventLogWriter(str(p), use_native=False)
    sink = EpisodeSink(w, num_envs=2, obs_as_frames=True)
    rng = np.random.RandomState(0)
    obs = rng.rand(3, 2, 4, 4, 3).astype(np.float32)  # (T,B,H,W,C)
    sink.add_rollout(obs, np.zeros((3, 2, 2), np.float32),
                     np.ones((3, 2), np.float32), np.zeros((3, 2), bool))
    w.close()
    chunks = [r for k, r in read_records(str(p)) if k == "chunk"]
    assert chunks[0]["state"].shape[1] == 0        # no f32 state stored
    assert chunks[0]["frames"].dtype == np.uint8
    got = chunks[0]["frames"].reshape(3, 4, 4, 3).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, obs[:, 0], atol=1 / 255.0 + 1e-6)


def test_next_episode_ids_seeds_resume(tmp_path):
    """Round-1 advisor (low): appending to an existing log must continue
    per-env episode numbering past the ids already in the file."""
    from cartpoleplusplus_tpu.eventlog import next_episode_ids

    p = tmp_path / "resume.cpe"
    w = EventLogWriter(str(p), use_native=False)
    sink = EpisodeSink(w, num_envs=2)
    t, b = 6, 2
    state = np.zeros((t, b, 3), np.float32)
    action = np.zeros((t, b, 2), np.float32)
    reward = np.ones((t, b), np.float32)
    done = np.zeros((t, b), bool)
    done[1, 0] = done[4, 0] = True   # env0 completes episodes 0 and 1
    done[2, 1] = True                # env1 completes episode 0
    sink.add_rollout(state, action, reward, done)
    w.close()

    ids = next_episode_ids(str(p), 2)
    # env0's trailing censored segment was written under episode_id 2 and
    # env1's under 1 — the next FRESH ids must not collide with either.
    np.testing.assert_array_equal(ids, [3, 2])
    # ids for envs never seen in the log start at 0.
    np.testing.assert_array_equal(next_episode_ids(str(p), 4)[2:], [0, 0])

    w2 = EventLogWriter(str(p), append=True)
    sink2 = EpisodeSink(w2, num_envs=2, initial_episode_ids=ids)
    sink2.add_rollout(state, action, reward, np.zeros((t, b), bool))
    w2.close()
    chunks = [r for k, r in read_records(str(p)) if k == "chunk"]
    pairs = [(c["env_id"], c["episode_id"]) for c in chunks]
    assert len(pairs) == len(set(pairs))  # all (env, episode) unique


def test_native_rollout_sink_bytes_match_python_sink(tmp_path):
    """eventlog_write_rollout (C++ segmentation of a whole fetched
    rollout chunk) must produce byte-identical files and episode
    counters to the per-env Python sink loop."""
    rng = np.random.RandomState(3)
    t, b, d = 17, 6, 5
    state = rng.randn(t, b, d).astype(np.float32)
    action = rng.randn(t, b, 2).astype(np.float32)
    reward = rng.rand(t, b).astype(np.float32)
    done = rng.rand(t, b) < 0.2
    done[-1, 0] = True   # boundary exactly at the chunk end
    done[:, 1] = False   # an env with no boundary at all

    paths, ids = [], []
    for use_native in (True, False):
        p = tmp_path / f"sink_{use_native}.cpe"
        w = EventLogWriter(str(p), metadata={"k": 1},
                           use_native=use_native)
        if use_native and w.backend != "native":
            pytest.skip("no native engine in this environment")
        sink = EpisodeSink(w, num_envs=b,
                           initial_episode_ids=np.arange(b))
        sink.add_rollout(state, action, reward, done)
        sink.add_rollout(state, action, reward, done)  # counters carry
        w.close()
        paths.append(p)
        ids.append(sink.episode_ids.copy())
    np.testing.assert_array_equal(ids[0], ids[1])
    assert paths[0].read_bytes() == paths[1].read_bytes()
    assert validate(str(paths[0])) >= 1
