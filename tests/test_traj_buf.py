"""TrajectoryBuffer tests: episode slicing from segments, acceptance ranges,
grid filter coverage, HDF5 round-trip."""

import numpy as np

from fsrl_tpu.data.traj_buf import TrajectoryBuffer
from fsrl_tpu.types import Transition


def seg(T, N, ep_len=5, rew=1.0, cost=0.0):
    t = np.arange(T)[:, None] * np.ones((1, N))
    trunc = ((t % ep_len) == ep_len - 1)
    z = np.zeros((T, N), np.float32)
    return Transition(
        obs=np.ones((T, N, 3), np.float32) * t[..., None],
        act=np.zeros((T, N, 2), np.float32),
        obs_next=np.ones((T, N, 3), np.float32),
        reward=z + rew, cost=(z + cost)[..., None],
        terminated=np.zeros((T, N), bool), truncated=trunc,
        logp=z,
    )


def test_store_segment_slices_episodes():
    buf = TrajectoryBuffer(max_trajectory=100, use_grid_filter=False)
    n = buf.store_segment(seg(12, 3, ep_len=5))
    assert n == 6           # two full episodes per env
    assert buf.num_trajectories == 6
    assert all(len(t["rewards"]) == 5 for t in buf.buffer)
    # partial episodes (2 steps carried per env) completed by the next segment
    s2 = seg(3, 3, ep_len=5)
    trunc = np.zeros((3, 3), bool)
    trunc[2, :] = True  # 2 carried + 3 new = 5-step episode ends here
    s2 = s2.replace(truncated=trunc) if hasattr(s2, "replace") else s2
    n2 = buf.store_segment(s2)
    assert n2 == 3
    assert buf.num_trajectories == 9
    assert all(len(t["rewards"]) == 5 for t in buf.buffer)


def test_acceptance_range():
    buf = TrajectoryBuffer(max_trajectory=100, use_grid_filter=False,
                           rmin=0.0, rmax=3.0)
    buf.store_segment(seg(5, 1, ep_len=5, rew=1.0))   # return 5 > rmax → reject
    assert buf.num_trajectories == 0
    buf.store_segment(seg(5, 1, ep_len=5, rew=0.5))   # return 2.5 → accept
    assert buf.num_trajectories == 1


def test_grid_filter_keeps_spatial_coverage():
    rng = np.random.RandomState(0)
    # 1000 points clustered at origin + 20 spread out far
    pts = list(rng.randn(1000, 2) * 0.1) + \
        list(rng.uniform(5, 50, size=(20, 2)))
    kept = TrajectoryBuffer.filter_points(pts, 64)
    assert len(kept) == 64
    far_kept = sum(1 for i in kept if i >= 1000)
    assert far_kept >= 15  # spread-out points survive the density filter


def test_capacity_and_filter_trigger():
    buf = TrajectoryBuffer(max_trajectory=10, use_grid_filter=True,
                           filter_interval=1.5)
    rng = np.random.RandomState(1)
    for i in range(30):
        buf.store_segment(seg(5, 1, ep_len=5, rew=rng.rand() * 10,
                              cost=rng.rand() * 10))
    assert buf.num_trajectories <= 15  # filtered back near max


def test_hdf5_roundtrip(tmp_path):
    buf = TrajectoryBuffer(max_trajectory=100, use_grid_filter=False)
    buf.store_segment(seg(10, 2, ep_len=5, rew=2.0, cost=0.5))
    path = buf.save(str(tmp_path))
    data = TrajectoryBuffer.load(path)
    assert set(data) == {"observations", "next_observations", "actions",
                         "rewards", "costs", "terminals", "timeouts"}
    assert data["rewards"].shape == (20,)
    assert float(data["costs"].sum()) == 10.0
    assert data["timeouts"].sum() == 4


def test_sample_shapes():
    buf = TrajectoryBuffer(max_trajectory=100, use_grid_filter=False)
    buf.store_segment(seg(10, 2, ep_len=5))
    batch = buf.sample(16)
    assert batch["observations"].shape == (16, 3)
    assert batch["rewards"].shape == (16,)


def test_native_grid_filter_matches_python_semantics():
    """C++ filter (when buildable) preserves the spatial-coverage contract and
    the exact count; falls back silently otherwise."""
    from fsrl_tpu.native import grid_filter_native
    rng = np.random.RandomState(2)
    pts = np.concatenate([rng.randn(5000, 2) * 0.1,
                          rng.uniform(5, 50, (50, 2))])
    kept = grid_filter_native(pts, 256, seed=0)
    if kept is None:  # no compiler in env — fallback path covered elsewhere
        return
    assert len(kept) == 256
    assert len(set(kept)) == 256          # no duplicates
    far = sum(1 for i in kept if i >= 5000)
    assert far >= 45                      # sparse region survives


def test_grid_filter_python_fallback(monkeypatch):
    """The vectorized numpy fallback must keep the same coverage property as
    the native C++ filter (breadth-first by cell depth)."""
    import fsrl_tpu.native as native
    monkeypatch.setattr(native, "_TRIED", True)
    monkeypatch.setattr(native, "_LIB", None)
    rng = np.random.RandomState(1)
    pts = list(rng.randn(2000, 2) * 0.1) + \
        list(rng.uniform(5, 50, size=(30, 2)))
    kept = TrajectoryBuffer.filter_points(pts, 100)
    assert len(kept) == 100 and len(set(kept)) == 100
    assert sum(1 for i in kept if i >= 2000) >= 25
    # n <= target: identity passthrough
    assert TrajectoryBuffer.filter_points([[0.0, 0.0], [1.0, 1.0]], 5) == [0, 1]
