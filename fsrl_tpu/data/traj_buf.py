"""Trajectory buffer for offline safe-RL dataset generation.

Re-design of the reference ``TrajectoryBuffer`` (``fsrl/data/traj_buf.py``):
episode-level store with reward/cost-return acceptance ranges, a **grid density
filter** over the 2-D (reward-return, cost-return) space that keeps a spatially
uniform subsample when over capacity (traj_buf.py:97-161), and HDF5 export.

TPU adaptation: training collection happens on device in (T, N_envs) segments;
``store_segment`` moves a segment to host once and slices it into completed
episodes per env column (carrying partial episodes across segment boundaries),
so dataset generation rides the fast collector for free.

Export schema is D4RL/DSRL-style: observations, next_observations, actions,
rewards, costs, terminals, timeouts.
"""

from __future__ import annotations

import os
from collections import defaultdict

import h5py
import numpy as np

KEYS = ("observations", "next_observations", "actions", "rewards", "costs",
        "terminals", "timeouts")


class TrajectoryBuffer:
    """Episode-level store for offline safe-RL dataset generation:
    reward/cost-return range acceptance, 2-D grid density filter, HDF5
    export (reference ``fsrl/data/traj_buf.py``)."""

    def __init__(
        self,
        max_trajectory: int = 99999,
        use_grid_filter: bool = True,
        rmin: float = -np.inf,
        rmax: float = np.inf,
        cmin: float = -np.inf,
        cmax: float = np.inf,
        filter_interval: float = 2.0,
    ):
        self.max_trajectory = max_trajectory
        self.buffer: list[dict[str, np.ndarray]] = []
        self.metrics: list[np.ndarray] = []
        self.rmin, self.rmax = rmin, rmax
        self.cmin, self.cmax = cmin, cmax
        self.use_grid_filter = use_grid_filter
        if use_grid_filter:
            assert filter_interval > 1, "filter interval must be > 1"
            self.filtering_thres = int(filter_interval * max_trajectory)
        self._partial: dict[int, list[dict[str, np.ndarray]]] = defaultdict(list)

    # ------------------------------------------------------------------
    def store_segment(self, tr) -> int:
        """Feed a (T, N, ...) rollout Transition (device or host); returns the
        number of completed episodes absorbed."""
        obs = np.asarray(tr.obs)
        T, N = obs.shape[:2]
        step = dict(
            observations=obs,
            next_observations=np.asarray(tr.obs_next),
            actions=np.asarray(tr.act),
            rewards=np.asarray(tr.reward),
            costs=np.asarray(tr.cost).sum(-1),
            terminals=np.asarray(tr.terminated),
            timeouts=np.asarray(tr.truncated),
        )
        done = step["terminals"] | step["timeouts"]
        n_done = 0
        for n in range(N):
            start = 0
            for t in range(T):
                if done[t, n]:
                    chunk = {k: v[start:t + 1, n] for k, v in step.items()}
                    self._partial[n].append(chunk)
                    self._finish_episode(n)
                    n_done += 1
                    start = t + 1
            if start < T:
                self._partial[n].append(
                    {k: v[start:, n] for k, v in step.items()})
        return n_done

    def _finish_episode(self, env_idx: int) -> None:
        chunks = self._partial.pop(env_idx, [])
        if not chunks:
            return
        traj = {k: np.concatenate([c[k] for c in chunks]) for k in KEYS}
        rew, cost = float(traj["rewards"].sum()), float(traj["costs"].sum())
        if not (self.rmin <= rew <= self.rmax and self.cmin <= cost <= self.cmax):
            return
        if len(self.buffer) < self.max_trajectory:
            self.buffer.append(traj)
            self.metrics.append(np.array([rew, cost]))
        elif self.use_grid_filter:
            self.buffer.append(traj)
            self.metrics.append(np.array([rew, cost]))
            if len(self.buffer) >= self.filtering_thres:
                self.apply_grid_filter()
        else:
            i = np.random.randint(0, len(self.buffer))
            self.buffer[i] = traj
            self.metrics[i] = np.array([rew, cost])

    # ------------------------------------------------------------------
    def apply_grid_filter(self) -> None:
        """Downsample to max_trajectory keeping the (reward, cost) space
        coverage uniform (reference traj_buf.py:97-117)."""
        kept = set(self.filter_points(self.metrics, self.max_trajectory))
        w = 0
        for r in range(len(self.buffer)):
            if r in kept:
                if r != w:
                    self.buffer[w] = self.buffer[r]
                    self.metrics[w] = self.metrics[r]
                w += 1
        del self.buffer[w:]
        del self.metrics[w:]

    @staticmethod
    def filter_points(points: list, target_size: int) -> list:
        """Density-uniform downsample of 2-D points (the capability of the
        reference's grid filter, traj_buf.py:119-161): bucket points into a
        ~sqrt(target)-per-side grid over the (reward, cost) bounding box and
        select breadth-first by within-cell depth, so every occupied cell
        contributes one point before any cell contributes two.

        The C++ implementation (``fsrl_tpu/native/grid_filter.cpp``) is the
        primary path (~50x faster at large n); this vectorized numpy fallback
        implements the same breadth-first-by-cell policy with randomized
        within-cell order and random ties across cells at equal depth.
        """
        from fsrl_tpu.native import grid_filter_native
        pts = np.asarray(points, dtype=np.float64)
        native = grid_filter_native(pts, target_size)
        if native is not None:
            return native
        n = pts.shape[0]
        if n <= target_size:
            return list(range(n))
        g = int(np.ceil(np.sqrt(target_size)))
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        span = np.maximum(hi - lo, 1e-12)
        cell_xy = np.minimum((pts - lo) / span * g, g).astype(np.int64)
        cid = cell_xy[:, 0] * (g + 1) + cell_xy[:, 1]

        rng = np.random.default_rng()
        shuffle = rng.permutation(n)            # randomize within-cell order
        by_cell = shuffle[np.argsort(cid[shuffle], kind="stable")]
        sorted_cid = cid[by_cell]
        # depth of each point within its cell (0 = the cell's first pick)
        new_cell = np.r_[True, sorted_cid[1:] != sorted_cid[:-1]]
        pos = np.arange(n)
        cell_start = pos[new_cell][np.cumsum(new_cell) - 1]
        depth = pos - cell_start
        # breadth-first: all depth-0 points (one per occupied cell) rank ahead
        # of any depth-1 point; ties at equal depth break randomly
        pick = np.lexsort((rng.random(n), depth))[:target_size]
        return by_cell[pick].tolist()

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return sum(len(t["rewards"]) for t in self.buffer)

    @property
    def num_trajectories(self) -> int:
        return len(self.buffer)

    def sample(self, batch_size: int) -> dict[str, np.ndarray]:
        tis = np.random.randint(0, len(self.buffer), size=batch_size)
        out = defaultdict(list)
        for ti in tis:
            traj = self.buffer[ti]
            si = np.random.randint(0, len(traj["rewards"]))
            for k in KEYS:
                out[k].append(traj[k][si])
        return {k: np.stack(v) for k, v in out.items()}

    def get_all(self) -> dict[str, np.ndarray]:
        return {k: np.concatenate([t[k] for t in self.buffer])
                for k in KEYS}

    def save(self, log_dir: str, dataset_name: str = "dataset.hdf5") -> str:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, dataset_name)
        data = self.get_all()
        with h5py.File(path, "w") as f:
            for k, v in data.items():
                f.create_dataset(k, data=v, compression="gzip")
        return path

    @staticmethod
    def load(path: str) -> dict[str, np.ndarray]:
        with h5py.File(path, "r") as f:
            return {k: f[k][()] for k in f.keys()}
