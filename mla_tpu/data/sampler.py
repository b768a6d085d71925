"""Class-balanced minibatch sampling (reference C9: ``BalancedDataGenerator``
over the 527-class long tail — SURVEY.md §2.1, reconstructed semantics:
per-class index lists, round-robin class draws, per-class cursors with
reshuffle on exhaustion).

Deterministic and resumable: the full sampler state is (seed, step,
per-class cursors, per-class permutations) and is checkpointable as plain
arrays (T10 requires sampler state in the TrainState — SURVEY.md §5).
Resume-by-replay is also supported (state_dict stores seed+step).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np


class BalancedSampler:
    """Round-robin over classes; within a class, draw clips from a seeded
    permutation, reshuffling independently per class when exhausted."""

    def __init__(self, y: np.ndarray, batch_size: int, seed: int = 0):
        if y.ndim != 2:
            raise ValueError(f"labels must be [clips, classes], got {y.shape}")
        self.y = np.asarray(y, bool)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.n_clips, self.n_classes = self.y.shape
        self.class_indices = [np.nonzero(self.y[:, k])[0] for k in range(self.n_classes)]
        self.valid_classes = np.array(
            [k for k, idx in enumerate(self.class_indices) if len(idx)], dtype=np.int64
        )
        if len(self.valid_classes) == 0:
            raise ValueError("no class has any positive clip")
        self._reset()

    def _reset(self):
        self._rng = np.random.default_rng(self.seed)
        self.step = 0
        self._class_cursor = 0
        self._class_order = self._rng.permutation(self.valid_classes)
        self._perms: Dict[int, np.ndarray] = {}
        self._cursors: Dict[int, int] = {}

    def _next_from_class(self, k: int) -> int:
        perm = self._perms.get(k)
        cur = self._cursors.get(k, 0)
        if perm is None or cur >= len(perm):
            perm = self._rng.permutation(self.class_indices[k])
            self._perms[k] = perm
            cur = 0
        self._cursors[k] = cur + 1
        return int(perm[cur])

    def _next_class(self) -> int:
        if self._class_cursor >= len(self._class_order):
            self._class_order = self._rng.permutation(self.valid_classes)
            self._class_cursor = 0
        k = int(self._class_order[self._class_cursor])
        self._class_cursor += 1
        return k

    def next_batch(self) -> np.ndarray:
        """Indices of the next balanced batch."""
        idx = np.empty(self.batch_size, dtype=np.int64)
        for i in range(self.batch_size):
            idx[i] = self._next_from_class(self._next_class())
        self.step += 1
        return idx

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            yield self.next_batch()

    # --- resumability (T10) ---
    def state_dict(self) -> Dict[str, int]:
        return {"seed": self.seed, "step": self.step}

    def load_state_dict(self, state: Dict[str, int]):
        """Deterministic resume by replay: rebuild RNG stream from seed and
        fast-forward `step` batches (index arithmetic only — O(step *
        batch_size) host work; for very long runs prefer the stateless
        Grain stream, data.pipeline="grain", which resumes in O(1))."""
        self.seed = int(state["seed"])
        self._reset()
        for _ in range(int(state["step"])):
            self.next_batch()


class SequentialSampler:
    """Plain eval-order batching (reference's non-balanced generator)."""

    def __init__(self, n_clips: int, batch_size: int):
        self.n_clips = n_clips
        self.batch_size = batch_size

    def __iter__(self):
        for s in range(0, self.n_clips, self.batch_size):
            yield np.arange(s, min(s + self.batch_size, self.n_clips))
