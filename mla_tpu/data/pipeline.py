"""Grain host input pipeline (T9, SURVEY.md §2.2: "Grain host pipeline ...
balanced mixture sampling re-implementing C9 semantics deterministically").

Two layers:
  - ``balanced_index_dataset``: an infinite ``grain.MapDataset`` of clip
    indices whose distribution is class-balanced — C9's semantics expressed
    as a deterministic pure function of (seed, position), so any worker /
    any restart reads the same stream (no mutable sampler state to shard).
  - ``make_train_iterator``: indices -> gathered (x, y) batches, with
    optional multiprocess prefetch, checkpointable via grain's iterator
    state (complements the Orbax sampler-state path in train.loop).

Design note: the stateful ``data.sampler.BalancedSampler`` reproduces the
reference's exact per-class-cursor behavior for parity; this module is the
scale path (stateless, shardable by slicing the index stream).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import grain
import numpy as np

from mla_tpu.data.synthetic import ArrayDataset


def _per_class_tables(y: np.ndarray):
    class_indices = [np.nonzero(y[:, k])[0] for k in range(y.shape[1])]
    valid = np.array([k for k, idx in enumerate(class_indices) if len(idx)], np.int64)
    if len(valid) == 0:
        raise ValueError("no class has any positive clip")
    # ragged -> dense [n_valid, max_count] + counts, for O(1) stateless lookup
    max_n = max(len(class_indices[k]) for k in valid)
    table = np.zeros((len(valid), max_n), np.int64)
    counts = np.zeros(len(valid), np.int64)
    for row, k in enumerate(valid):
        idx = class_indices[k]
        table[row, : len(idx)] = idx
        counts[row] = len(idx)
    return table, counts


def balanced_index_dataset(
    y: np.ndarray, seed: int = 0, start_position: int = 0
) -> grain.MapDataset:
    """Infinite MapDataset of clip indices, class-balanced.

    Position p deterministically maps to: class = row p of a seeded
    per-epoch permutation over valid classes; clip = a seeded draw from
    that class's clip list (counter-based RNG: fold (seed, p) -> draw).
    Stateless => resumable from ANY position in O(1) (``start_position``
    simply begins the counter there — the stream content at position p is
    independent of where iteration started) and shardable across hosts by
    ``ds[shard::num_shards]`` slicing.
    """
    table, counts = _per_class_tables(y)
    n_valid = len(counts)

    def index_at(p: int) -> int:
        epoch, slot = divmod(p, n_valid)
        class_perm = np.random.default_rng((seed, 1, epoch)).permutation(n_valid)
        row = int(class_perm[slot])
        draw = int(np.random.default_rng((seed, 2, p)).integers(0, counts[row]))
        return int(table[row, draw])

    return grain.MapDataset.range(start_position, 2**62).map(index_at)


def make_train_iterator(
    ds: ArrayDataset,
    batch_size: int,
    seed: int = 0,
    workers: int = 0,
    start_index: int = 0,
    host_index: int = 0,
    host_count: int = 1,
    read_buffer_batches: int = 4,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Infinite (x, y) batch iterator with balanced classes (T9).

    workers > 0 enables grain multiprocess prefetch (useful once decode is
    real IO; synthetic in-RAM data doesn't need it).

    ``start_index`` (in GLOBAL batches) resumes in O(1): the balanced
    stream is a pure function of absolute position, so resuming batch k
    just starts the position counter there — no skip loop, no iterator
    state (round-1 VERDICT item 5).

    Multi-host sharding (T9 at pod scale): with ``host_count`` H, host h
    yields the h-th contiguous ``batch_size/H`` slice of every GLOBAL
    batch — concatenating all hosts' step-s sub-batches reproduces the
    unsharded stream's batch s exactly, with zero coordination (each
    position is a pure function of (seed, global position)).
    """
    if batch_size % host_count:
        raise ValueError(f"batch_size {batch_size} not divisible by {host_count} hosts")
    if not 0 <= host_index < host_count:
        raise ValueError(f"host_index {host_index} outside [0, {host_count})")
    per_host = batch_size // host_count
    x_arr, y_arr = ds.x, ds.y
    if host_count == 1:
        index_ds = balanced_index_dataset(
            y_arr, seed, start_position=start_index * batch_size
        )
    else:
        # local position -> global position within this host's batch slice
        base = balanced_index_dataset(y_arr, seed)

        def global_pos(p_local: int) -> int:
            step, j = divmod(p_local, per_host)
            return step * batch_size + host_index * per_host + j

        index_ds = (
            grain.MapDataset.range(start_index * per_host, 2**62)
            .map(lambda p: base[global_pos(p)])
        )
    pipeline = (
        index_ds
        .map(lambda i: {"x": x_arr[i], "y": y_arr[i]})
        .batch(per_host)
    )
    # the elements reaching the iterator are whole BATCHES: grain's default
    # ReadOptions (500-element buffer, 16 threads) would let the prefetcher
    # race ~500 batches ahead of a device-bound consumer — measured 19 GB
    # of host RSS against a 4 GB out-of-core pack. A few batches of
    # readahead already hides disk latency; order (and thus the stream's
    # determinism) is position-based and unaffected.
    it = pipeline.to_iter_dataset(
        grain.ReadOptions(num_threads=2,
                          prefetch_buffer_size=max(1, read_buffer_batches)))
    if workers:
        it = it.mp_prefetch(grain.MultiprocessingOptions(num_workers=workers))
    for rec in it:
        yield rec["x"], rec["y"]


def class_histogram(y: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Diagnostic: per-class positive counts in a drawn index set."""
    return y[indices].sum(axis=0)
