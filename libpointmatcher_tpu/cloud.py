"""PointCloud — the TPU-native data model for point clouds.

This is the capability-equivalent of the reference ``DataPoints``
(reference: pointmatcher/PointMatcher.h:207-358, DataPoints.cpp), redesigned
for XLA: instead of a variable-width (d+1)xN homogeneous feature matrix whose
column count changes at every filter, a ``PointCloud`` is a **fixed-shape,
masked** pytree:

- ``points``      [N, d] float32   point coordinates (d = 2 or 3); no
                                   homogeneous pad row — transforms are applied
                                   as ``x @ R.T + t``.
- ``mask``        [N]    bool      valid-point mask. "Removing" a point means
                                   clearing its mask bit, which keeps every
                                   array shape static under ``jax.jit``.
- ``descriptors`` {name: [N, span] float32}  named descriptor channels in
                                   insertion order (parity with the reference's
                                   ``Labels``: "normals" has span d,
                                   "densities" span 1, ...).
- ``times``       {name: [N, span] int}      named time channels.

Host-side ``compact()`` re-packs valid points to the front and pads to a
bucketed size so that repeated registrations hit the jit cache.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .errors import InvalidField

__all__ = ["PointCloud", "bucket_size", "split_int64", "merge_int64"]


def split_int64(arr) -> np.ndarray:
    """int64 [N, k] → int32 [N, 2k] (high, low interleaved).

    JAX runs with 32-bit default types; storing nanosecond timestamps on
    device would silently truncate. The reference hits the same wall in VTK
    files and splits into 32-bit halves (reference: IO.cpp:1106-1236); we use
    the same representation as the in-memory device format."""
    arr = np.asarray(arr, dtype=np.int64)
    hi = (arr >> 32).astype(np.int32)
    lo = (arr & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    out = np.empty((arr.shape[0], arr.shape[1] * 2), np.int32)
    out[:, 0::2] = hi
    out[:, 1::2] = lo
    return out


def merge_int64(arr) -> np.ndarray:
    """int32 [N, 2k] (high, low interleaved) → int64 [N, k]."""
    arr = np.asarray(arr, dtype=np.int32)
    hi = arr[:, 0::2].astype(np.int64)
    lo = arr[:, 1::2].view(np.uint32).astype(np.int64)
    return (hi << 32) | lo


def bucket_size(n: int, granule: int = 256) -> int:
    """Round ``n`` up to a jit-cache-friendly bucket.

    Buckets follow a 1-1.5-2 geometric ladder (256, 384, 512, 768, 1024, …)
    so distinct cloud sizes map to a small number of compiled programs (the
    reference recompiles nothing but pays dynamic allocation; XLA wants
    static shapes) while capping padding waste at 33% — compute cost in the
    matcher is O(N_alloc·M_alloc), so padding is paid quadratically."""
    if n <= granule:
        return granule
    p = granule * (2 ** math.floor(math.log2(n / granule)))
    if n <= p:
        return p
    if n <= (p * 3) // 2:
        return (p * 3) // 2
    return 2 * p


@jax.tree_util.register_pytree_node_class
class PointCloud:
    """Masked fixed-shape point cloud (see module docstring)."""

    __slots__ = (
        "points", "mask", "descriptors", "times", "_count_cache", "_host_cache",
    )

    def __init__(
        self,
        points,
        mask=None,
        descriptors: Optional[Mapping[str, jnp.ndarray]] = None,
        times: Optional[Mapping[str, jnp.ndarray]] = None,
    ):
        points = jnp.asarray(points)
        if points.ndim != 2:
            raise InvalidField(
                f"points must be [N, d], got shape {points.shape}"
            )
        if points.dtype not in (jnp.float32, jnp.float64):
            points = points.astype(jnp.float32)
        self.points = points
        if mask is None:
            mask = jnp.ones((points.shape[0],), dtype=bool)
        self.mask = jnp.asarray(mask, dtype=bool)
        self.descriptors: Dict[str, jnp.ndarray] = dict(descriptors or {})
        self.times: Dict[str, jnp.ndarray] = dict(times or {})
        self._count_cache: Optional[int] = None
        self._host_cache = None  # (points, mask, descriptors, times) numpy

    # ------------------------------------------------------------------ pytree
    def tree_flatten(self):
        desc_names = tuple(self.descriptors.keys())
        time_names = tuple(self.times.keys())
        children = (
            self.points,
            self.mask,
            tuple(self.descriptors[k] for k in desc_names),
            tuple(self.times[k] for k in time_names),
        )
        return children, (desc_names, time_names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        desc_names, time_names = aux
        points, mask, desc_vals, time_vals = children
        obj = object.__new__(cls)
        obj.points = points
        obj.mask = mask
        obj.descriptors = dict(zip(desc_names, desc_vals))
        obj.times = dict(zip(time_names, time_vals))
        obj._count_cache = None
        obj._host_cache = None
        return obj

    # ------------------------------------------------------------- properties
    @property
    def num_points(self) -> int:
        """Static capacity N (allocated rows, valid or not)."""
        return self.points.shape[0]

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    def count(self):
        """Traced number of valid points."""
        return jnp.sum(self.mask)

    def count_host(self) -> int:
        """Host-side number of valid points (synchronizes once, then cached —
        the instance and its mask are immutable)."""
        if self._count_cache is None:
            self._count_cache = int(np.asarray(jax.device_get(self.count())))
        return self._count_cache

    # ----------------------------------------------------------- descriptors
    # Parity: DataPoints field ops (reference: PointMatcher.h:284-329).
    def has_descriptor(self, name: str) -> bool:
        return name in self.descriptors

    def get_descriptor(self, name: str) -> jnp.ndarray:
        try:
            return self.descriptors[name]
        except KeyError:
            raise InvalidField(
                f"Missing descriptor '{name}'; have {list(self.descriptors)}"
            ) from None

    def with_descriptor(self, name: str, value) -> "PointCloud":
        value = jnp.asarray(value)
        if value.ndim == 1:
            value = value[:, None]
        if value.shape[0] != self.num_points:
            raise InvalidField(
                f"descriptor '{name}' rows {value.shape[0]} != N {self.num_points}"
            )
        new = dict(self.descriptors)
        new[name] = value
        return PointCloud(self.points, self.mask, new, self.times)

    def without_descriptor(self, name: str) -> "PointCloud":
        new = dict(self.descriptors)
        new.pop(name, None)
        return PointCloud(self.points, self.mask, new, self.times)

    def with_time(self, name: str, value) -> "PointCloud":
        """Add an int64 time channel (stored split into int32 words)."""
        value = np.asarray(value)
        if value.ndim == 1:
            value = value[:, None]
        if value.dtype == np.int64:
            value = split_int64(value)
        new = dict(self.times)
        new[name] = jnp.asarray(value, jnp.int32)
        return PointCloud(self.points, self.mask, self.descriptors, new)

    def get_time(self, name: str) -> np.ndarray:
        """Host-side int64 view of a time channel."""
        return merge_int64(np.asarray(jax.device_get(self.times[name])))

    def descriptor_labels(self) -> Tuple[Tuple[str, int], ...]:
        return tuple((k, int(v.shape[1])) for k, v in self.descriptors.items())

    def time_labels(self) -> Tuple[Tuple[str, int], ...]:
        # stored split into (high, low) int32 pairs → logical span is half
        return tuple((k, int(v.shape[1]) // 2) for k, v in self.times.items())

    # ------------------------------------------------------------- structure
    def replace(self, **kw) -> "PointCloud":
        out = PointCloud(
            kw.get("points", self.points),
            kw.get("mask", self.mask),
            kw.get("descriptors", self.descriptors),
            kw.get("times", self.times),
        )
        if "mask" not in kw:
            out._count_cache = self._count_cache
        return out

    def with_mask(self, mask) -> "PointCloud":
        """New cloud whose validity mask is ``self.mask & mask``."""
        return self.replace(mask=jnp.logical_and(self.mask, mask))

    def create_similar_empty(self, n: Optional[int] = None) -> "PointCloud":
        """Same channel structure, all-invalid (reference: DataPoints.cpp:339)."""
        n = self.num_points if n is None else n
        return PointCloud(
            jnp.zeros((n, self.dim), self.points.dtype),
            jnp.zeros((n,), bool),
            {k: jnp.zeros((n, v.shape[1]), v.dtype) for k, v in self.descriptors.items()},
            {k: jnp.zeros((n, v.shape[1]), v.dtype) for k, v in self.times.items()},
        )

    def concatenate(self, other: "PointCloud") -> "PointCloud":
        """Append ``other``'s rows (reference: DataPoints.cpp:225).

        Descriptors kept only when present in both with equal span; others are
        dropped (matching the reference's keep-common-fields behavior)."""
        if other.dim != self.dim:
            raise InvalidField("cannot concatenate clouds of different dim")
        points = jnp.concatenate([self.points, other.points], axis=0)
        mask = jnp.concatenate([self.mask, other.mask], axis=0)
        descs = {}
        for k, v in self.descriptors.items():
            if k in other.descriptors and other.descriptors[k].shape[1] == v.shape[1]:
                descs[k] = jnp.concatenate([v, other.descriptors[k]], axis=0)
        times = {}
        for k, v in self.times.items():
            if k in other.times and other.times[k].shape[1] == v.shape[1]:
                times[k] = jnp.concatenate([v, other.times[k]], axis=0)
        return PointCloud(points, mask, descs, times)

    def permute_rows(self, perm) -> "PointCloud":
        """Jit-safe row permutation (all row-aligned fields follow).

        Used once per registration by the serving skip path to put the
        reading in Morton order before the loop (ops/knn_skip.py); row
        order is otherwise meaningless to the engine (every consumer is a
        masked row-wise reduction)."""
        return PointCloud(
            self.points[perm],
            self.mask[perm],
            {k: v[perm] for k, v in self.descriptors.items()},
            {k: v[perm] for k, v in self.times.items()},
        )

    # --------------------------------------------------------- host repacking
    def compact_traced(self, cap: int) -> "PointCloud":
        """Jit-safe compaction to a STATIC row capacity: valid rows are packed
        to the front via cumsum-rank scatter (no sort, no host sync). Rows
        beyond ``cap`` survivors are dropped — callers pick ``cap`` with
        enough headroom that overflow never happens in practice (the fused
        serving path does; see parallel/batch.py)."""
        rank = jnp.cumsum(self.mask) - 1  # rank among valid rows
        keep = jnp.logical_and(self.mask, rank < cap)
        dest = jnp.where(keep, rank, cap)  # overflow/invalid → scratch row

        def scat(x):
            out = jnp.zeros((cap + 1,) + x.shape[1:], x.dtype)
            return out.at[dest].set(x)[:cap]

        mask = jnp.zeros((cap + 1,), bool).at[dest].set(keep)[:cap]
        return PointCloud(
            scat(self.points),
            mask,
            {k: scat(v) for k, v in self.descriptors.items()},
            {k: scat(v) for k, v in self.times.items()},
        )

    def compact(self, granule: int = 256, min_size: Optional[int] = None,
                ladder: bool = True) -> "PointCloud":
        """Pack valid rows to the front, pad/trim to a bucketed size.

        Run between filters outside the jitted hot loop, so downstream compute
        (whose cost is O(N_alloc)) only pays for points that survived
        filtering — the reference gets this for free by reallocating
        (DataPoints::conservativeResize); we get it by re-bucketing. The
        permutation and gathers stay on device; only the valid count (one
        scalar) is pulled to the host to pick the bucket."""
        n = self.count_host()
        if ladder:
            cap = bucket_size(max(n, 1), granule)
        else:
            # exact fine bucket — for long-lived clouds (ICPSequence maps)
            # where one compile per shape is fine and padding is paid in the
            # O(N·M) sweep every iteration
            cap = granule * math.ceil(max(n, 1) / granule)
        if min_size is not None:
            cap = max(cap, min_size)
        out = _compact_on_device(self, cap, n)
        out._count_cache = n
        return out

    def host_rows(self):
        """Raw PADDED host rows ``(points, mask)`` as numpy — row indices
        match the device layout (``to_numpy`` compacts, which would not).
        Free for clouds built by ``from_numpy`` (loader output)."""
        if self._host_cache is not None:
            pts_h, mask_h, _, _ = self._host_cache
            return np.asarray(pts_h), np.asarray(mask_h)
        pts, mask = jax.device_get((self.points, self.mask))
        return np.asarray(pts), np.asarray(mask)

    # -------------------------------------------------------------- numpy IO
    def to_numpy(self):
        """Return (points[N_valid,d], descriptors, times) as numpy, valid rows
        only; time channels come back as int64.

        Clouds freshly built by ``from_numpy`` (e.g. straight from a loader)
        answer from their cached host copy — no device→host transfer."""
        if self._host_cache is not None:
            pts_h, mask_h, descs_h, times_h = self._host_cache
        else:
            host = jax.device_get(self)
            pts_h = np.asarray(host.points)
            mask_h = np.asarray(host.mask)
            descs_h = {k: np.asarray(v) for k, v in host.descriptors.items()}
            times_h = {k: np.asarray(v) for k, v in host.times.items()}
        pts = pts_h[mask_h]
        descs = {k: v[mask_h] for k, v in descs_h.items()}
        times = {k: merge_int64(v[mask_h]) for k, v in times_h.items()}
        return pts, descs, times

    @staticmethod
    def from_numpy(points, descriptors=None, times=None, granule: int = 256) -> "PointCloud":
        points = np.asarray(points, dtype=np.float32)
        n, d = points.shape
        cap = bucket_size(max(n, 1), granule)
        pts = np.zeros((cap, d), np.float32)
        pts[:n] = points
        mask = np.zeros((cap,), bool)
        mask[:n] = True
        descs = {}
        for k, v in (descriptors or {}).items():
            v = np.asarray(v, np.float32)
            if v.ndim == 1:
                v = v[:, None]
            buf = np.zeros((cap, v.shape[1]), np.float32)
            buf[:n] = v
            descs[k] = buf
        tms = {}
        for k, v in (times or {}).items():
            v = np.asarray(v)
            if v.ndim == 1:
                v = v[:, None]
            if v.dtype != np.int32:
                v = split_int64(v)
            buf = np.zeros((cap, v.shape[1]), np.int32)
            buf[:n] = v
            tms[k] = buf
        out = PointCloud(pts, mask, descs, tms)
        out._count_cache = n
        out._host_cache = (pts, mask, descs, tms)
        return out

    def __repr__(self):
        return (
            f"PointCloud(N={self.num_points}, dim={self.dim}, "
            f"descriptors={self.descriptor_labels()}, times={self.time_labels()})"
        )


@partial(jax.jit, static_argnames=("cap",), donate_argnums=())
def _gather_compact(cloud: "PointCloud", cap: int) -> "PointCloud":
    # stable argsort puts valid rows first, preserving order
    order = jnp.argsort(jnp.logical_not(cloud.mask), stable=True)[:cap]
    rank = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    new_mask = rank < jnp.sum(cloud.mask)
    return PointCloud(
        cloud.points[order],
        new_mask,
        {k: v[order] for k, v in cloud.descriptors.items()},
        {k: v[order] for k, v in cloud.times.items()},
    )


def _compact_on_device(cloud: "PointCloud", cap: int, n_valid: int) -> "PointCloud":
    if cap == cloud.num_points and n_valid == cloud.num_points:
        return cloud
    if cap > cloud.num_points:
        pad = cap - cloud.num_points
        cloud = PointCloud(
            jnp.pad(cloud.points, ((0, pad), (0, 0))),
            jnp.pad(cloud.mask, (0, pad)),
            {k: jnp.pad(v, ((0, pad), (0, 0))) for k, v in cloud.descriptors.items()},
            {k: jnp.pad(v, ((0, pad), (0, 0))) for k, v in cloud.times.items()},
        )
    return _gather_compact(cloud, cap)
