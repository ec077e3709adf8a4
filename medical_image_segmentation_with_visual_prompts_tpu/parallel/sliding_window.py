"""Device-side batched sliding-window 3D inference.

The reference's test-time bottleneck is a host-side loop: center-crop,
``unfold`` on the CPU, re-batch windows in chunks of 10, one
host→device copy per chunk (segmentation.py:229-266; SURVEY.md §3.4 ★).
Here the entire pipeline is ONE jitted XLA program per volume shape:

* window extraction by ``dynamic_slice`` under ``lax.scan`` (overlapping
  windows, stride = roi/2 by default — any stride ≤ roi is supported,
  see ``resolve_stride``) straight from the device-resident volume;
* chunked model forwards inside the same program (scan over chunks);
* two output modes:
  - ``per_window`` — per-window metric statistics, exactly the
    reference's evaluation protocol (no stitching);
  - ``gaussian`` — NEW capability: softmax probabilities are blended
    into a full-volume prediction with a separable Gaussian importance
    map (σ = roi/8), then argmax'd — the standard sliding-window
    inference medical pipelines expect.

The window batch is padded to a fixed chunk size so every volume shape
compiles exactly one program; padded windows carry zero blend weight /
are masked from the metrics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resolve_stride(window: Sequence[int], stride=None) -> Tuple[int, ...]:
    """Normalize a stride spec to a per-axis int tuple.

    ``None`` → the reference's roi/2 (segmentation.py:243-252, the
    parity default); a float ``f`` → ``max(1, int(w * f))`` per axis
    (``0.75`` ≈ 2-3× fewer windows on the canonical volume); a sequence
    → per-axis strides.  Strides larger than the window would leave
    uncovered gaps and are rejected.
    """
    if stride is None:
        s = tuple(w // 2 for w in window)
    elif isinstance(stride, (int, float)):
        if stride <= 0:
            raise ValueError(f"stride factor must be positive, got {stride}")
        s = tuple(max(1, int(round(w * float(stride)))) for w in window)
    else:
        s = tuple(int(v) for v in stride)
    if len(s) != len(tuple(window)):
        raise ValueError(f"stride {s} rank != window {tuple(window)}")
    if any(si > wi or si < 1 for si, wi in zip(s, window)):
        raise ValueError(f"stride {s} must be in [1, window] {tuple(window)}")
    return s


def window_starts(image_size: Sequence[int], window: Sequence[int],
                  stride=None
                  ) -> Tuple[Tuple[slice, ...], np.ndarray, Tuple[int, ...]]:
    """Center-crop slices, [N, 3] window starts, grid shape (ref :229-252)."""
    stride = resolve_stride(window, stride)
    slices, axes = [], []
    for i in range(3):
        adj = (image_size[i] - window[i]) // stride[i] * stride[i] + window[i]
        begin = (image_size[i] - adj) // 2
        slices.append(slice(begin, begin + adj))
        axes.append(np.arange(0, adj - window[i] + 1, stride[i]))
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    return (tuple(slices), grid.astype(np.int32),
            tuple(len(a) for a in axes))


def bucket_shape(cropped: Sequence[int], window: Sequence[int]
                 ) -> Tuple[int, ...]:
    """Round a stride-aligned cropped shape up to window multiples so a
    heterogeneous test set shares O(#buckets) compiled programs."""
    return tuple(int(-(-c // w) * w) for c, w in zip(cropped, window))


def cover_shape(dims: Sequence[int], window: Sequence[int], stride=None
                ) -> Tuple[int, ...]:
    """Smallest stride-grid extent ``(n-1)·s + w ≥ dims`` per axis.

    The pad-coverage serving mode pads the volume UP to this shape so
    the uniform window grid covers every real voxel (the reference's
    center-crop semantics instead discard up to ``s-1`` border voxels
    per axis — increasingly lossy at larger strides)."""
    stride = resolve_stride(window, stride)
    return tuple(
        int(max(w, -(-max(d - w, 0) // s) * s + w))
        for d, w, s in zip(dims, window, stride))


def bucketed_starts(cropped: Sequence[int], window: Sequence[int],
                    stride=None
                    ) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...]]:
    """Window grid over the BUCKET shape plus a validity mask selecting
    exactly the real (cropped-shape) grid.

    Invalid windows get zero blend weight, so the stitched prediction
    cropped back to ``cropped`` is bit-identical to the unbucketed run
    (same window set, same weights).
    """
    bucket = bucket_shape(cropped, window)
    _, starts, grid_shape = window_starts(bucket, window, stride)
    valid = np.all(starts + np.asarray(window, np.int32)
                   <= np.asarray(cropped, np.int32), axis=1)
    return starts, valid, grid_shape


def _gaussian_importance(window: Sequence[int], sigma_scale: float = 0.125
                         ) -> np.ndarray:
    """Separable Gaussian importance map over a window (center-weighted)."""
    maps = []
    for w in window:
        x = np.arange(w, dtype=np.float32) - (w - 1) / 2.0
        sigma = max(w * sigma_scale, 1e-3)
        maps.append(np.exp(-0.5 * (x / sigma) ** 2))
    g = np.einsum("i,j,k->ijk", *maps).astype(np.float32)
    return np.maximum(g, 1e-4)


def gaussian_weight_acc(starts, valid, window, out_spatial) -> np.ndarray:
    """Host-side precomputed Gaussian blend-weight accumulator.

    The stitched weight volume is input-INDEPENDENT (a pure function of
    the window grid, validity and the Gaussian importance map), so
    computing it once per (shape, grid) in numpy removes the weights
    scan-output and its whole coset-stitch pass from the device program
    — the device stitches probabilities only and divides by this map.

    ``valid`` is either an int (count of leading valid windows) or a
    per-window 0/1 vector; ``starts`` may include chunk padding (padded
    rows must be marked invalid / beyond the count).
    """
    g = _gaussian_importance(window)
    starts = np.asarray(starts)
    if np.ndim(valid) == 0:
        vmask = np.arange(starts.shape[0]) < int(valid)
    else:
        vmask = np.asarray(valid) > 0
    acc = np.zeros((*out_spatial, 1), np.float32)
    wh, ww, wd = window
    for s, v in zip(starts, vmask):
        if v:
            acc[s[0]:s[0] + wh, s[1]:s[1] + ww, s[2]:s[2] + wd, 0] += g
    return acc


def _coset_stitch(values: jnp.ndarray, grid_shape, window, stride,
                  out_spatial) -> jnp.ndarray:
    """Sum overlapping windows into a volume without sequential scatter.

    Generalized coset decomposition: along axis i, windows whose grid
    index is congruent mod ``k_i = ceil(w_i / s_i)`` start ``k_i * s_i ≥
    w_i`` apart, so they are disjoint.  Zero-padding each window from
    ``w_i`` to the coset pitch ``k_i * s_i`` makes every coset tile a
    contiguous slab — a pure reshape/transpose + pad + add, fully
    parallel on device, unlike a scatter loop.  At the parity default
    ``s = w/2`` this reduces to the 8-parity-coset scheme (pitch == w,
    the pad is a no-op); at ``s = w`` it is a single reshape.

    values: ``[N, wh, ww, wd, C]`` in meshgrid (i-major) window order.
    """
    n0, n1, n2 = grid_shape
    c = values.shape[-1]
    ks = tuple(-(-w // s) for w, s in zip(window, stride))
    pitch = tuple(k * s for k, s in zip(ks, stride))
    if pitch != tuple(window):
        # Pad windows to the coset pitch; padded voxels carry zero
        # probability/weight so the stitched sum is unchanged.
        values = jnp.pad(values, [(0, 0)] + [
            (0, p - w) for p, w in zip(pitch, window)] + [(0, 0)])
    p0, p1, p2 = pitch
    s0, s1, s2 = stride
    grids = values.reshape(n0, n1, n2, p0, p1, p2, c)
    out = jnp.zeros((*out_spatial, c), values.dtype)
    for a in range(min(ks[0], n0)):
        for b in range(min(ks[1], n1)):
            for d in range(min(ks[2], n2)):
                sub = grids[a::ks[0], b::ks[1], d::ks[2]]
                na, nb, nd = sub.shape[:3]
                slab = sub.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
                    na * p0, nb * p1, nd * p2, c)
                # The last window's pitch padding may overrun the volume
                # (it holds only zeros there) — crop before placing.
                off = (a * s0, b * s1, d * s2)
                ext = [min(e, o - f) for e, o, f in
                       zip((na * p0, nb * p1, nd * p2), out_spatial, off)]
                slab = slab[:ext[0], :ext[1], :ext[2]]
                pads = [(f, o - f - e) for f, o, e in
                        zip(off, out_spatial, ext)] + [(0, 0)]
                out = out + jnp.pad(slab, pads)
    return out


def make_sliding_window_fn(apply_fn, window: Sequence[int], chunk: int,
                           num_classes: int, mode: str = "gaussian",
                           grid_shape: Sequence[int] = None,
                           mesh=None, stride=None, preprocess=None):
    """Build a jitted volume → prediction/stats function.

    Args:
      apply_fn: ``(image_batch [chunk, *window, C_in]) -> logits
        [chunk, *window, num_classes]`` (closes over variables).
      window: roi size.
      chunk: fixed window batch size per forward.
      num_classes: segmentation classes.
      mode: ``gaussian`` (returns stitched class-probability volume) or
        ``per_window`` (returns per-window argmax predictions).
      grid_shape: (n0, n1, n2) window-grid counts (required for
        ``gaussian``; the second output of :func:`window_starts` is this
        grid flattened i-major).
      stride: window stride spec (``resolve_stride``) — must match the
        grid the ``starts`` were computed with.  Default roi/2 (parity
        with the reference protocol); larger strides cut the number of
        model forwards per volume (the dominant serving cost).
      preprocess: optional jit-traceable volume transform applied ON
        DEVICE before window extraction (e.g. intensity windowing of a
        narrow int16 H2D payload).  Padded voxels pass through it but
        only ever reach zero-weight windows or the cropped-away bucket
        margin, so the stitched output is unaffected by their value.

    The returned fn takes (volume [H', W', D', C_in] already center-
    cropped, starts [N, 3] int32) with N padded to a multiple of
    ``chunk`` (pad starts with 0 and pass ``n_valid``).

    With ``mesh`` (a 1-D ``data`` mesh), each chunk's window batch is
    sharded across the mesh inside the program — batched prompt-
    conditioned sliding-window SERVING over the mesh (``chunk`` must be
    a multiple of the mesh size); the stitched volume stays replicated.
    """
    wh, ww, wd = window
    stride = resolve_stride(window, stride)
    gauss = jnp.asarray(_gaussian_importance(window))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        if chunk % mesh.devices.size:
            raise ValueError(
                f"chunk {chunk} not divisible by mesh size "
                f"{mesh.devices.size}")
        batch_sh = NamedSharding(mesh, P("data"))
        shard_chunk = lambda t: jax.lax.with_sharding_constraint(t, batch_sh)
    else:
        shard_chunk = lambda t: t

    @jax.jit
    def run(volume, starts, n_valid, weight_acc=None):
        if preprocess is not None:
            volume = preprocess(volume)
        n = starts.shape[0]
        n_chunks = n // chunk

        def gather_window(s):
            return jax.lax.dynamic_slice(
                volume, (s[0], s[1], s[2], 0),
                (wh, ww, wd, volume.shape[-1]))

        if mode == "gaussian":
            if grid_shape is None:
                raise ValueError("gaussian mode needs grid_shape")

            def body(_, idx):
                s_chunk = jax.lax.dynamic_slice(starts, (idx * chunk, 0),
                                                (chunk, 3))
                batch = shard_chunk(jax.vmap(gather_window)(s_chunk))
                probs = jax.nn.softmax(apply_fn(batch), axis=-1)
                if n_valid.ndim == 0:  # count of leading valid windows
                    valid = (idx * chunk + jnp.arange(chunk)) < n_valid
                else:                  # per-window validity vector [N]
                    valid = jax.lax.dynamic_slice(n_valid, (idx * chunk,),
                                                  (chunk,)) > 0
                w = gauss[..., None] * valid[:, None, None, None, None]
                if weight_acc is not None:
                    return None, probs * w
                return None, (probs * w, w)

            nw = int(np.prod(grid_shape))
            if weight_acc is not None:
                # Blend-weight volume precomputed on the host
                # (gaussian_weight_acc): the device stitches
                # probabilities only.
                _, wprobs = jax.lax.scan(body, None, jnp.arange(n_chunks))
                wacc = weight_acc
            else:
                _, (wprobs, weights) = jax.lax.scan(body, None,
                                                    jnp.arange(n_chunks))
                weights = weights.reshape((n,) + tuple(window) + (1,))
                wacc = _coset_stitch(weights[:nw], grid_shape, window,
                                     stride, volume.shape[:3])
            wprobs = wprobs.reshape((n,) + tuple(window) + (num_classes,))
            acc = _coset_stitch(wprobs[:nw], grid_shape, window, stride,
                                volume.shape[:3])
            return acc / jnp.maximum(wacc, 1e-8)

        # per_window mode: per-window argmax predictions [N, *window].
        def body(_, idx):
            s_chunk = jax.lax.dynamic_slice(starts, (idx * chunk, 0),
                                            (chunk, 3))
            batch = shard_chunk(jax.vmap(gather_window)(s_chunk))
            pred = jnp.argmax(apply_fn(batch), axis=-1)
            return None, pred

        _, preds = jax.lax.scan(body, None, jnp.arange(n_chunks))
        return preds.reshape((n,) + tuple(window))

    return run


def pad_starts(starts: np.ndarray, chunk: int, valid: np.ndarray = None
               ) -> Tuple[np.ndarray, "int | np.ndarray"]:
    """Pad the window list to a chunk multiple.  Returns (starts, count)
    or, when a per-window validity vector is given (bucketed grids),
    (starts, padded int32 validity vector)."""
    n = starts.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        starts = np.concatenate(
            [starts, np.zeros((n_pad, 3), starts.dtype)])
    if valid is None:
        return starts, n
    v = np.concatenate([np.asarray(valid, np.int32),
                        np.zeros((n_pad,), np.int32)])
    return starts, v


class BucketedInference:
    """Gaussian sliding-window inference with shape bucketing.

    One compiled program per BUCKET shape (cropped dims rounded up to
    window multiples) instead of one per distinct volume shape — a
    heterogeneous test set over the 40s-7min remote-compile tunnel
    compiles O(#buckets) programs.  Exact: bucket-grid windows outside
    the real grid carry zero blend weight, so the cropped-back result
    equals the unbucketed run.
    """

    def __init__(self, apply_fn, window: Sequence[int], chunk=None,
                 num_classes: int = 2, mesh=None, stride=None,
                 preprocess=None, coverage: str = "crop",
                 pad_value: float = 0.0):
        # ``chunk=None`` = auto: per bucket, the window batch is the
        # full grid when it fits (≤ 32 — one scan step, zero padding
        # slots; the 27-window canonical grid measured +14% over
        # chunk 16 this way, PERF.md round 5), else 16; always rounded
        # up to a mesh multiple for DP serving.
        self.apply_fn = apply_fn
        self.window = tuple(window)
        self.chunk = chunk
        self.num_classes = num_classes
        self.mesh = mesh
        self.preprocess = preprocess
        # Callers that center-crop the volume themselves must crop with
        # this same stride (window_starts(..., stride=runner.stride)).
        self.stride = resolve_stride(window, stride)
        # ``coverage``: "crop" = the reference's center-crop-to-grid
        # semantics (callers pre-crop; border voxels beyond the grid
        # are dropped — up to stride-1 per axis).  "pad" = MONAI-style
        # full coverage: the volume is padded UP to the stride-grid
        # cover with ``pad_value`` (native-HU air for raw CT feeds),
        # every real voxel lands in ≥1 window, and the stitched result
        # is cropped back — no border loss at ANY stride.
        if coverage not in ("crop", "pad"):
            raise ValueError(f"coverage must be crop|pad, got {coverage}")
        self.coverage = coverage
        self.pad_value = pad_value
        self._runs = {}
        # Blend-weight volumes are keyed per distinct (bucket, dims) —
        # unlike the O(#buckets) program cache this can grow with every
        # distinct volume shape, and each entry is a bucket-sized fp32
        # device array, so it is LRU-bounded.
        from collections import OrderedDict
        self._waccs = OrderedDict()
        self._waccs_max = 16

    @property
    def compiled_programs(self) -> int:
        return len(self._runs)

    def _resolve_chunk(self, n_windows: int) -> int:
        """Auto chunk (``chunk=None``): the whole grid in one scan step
        when ≤ 32 windows, else 16; rounded up to a mesh multiple."""
        chunk = self.chunk
        if chunk is None:
            chunk = n_windows if n_windows <= 32 else 16
        if self.mesh is not None:
            ms = self.mesh.devices.size
            chunk = -(-chunk // ms) * ms
        return int(chunk)

    def __call__(self, cropped: np.ndarray) -> jnp.ndarray:
        """cropped: [H', W', D', C] stride-aligned volume (already
        center-cropped).  Returns stitched class probabilities
        [H', W', D', num_classes]."""
        dims = cropped.shape[:3]
        if self.coverage == "pad":
            # Full-coverage grid over the padded volume: every window
            # is real (the pad regions contribute through the Gaussian
            # blend exactly like interior overlap), result cropped back.
            bucket = cover_shape(dims, self.window, self.stride)
            _, starts, grid_shape = window_starts(bucket, self.window,
                                                  self.stride)
            valid = np.ones((starts.shape[0],), np.int32)
        else:
            bucket = bucket_shape(dims, self.window)
            starts, valid, grid_shape = bucketed_starts(
                dims, self.window, self.stride)
        chunk = self._resolve_chunk(starts.shape[0])
        key = (bucket, grid_shape, chunk)
        if key not in self._runs:
            self._runs[key] = make_sliding_window_fn(
                self.apply_fn, self.window, chunk, self.num_classes,
                mode="gaussian", grid_shape=grid_shape, mesh=self.mesh,
                stride=self.stride, preprocess=self.preprocess)
        pads = [(0, b - d) for b, d in zip(bucket, dims)] + [(0, 0)]
        vol = np.pad(np.asarray(cropped), pads,
                     constant_values=np.asarray(
                         self.pad_value, np.asarray(cropped).dtype))
        starts_p, vvec = pad_starts(starts, chunk, valid)
        wkey = (bucket, dims)
        if wkey in self._waccs:
            self._waccs.move_to_end(wkey)
        else:
            self._waccs[wkey] = jnp.asarray(gaussian_weight_acc(
                starts_p, vvec, self.window, bucket))
            while len(self._waccs) > self._waccs_max:
                self._waccs.popitem(last=False)
        probs = self._runs[key](jnp.asarray(vol), jnp.asarray(starts_p),
                                jnp.asarray(vvec), self._waccs[wkey])
        return probs[:dims[0], :dims[1], :dims[2]]
