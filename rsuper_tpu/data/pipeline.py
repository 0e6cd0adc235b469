"""Input pipeline: host-side prefetching + on-device batch augmentation.

Replaces the reference's DataLoader-worker + AugmentEternal machinery
(``train_ddp.py:114``, ``AugmentEternal.py``): instead of burning CPU workers
on per-item torch augmentation, the host threads only do IO + branchy
cropping (``dataset.py``), and the geometric/intensity augmentation runs
batched on the TPU inside one jitted function (`device_augment`), overlapped
with the train step via async dispatch.
"""

from __future__ import annotations

import os
import queue
import threading
from functools import partial
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .augment import (
    _affine_theta,
    affine_sample,
    affine_sample_window,
    center_crop,
    intensity_augment,
)
from .dataset import RSuperDataset, to_channels_last

# A/B knob for the TPU measurement batch: the round-3 crop-window affine
# (2.42× fewer gather points) coincided with a measured 73→134 ms/step
# augment regression on the real chip (VERDICT r3 weak #2). Set
# RSUPER_AUG_FULLWARP=1 to trace the previous warp-full-then-crop graph so
# the two lowering variants can be timed against each other. Trace-time
# only (jitted graphs don't re-read the environment).
_FULLWARP = bool(os.environ.get("RSUPER_AUG_FULLWARP"))
# The IMAGE warp runs through the shear-decomposed batched-matmul pipeline
# (ops/shear_warp.py) by default — the same affine map as MXU matmuls
# instead of ~8 gathers/voxel. Hardware A/B (round 5, artifacts/
# exp_augment{,_shear}_r5a.log): 36.6 ms vs 128.0 ms per step at 96³ crops.
# Labels keep the exact packed nearest gather either way. Set
# RSUPER_AUG_SHEAR=0 to fall back to the map_coordinates trilinear gather
# (the golden reference; multi-pass lerp smooths slightly more).
_SHEAR = os.environ.get("RSUPER_AUG_SHEAR", "1") not in ("0", "")


_BITS = 24  # binary channels per float32 word (exact integers up to 2^24)


def _pack_bits(m):
    """(..., C) binary -> (..., ceil(C/24)) float words (exact)."""
    C = m.shape[-1]
    words = []
    for s in range(0, C, _BITS):
        chunk = m[..., s : s + _BITS]
        pows = (2.0 ** jnp.arange(chunk.shape[-1], dtype=jnp.float32))
        words.append(jnp.sum(chunk * pows, axis=-1))
    return jnp.stack(words, axis=-1)


def _unpack_bits(w, C):
    outs = []
    for i, s in enumerate(range(0, C, _BITS)):
        n = min(_BITS, C - s)
        word = w[..., i]
        for b in range(n):
            outs.append(jnp.mod(jnp.floor(word / (2.0**b)), 2.0))
    return jnp.stack(outs, axis=-1)


def _bytes_to_words(packed_u8):
    """(..., W8) little-bitorder packed BYTES → (..., ceil(8·W8/24)) f32
    words in `_pack_bits`'s LSB-first 24-bit layout (byte k of a 3-byte
    group lands at bits 8k..8k+7, so host `np.packbits(bitorder='little')`
    channel j maps to bit j%24 of word j//24 — exactly `_pack_bits`)."""
    W8 = packed_u8.shape[-1]
    b = packed_u8.astype(jnp.float32)
    words = []
    for s in range(0, W8, 3):
        chunk = b[..., s : s + 3]
        pows = 256.0 ** jnp.arange(chunk.shape[-1], dtype=jnp.float32)
        words.append(jnp.sum(chunk * pows, axis=-1))
    return jnp.stack(words, axis=-1)


def pack_record_masks(rec, image_dtype=np.float16):
    """Host-side transfer packing: the three one-hot mask stacks (3·C binary
    uint8 channels) become one ``np.packbits`` byte plane (8× fewer bytes),
    and the float32 image narrows to `image_dtype` (f16 by default — the
    augment pass upcasts to f32 before interpolating, and the model consumes
    bf16, which is coarser than f16). At 16 classes / 140³ load size this
    cuts the per-record H2D payload from ~143 MB to ~22 MB — through the
    remote-relay link that is the difference between 0.43 and >2 patches/s
    end-to-end (driver round-4 `exp_loop_device.log`; the reference never
    pays this because its DataLoader workers feed a local PCIe GPU,
    ``train_ddp.py:114``)."""
    rec = dict(rec)
    m = np.concatenate(
        [rec.pop("label"), rec.pop("unk"), rec.pop("segment_mask")], axis=-1
    )
    rec["masks_packed"] = np.packbits(
        m.astype(np.uint8), axis=-1, bitorder="little"
    )
    if image_dtype is not None:
        rec["image"] = np.asarray(rec["image"]).astype(image_dtype)
    return rec


def pack_record_cf(rec_cf, image_dtype=np.float16):
    """Channel-FIRST record (straight out of ``RSuperDataset.sample``) →
    packed channels-last transfer record, skipping `to_channels_last`
    entirely: the native one-pass encoder (`native_io.pack_masks_cl`) reads
    the contiguous (C, D, H, W) planes and writes the packed byte plane
    directly, instead of the moveaxis → concatenate → packbits chain that
    copies the 3·C·N mask stack four times. On the 1-core loader host this
    is the difference between ~390 ms and ~50 ms per item (round-5
    `tools/profile_loader.py`) — the loader being the steady-state training
    ceiling (VERDICT r4 weak #1). Bit layout is identical to
    `pack_record_masks` (numpy fallback when the .so isn't built)."""
    from . import native_io

    label = rec_cf.pop("label")
    unk = rec_cf.pop("unk")
    seg = rec_cf.pop("segment_mask")
    packed = native_io.pack_masks_cl(label, unk, seg)
    if packed is None:  # no native lib: numpy path on channel-first stacks
        m = np.concatenate([label, unk, seg], axis=0)
        packed = np.moveaxis(
            np.packbits(m.astype(np.uint8), axis=0, bitorder="little"), 0, -1
        )
        packed = np.ascontiguousarray(packed)
    out = {"masks_packed": packed}
    for k, v in rec_cf.items():
        out[k] = v
    img = np.asarray(out["image"])[..., None]
    out["image"] = img.astype(image_dtype) if image_dtype is not None \
        else img.astype(np.float32)
    return out


def _augment_items(
    batch: Dict[str, jnp.ndarray],
    keys,
    crop_size,
    affine_prob: float,
    scale,
    rotate,
    translate,
    intensity_prob: float,
    out_dtype=jnp.float32,
    num_classes=None,
):
    """Per-item augmentation over the leading (local) batch axis.

    * random affine (scale/rotate/translate) with probability `affine_prob`,
      gated by each record's ``apply_affine`` flag (segment-targeted report
      crops are never warped — reference ``crop()`` :902);
    * centre-crop from the margined load size down to `crop_size`;
    * the 6-op intensity stack (p=0.3 each, reference :493-507).

    TPU notes: the 3·C binary mask channels ride as bit-packed float words
    through the whole pass — from either the host's ``masks_packed`` byte
    plane (preferred: 8× less H2D traffic, `pack_record_masks`, requires
    `num_classes`) or packed on device from the one-hot stacks — so the
    nearest-neighbour affine gather touches 24× fewer elements (the unpacked
    version costs more than the whole train step), unpacking once after the
    warp/crop cond. Items run under ``lax.map`` so un-warped records truly
    skip the gathers.
    """
    B = batch["image"].shape[0]
    if "masks_packed" in batch:
        if num_classes is None:
            raise ValueError("packed batches need a static num_classes")
        C = num_classes
        words = _bytes_to_words(batch["masks_packed"])
    else:
        C = batch["label"].shape[-1]
        masks = jnp.concatenate(
            [batch["label"], batch["unk"], batch["segment_mask"]], axis=-1
        ).astype(jnp.float32)
        words = _pack_bits(masks)
    C3 = 3 * C

    def one(args):
        img, w, flag, k = args
        k_aff, k_coin, k_int = jax.random.split(k, 3)
        theta = _affine_theta(k_aff, scale, rotate, translate, (0.0, 0.0, 0.0))
        coin = jax.random.uniform(k_coin) < affine_prob
        do_aff = (flag > 0) & coin

        # f16/bf16 transfer images upcast before any interpolation
        img3 = img[..., 0].astype(jnp.float32)
        # sample ONLY the centre crop window of the affine output grid —
        # identical values to warp-full-then-center_crop (same coordinates),
        # but 2.4x fewer gathers at the margined load shapes (augment.py
        # affine_sample_window)
        starts = tuple(
            (s - c) // 2 for s, c in zip(img3.shape, crop_size)
        )

        def warp(operands):
            img3, w = operands
            if _FULLWARP:  # A/B: the pre-round-3 full-volume warp graph
                return (
                    center_crop(affine_sample(img3, theta, order=1),
                                crop_size),
                    center_crop(affine_sample(w, theta, order=0), crop_size),
                )
            if _SHEAR:
                from ..ops.shear_warp import shear_affine_window

                img_w = shear_affine_window(img3, theta, crop_size, starts)
            else:
                img_w = affine_sample_window(img3, theta, crop_size, starts,
                                             order=1)
            return (
                img_w,
                affine_sample_window(w, theta, crop_size, starts, order=0),
            )

        def nowarp(operands):
            img3, w = operands
            return center_crop(img3, crop_size), center_crop(w, crop_size)

        img3, w = jax.lax.cond(do_aff, warp, nowarp, (img3, w))
        img3 = intensity_augment(img3, k_int, p=intensity_prob)
        # binary masks are exact in bf16; the image feeds a bf16 model anyway
        # — emitting the training dtype halves the step's input footprint
        # (closes the 290 MB HBM gap at 128³ with remat off; docs/perf.md)
        img3 = img3.astype(out_dtype)
        masks = _unpack_bits(w, C3).astype(out_dtype)
        return (img3[..., None], masks[..., :C], masks[..., C : 2 * C],
                masks[..., 2 * C :])

    img, lab, unk, seg = jax.lax.map(
        one,
        (
            batch["image"],
            words,
            batch.get("apply_affine", jnp.ones((B,), jnp.float32)),
            keys,
        ),
    )
    out = {
        k: v for k, v in batch.items()
        if k not in ("masks_packed", "apply_affine")
    }
    out.update(image=img, label=lab, unk=unk, segment_mask=seg)
    return out


@partial(jax.jit, static_argnames=("crop_size", "affine_prob", "scale", "rotate",
                                   "translate", "intensity_prob", "out_dtype",
                                   "num_classes"))
def device_augment(
    batch: Dict[str, jnp.ndarray],
    key,
    crop_size=(96, 96, 96),
    affine_prob: float = 0.4,
    scale=(0.0, 0.0, 0.0),
    rotate=(30.0, 30.0, 30.0),
    translate=(0.0, 0.0, 0.0),
    intensity_prob: float = 0.3,
    out_dtype=jnp.float32,
    num_classes=None,
):
    """Single-device batched augmentation (see `_augment_items`). For a
    multi-device mesh use `build_augment_step`, which keeps the data-axis
    sharding instead of replicating through ``lax.map``."""
    keys = jax.random.split(key, batch["image"].shape[0])
    return _augment_items(batch, keys, crop_size, affine_prob, scale, rotate,
                          translate, intensity_prob, out_dtype, num_classes)


def build_augment_step(
    mesh,
    crop_size=(96, 96, 96),
    affine_prob: float = 0.4,
    scale=(0.0, 0.0, 0.0),
    rotate=(30.0, 30.0, 30.0),
    translate=(0.0, 0.0, 0.0),
    intensity_prob: float = 0.3,
    out_dtype=jnp.float32,
    num_classes=None,
):
    """Returns ``augment(batch, keys) -> batch`` jitted over `mesh` with every
    array sharded on the data axis in AND out — the train loop does one
    host→device transfer per step and no re-sharding afterwards (the naive
    ``lax.map`` version replicates its outputs, forcing a second device_put:
    per-step H2D/ICI traffic for nothing).

    `keys`: (B,) PRNG keys (``jax.random.split(step_key, B)``); each shard
    augments its local items under the same ``lax.map``+``cond`` skip.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:  # jax>=0.8: jax.shard_map, no check_rep kwarg
        from jax import shard_map
        sm_kwargs = {}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        sm_kwargs = {"check_rep": False}

    def local_augment(batch, keys):
        return _augment_items(batch, keys, crop_size, affine_prob, scale,
                              rotate, translate, intensity_prob, out_dtype,
                              num_classes)

    sharded = shard_map(
        local_augment,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        **sm_kwargs,
    )
    data = NamedSharding(mesh, P("data"))
    return jax.jit(sharded, in_shardings=(data, data), out_shardings=data)


class DevicePrefetcher:
    """Overlap the host→device transfer (and optionally the augment dispatch)
    with the train step: a daemon thread pulls host batches from `loader`,
    `device_put`s batch N+1 to the mesh's data sharding — and waits for the
    copy — while step N runs on the device.

    Round-4's loop bench measured the un-overlapped transfer at 208 ms per
    17 MB item against a 96 ms step (VERDICT r4 weak #1): the copy was on
    the critical path because `local_batch_to_global` ran inline in the
    train loop. Here the transfer thread owns that wait (`block_until_ready`
    releases the GIL; over the relay it is network I/O, on real hosts DMA),
    so steady state approaches max(loader, transfer, device time) instead of
    their sum. This is the TPU-shaped counterpart of the reference's
    `pin_memory` + `non_blocking` DataLoader hand-off
    (``train_ddp.py:114``).

    `augment_fn(batch, keys) -> batch` (optional): dispatched from the
    transfer thread right after the copy, with per-item PRNG keys drawn from
    `key` exactly as the train loop would — jit dispatch is async, so this
    just front-loads the enqueue and the augment output is what waits in the
    queue. `depth` bounds device-resident prefetched batches (each holds its
    full payload in HBM until consumed).
    """

    def __init__(self, loader, mesh, depth: int = 2, augment_fn=None,
                 key=None, global_batch: Optional[int] = None):
        from ..parallel.multihost import (global_key_slices,
                                          local_batch_to_global)

        self.loader = loader
        self.mesh = mesh
        self.depth = max(1, depth)
        self.augment_fn = augment_fn
        self.key = key
        self.global_batch = global_batch
        self._to_global = local_batch_to_global
        self._key_slices = global_key_slices

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []

        def feeder():
            try:
                key = self.key
                for batch in self.loader:
                    g = self._to_global(batch, self.mesh)
                    if self.augment_fn is not None:
                        key, k = jax.random.split(key)
                        B = self.global_batch or jax.tree.leaves(g)[0].shape[0]
                        item_keys = self._key_slices(
                            jax.random.split(k, B), self.mesh
                        )
                        g = self.augment_fn(g, item_keys)
                    # wait INSIDE the feeder so the consumer never blocks on
                    # the copy; for the augmented path this also paces the
                    # feeder against real device progress
                    for leaf in jax.tree.leaves(g):
                        jax.block_until_ready(leaf)
                    q.put(g)
            except Exception as e:  # surface loader errors in the main thread
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                if err:
                    raise err[0]
                return
            yield item


class PrefetchLoader:
    """Thread-pool loader: samples records with `RSuperDataset.sample`, stacks
    channels-last batches, and keeps `prefetch` batches ready."""

    def __init__(
        self,
        dataset: RSuperDataset,
        batch_size: int,
        indices: Sequence[int],
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        transform=None,
        pack_masks: bool = False,
        image_transfer_dtype=np.float16,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = list(indices)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        # optional worker-side record transform (host augmentation —
        # data/host_augment.make_host_augment); overlaps with device compute
        # like the reference's DataLoader workers (train_ddp.py:114)
        self.transform = transform
        # pack_masks: emit `masks_packed` bytes instead of the three one-hot
        # stacks (pack_record_masks) — the consumer must be a device-augment
        # step built with num_classes. ~6.5× less H2D per step.
        self.pack_masks = pack_masks
        self.image_transfer_dtype = image_transfer_dtype

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n_batches = len(self.indices) // self.batch_size
        if n_batches == 0:
            return
        jobs: "queue.Queue" = queue.Queue()
        results: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        for bi in range(n_batches):
            for j in range(self.batch_size):
                jobs.put((bi, self.indices[bi * self.batch_size + j]))
        for _ in range(self.num_workers):
            jobs.put(None)

        def worker(wid: int):
            rng = np.random.default_rng(self.seed * 10007 + wid)
            while True:
                job = jobs.get()
                if job is None:
                    results.put(None)
                    return
                bi, idx = job

                def load(i):
                    if self.pack_masks and self.transform is None:
                        # channel-first fast path: fused native pack, no
                        # to_channels_last copies (pack_record_cf)
                        return pack_record_cf(self.dataset.sample(i, rng),
                                              self.image_transfer_dtype)
                    rec = to_channels_last(self.dataset.sample(i, rng))
                    if self.transform is not None:
                        rec = self.transform(rec, rng)
                    if self.pack_masks:
                        rec = pack_record_masks(rec, self.image_transfer_dtype)
                    return rec

                try:
                    results.put((bi, load(idx)))
                except Exception as e:  # degrade like the reference (:421-433)
                    try:
                        idx2 = int(rng.integers(len(self.dataset)))
                        results.put((bi, load(idx2)))
                    except Exception:
                        results.put((bi, e))

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        pending: Dict[int, list] = {}
        done_workers = 0
        emitted = 0
        next_batch = 0
        while emitted < n_batches:
            item = results.get()
            if item is None:
                done_workers += 1
                if done_workers == self.num_workers and not pending:
                    break
                continue
            bi, rec = item
            if isinstance(rec, Exception):
                raise rec
            pending.setdefault(bi, []).append(rec)
            while next_batch in pending and len(pending[next_batch]) == self.batch_size:
                recs = pending.pop(next_batch)
                batch = {
                    k: np.stack([r[k] for r in recs]) for k in recs[0]
                }
                yield batch
                emitted += 1
                next_batch += 1
