"""Multi-scale sliding-window + horizontal-flip TTA evaluator.

Reference protocol being reproduced exactly (reference:
additional_utils/encoding_models.py:54-155, additional_utils/models.py:
23-132; scales & crop from test_lseg.py:308-316):

    for scale in scales:
        long = ceil(base_size * scale); aspect-preserving resize
        (bilinear align_corners=True)
        pad to crop with value -mean/std (normalized zero)
        if bigger than crop: sliding 480-windows, stride 320, last
        window snapped to the border
        per window: logits(crop) + hflip(logits(hflip(crop))),
        accumulated into a canvas with per-pixel counts
        canvas /= counts; resize back to (H, W); sum over scales

TPU-first redesign (SURVEY.md §7): instead of Python loops + one thread
per GPU (reference models.py:183-248), the host *plans* the static
(scale, window) grid once per image size, and the device runs small jit
programs with fully static shapes:

- crop stage (three tiny programs + the model's standard batched
  forward, compiled ONCE and shared with every other consumer): gather
  a chunk of crops from the stacked padded scale pyramid, run the model
  on (crops, flipped crops) as one batch, scatter-add the combined
  logits into the stacked (S, Pmax, Pmax, K) canvases with donated
  buffers. The host drives the chunk loop — every array stays on
  device, padding chunks never launch, and no image-size value ever
  enters a trace (one compile total across all image sizes).
- assemble stage (one small compile per output-size *bucket*): canvases
  are count-normalized and mapped back to the original resolution by
  per-scale interpolation matrices built on host (exact
  align_corners=True semantics, zero-padded to the static canvas size),
  summed over scales, argmax -> (H_b, W_b) int32 label map. Only this
  small int map leaves the device.

The input-image scale pyramid is resized on host with the same
interpolation matrices (`lseg_tpu.ops.resize._interp_matrix`), so host
and device bilinear semantics are bit-identical.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lseg_tpu.ops.resize import _interp_matrix


# ---------------------------------------------------------------------------
# Protocol + host-side planning
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TTAProtocol:
    """The eval protocol constants (reference: test_lseg.py:308-316,
    lseg_module.py:29-38). `citys` preset uses base 2048 / crop 768 /
    scales 0.75..2.25 (test_lseg.py:308-312)."""

    base_size: int = 520
    crop_size: int = 480
    scales: Tuple[float, ...] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)
    flip: bool = True
    # normalized pad value per channel = (0 - mean) / std
    pad_value: Tuple[float, float, float] = (-1.0, -1.0, -1.0)

    @property
    def stride(self) -> int:
        # int(crop * 1/3 * 2), reference encoding_models.py:63
        return int(self.crop_size * 2.0 / 3.0)

    @functools.cached_property
    def canvas_sizes(self) -> Tuple[int, ...]:
        """Static per-scale canvas side = max(crop, ceil(base*scale))."""
        return tuple(
            max(self.crop_size, int(math.ceil(self.base_size * s)))
            for s in self.scales
        )

    @functools.cached_property
    def max_crops(self) -> int:
        """Worst-case total window count across scales (square image at
        the long-side bound)."""
        total = 0
        for c in self.canvas_sizes:
            n = self._n_windows(c)
            total += n * n
        return total

    def _n_windows(self, d: int) -> int:
        d = max(d, self.crop_size)
        return int(math.ceil((d - self.crop_size) / self.stride)) + 1

    def window_positions(self, d: int) -> List[int]:
        """Window origins along a dim of (padded) size d: stride grid
        with the last window snapped to the border
        (reference encoding_models.py:103-125)."""
        d = max(d, self.crop_size)
        return [
            min(i * self.stride, d - self.crop_size)
            for i in range(self._n_windows(d))
        ]

    def scaled_size(self, h: int, w: int, scale: float) -> Tuple[int, int]:
        """Aspect-preserving resize target: long side = ceil(base*scale)
        (reference encoding_models.py:66-76)."""
        long_size = int(math.ceil(self.base_size * scale))
        if h > w:
            height = long_size
            width = int(1.0 * w * long_size / h + 0.5)
        else:
            width = long_size
            height = int(1.0 * h * long_size / w + 0.5)
        return height, width


@dataclasses.dataclass
class TTAPlan:
    """Host-computed static plan for one input size (H, W)."""

    h: int
    w: int
    sizes: List[Tuple[int, int]]          # per-scale (h_s, w_s)
    crops: np.ndarray                      # (MAX_CROPS, 4) s,y0,x0,valid
    n_valid: int


def make_plan(proto: TTAProtocol, h: int, w: int) -> TTAPlan:
    crops = []
    sizes = []
    for si, scale in enumerate(proto.scales):
        hs, ws = proto.scaled_size(h, w, scale)
        sizes.append((hs, ws))
        for y0 in proto.window_positions(hs):
            for x0 in proto.window_positions(ws):
                crops.append((si, y0, x0, 1))
    n_valid = len(crops)
    assert n_valid <= proto.max_crops, (n_valid, proto.max_crops)
    while len(crops) < proto.max_crops:
        crops.append((0, 0, 0, 0))
    return TTAPlan(
        h=h, w=w, sizes=sizes,
        crops=np.asarray(crops, dtype=np.int32), n_valid=n_valid,
    )


def _resize_np(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Exact align_corners=True bilinear resize on host (same operator
    matrices as the device path)."""
    h, w, _ = img.shape
    out = img.astype(np.float32)
    if h != oh:
        out = np.einsum("oh,hwc->owc", _interp_matrix(h, oh, True), out)
    if w != ow:
        out = np.einsum("ow,hwc->hoc", _interp_matrix(w, ow, True), out)
    return out


def build_pyramid(
    proto: TTAProtocol, image: np.ndarray, plan: TTAPlan
) -> np.ndarray:
    """Resize the normalized (H, W, 3) image to each scale and embed it
    in ONE stacked (S, Pmax, Pmax, 3) buffer (pad = normalized zero,
    reference pad_image encoding_models.py:144-155). A single stacked
    tensor keeps the crop program switch-free (a plain dynamic_slice
    indexed by scale), which also keeps the compiled graph small."""
    pmax = max(proto.canvas_sizes)
    pad = np.asarray(proto.pad_value, dtype=np.float32)
    pyr = np.broadcast_to(
        pad, (len(proto.scales), pmax, pmax, 3)
    ).copy()
    for s, (hs, ws) in enumerate(plan.sizes):
        pyr[s, :hs, :ws] = _resize_np(image, hs, ws)
    return pyr


def _make_pyramid_builder(proto: TTAProtocol):
    """Device-side scale-pyramid construction — the TTA transfer cut.

    The host path uploads the full (S, Pmax, Pmax, 3) pyramid per image
    (~60 MB fp32 for the ADE20K protocol); over the relayed TPU link the
    measured 6.5-8 s/image was transfer-dominated. This program instead
    takes the ONE (hb, wb, 3) padded image (~25x smaller) and builds all
    S aspect-preserving resizes on device. The bilinear operators are
    constructed in-trace from iota (align_corners=True: src=o*(h-1)/
    (hs-1), triangle weights relu(1-|src-i|)) — exactly the two-tap rows
    `_interp_matrix` builds on host, so device and host pyramids are
    numerically identical (tested). One compile per (hb, wb) bucket.

    Inputs: img (hb, wb, 3) zero-padded; hw (2,) true size; sizes (S, 2)
    per-scale targets. Output: (S, Pmax, Pmax, 3) pyramid, pad_value
    outside each scale's (hs, ws) region.
    """
    pmax = max(proto.canvas_sizes)
    pad = jnp.asarray(proto.pad_value, jnp.float32)

    def axis_weights(dim_in: int, true_len, targets):
        # (S, Pmax, dim_in) interp rows; rows o >= target are zeroed
        o = jax.lax.broadcasted_iota(jnp.int32, (pmax, dim_in), 0)
        i = jax.lax.broadcasted_iota(jnp.int32, (pmax, dim_in), 1)
        t = targets[:, None, None].astype(jnp.float32)  # (S,1,1)
        ratio = (true_len - 1).astype(jnp.float32) / jnp.maximum(
            t - 1.0, 1.0)
        src = o[None].astype(jnp.float32) * ratio
        wts = jnp.maximum(0.0, 1.0 - jnp.abs(src - i[None]))
        valid = ((o[None] < targets[:, None, None])
                 & (i[None] < true_len))
        return jnp.where(valid, wts, 0.0)

    @jax.jit
    def build(img, hw, sizes):
        h, w = hw[0], hw[1]
        wh = axis_weights(img.shape[0], h, sizes[:, 0])
        ww = axis_weights(img.shape[1], w, sizes[:, 1])
        # HIGHEST precision: on TPU the default fp32 einsum runs single-
        # pass bf16 (~1e-2 rel) — the pyramid feeds the PARITY eval path,
        # so keep the resize fp32-exact (cost is noise vs the model)
        t = jnp.einsum("soh,hwc->sowc", wh, img.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        pyr = jnp.einsum("spw,sowc->sopc", ww, t,
                         precision=jax.lax.Precision.HIGHEST)
        oy = jax.lax.broadcasted_iota(jnp.int32, (pmax, pmax), 0)
        ox = jax.lax.broadcasted_iota(jnp.int32, (pmax, pmax), 1)
        inside = ((oy[None] < sizes[:, :1, None])
                  & (ox[None] < sizes[:, 1:, None]))
        return jnp.where(inside[..., None], pyr, pad)

    return build


# ---------------------------------------------------------------------------
# Device program A: crop scan -> per-scale canvases
# ---------------------------------------------------------------------------

def _make_accumulate(proto: TTAProtocol, apply_fn, num_classes: int,
                     crops_per_step: int = 4):
    """Build the jit'd crop-scan program.
    `apply_fn(images, text_features) -> logits` maps
    (B, crop, crop, 3) -> (B, crop, crop, K); text_features is a traced
    argument so label-set swaps (same K) reuse the compile.

    Three SMALL device programs with a host-driven chunk loop (all data
    stays on device between calls):

      gather:  (pyramid, metas)               -> (g, crop, crop, 3)
      forward: the model's standard batched jit (shared with every
               other consumer — ONE model compile total)
      scatter: (canvases, counts, metas, logits) -> updated, donated

    Crops are processed `crops_per_step` (g) at a time — the forward
    runs at batch 2g (crop + hflip). Partial chunks mask padding slots'
    contributions to zero; all-padding chunks never launch (the host
    knows n_valid). Earlier designs that inlined the model forward into
    one scan program (with lax.switch or stacked-slice scatter) crashed
    / ran out the TPU AOT compile helper at flagship size — keeping the
    model compile separate is also what makes label-set swaps and the
    single-scale path share one executable.

    Canvases are ONE stacked (S, Pmax, Pmax, K) tensor so gather and
    scatter are plain dynamic slices indexed by (scale, y, x)."""
    crop = proto.crop_size
    n_scales = len(proto.scales)
    pmax = max(proto.canvas_sizes)
    g = crops_per_step

    @jax.jit
    def gather(pyramid, metas):  # metas: (g, 4)
        def grab_one(meta):
            s, y0, x0 = meta[0], meta[1], meta[2]
            return jax.lax.dynamic_slice(
                pyramid, (s, y0, x0, 0), (1, crop, crop, 3)
            )[0]

        return jnp.stack([grab_one(metas[j]) for j in range(g)], axis=0)

    @jax.jit
    def combine_flip(logits):  # (2g, c, c, K) -> (g, c, c, K)
        logits = logits.astype(jnp.float32)
        return logits[:g] + logits[g:][:, :, ::-1, :]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scatter(canvases, counts, metas, combined):
        for j in range(g):
            s, y0, x0 = metas[j, 0], metas[j, 1], metas[j, 2]
            w = (metas[j, 3] > 0).astype(jnp.float32)
            idx = (s, y0, x0, 0)
            c = jax.lax.dynamic_slice(
                canvases, idx, (1, crop, crop, num_classes)
            )
            n = jax.lax.dynamic_slice(counts, idx, (1, crop, crop, 1))
            canvases = jax.lax.dynamic_update_slice(
                canvases, c + combined[j][None] * w, idx
            )
            counts = jax.lax.dynamic_update_slice(counts, n + w, idx)
        return canvases, counts

    @jax.jit
    def normalize(canvases, counts):
        return canvases / jnp.maximum(counts, 1.0)

    # apply_fn is a host-level callable whose params live INSIDE its own
    # jit as arguments (engine/serve.make_logits_fn). Re-jitting it here
    # would inline the weights as constants — see serve.py docstring.
    forward = apply_fn

    @jax.jit
    def flip_cat(patches):
        return jnp.concatenate([patches, patches[:, :, ::-1, :]], axis=0)

    @jax.jit
    def to_f32(x):
        return x.astype(jnp.float32)

    def run(pyramid, crop_meta, text_features):
        canvases = jnp.zeros((n_scales, pmax, pmax, num_classes),
                             jnp.float32)
        counts = jnp.zeros((n_scales, pmax, pmax, 1), jnp.float32)
        n_chunks = -(-int(np.sum(crop_meta[:, 3] > 0)) // g)
        for ci in range(n_chunks):
            metas = jnp.asarray(crop_meta[ci * g: (ci + 1) * g])
            patches = gather(pyramid, metas)
            if proto.flip:
                combined = combine_flip(
                    forward(flip_cat(patches), text_features)
                )
            else:
                combined = to_f32(forward(patches, text_features))
            canvases, counts = scatter(canvases, counts, metas, combined)
        return normalize(canvases, counts)

    return run


# ---------------------------------------------------------------------------
# Device program B: canvases -> full-res argmax (per output bucket)
# ---------------------------------------------------------------------------

def _make_assemble(proto: TTAProtocol, num_classes: int, return_logits):

    def run(canvases, mats_h, mats_w):
        # canvases: (S, Pmax, Pmax, K); mats: (S, out, Pmax) zero-padded
        total = jnp.einsum("soh,shwk->sowk", mats_h, canvases)
        total = jnp.einsum("sow,shwk->shok", mats_w, total)
        total = jnp.sum(total, axis=0)
        if return_logits:
            return total
        return jnp.argmax(total, axis=-1).astype(jnp.int32)

    return jax.jit(run)


def _bucket(x: int, step: int = 64) -> int:
    return int(math.ceil(x / step)) * step


class MultiScaleEvaluator:
    """Drop-in equivalent of the reference `LSeg_MultiEvalModule`
    (additional_utils/models.py:23-132): __call__(image, text_features)
    -> (H, W) int32 label map (or summed fp32 logits).

    `apply_fn(images, text_features)`: batched crop forward at the
    protocol's crop size. One instance caches plans per input size and
    the assemble program per output bucket.
    """

    def __init__(
        self,
        apply_fn,
        num_classes: int,
        proto: TTAProtocol = TTAProtocol(),
        bucket_step: int = 64,
        crops_per_step: int = 4,
        device_pyramid: bool = True,
    ):
        self.proto = proto
        self.num_classes = num_classes
        self.bucket_step = bucket_step
        self.crops_per_step = crops_per_step
        # build the scale pyramid on device from the single uploaded
        # image (~25x less host->device traffic); False = host path
        # (the oracle both are tested against)
        self.device_pyramid = device_pyramid
        self._apply_fn = apply_fn
        self._plans: Dict[Tuple[int, int], TTAPlan] = {}
        self._accumulate = None
        self._pyramid_builder = None
        self._assemble_logits = _make_assemble(proto, num_classes, True)
        self._assemble_argmax = _make_assemble(proto, num_classes, False)

    def _plan(self, h: int, w: int) -> TTAPlan:
        plan = self._plans.get((h, w))
        if plan is None:
            plan = make_plan(self.proto, h, w)
            self._plans[(h, w)] = plan
        return plan

    def _device_pyramid(self, image: np.ndarray, plan: TTAPlan):
        h, w, _ = image.shape
        hb = _bucket(h, self.bucket_step)
        wb = _bucket(w, self.bucket_step)
        if self._pyramid_builder is None:
            self._pyramid_builder = _make_pyramid_builder(self.proto)
        img = np.zeros((hb, wb, 3), np.float32)
        img[:h, :w] = image
        return self._pyramid_builder(
            jnp.asarray(img),
            jnp.asarray([h, w], np.int32),
            jnp.asarray(plan.sizes, np.int32),
        )

    def _canvases(self, image: np.ndarray, text_features):
        h, w, _ = image.shape
        plan = self._plan(h, w)
        if self.device_pyramid:
            pyramid = self._device_pyramid(image, plan)
        else:
            pyramid = jnp.asarray(build_pyramid(self.proto, image, plan))
        if self._accumulate is None:
            self._accumulate = _make_accumulate(
                self.proto, self._apply_fn, self.num_classes,
                self.crops_per_step,
            )
        crops = plan.crops
        g = self.crops_per_step
        if len(crops) % g:
            crops = np.concatenate(
                [crops,
                 np.zeros((g - len(crops) % g, 4), crops.dtype)], axis=0
            )
        canvases = self._accumulate(
            pyramid, jnp.asarray(crops), text_features
        )
        return canvases, plan

    def _mats(self, plan: TTAPlan, hb: int, wb: int):
        pmax = max(self.proto.canvas_sizes)
        s = len(self.proto.scales)
        mats_h = np.zeros((s, hb, pmax), np.float32)
        mats_w = np.zeros((s, wb, pmax), np.float32)
        for i, (hs, ws) in enumerate(plan.sizes):
            mats_h[i, : plan.h, :hs] = _interp_matrix(hs, plan.h, True)
            mats_w[i, : plan.w, :ws] = _interp_matrix(ws, plan.w, True)
        return jnp.asarray(mats_h), jnp.asarray(mats_w)

    def __call__(
        self, image: np.ndarray, text_features, return_logits: bool = False
    ):
        """image: (H, W, 3) normalized fp32. Returns (H, W) int32 argmax
        map (or (H, W, K) fp32 summed logits when `return_logits`)."""
        h, w, _ = image.shape
        canvases, plan = self._canvases(image, text_features)
        hb, wb = _bucket(h, self.bucket_step), _bucket(w, self.bucket_step)
        mats_h, mats_w = self._mats(plan, hb, wb)
        fn = self._assemble_logits if return_logits else self._assemble_argmax
        out = fn(canvases, mats_h, mats_w)
        return np.asarray(out)[:h, :w]


# Dataset protocol presets (reference: test_lseg.py:308-316 — cityscapes
# uses base 2048 / crop 768 and a shifted scale ladder).
ADE20K_PROTOCOL = TTAProtocol()
CITYSCAPES_PROTOCOL = TTAProtocol(
    base_size=2048,
    crop_size=768,
    scales=(0.75, 1.0, 1.25, 1.5, 1.75, 2.0, 2.25),
)
