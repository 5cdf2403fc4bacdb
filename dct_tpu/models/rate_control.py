"""Rate control: encode to a byte budget by probing exact container sizes.

The reference ships an encoded-size ESTIMATOR (entropy.c:430-466, the heap
walk `huffman_encoded_size` — SURVEY.md section 2.11) but never closes the
loop into rate control. This module does, the TPU way: a size probe is the
staged encode pipeline run WITHOUT the bit-pack — device transform + RLE +
symbol chunk lengths reduced to one int32 per stripe — so probing a
quality costs one analyze dispatch (+ one chunk-length dispatch for
dynamic tables) and fetches n_stripes ints instead of a payload. Probe
sizes are EXACT, not estimates: the chunk-length tensor is the same one
the packer offsets by (ops/bitstream.symbol_chunks), and the header cost
comes from serializing an empty-stripe skeleton container, so the
prediction cannot drift from the wire format (asserted byte-exact against
real encodes in tests/test_rate_control.py).

`encode_to_size` bisects a quality ladder for the largest quality whose
exact size fits the budget, then runs ONE real encode at that quality.
Container size is near-monotone in quality; bisection can in principle
settle on a smaller-than-optimal feasible quality on adversarial content,
but the returned container always fits the budget because each probe is
exact for its own quality.

Deliberately NOT batched across the ladder: stacking the per-quality
operators into one vmapped dispatch would re-derive the transform outside
the canonical per-quality constants (transform.packed_encode_operator_
split), risking exactly the f32 tie-rounding divergence CLAUDE.md records
for re-associated contractions — a silently-wrong size on the TPU backend
is worse than ~4 extra 32 ms dispatches per image. Probes are jit-cached
per (quality, shape), so repeated calls pay dispatches only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dct_tpu import container as cont
from dct_tpu.config import CodecConfig
from dct_tpu.models import codec as _codec
from dct_tpu.ops import bitstream as bs
from dct_tpu.ops import blocks as blk
from dct_tpu.ops import huffman as hf

# Quality rungs for encode_to_size: dense where the size/quality curve is
# steep (high quality), sparse where it is flat.
DEFAULT_LADDER = (1, 5, 10, 15, 20, 30, 40, 50, 60, 70, 80, 85, 90, 95, 97, 100)


@functools.partial(jax.jit, static_argnames=("cfg", "n_stripes"))
def _chunk_bits(
    symbols,
    cfg: CodecConfig,
    n_stripes: int,
    lengths: jax.Array,
    codes: jax.Array,
    run_lengths: jax.Array | None = None,
    run_codes: jax.Array | None = None,
) -> jax.Array:
    """Per-stripe payload bit counts: encode_pack minus the pack.

    Reduces the same (B, S, 3) chunk-length tensor the scatter packer
    consumes (codec.encode_pack), so the result equals the packer's
    bit_lengths for every mode; the chunk VALUES are dead code under this
    reduction and XLA eliminates them."""
    rkw = dict(
        run_lengths=run_lengths,
        run_codes=run_codes,
        run_bits=bs.run_field_bits(cfg.n2),
    )
    mode = cfg.huffman_mode if cfg.use_huffman else "none"
    if mode == "category":
        _, cl = bs.symbol_chunks(
            symbols, mode, cat_lengths=lengths, cat_codes=codes, **rkw
        )
    elif mode == "direct":
        _, cl = bs.symbol_chunks(
            symbols, mode, val_lengths=lengths, val_codes=codes,
            vmin=_codec.DIRECT_VMIN, **rkw
        )
    else:
        _, cl = bs.symbol_chunks(symbols, mode, **rkw)
    return cl.reshape(n_stripes, -1).sum(axis=1)


def _plane_size(
    plane: np.ndarray, cfg: CodecConfig, chroma: bool
) -> tuple[np.ndarray, cont.PlaneData]:
    """(per-stripe bit counts, empty-stripe PlaneData skeleton) for one
    plane at cfg.quality. Mirrors codec.encode_plane up to (but not
    including) the pack stage."""
    h, w = int(plane.shape[0]), int(plane.shape[1])
    n = cfg.block_size
    bh, bw, n_stripes = _codec._padded_grid(h, w, cfg)
    img = blk.pad_to_blocks(jnp.asarray(plane, jnp.uint8), n)
    ph, pw = bh * n, bw * n
    if img.shape[0] != ph or img.shape[1] != pw:
        img = jnp.pad(
            img, ((0, ph - img.shape[0]), (0, pw - img.shape[1])), mode="edge"
        )

    symbols, var_codes, hist, run_hist = _codec.encode_analyze(
        img, cfg, chroma=chroma
    )
    table = _codec._build_table(
        cfg, None if cfg.static_tables else np.asarray(hist)
    )
    run_table = _codec._build_run_table(
        cfg, None if cfg.static_tables else np.asarray(run_hist)
    )
    lengths, codes = _codec._table_arrays(table)
    if cfg.coded_runs:
        run_lengths, run_codes = _codec._table_arrays(run_table)
    else:
        run_lengths = run_codes = None
    bits = np.asarray(
        _chunk_bits(
            symbols, cfg, n_stripes, lengths, codes, run_lengths, run_codes
        )
    )
    skeleton = cont.PlaneData(
        width=w,
        height=h,
        table_lengths=table.lengths if table is not None else None,
        vmin=_codec.DIRECT_VMIN,
        variance_codes=np.asarray(var_codes) if cfg.adaptive else None,
        stripe_bits=np.zeros(n_stripes, np.uint32),
        stripes=[b""] * n_stripes,
        run_table_lengths=(
            run_table.lengths if run_table is not None else None
        ),
    )
    return bits, skeleton


def container_size(image: np.ndarray, cfg: CodecConfig) -> int:
    """EXACT serialized container size in bytes for encoding `image` under
    `cfg` — without packing or materializing the payload.

    Grayscale (H, W) or RGB (H, W, 3) by array rank (RGB requires a color
    chroma mode, as codec.encode does)."""
    if image.ndim == 2:
        plane_args = [(np.asarray(image, np.uint8), False)]
        w, h = int(image.shape[1]), int(image.shape[0])
    else:
        if cfg.chroma == "gray":
            raise ValueError("RGB input requires chroma '444' or '420'")
        from dct_tpu.models import color as _color

        y, cb, cr = _color._to_planes(
            jnp.asarray(image, jnp.uint8), cfg.chroma
        )
        plane_args = [
            (np.asarray(y), False), (np.asarray(cb), True),
            (np.asarray(cr), True),
        ]
        w, h = int(image.shape[1]), int(image.shape[0])

    payload = 0
    skeletons = []
    for plane, chroma in plane_args:
        bits, skel = _plane_size(plane, cfg, chroma)
        payload += int(((bits.astype(np.int64) + 7) // 8).sum())
        skeletons.append(skel)
    header = len(
        cont.serialize(
            cont.Container(config=cfg, width=w, height=h, planes=skeletons)
        )
    )
    return header + payload


# ---------------------------------------------------------------------------
# Video (batched frame stacks, models/video.py)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "n_stripes"))
def _chunk_bits_batch(
    symbols, cfg, n_stripes, lengths, codes, run_lengths=None, run_codes=None
):
    return jax.vmap(
        lambda s: _chunk_bits(
            s, cfg, n_stripes, lengths, codes, run_lengths, run_codes
        )
    )(symbols)


def _plane_batch_bits(
    planes: np.ndarray,
    cfg: CodecConfig,
    chroma: bool,
    chunk_frames: int | None,
) -> tuple[np.ndarray, cont.PlaneData]:
    """((F, n_stripes) per-stripe bit counts, skeleton PlaneData) for a
    frame-stack plane batch at cfg.quality. Mirrors
    video._encode_plane_batch (batch-GLOBAL dynamic tables, chunked
    dispatches) up to but not including the pack, so the counts equal the
    packer's bit_lengths for every frame. The skeleton's serialized size
    is identical for every frame of the batch (tables are shared; the
    adaptive variance-code field has fixed length)."""
    from dct_tpu.models import video as _video

    f, h, w = (int(x) for x in planes.shape)
    bh, bw, n_stripes = _codec._padded_grid(h, w, cfg)
    n = cfg.block_size
    ph, pw = bh * n, bw * n
    if chunk_frames is None:
        chunk_frames = max(1, _video.CHUNK_PIXEL_BUDGET // (h * w))
    chunk = max(1, min(int(chunk_frames), f))

    def prep(sub):
        imgs = blk.pad_to_blocks(jnp.asarray(sub, jnp.uint8), n)
        return jnp.pad(
            imgs,
            ((0, 0), (0, ph - imgs.shape[1]), (0, pw - imgs.shape[2])),
            mode="edge",
        )

    symbols_chunks = []
    if cfg.static_tables:
        table = _codec._build_table(cfg, None)
        run_table = _codec._build_run_table(cfg, None)
    else:
        hist = run_hist = None
        for i0 in range(0, f, chunk):
            sym, _, h_, rh_ = _video._analyze_batch(
                prep(planes[i0 : i0 + chunk]), cfg, chroma=chroma
            )
            symbols_chunks.append(sym)  # reused below: probes are 1-pass
            hist = np.asarray(h_, np.int64) + (0 if hist is None else hist)
            run_hist = (
                np.asarray(rh_, np.int64)
                + (0 if run_hist is None else run_hist)
            )
        table = _codec._build_table(cfg, hist)
        run_table = _codec._build_run_table(cfg, run_hist)
    lengths, codes = _codec._table_arrays(table)
    if cfg.coded_runs:
        run_lengths, run_codes = _codec._table_arrays(run_table)
    else:
        run_lengths = run_codes = None

    bits = []
    for ci, i0 in enumerate(range(0, f, chunk)):
        if symbols_chunks:
            sym = symbols_chunks[ci]
        else:
            sym, _, _, _ = _video._analyze_batch(
                prep(planes[i0 : i0 + chunk]), cfg, chroma=chroma
            )
        bits.append(np.asarray(_chunk_bits_batch(
            sym, cfg, n_stripes, lengths, codes, run_lengths, run_codes
        )))
    skeleton = cont.PlaneData(
        width=w,
        height=h,
        table_lengths=table.lengths if table is not None else None,
        vmin=_codec.DIRECT_VMIN,
        variance_codes=(
            np.zeros(bh * bw, np.uint8) if cfg.adaptive else None
        ),
        stripe_bits=np.zeros(n_stripes, np.uint32),
        stripes=[b""] * n_stripes,
        run_table_lengths=(
            run_table.lengths if run_table is not None else None
        ),
    )
    return np.concatenate(bits, axis=0), skeleton


def video_container_sizes(
    frames: np.ndarray,
    cfg: CodecConfig,
    chunk_frames: int | None = None,
) -> np.ndarray:
    """EXACT per-frame container sizes (bytes) for VideoCodec(cfg).encode
    (frames), without packing: (F,) int64. Remember that the batch shares
    ONE table per plane type, so these differ from per-image
    container_size whenever tables are dynamic."""
    if cfg.chroma == "gray":
        if frames.ndim != 3:
            raise ValueError(f"expected (F, H, W), got {frames.shape}")
        plane_batches = [(np.asarray(frames, np.uint8), False)]
        f, h, w = (int(x) for x in frames.shape)
    else:
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(
                f"expected (F, H, W, 3) RGB for chroma={cfg.chroma}, "
                f"got {frames.shape}"
            )
        from dct_tpu.models import color as _color

        f, h, w = (int(x) for x in frames.shape[:3])
        planes = jax.vmap(lambda im: _color._to_planes(im, cfg.chroma))(
            jnp.asarray(frames, jnp.uint8)
        )
        plane_batches = [
            (np.asarray(planes[0]), False), (np.asarray(planes[1]), True),
            (np.asarray(planes[2]), True),
        ]

    per_frame = np.zeros(f, np.int64)
    skeletons = []
    for batch, chroma in plane_batches:
        bits, skel = _plane_batch_bits(batch, cfg, chroma, chunk_frames)
        per_frame += ((bits.astype(np.int64) + 7) // 8).sum(axis=1)
        skeletons.append(skel)
    header = len(cont.serialize(
        cont.Container(config=cfg, width=w, height=h, planes=skeletons)
    ))
    return per_frame + header


def encode_video_to_size(
    frames: np.ndarray,
    total_bytes: int,
    config: CodecConfig | None = None,
    qualities: tuple[int, ...] = DEFAULT_LADDER,
    strict: bool = True,
    chunk_frames: int | None = None,
) -> tuple[list[bytes], int]:
    """Encode a frame stack into at most `total_bytes` across all per-frame
    containers, at one shared quality (the batch analog of encode_to_size;
    per-frame streams stay individually decodable). Returns
    (streams, quality)."""
    if not qualities:
        raise ValueError("empty quality ladder")
    base = config or CodecConfig()
    if frames.ndim == 4 and base.chroma == "gray":
        base = base.replace(chroma="420")
    ladder = sorted(set(int(q) for q in qualities))

    totals: dict[int, int] = {}

    def probe(q: int) -> int:
        if q not in totals:
            totals[q] = int(video_container_sizes(
                frames, base.replace(quality=q), chunk_frames
            ).sum())
        return totals[q]

    lo, hi = 0, len(ladder) - 1
    if probe(ladder[lo]) > total_bytes:
        if strict:
            raise ValueError(
                f"quality {ladder[lo]} needs {totals[ladder[lo]]} bytes > "
                f"budget {total_bytes}"
            )
        best = ladder[lo]
    elif probe(ladder[hi]) <= total_bytes:
        best = ladder[hi]
    else:
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if probe(ladder[mid]) <= total_bytes:
                lo = mid
            else:
                hi = mid
        best = ladder[lo]
    from dct_tpu.models.video import VideoCodec

    streams = VideoCodec(
        base.replace(quality=best), chunk_frames=chunk_frames
    ).encode(frames)
    return streams, best


# ---------------------------------------------------------------------------
# Distortion probes (exact PSNR without a bitstream)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "chroma", "h", "w"))
def _plane_sse_chunks(
    plane_padded: jax.Array, cfg: CodecConfig, chroma: bool, h: int, w: int
) -> jax.Array:
    """Exact roundtrip squared error of one padded plane vs its unpadded
    region, as (h, ceil(w/4096)) int32 column-chunk partial sums.

    Runs the production transform pair — quantize via _fused_encode,
    reconstruct via _fused_decode, the same ops decode_plane_device uses —
    so the reconstruction is bit-identical to decoding a real container
    (the wire carries these exact integers; byte-identity between staged,
    fused, and packed paths is established by tests/test_fused_encode.py).
    Chunked int32 keeps the sum exact without x64: each chunk is at most
    4096 * 255^2 < 2^31; the caller totals chunks in Python ints."""
    n = cfg.block_size
    pixels = blk.image_to_blocks(plane_padded, n)
    scale = None
    if cfg.adaptive:
        from dct_tpu.ops import quant, transform

        var = quant.block_variance_flat(transform.level_shift(pixels))
        scale = quant.scale_from_variance_code(quant.variance_code(var))
    zz = _codec._fused_encode(pixels, cfg, scale, chroma)
    rec = _codec._fused_decode(zz, cfg, scale, chroma)
    img = blk.blocks_to_image(
        rec, plane_padded.shape[0], plane_padded.shape[1], n
    )[:h, :w]
    d = img.astype(jnp.int32) - plane_padded[:h, :w].astype(jnp.int32)
    sq = d * d
    pad_w = -(-w // 4096) * 4096
    if pad_w != w:
        sq = jnp.pad(sq, ((0, 0), (0, pad_w - w)))
    return sq.reshape(h, pad_w // 4096, 4096).sum(axis=2)


def _pad_plane(plane: np.ndarray, cfg: CodecConfig) -> jax.Array:
    """The exact padding encode_plane applies (block grid + stripe grid)."""
    h, w = int(plane.shape[0]), int(plane.shape[1])
    bh, bw, _ = _codec._padded_grid(h, w, cfg)
    n = cfg.block_size
    img = blk.pad_to_blocks(jnp.asarray(plane, jnp.uint8), n)
    ph, pw = bh * n, bw * n
    if img.shape[0] != ph or img.shape[1] != pw:
        img = jnp.pad(
            img, ((0, ph - img.shape[0]), (0, pw - img.shape[1])), mode="edge"
        )
    return img


def roundtrip_sse(image: np.ndarray, cfg: CodecConfig) -> int:
    """EXACT sum of squared pixel errors of encode->decode under `cfg`,
    without producing a bitstream. Grayscale (H, W) only; color goes
    through psnr_at_quality (the RGB reconstruction crosses planes)."""
    if image.ndim != 2:
        raise ValueError("roundtrip_sse takes a grayscale (H, W) plane")
    h, w = int(image.shape[0]), int(image.shape[1])
    chunks = np.asarray(
        _plane_sse_chunks(_pad_plane(image, cfg), cfg, False, h, w)
    )
    return int(sum(int(x) for x in chunks.ravel()))


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w"))
def _rgb_sse_chunks(
    rgb: jax.Array, cfg: CodecConfig, h: int, w: int
) -> jax.Array:
    """Exact roundtrip squared error for an RGB image: the full color
    pipeline (YCbCr split, per-plane quantize/reconstruct with the chroma
    table and 4:2:0 resampling, RGB reassembly) mirroring
    ColorImageCodec.decode_to_device, reduced to int32 column chunks."""
    from dct_tpu.models import color as _color

    planes = _color._to_planes(rgb, cfg.chroma)
    recs = []
    for i, plane in enumerate(planes):
        n = cfg.block_size
        ph_, pw_ = int(plane.shape[0]), int(plane.shape[1])
        bh, bw, _ = _codec._padded_grid(ph_, pw_, cfg)
        p = blk.pad_to_blocks(plane, n)
        tgt_h, tgt_w = bh * n, bw * n
        if p.shape[0] != tgt_h or p.shape[1] != tgt_w:
            p = jnp.pad(
                p, ((0, tgt_h - p.shape[0]), (0, tgt_w - p.shape[1])),
                mode="edge",
            )
        chroma = i > 0
        pixels = blk.image_to_blocks(p, n)
        scale = None
        if cfg.adaptive:
            from dct_tpu.ops import quant, transform

            var = quant.block_variance_flat(transform.level_shift(pixels))
            scale = quant.scale_from_variance_code(quant.variance_code(var))
        zz = _codec._fused_encode(pixels, cfg, scale, chroma)
        rec = _codec._fused_decode(zz, cfg, scale, chroma)
        recs.append(
            blk.blocks_to_image(rec, tgt_h, tgt_w, n)[:ph_, :pw_]
        )
    out = _color.planes_to_rgb(recs[0], recs[1], recs[2], cfg.chroma, h, w)
    d = out.astype(jnp.int32) - rgb.astype(jnp.int32)
    sq = (d * d).sum(axis=2)  # <= 3 * 255^2 per pixel
    pad_w = -(-w // 1024) * 1024
    if pad_w != w:
        sq = jnp.pad(sq, ((0, 0), (0, pad_w - w)))
    return sq.reshape(h, pad_w // 1024, 1024).sum(axis=2)


def psnr_at_quality(image: np.ndarray, cfg: CodecConfig) -> float:
    """EXACT PSNR (dB) of encoding `image` under `cfg` — identical to
    metrics.psnr(image, decode(encode(image, cfg))) — without packing or
    parsing a bitstream. Probes run entirely on device; only int32
    partial sums are fetched."""
    h, w = int(image.shape[0]), int(image.shape[1])
    if image.ndim == 2:
        sse = roundtrip_sse(image, cfg)
        n_px = h * w
    else:
        if cfg.chroma == "gray":
            raise ValueError("RGB input requires chroma '444' or '420'")
        chunks = np.asarray(
            _rgb_sse_chunks(jnp.asarray(image, jnp.uint8), cfg, h, w)
        )
        sse = int(sum(int(x) for x in chunks.ravel()))
        n_px = h * w * 3
    if sse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 * n_px / sse))


def encode_to_psnr(
    image: np.ndarray,
    min_psnr: float,
    config: CodecConfig | None = None,
    qualities: tuple[int, ...] = DEFAULT_LADDER,
    strict: bool = True,
) -> tuple[bytes, int]:
    """Encode `image` at the LOWEST ladder quality whose exact PSNR meets
    `min_psnr` dB (smallest file achieving the distortion target — the
    quality-targeted dual of encode_to_size). Returns (bytes, quality).

    If even the highest rung misses the target: raise ValueError when
    `strict`, else return the highest-rung encode (best effort)."""
    if not qualities:
        raise ValueError("empty quality ladder")
    base = config or CodecConfig()
    if image.ndim == 3 and base.chroma == "gray":
        base = base.replace(chroma="420")
    ladder = sorted(set(int(q) for q in qualities))

    psnrs: dict[int, float] = {}

    def probe(q: int) -> float:
        if q not in psnrs:
            psnrs[q] = psnr_at_quality(image, base.replace(quality=q))
        return psnrs[q]

    lo, hi = 0, len(ladder) - 1
    if probe(ladder[hi]) < min_psnr:
        if strict:
            raise ValueError(
                f"quality {ladder[hi]} reaches only "
                f"{psnrs[ladder[hi]]:.2f} dB < target {min_psnr}"
            )
        best = ladder[hi]
    elif probe(ladder[lo]) >= min_psnr:
        best = ladder[lo]
    else:
        # invariant: ladder[lo] misses the target, ladder[hi] meets it
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if probe(ladder[mid]) >= min_psnr:
                hi = mid
            else:
                lo = mid
        best = ladder[hi]
    data = _codec.encode(image, base.replace(quality=best))
    return data, best


def encode_to_size(
    image: np.ndarray,
    max_bytes: int,
    config: CodecConfig | None = None,
    qualities: tuple[int, ...] = DEFAULT_LADDER,
    strict: bool = True,
) -> tuple[bytes, int]:
    """Encode `image` into at most `max_bytes`, choosing the highest
    quality on the ladder that fits. Returns (container bytes, quality).

    `config` supplies every knob except quality (its quality field is
    ignored). If even the lowest rung exceeds the budget: raise ValueError
    when `strict`, else return the lowest-rung encode (over budget, best
    effort). Probes are exact (see container_size), so the returned
    container always fits when a fitting rung exists."""
    if not qualities:
        raise ValueError("empty quality ladder")
    base = config or CodecConfig()
    if image.ndim == 3 and base.chroma == "gray":
        base = base.replace(chroma="420")
    ladder = sorted(set(int(q) for q in qualities))

    sizes: dict[int, int] = {}

    def probe(q: int) -> int:
        if q not in sizes:
            sizes[q] = container_size(image, base.replace(quality=q))
        return sizes[q]

    lo, hi = 0, len(ladder) - 1
    if probe(ladder[lo]) > max_bytes:
        if strict:
            raise ValueError(
                f"quality {ladder[lo]} needs {sizes[ladder[lo]]} bytes > "
                f"budget {max_bytes}"
            )
        best = ladder[lo]
    elif probe(ladder[hi]) <= max_bytes:
        best = ladder[hi]
    else:
        # invariant: ladder[lo] fits, ladder[hi] does not
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if probe(ladder[mid]) <= max_bytes:
                lo = mid
            else:
                hi = mid
        best = ladder[lo]
    data = _codec.encode(image, base.replace(quality=best))
    return data, best
