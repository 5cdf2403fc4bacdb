"""Batched-frame codec ("video" model family): encode a stack of frames in
one device dispatch per stage (BASELINE.json config 2: 256 x 1080p batch).

All-intra: every frame is coded independently (the reference pipeline has no
temporal tools), but the batch shares ONE Huffman table per plane type
derived from the batch-global histogram — the multi-frame analog of the
per-image table, and the same psum-reduction shape the sharded encoder uses
across stripes. Per-frame containers stay individually decodable.

Color stacks ((F, H, W, 3) RGB with cfg.chroma '444'/'420') encode as three
plane batches (Y, Cb, Cr) with the chrominance quant table on Cb/Cr,
mirroring models/color.ColorImageCodec per frame.
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
from dct_tpu.ops import huffman as hf


@functools.partial(jax.jit, static_argnames=("cfg", "chroma"))
def _analyze_batch(frames: jax.Array, cfg: CodecConfig, chroma: bool = False):
    symbols, var_codes, hist, run_hist = jax.vmap(
        lambda im: _codec.encode_analyze(im, cfg, chroma=chroma)
    )(frames)
    return symbols, var_codes, jnp.sum(hist, axis=0), jnp.sum(run_hist, axis=0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_stripes", "return_block_bits")
)
def _pack_batch(symbols, cfg: CodecConfig, n_stripes: int, lengths, codes,
                run_lengths=None, run_codes=None,
                return_block_bits: bool = False):
    return jax.vmap(
        lambda s: _codec.encode_pack(
            s, cfg, n_stripes, lengths, codes, run_lengths, run_codes,
            return_block_bits=return_block_bits,
        )
    )(symbols)


# Device-memory budget per encode dispatch, in pixels. The dominant
# allocation is the worst-case units buffer (~1.25 B/pixel in i32 plus the
# uint16 narrowing copy); 128 Mpix keeps one chunk under ~3 GB at any
# frame size, so arbitrarily long stacks encode in bounded memory
# (a 256-frame 1080p batch — BASELINE config 2 — OOMs a 16 GB chip if
# dispatched whole).
CHUNK_PIXEL_BUDGET = 128_000_000


def _encode_plane_batch(
    planes: jax.Array,
    cfg: CodecConfig,
    chroma: bool = False,
    chunk_frames: int | None = None,
) -> list[cont.PlaneData]:
    """(F, h, w) u8 plane stack -> one PlaneData per frame.

    One batched device dispatch per stage per chunk of frames (chunks are
    sized by CHUNK_PIXEL_BUDGET unless chunk_frames is given); a single
    Huffman table (and run table) per plane TYPE shared across the WHOLE
    batch, so the output is byte-identical for every chunking: dynamic
    tables come from histograms accumulated over all chunks (pass 1), and
    pass 2 re-derives each chunk's symbols against the final tables."""
    f, h, w = (int(x) for x in planes.shape)
    bh, bw, n_stripes = _codec._padded_grid(h, w, cfg)
    n = cfg.block_size

    from dct_tpu.ops import blocks as blk

    if chunk_frames is None:
        chunk_frames = max(1, CHUNK_PIXEL_BUDGET // (h * w))
    chunk = max(1, min(int(chunk_frames), f))

    ph, pw = bh * n, bw * n

    def prep(sub):
        imgs = blk.pad_to_blocks(jnp.asarray(sub, jnp.uint8), n)
        return jnp.pad(
            imgs,
            ((0, 0), (0, ph - imgs.shape[1]), (0, pw - imgs.shape[2])),
            mode="edge",
        )

    if cfg.static_tables:
        table = _codec._build_table(cfg, None)
        run_table = _codec._build_run_table(cfg, None)
        lengths = codes = run_lengths = run_codes = None
        symbols_once = None
    elif f <= chunk:
        # single chunk: analyze once and pack the SAME symbols (no
        # recompute)
        symbols_once, var_once, hist, run_hist = _analyze_batch(
            prep(planes), cfg, chroma=chroma
        )
        table = _codec._build_table(cfg, np.asarray(hist))
        run_table = _codec._build_run_table(cfg, np.asarray(run_hist))
        lengths, codes = _codec._table_arrays(table)
        run_lengths, run_codes = (
            _codec._table_arrays(run_table) if cfg.coded_runs else (None, None)
        )
    else:
        # pass 1: batch-global histograms, chunk by chunk (symbols dropped
        # per chunk to bound device memory)
        hist = run_hist = None
        for i0 in range(0, f, chunk):
            _, _, h_, rh_ = _analyze_batch(
                prep(planes[i0 : i0 + chunk]), cfg, chroma=chroma
            )
            # accumulate in int64: device histograms are int32 and a bin
            # can exceed 2^31 counts across a very long stack
            hist = np.asarray(h_, np.int64) + (0 if hist is None else hist)
            run_hist = (
                np.asarray(rh_, np.int64)
                + (0 if run_hist is None else run_hist)
            )
        table = _codec._build_table(cfg, hist)
        run_table = _codec._build_run_table(cfg, run_hist)
        lengths, codes = _codec._table_arrays(table)
        run_lengths, run_codes = (
            _codec._table_arrays(run_table) if cfg.coded_runs else (None, None)
        )
        symbols_once = None

    out: list[cont.PlaneData] = []
    for i0 in range(0, f, chunk):
        block_bits = None
        if cfg.static_tables:
            packed, var_codes, block_bits = jax.vmap(
                lambda im: _codec.encode_step(im, cfg, n_stripes, chroma)
            )(prep(planes[i0 : i0 + chunk]))
        elif symbols_once is not None:
            # symbols already computed by the single-chunk analyze above —
            # no second pad/upload of the stack
            res = _pack_batch(
                symbols_once, cfg, n_stripes, lengths, codes,
                run_lengths, run_codes,
                return_block_bits=bool(cfg.decode_index),
            )
            packed, block_bits = res if cfg.decode_index else (res, None)
            var_codes = var_once
        elif _codec._fused_kernel_ok(cfg):
            packed, var_codes, block_bits = jax.vmap(
                lambda im: _codec.encode_fused_step(
                    im, cfg, n_stripes, lengths, codes, chroma,
                    run_lengths, run_codes,
                )
            )(prep(planes[i0 : i0 + chunk]))
        else:
            symbols, var_codes, _, _ = _analyze_batch(
                prep(planes[i0 : i0 + chunk]), cfg, chroma=chroma
            )
            res = _pack_batch(
                symbols, cfg, n_stripes, lengths, codes,
                run_lengths, run_codes,
                return_block_bits=bool(cfg.decode_index),
            )
            packed, block_bits = res if cfg.decode_index else (res, None)

        packed = bs.fetch_packed(packed)  # trim worst-case slack before D2H
        units, bits = packed.units, packed.bit_lengths
        var_np = np.asarray(var_codes) if cfg.adaptive else None
        bb_np = (
            np.asarray(block_bits) if block_bits is not None else None
        )

        for i in range(units.shape[0]):
            stripes = bs.stripes_to_bytes(bs.PackedStripes(units[i], bits[i]))
            out.append(cont.PlaneData(
                width=w,
                height=h,
                table_lengths=table.lengths if table is not None else None,
                vmin=_codec.DIRECT_VMIN,
                variance_codes=var_np[i] if cfg.adaptive else None,
                stripe_bits=bits[i].astype(np.uint32),
                stripes=stripes,
                run_table_lengths=(
                    run_table.lengths if run_table is not None else None
                ),
                block_bits=(
                    bb_np[i].reshape(-1).astype(np.uint16)
                    if bb_np is not None else None
                ),
            ))
    return out


class VideoCodec:
    """Encode (F, H, W) grayscale or (F, H, W, 3) RGB u8 frame stacks;
    returns a list of per-frame containers (each independently decodable
    with models.codec.decode)."""

    def __init__(
        self,
        config: CodecConfig | None = None,
        chunk_frames: int | None = None,
        mesh=None,
    ):
        """chunk_frames caps frames per device dispatch (None = auto from
        CHUNK_PIXEL_BUDGET). Output bytes are chunking-invariant. With a
        jax.sharding.Mesh, encode runs dp x sp sharded
        (parallel/shard_encode.encode_video_sharded) and the bytes are
        mesh-shape-invariant (identical to the unsharded encoder)."""
        self.config = config or CodecConfig()
        self.chunk_frames = chunk_frames
        self.mesh = mesh

    def encode(self, frames: np.ndarray) -> list[bytes]:
        cfg = self.config
        ck = self.chunk_frames
        if self.mesh is not None:
            from dct_tpu.parallel import shard_encode as _se

            return _se.encode_video_sharded(
                frames, cfg, self.mesh, chunk_frames=ck
            )
        if cfg.chroma == "gray":
            if frames.ndim != 3:
                raise ValueError(f"expected (F, H, W), got {frames.shape}")
            f, h, w = (int(x) for x in frames.shape)
            # frames stay on host; _encode_plane_batch transfers per chunk
            per_frame = [
                [p]
                for p in _encode_plane_batch(frames, cfg, chunk_frames=ck)
            ]
        else:
            if frames.ndim != 4 or frames.shape[-1] != 3:
                raise ValueError(
                    f"expected (F, H, W, 3) RGB for chroma={cfg.chroma}, "
                    f"got {frames.shape}"
                )
            from dct_tpu.models import color as _color

            f, h, w = (int(x) for x in frames.shape[:3])
            # RGB->YCbCr in chunks too: the f32 intermediates of a whole
            # long stack would dwarf the u8 planes they produce
            cc = ck or max(1, CHUNK_PIXEL_BUDGET // (h * w))
            parts = [[], [], []]
            for i0 in range(0, f, cc):
                planes = jax.vmap(
                    lambda im: _color._to_planes(im, cfg.chroma)
                )(jnp.asarray(frames[i0 : i0 + cc], jnp.uint8))
                for lst, p in zip(parts, planes):
                    lst.append(np.asarray(p))
            y, cb, cr = (np.concatenate(lst) for lst in parts)
            ys = _encode_plane_batch(y, cfg, chroma=False, chunk_frames=ck)
            cbs = _encode_plane_batch(cb, cfg, chroma=True, chunk_frames=ck)
            crs = _encode_plane_batch(cr, cfg, chroma=True, chunk_frames=ck)
            per_frame = [[ys[i], cbs[i], crs[i]] for i in range(f)]

        return [
            cont.serialize(
                cont.Container(config=cfg, width=w, height=h, planes=planes)
            )
            for planes in per_frame
        ]

    def decode(self, streams: list[bytes]) -> np.ndarray:
        return np.asarray(self.decode_to_device(streams))

    def decode_to_device(self, streams: list[bytes]) -> jax.Array:
        """Batched device decode: entropy-decode every frame on the host
        (C++ thread pool), then ONE vmapped dequant+IDCT dispatch per plane
        type for the whole stack, leaving u8 frames on device — the
        data-loading path for on-chip consumers (decoded frames feeding a
        model)."""
        if not streams:
            raise ValueError("decode requires at least one stream")
        conts = [cont.deserialize(s) for s in streams]
        c0 = conts[0]
        cfg = c0.config

        def _key(c):
            # batched decode shares one entropy table per plane type, so
            # per-frame tables (e.g. per-image dynamic tables from
            # ImageCodec) must ALL match, not just frame dimensions
            return (c.config,) + tuple(
                (
                    p.height, p.width,
                    None if p.table_lengths is None
                    else p.table_lengths.tobytes(),
                    None if p.run_table_lengths is None
                    else p.run_table_lengths.tobytes(),
                )
                for p in c.planes
            )

        k0 = _key(c0)
        if any(_key(c) != k0 for c in conts[1:]):
            # mixed batch: fall back to per-frame decode
            return jnp.stack([jnp.asarray(_codec.decode(s)) for s in streams])

        # symmetric with encode: decode long stacks in frame chunks so the
        # coefficient grids + f32 intermediates stay in bounded memory
        ck = max(1, self.chunk_frames or max(
            1, CHUNK_PIXEL_BUDGET // (c0.height * c0.width)
        ))
        if len(conts) > ck:
            return jnp.concatenate([
                self._decode_cont_batch(conts[i0 : i0 + ck], cfg)
                for i0 in range(0, len(conts), ck)
            ])
        return self._decode_cont_batch(conts, cfg)

    def _decode_cont_batch(
        self, conts: list[cont.Container], cfg: CodecConfig
    ) -> jax.Array:
        c0 = conts[0]
        if cfg.chroma == "gray":
            return self._decode_plane_batch(conts, cfg, 0, chroma=False)

        from dct_tpu.models import color as _color

        y = self._decode_plane_batch(conts, cfg, 0, chroma=False)
        cb = self._decode_plane_batch(conts, cfg, 1, chroma=True)
        cr = self._decode_plane_batch(conts, cfg, 2, chroma=True)
        h, w = c0.height, c0.width

        @jax.jit
        def recombine(yy, b, r):
            return jax.vmap(
                lambda yi, bi, ri: _color.planes_to_rgb(
                    yi, bi, ri, cfg.chroma, h, w
                )
            )(yy, b, r)

        return recombine(y, cb, cr)

    @staticmethod
    def _decode_plane_batch(
        conts: list[cont.Container], cfg: CodecConfig, plane_idx: int,
        chroma: bool,
    ) -> jax.Array:
        """Entropy-decode plane `plane_idx` of every container on the host,
        then one vmapped dequant+IDCT dispatch for the whole stack."""
        from dct_tpu.ops import blocks as blk
        from dct_tpu.ops import quant
        from dct_tpu.models.codec import (
            _decode_stripes, _fused_decode, _padded_grid,
        )

        p0 = conts[0].planes[plane_idx]
        n = cfg.block_size
        bh, bw, n_stripes = _padded_grid(p0.height, p0.width, cfg)
        bps = (bh // n_stripes) * bw
        mode = cfg.huffman_mode if cfg.use_huffman else "none"
        table = hf.CanonicalTable(p0.table_lengths) if mode != "none" else None
        run_table = (
            hf.CanonicalTable(p0.run_table_lengths) if cfg.coded_runs else None
        )

        # indexed containers: ONE batched on-device decode dispatch for
        # the whole stack (entropy decode + reconstruct, no coefficient
        # upload) — F frames cost one tunnel round trip instead of F
        if all(
            _codec._device_decode_ok(c.planes[plane_idx], cfg) for c in conts
        ):
            from dct_tpu.ops import entropy_decode_pallas as edp

            u_max = max(
                1,
                -(-max(
                    (len(s) + 1) // 2
                    for c in conts for s in c.planes[plane_idx].stripes
                ) // 1024) * 1024,
            )
            # shared window geometry: per-frame data-driven W/span would
            # differ across frames, so the batch uses the maxima
            geo = edp.plan_geometry(
                [c.planes[plane_idx].block_bits for c in conts], n_stripes
            )
            preps = [
                _codec._device_decode_prep(
                    c.planes[plane_idx], cfg, table, mode, n_stripes, bps,
                    run_table, u_max=u_max,
                    w_units=geo[0] if geo else None,
                    span=geo[1] if geo else None,
                )
                for c in conts
            ] if geo is not None else [None]
            if all(p is not None for p in preps) and len(
                {tuple(sorted(p[1].items())) for p in preps}
            ) == 1:
                arrays = tuple(
                    jnp.stack([np.asarray(p[0][i]) for p in preps])
                    for i in range(len(preps[0][0]))
                )
                if cfg.adaptive:
                    vc = jnp.asarray(np.stack([
                        np.asarray(c.planes[plane_idx].variance_codes)
                        for c in conts
                    ]))
                else:
                    vc = jnp.zeros((len(conts), 1), jnp.uint8)
                return _codec._device_decode_batch_step(
                    arrays, vc, cfg=cfg, chroma=chroma,
                    edp_statics=tuple(sorted(preps[0][1].items())),
                    bh=bh, bw=bw, n_stripes=n_stripes,
                    height=p0.height, width=p0.width,
                )

        zz = np.stack([
            _decode_stripes(
                c.planes[plane_idx], cfg, table, mode, n_stripes, bps,
                run_table,
            )
            for c in conts
        ])  # (F, NB, n2)
        if cfg.dc_prediction:
            zz = np.stack([_codec.dc_reconstruct(z, n_stripes) for z in zz])
        scale = None
        if cfg.adaptive:
            codes = jnp.asarray(np.stack(
                [np.asarray(c.planes[plane_idx].variance_codes) for c in conts]
            ))
            scale = quant.scale_from_variance_code(codes)  # (F, NB)

        def one(z, s):
            px = _fused_decode(z, cfg, s, chroma)
            return blk.blocks_to_image(px, bh * n, bw * n, n)

        if cfg.adaptive:
            imgs = jax.vmap(one)(jnp.asarray(zz), scale)
        else:
            imgs = jax.vmap(lambda z: one(z, None))(jnp.asarray(zz))
        return imgs[:, : p0.height, : p0.width]
