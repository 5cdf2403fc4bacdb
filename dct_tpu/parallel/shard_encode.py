"""Sharded encode: images striped across a device mesh, deterministic
bitstreams regardless of mesh shape.

Design (SURVEY.md sections 5.7-5.8, BASELINE.json configs 4-5):

  * A frame's stripes are a property of the IMAGE (cfg.stripe_rows block
    rows each), not of the mesh: each stripe is encoded to an independent
    byte-aligned substream with a per-image Huffman table derived from the
    GLOBAL histogram. Any mesh assignment of stripes to devices therefore
    produces bit-identical containers (tested in tests/test_parallel.py —
    the codec's "race detector", SURVEY.md section 5.2).
  * Histogram globalization is the only cross-device reduction in the
    analyze phase: an integer psum, order-independent by construction.
  * The offsets table is derived from per-stripe bit lengths exchanged via
    all_gather — exclusive cumsum, the TPU-native replacement for what a
    multi-node codec would do with an MPI/NCCL allgather of stream sizes.

Two operating modes:
  * dynamic tables (default): two sharded dispatches with a 64-byte host
    sync for table construction (same structure as single-chip).
  * static tables: ONE sharded dispatch (models.codec.encode_step under
    jit-with-shardings) — the path dryrun_multichip and the scaling bench
    exercise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 top-level API
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from dct_tpu import container as cont
from dct_tpu.config import CodecConfig
from dct_tpu.models import codec as _codec
from dct_tpu.ops import bitstream as bs
from dct_tpu.ops import huffman as hf
from dct_tpu.parallel import mesh as meshlib


def _host_full(x) -> np.ndarray:
    """Device array -> full host ndarray, valid under multi-process SPMD.

    Single process: plain np.asarray. Multi-process (jax.distributed):
    shards on other hosts are not addressable, so gather them first —
    the codec analog of an MPI gather of per-rank results at the writer.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def stripe_byte_offsets(bit_lengths: jax.Array, mesh: Mesh) -> jax.Array:
    """Global byte offsets of each stripe's substream in the final payload.

    bit_lengths: (n_stripes,) sharded over the stripe axis. Explicit
    shard_map + all_gather: every device learns all lengths, computes the
    exclusive cumsum of byte sizes, and keeps its own slice. Deterministic
    for any mesh because the input ordering is the stripe index.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(meshlib.STRIPE_AXIS),
        out_specs=P(meshlib.STRIPE_AXIS),
    )
    def f(local_bits):
        all_bits = jax.lax.all_gather(
            local_bits, meshlib.STRIPE_AXIS, tiled=True
        )  # (n_stripes,)
        nbytes = (all_bits + 7) // 8
        offs = jnp.cumsum(nbytes) - nbytes  # exclusive
        k = local_bits.shape[0]
        i = jax.lax.axis_index(meshlib.STRIPE_AXIS)
        return jax.lax.dynamic_slice(offs, (i * k,), (k,))

    return f(bit_lengths)


def global_category_histogram(
    values: jax.Array, live: jax.Array, mesh: Mesh
) -> jax.Array:
    """psum of per-shard category histograms -> identical table everywhere.

    values (B, S) / live mask (B, S) sharded over the stripe axis (leading
    block dim). Integer psum is order-independent, so the global histogram —
    and therefore the Huffman table — is identical for every mesh shape."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(meshlib.STRIPE_AXIS, None), P(meshlib.STRIPE_AXIS, None)),
        out_specs=P(),
    )
    def f(v, m):
        local = hf.category_histogram_masked(v, m)
        return jax.lax.psum(local, meshlib.STRIPE_AXIS)

    return f(values, live)


def global_run_histogram(
    runs: jax.Array, live: jax.Array, mesh: Mesh
) -> jax.Array:
    """psum of per-shard run-length histograms (coded_runs tables)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(meshlib.STRIPE_AXIS, None), P(meshlib.STRIPE_AXIS, None)),
        out_specs=P(),
    )
    def f(r, m):
        local = hf.run_histogram_masked(r, m)
        return jax.lax.psum(local, meshlib.STRIPE_AXIS)

    return f(runs, live)


def encode_plane_sharded(
    plane: np.ndarray, cfg: CodecConfig, mesh: Mesh, chroma: bool = False
) -> cont.PlaneData:
    """Stripe-sharded single-plane encode producing a container plane that
    is byte-identical to the single-device encoder's. chroma selects the
    chrominance quant table (color containers' Cb/Cr planes)."""
    h, w = int(plane.shape[0]), int(plane.shape[1])
    n = cfg.block_size
    if cfg.decode_index:
        # per-block bit lengths are stripe-local (no collective needed) but
        # the sharded assembly below does not gather them yet — reject
        # loudly rather than emit a v2 container with a missing index
        raise ValueError(
            "decode_index is not yet supported on the sharded encode path"
        )
    bh, bw, n_stripes = _codec._padded_grid(h, w, cfg)
    n_dev = mesh.shape[meshlib.STRIPE_AXIS]
    bh_real = bh  # block rows before mesh padding (histogram masking)
    if n_stripes % n_dev != 0:
        # pad the stripe count so it divides the mesh; extra stripes hold
        # replicated edge rows and are dropped at container assembly
        n_stripes_p = -(-n_stripes // n_dev) * n_dev
        bh = n_stripes_p * cfg.stripe_rows
    else:
        n_stripes_p = n_stripes

    img = jnp.asarray(np.asarray(plane, np.uint8))
    from dct_tpu.ops import blocks as blk

    img = blk.pad_to_blocks(img, n)
    ph, pw = bh * n, bw * n
    img = jnp.pad(
        img, ((0, ph - img.shape[0]), (0, pw - img.shape[1])), mode="edge"
    )
    row_sharding = NamedSharding(mesh, P(meshlib.STRIPE_AXIS, None))
    img = jax.device_put(img, row_sharding)

    if cfg.static_tables:
        table = _codec._build_table(cfg, None)
        run_table = _codec._build_run_table(cfg, None)
        packed, var_codes = _encode_step_sharded(
            img, cfg, n_stripes_p, mesh, chroma
        )
    else:
        symbols, var_codes, _, _ = _codec.encode_analyze(img, cfg, chroma=chroma)
        from dct_tpu.ops.rle import RLEPositional

        if isinstance(symbols, RLEPositional):
            live = symbols.is_sym
        else:
            s_idx = jnp.arange(symbols.values.shape[1])[None, :]
            live = s_idx < symbols.counts[:, None]
        # mesh-pad stripes (added only so the stripe count divides the
        # device count) must NOT contaminate the global histograms, or the
        # table — and the whole container — would depend on the mesh shape
        nb_real = bh_real * bw
        live = live & (
            jnp.arange(symbols.values.shape[0])[:, None] < nb_real
        )
        if cfg.use_huffman and cfg.huffman_mode == "category":
            hist = global_category_histogram(symbols.values, live, mesh)
        else:
            hist = _hist_fallback(symbols, cfg, nb_real)
        table = _codec._build_table(cfg, np.asarray(hist))
        if cfg.coded_runs:
            # second collective: psum the run histogram so every shard
            # derives the identical run table
            run_hist = global_run_histogram(symbols.runs, live, mesh)
            run_table = _codec._build_run_table(cfg, np.asarray(run_hist))
            run_lengths, run_codes = _codec._table_arrays(run_table)
        else:
            run_table = None
            run_lengths = run_codes = None
        lengths, codes = _codec._table_arrays(table)
        packed = _codec.encode_pack(
            symbols, cfg, n_stripes_p, lengths, codes, run_lengths, run_codes
        )

    # collective offsets (exercised + returned for the container writer)
    _ = stripe_byte_offsets(packed.bit_lengths, mesh)

    # container assembly happens on the host: under multi-process SPMD the
    # writer must first gather the shards living on other hosts. Gather the
    # tiny bit-lengths first and trim the units' worst-case slack on device
    # so the cross-host gather moves only payload-sized data (the same trim
    # bs.fetch_packed applies single-process).
    all_bits = _host_full(packed.bit_lengths)
    u_trim = bs.trim_units_count(all_bits, packed.units.shape[-1])
    packed = bs.PackedStripes(
        units=_host_full(packed.units[..., :u_trim]), bit_lengths=all_bits
    )
    stripes = bs.stripes_to_bytes(packed)[:n_stripes]
    return cont.PlaneData(
        width=w,
        height=h,
        table_lengths=table.lengths if table is not None else None,
        vmin=_codec.DIRECT_VMIN,
        variance_codes=(
            # bh_real, not bh: mesh-pad stripes exist only so the stripe
            # count divides the device count — their variance codes must
            # not leak into the container or bytes depend on the mesh
            _host_full(var_codes)[: bh_real * bw] if cfg.adaptive else None
        ),
        stripe_bits=np.asarray(packed.bit_lengths, np.uint32)[:n_stripes],
        stripes=stripes,
        run_table_lengths=(
            run_table.lengths if run_table is not None else None
        ),
    )


def _hist_fallback(symbols, cfg, nb_real: int):
    if cfg.use_huffman and cfg.huffman_mode == "direct":
        # mesh-pad stripes must not contaminate the value histogram either
        # (same mesh-shape-invariance reasoning as the category psum path):
        # zero their per-block symbol counts before histogramming
        counts = jnp.where(
            jnp.arange(symbols.values.shape[0]) < nb_real, symbols.counts, 0
        )
        return hf.value_histogram(
            symbols.values, counts, _codec.DIRECT_VMIN, -_codec.DIRECT_VMIN
        )
    return jnp.zeros(1, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_stripes", "mesh", "chroma")
)
def _encode_step_sharded(
    img, cfg: CodecConfig, n_stripes: int, mesh: Mesh, chroma: bool = False
):
    """shard_map'd static-table encode: each device packs ITS stripes.

    shard_map (not GSPMD auto-partitioning) is load-bearing twice over:
    (1) stripes are independent by design, but the staged packer's
    scatter-add has data-dependent indices, and the SPMD partitioner
    cannot prove they stay shard-local — it lowers a sharded scatter to
    scatter-into-replicated + all-reduce (2 x ~123 KB for a 16-stripe
    1080p plane, measured in tests/test_collectives.py). Inside
    shard_map the scatter is a plain single-device op. (2) a Mosaic
    kernel under GSPMD has no partitioning rules at all; under shard_map
    each device runs the fused kernel on its local stripe rows — the
    standard pallas-under-shard_map composition. Zero collectives
    either way (asserted by tests/test_collectives.py).
    """
    n_dev = mesh.shape[meshlib.STRIPE_AXIS]
    if n_stripes % n_dev:
        # a silent floor division would re-segment stripes wrongly
        # (encode_plane_sharded pre-pads, so it never trips this)
        raise ValueError(
            f"n_stripes={n_stripes} must divide over the {n_dev}-device "
            f"stripe axis"
        )
    local_stripes = n_stripes // n_dev
    ps_spec = bs.PackedStripes(
        units=P(meshlib.STRIPE_AXIS, None),
        bit_lengths=P(meshlib.STRIPE_AXIS),
    )
    out_specs = (ps_spec, P(meshlib.STRIPE_AXIS) if cfg.adaptive else None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(meshlib.STRIPE_AXIS, None),
        out_specs=out_specs,
        # jax 0.9's check_vma=True rejects pl.pallas_call outputs (their
        # ShapeDtypeStruct carries vma=None), and every TPU-backend path
        # in encode_step is Pallas (fused kernel / pack kernel). The body
        # is embarrassingly parallel — no cross-shard values to check.
        check_vma=False,
    )
    def f(local_img):
        return _codec.encode_step(local_img, cfg, local_stripes, chroma)

    return f(img)


def encode_image_sharded(
    image: np.ndarray, cfg: CodecConfig, mesh: Mesh
) -> bytes:
    """Full sharded encode -> container bytes (mesh-invariant).

    Grayscale (2D input, cfg.chroma == 'gray') or color (3D RGB input,
    cfg.chroma '444'/'420'): color containers carry three planes, each
    stripe-sharded independently, byte-identical to ColorImageCodec."""
    if cfg.chroma == "gray":
        plane = encode_plane_sharded(image, cfg, mesh)
        planes = [plane]
    else:
        from dct_tpu.models import color as _color

        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) RGB, got {image.shape}")
        y, cb, cr = _color._to_planes(
            jnp.asarray(image, jnp.uint8), cfg.chroma
        )
        planes = [
            encode_plane_sharded(np.asarray(y), cfg, mesh, chroma=False),
            encode_plane_sharded(np.asarray(cb), cfg, mesh, chroma=True),
            encode_plane_sharded(np.asarray(cr), cfg, mesh, chroma=True),
        ]
    c = cont.Container(
        config=cfg,
        width=int(image.shape[1]),
        height=int(image.shape[0]),
        planes=planes,
    )
    return cont.serialize(c)


def _decode_plane_sharded(
    p: cont.PlaneData, cfg: CodecConfig, mesh: Mesh, chroma: bool = False
) -> jax.Array:
    """One container plane -> u8 pixel plane on the mesh (row-sharded).

    Entropy decode runs on the host (per-stripe, C++ thread pool); the
    coefficient grid is placed with stripes over the mesh's stripe axis and
    ONE sharded dequant+IDCT dispatch reconstructs pixel rows in place — no
    cross-device traffic at all (8x8 blocks share no pixels, SURVEY.md
    section 5.7)."""
    from dct_tpu.models.codec import _decode_stripes, _padded_grid
    from dct_tpu.ops import quant

    bh, bw, n_stripes = _padded_grid(p.height, p.width, cfg)
    bps = (bh // n_stripes) * bw
    mode = cfg.huffman_mode if cfg.use_huffman else "none"
    table = hf.CanonicalTable(p.table_lengths) if mode != "none" else None
    run_table = (
        hf.CanonicalTable(p.run_table_lengths) if cfg.coded_runs else None
    )

    zz = _decode_stripes(
        p, cfg, table, mode, n_stripes, bps, run_table
    )  # (NB, n2)
    if cfg.dc_prediction:
        zz = _codec.dc_reconstruct(zz, n_stripes)
    block_sharding = NamedSharding(mesh, P(meshlib.STRIPE_AXIS, None))
    n_dev = mesh.shape[meshlib.STRIPE_AXIS]
    nb = zz.shape[0]
    pad = (-nb) % (n_dev * bps)
    if pad:  # replicate-edge blocks so the stripe axis divides the mesh
        zz = np.concatenate([zz, np.zeros((pad, zz.shape[1]), zz.dtype)])
    zz_dev = jax.device_put(jnp.asarray(zz), block_sharding)
    scale = None
    if cfg.adaptive:
        codes = np.asarray(p.variance_codes)
        if pad:
            codes = np.concatenate([codes, np.zeros(pad, codes.dtype)])
        scale = quant.scale_from_variance_code(
            jax.device_put(jnp.asarray(codes), NamedSharding(mesh, P(meshlib.STRIPE_AXIS)))
        )

    bh_tot = bh + pad // bw  # padded block rows (divisible by n_dev)
    step = _decode_step_sharded(cfg, mesh, bh_tot, bw, chroma,
                                with_scale=scale is not None)
    img = step(zz_dev, scale) if scale is not None else step(zz_dev)
    return img[: p.height, : p.width]


def _decode_step_sharded(
    cfg: CodecConfig, mesh: Mesh, bh_tot: int, bw: int, chroma: bool,
    with_scale: bool,
):
    """Jitted shard_map'd dequant+IDCT step: (NB, n2) coeffs (stripe-
    sharded) -> row-sharded u8 image of bh_tot x bw blocks.

    shard_map, not GSPMD sharding constraints: on the TPU backend
    _fused_decode is a Mosaic kernel, and a Pallas custom call has no
    GSPMD partitioning rules — the partitioner would replicate it (or
    reject it), exactly the failure mode the encode side documents.
    Blocks share no pixels, so each device reconstructs its own block
    rows and the output is row-sharded with zero collectives. Also
    exported chiplessly by benchmarks/mosaic_lowering_check.py."""
    from dct_tpu.models.codec import _fused_decode
    from dct_tpu.ops import blocks as blk

    n = cfg.block_size
    n_dev = mesh.shape[meshlib.STRIPE_AXIS]
    in_specs = (P(meshlib.STRIPE_AXIS, None),)
    if with_scale:
        in_specs += (P(meshlib.STRIPE_AXIS),)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(meshlib.STRIPE_AXIS, None),
        check_vma=False,  # Pallas out_shapes carry vma=None (see encode)
    )
    def step(z, s=None):
        px = _fused_decode(z, cfg, s, chroma)
        return blk.blocks_to_image(px, (bh_tot // n_dev) * n, bw * n, n)

    return step


def decode_image_sharded(data: bytes, mesh: Mesh) -> jax.Array:
    """Sharded decode: container bytes -> u8 pixels on the mesh.

    The mirror of encode_image_sharded. Grayscale containers return a
    row-sharded (H, W) plane; color containers decode each plane sharded,
    then upsample + YCbCr->RGB in one jitted dispatch (XLA inserts any
    resharding the differently-sized chroma grids need). np.asarray() the
    result to land on host."""
    c = cont.deserialize(data)
    cfg = c.config
    if cfg.chroma == "gray":
        return _decode_plane_sharded(c.planes[0], cfg, mesh)

    from dct_tpu.models import color as _color

    y = _decode_plane_sharded(c.planes[0], cfg, mesh, chroma=False)
    cb = _decode_plane_sharded(c.planes[1], cfg, mesh, chroma=True)
    cr = _decode_plane_sharded(c.planes[2], cfg, mesh, chroma=True)
    h, w = c.height, c.width

    @jax.jit
    def recombine(yy, b, r):
        return _color.planes_to_rgb(yy, b, r, cfg.chroma, h, w)

    return recombine(y, cb, cr)


# ---------------------------------------------------------------------------
# Batched multi-frame sharded encode (dp x sp) — the "training step" analog
# ---------------------------------------------------------------------------


def encode_batch_step(
    frames: jax.Array, cfg: CodecConfig, n_stripes: int, mesh: Mesh
):
    """One fully-jitted sharded step over a batch of frames.

    frames: (F, Hp, Wp) u8, sharded (data, stripe, -). Static tables.
    Returns PackedStripes batched over frames: units (F, S, U) and
    bit_lengths (F, S), sharded (data, stripe[, -]).

    This is the codec's equivalent of a sharded training step: pure SPMD
    compute + one collective family (none needed for static tables; the
    offset exchange happens in stripe_byte_offsets when assembling).
    """

    step = _batch_step(cfg, n_stripes, mesh)
    frames = jax.device_put(frames, meshlib.frame_sharding(mesh))
    return step(frames)


@functools.lru_cache(maxsize=None)
def _batch_step(cfg: CodecConfig, n_stripes: int, mesh: Mesh):
    """Jitted shard_map'd dp x sp step (cached per config/mesh; also
    lowered directly by tests/test_collectives.py to pin zero collectives
    in the compiled HLO — same reasoning as _encode_step_sharded)."""
    n_dev = mesh.shape[meshlib.STRIPE_AXIS]
    if n_stripes % n_dev:
        raise ValueError(
            f"n_stripes={n_stripes} must divide over the {n_dev}-device "
            f"stripe axis (a floor division would re-segment stripes)"
        )
    local_stripes = n_stripes // n_dev
    ps_spec = bs.PackedStripes(
        units=P(meshlib.DATA_AXIS, meshlib.STRIPE_AXIS, None),
        bit_lengths=P(meshlib.DATA_AXIS, meshlib.STRIPE_AXIS),
    )

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(meshlib.DATA_AXIS, meshlib.STRIPE_AXIS, None),
        out_specs=ps_spec,
        # see _encode_step_sharded: pallas_call under check_vma=True is
        # rejected on the TPU backend (vma=None out_shapes)
        check_vma=False,
    )
    def step(fr):
        packed, _ = jax.vmap(
            lambda im: _codec.encode_step(im, cfg, local_stripes)
        )(fr)
        return packed

    return step
