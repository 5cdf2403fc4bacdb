"""Lower the fused encode kernel for a TPU target WITHOUT a TPU.

`jax.export` with platforms=["tpu"] runs the jaxpr -> Mosaic-MLIR
generation (plus tpu-dialect verification and mosaic-serde) on the host,
so it catches the *lowering* class of Mosaic failures — unsupported
primitives, reshape/layout restrictions, dtype limits at op-build time —
for every pack-tier instantiation, even while the axon tunnel is down.

What it does NOT validate: the libtpu pass pipeline
(infer/apply-vector-layout, e.g. "Rotate with non-32-bit data" fires
there) and numerics. Those still need benchmarks/tpu_parity.py on the
real chip; this is the cheap front half of that check.

Usage: python benchmarks/mosaic_lowering_check.py

Exit 0 when every matrix cell lowers; prints one line per case.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

os.environ["DCT_TPU_FORCE_MOSAIC"] = "1"
# sharded cells trace shard_map over an 8-device mesh
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import export  # noqa: E402

sys.path.insert(0, ".")

from dct_tpu.config import CodecConfig  # noqa: E402
from dct_tpu.models import codec  # noqa: E402
from dct_tpu.ops import huffman as hf  # noqa: E402
from dct_tpu.ops import quant, transform  # noqa: E402
from dct_tpu.ops.fused_encode_pallas import encode_stripes_fused  # noqa: E402


def _try_lower(case: str, fn, *args) -> tuple[str, str] | None:
    """Export fn for a TPU target; print the outcome; return the failure
    (case, error) or None. The single export/serialize path every sweep
    cell goes through."""
    try:
        exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
        _ = exp.mlir_module_serialized
        print("LOWER-OK " + case, flush=True)
        return None
    except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
        print("FAIL " + case, flush=True)
        return (case, f"{type(e).__name__}: {e}")


def lower_case(block: int, mode: str, full: bool) -> tuple[str, str] | None:
    """One fused-kernel matrix cell. Returns _try_lower's result."""
    n2 = block * block
    adaptive = dc = runs = full
    runs = runs and block <= 8  # run-code alphabet covers runs 0..64 only
    use_h = mode != "none"
    cfg = CodecConfig(
        quality=30 if full else 50,
        block_size=block,
        adaptive=adaptive,
        use_huffman=use_h,
        huffman_mode=mode if use_h else "category",
        static_tables=use_h and mode == "category",
        coded_runs=runs,
        dc_prediction=dc,
    )
    n_stripes, bps = 3, 17
    nb = n_stripes * bps
    rng = np.random.default_rng(block)
    px = jnp.asarray(
        rng.integers(0, 256, (nb, n2)).astype(np.uint8))

    scale = None
    if adaptive:
        var = quant.block_variance_flat(transform.level_shift(px))
        scale = quant.scale_from_variance_code(quant.variance_code(var))

    vmin = 0
    if mode == "direct":
        t = hf.CanonicalTable.from_frequencies(
            np.ones(512, np.int64))  # shape-representative value table
        vmin = codec.DIRECT_VMIN
    else:
        t = hf.default_category_table(cfg.quality)
    lengths = jnp.asarray(t.lengths, jnp.int32)
    codes = jnp.asarray(t.codes.astype(np.int64), jnp.uint32)
    rl = rc = None
    if runs:
        rt = hf.default_run_table(cfg.quality)
        rl = jnp.asarray(rt.lengths, jnp.int32)
        rc = jnp.asarray(rt.codes.astype(np.int64), jnp.uint32)

    args = [px, lengths, codes]
    if scale is not None:
        args.append(scale)
    if rl is not None:
        args += [rl, rc]

    def fn(px, lengths, codes, *rest):
        i = 0
        sc = None
        if scale is not None:
            sc = rest[i]
            i += 1
        r_l = r_c = None
        if rl is not None:
            r_l, r_c = rest[i], rest[i + 1]
        return encode_stripes_fused(
            px, cfg, n_stripes, lengths, codes,
            adaptive_scale=sc, run_lengths=r_l, run_codes=r_c, vmin=vmin,
        )

    # label the features that are ACTUALLY enabled (runs is forced off at
    # block=16, so its full cell must not claim coded-runs coverage)
    feats = "+".join(
        n for n, on in (("adaptive", adaptive), ("dc", dc), ("runs", runs))
        if on
    ) or "plain"
    return _try_lower(f"N={block} mode={mode} {feats}", fn, *args)


def transform_kernel_cases() -> list[tuple[str, str] | None]:
    """The standalone transform/decode kernels bench.py and the decode
    scoreboard drive, plus the int8-experiment kernel (VERDICT r2 item 2),
    so the TPU-gated queue cannot die on a lowering error."""
    from dct_tpu.ops import transform_pallas as tpk

    results = []
    rng = np.random.default_rng(7)
    for block in (2, 4, 8):
        n2 = block * block
        for adaptive in (False, True):
            cfg = CodecConfig(quality=50, block_size=block,
                              adaptive=adaptive, static_tables=True)
            B = 3 * tpk.TILE_ROWS * (128 // n2) - 5
            px = jnp.asarray(
                rng.integers(0, 256, (B, n2)).astype(np.uint8))
            scale = None
            if adaptive:
                var = quant.block_variance_flat(transform.level_shift(px))
                scale = quant.scale_from_variance_code(
                    quant.variance_code(var))
            a = "adaptive" if adaptive else "plain"
            results.append(_try_lower(
                f"encode_blocks_pallas N={block} {a}",
                lambda p, s=None: tpk.encode_blocks_pallas(
                    p, cfg, adaptive_scale=s),
                *( (px, scale) if adaptive else (px,) )))
            zz = jnp.zeros((B, n2), jnp.int16)
            results.append(_try_lower(
                f"decode_blocks_pallas N={block} {a}",
                lambda z, s=None: tpk.decode_blocks_pallas(
                    z, cfg, adaptive_scale=s),
                *( (zz, scale) if adaptive else (zz,) )))
    # bench.py measure_mfu path: packed (rows, 128) IO, no layout copy
    cfg = CodecConfig(quality=50, static_tables=True)
    rows = 2 * tpk.TILE_ROWS
    pk = jnp.zeros((rows, 128), jnp.uint8)
    results.append(_try_lower(
        "encode_blocks_pallas 8x8 packed_io",
        lambda p: tpk.encode_blocks_pallas(p, cfg, packed_io=True), pk))
    # int8x3 digit-split kernel (the roofline experiment's TPU phase)
    from benchmarks.int8_experiment import build_run_int8

    run_int8, _ = build_run_int8(cfg, rows)
    results.append(_try_lower("int8x3 digit kernel", run_int8, pk))
    return results


def entropy_decode_cases() -> list[tuple[str, str] | None]:
    """The device entropy decoder (ops/entropy_decode_pallas.py): every
    mode x run-field combination plus the block-size extremes. The
    while_loop + per-lane roll distribute are the novel Mosaic surface
    here — exactly the constructs the interpret-mode tests can't vet."""
    from dct_tpu.ops import bitstream as bs
    from dct_tpu.ops import entropy_decode_pallas as edp

    results = []
    cases = [
        (8, "category", False),
        (8, "category", True),
        (8, "direct", True),
        (8, "none", False),
        (4, "category", False),
        (16, "category", False),
    ]
    for n, mode, runs in cases:
        n2 = n * n
        n_stripes, bps = 3, 20
        rng = np.random.default_rng(n)
        # shape-representative inputs: geometry/tables drive the trace,
        # stream CONTENT does not (fixed worst-case loop structure)
        bb = rng.integers(8, 64, (n_stripes, bps)).astype(np.int64)
        units = np.zeros((n_stripes, 1024), np.int32)
        if mode == "direct":
            t = hf.CanonicalTable.from_frequencies(np.ones(512, np.int64))
            vmin = codec.DIRECT_VMIN
        elif mode == "category":
            t = hf.default_category_table(50)
            vmin = 0
        else:
            t, vmin = None, 0
        rt = hf.default_run_table(50) if runs else None

        rtag = "+runs" if runs else ""
        case = f"entropy decode N={n} mode={mode}{rtag}"
        # decode_args is HOST prep (concrete geometry/tables); only
        # decode_call is traced — mirror the production split
        prep = edp.decode_args(
            units, bb, n_stripes, n2, mode, t, vmin=vmin,
            run_table=rt, run_bits=bs.run_field_bits(n2),
        )
        if prep is None:
            results.append((case, "decode_args declined a supported table"))
            continue
        arrays, statics = prep
        fn = functools.partial(edp.decode_call, **statics)
        results.append(_try_lower(case, fn, *arrays))
    return results


def sharded_cases() -> list[tuple[str, str] | None]:
    """shard_map'd Pallas steps (the round-3 check_vma crash class): the
    sharded static encode, the dp x sp batch step, and the sharded
    decode's in-shard_map _fused_decode, each exported for a TPU target
    over the 8-virtual-device mesh."""
    from dct_tpu.parallel import mesh as meshlib
    from dct_tpu.parallel import shard_encode

    results = []
    cfg = CodecConfig(quality=50, static_tables=True, use_pallas=True)
    mesh = meshlib.make_mesh()
    img = jnp.zeros((128, 96), jnp.uint8)
    results.append(_try_lower(
        "sharded encode step (shard_map + fused kernel)",
        lambda im: shard_encode._encode_step_sharded(im, cfg, 16, mesh),
        img))
    frames = jnp.zeros((2, 64, 64), jnp.uint8)
    bstep = shard_encode._batch_step(
        cfg, 8, meshlib.make_mesh(n_data=2, n_stripe=4)
    )
    results.append(_try_lower(
        "sharded dp x sp batch step", bstep, frames))
    # sharded decode step: 16 block rows x 12 block cols, one stripe per
    # block row over the 8-device stripe axis
    dstep = shard_encode._decode_step_sharded(
        cfg, mesh, bh_tot=16, bw=12, chroma=False, with_scale=False,
    )
    zz = jnp.zeros((16 * 12, 64), jnp.int16)
    results.append(_try_lower(
        "sharded decode step (shard_map + decode kernel)", dstep, zz))
    cfg_a = CodecConfig(quality=50, adaptive=True, use_pallas=True)
    dstep_a = shard_encode._decode_step_sharded(
        cfg_a, mesh, bh_tot=16, bw=12, chroma=False, with_scale=True,
    )
    scale = jnp.ones((16 * 12,), jnp.float32)
    results.append(_try_lower(
        "sharded decode step, adaptive", dstep_a, zz, scale))
    return results


def main() -> int:
    failures = []
    n = 0
    for block in (4, 8, 16):
        for mode in ("category", "direct", "none"):
            for full in (False, True):
                r = lower_case(block, mode, full)
                n += 1
                if r is not None:
                    failures.append(r)
    extra = (
        transform_kernel_cases() + entropy_decode_cases() + sharded_cases()
    )
    n += len(extra)
    failures += [r for r in extra if r is not None]
    for case, err in failures:
        print(f"--- {case}\n{err[:2000]}", file=sys.stderr)
    print(f"{n - len(failures)}/{n} lowered")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
