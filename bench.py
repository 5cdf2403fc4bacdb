#!/usr/bin/env python
"""Headline benchmark: single-chip encode throughput (Mpix/s).

Workload: BASELINE.json config 2 shape — a batch of grayscale 1080p frames
through the FULL device encode pipeline (the fused Pallas stripe kernel:
DCT+quant+zigzag MXU matmul, RLE prefix scans, one-hot MXU bit-pack, static
category table).

Timing: the axon tunnel costs ~32 ms per dispatch (see
benchmarks/overhead.py), comparable to the work itself at this batch size.
The benchmark therefore jits the encode step inside an on-device
lax.fori_loop at two trip counts and reports the DELTA throughput
(T(K) - T(1)) / (K - 1) — pure chip time, dispatch overhead cancelled. The
loop perturbs the input each trip (XOR with the trip parity) so XLA cannot
hoist or CSE the body.

Baseline: the C reference has no benchmarks of its own (BASELINE.md), so
vs_baseline compares against the reference's own full encode pipeline
(oracle_encode_batch: DCT -> quantize -> RLE -> Huffman -> size estimate)
compiled at -O2 (more generous than its Justfile's -g) and driven in a
single C loop — measured on this host when the oracle builds, else the
recorded constant below.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured via oracle_encode_batch (-O2, single core, best-of-3) on the
# bench host; used only if the oracle cannot be built at bench time.
# (Round-1's 5.83 was a single contended timing; the uncontended oracle
# does ~13.9 Mpix/s, so vs_baseline ratios before round 2 ran high.)
C_REF_MPIX_S_FALLBACK = 13.9

FRAMES = 8
H, W = 1088, 1920  # 1080p padded to the 8-px grid (136 x 240 blocks)


def measure_c_baseline() -> float:
    try:
        from dct_tpu import oracle

        if not oracle.available():
            return C_REF_MPIX_S_FALLBACK
        rng = np.random.default_rng(0)
        px = rng.integers(0, 256, (20000, 8, 8)).astype(np.uint8)
        oracle.encode_batch(px[:500], 50)  # warmup
        # best-of-3: the 1-core bench host runs other processes, and a
        # single timing overstates the oracle's cost (vs_baseline jittered
        # 80-140x across otherwise-identical runs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            oracle.encode_batch(px, 50)
            best = min(best, time.perf_counter() - t0)
        return px.shape[0] * 64 / best / 1e6
    except Exception:
        return C_REF_MPIX_S_FALLBACK


def main() -> None:
    # Backend-init watchdog: with JAX_PLATFORMS=axon pinned and the tunnel
    # relay dead, jax backend init hangs FOREVER in make_c_api_client
    # (observed 2026-08-17: local relay ports closed). Fail fast and
    # diagnosably instead of eating the driver's whole bench budget.
    # 300 s >> normal init (~10 s); first KERNEL compiles happen later.
    import os as _os
    import sys as _sys
    import threading

    _init_done = threading.Event()

    def _watchdog():
        if not _init_done.wait(300):
            print(
                "fatal: jax backend init did not complete in 300 s — "
                "axon tunnel down? (TCP-probe 127.0.0.1:8082/8083)",
                file=_sys.stderr, flush=True,
            )
            _os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    jax.devices()  # force backend init under the watchdog
    _init_done.set()

    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.utils import image_io

    on_tpu = jax.default_backend() == "tpu"
    cfg = CodecConfig(quality=50, static_tables=True, use_pallas=on_tpu)
    n_stripes = H // 8  # one block row per stripe

    frames = np.stack(
        [image_io.synthetic_image(H, W, "photo", seed=s) for s in range(FRAMES)]
    )
    frames_dev = jnp.asarray(frames)

    def make_step(k: int):
        @jax.jit
        def run(fr):
            def body(i, acc):
                # every trip sees distinct data so no two loop bodies can
                # ever be CSE'd/collapsed by XLA (i & 1 would leave only
                # two unique bodies)
                f = fr ^ (i & 255).astype(jnp.uint8)
                packed = jax.vmap(
                    lambda im: codec.encode_step(im, cfg, n_stripes)
                )(f)[0]
                # Reduce on device: forces the full pipeline to execute
                # while the timed fetch stays 4 bytes (block_until_ready
                # alone under-reports through the axon relay, and fetching
                # the units buffer would time the host link, not the chip).
                return acc + jnp.sum(packed.bit_lengths)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    K = 9
    step1, stepk = make_step(1), make_step(K)

    def timed(fn, iters=6):
        float(fn(frames_dev))  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(frames_dev))  # scalar fetch = true device sync
        return (time.perf_counter() - t0) / iters

    # ---- DCT-kernel roofline fraction (the BASELINE.json north-star
    # metric): time the standalone transform kernel on the same content and
    # divide by the analytic ceiling min(MXU, HBM). The kernel runs the
    # split-operand form = 3 bf16 MXU passes (256 FLOP/px each); v5e peak
    # bf16 = 197 TFLOPS (394 is int8), HBM 819 GB/s at 3 B/px.
    def measure_mfu() -> float:
        from dct_tpu.ops import transform_pallas as tpk
        from dct_tpu.ops import blocks as blk

        px = jax.vmap(lambda im: blk.image_to_blocks(im, 8))(frames_dev)
        # double the workload so the K-loop delta dwarfs the ~2 ms tunnel
        # dispatch jitter (the kernel body is ~0.2 ms at 33 Mpix); packed
        # (rows, 128) layout so the measurement times the KERNEL, not the
        # (B, 64) output-layout copy XLA adds outside the fused path
        px = jnp.concatenate([px, px]).reshape(-1, 128)
        n_rows = px.shape[0]  # unpadded: TILE_ROWS pad is not throughput
        rows = -(-n_rows // tpk.TILE_ROWS) * tpk.TILE_ROWS
        px = jnp.pad(px, ((0, rows - n_rows), (0, 0)))

        # ONE K-loop harness for both kernel paths (harness hygiene per
        # benchmarks/dct_experiments.py: an optimization_barrier threaded
        # through the carry pins the kernel in the loop with no extra
        # memory traffic — an XOR-perturbation pass + full-output sum
        # would more than double the kernel's own HBM bytes and measure
        # the HARNESS — and only a 64-value slice is consumed). Shared so
        # mfu and mfu_wrapper stay methodologically comparable.
        #
        # Estimator (reworked round 5 — BENCH_r04 shipped mfu=1.182 > 1.0,
        # which is physically impossible and showed mean-of-4 at two trip
        # counts still passes tunnel/host jitter through): THREE trip
        # counts, min-of-6 per count (min is the right statistic against
        # strictly-additive host/tunnel noise), a delta per (k_i, k_j)
        # pair, median of the three deltas as the estimate and the
        # (min, max) pair spread reported alongside.
        def kernel_delta(arr, kernel_fn):
            def make_k(k):
                @jax.jit
                def run(p):
                    def body(i, acc):
                        pi, _ = jax.lax.optimization_barrier((p, acc))
                        zz = kernel_fn(pi)
                        # barrier the FULL output before slicing: without
                        # it XLA slices BEFORE the wrapper's post-kernel
                        # reshape/layout copy and DCEs the very copy
                        # mfu_wrapper exists to expose (found 2026-08-19;
                        # earlier mfu_wrapper values under-reported the
                        # gap — see BASELINE.md wrapper-layout section)
                        zzb, _ = jax.lax.optimization_barrier((zz, acc))
                        return acc + jnp.sum(zzb[:1].astype(jnp.int32))

                    return jax.lax.fori_loop(0, k, body, jnp.int32(0))

                return run

            def timed_a(fn):
                float(fn(arr))  # compile + warmup
                best = float("inf")
                for _ in range(6):
                    t0 = time.perf_counter()
                    float(fn(arr))
                    best = min(best, time.perf_counter() - t0)
                return best

            ks = (9, 69, 129)  # every pair delta >> the ~2 ms jitter
            ts = [timed_a(make_k(k)) for k in ks]
            deltas = sorted(
                (ts[j] - ts[i]) / (ks[j] - ks[i])
                for i in range(len(ks))
                for j in range(i + 1, len(ks))
                if ts[j] > ts[i]
            )
            if not deltas:
                return float("nan"), (float("nan"), float("nan"))
            mid = deltas[len(deltas) // 2]
            return mid, (deltas[0], deltas[-1])

        dt_k, (dt_lo, dt_hi) = kernel_delta(
            px, lambda p: tpk.encode_blocks_pallas(p, cfg, packed_io=True)
        )
        mxu_bound = 197e12 / (256 * 3) / 1e9  # Gpix/s
        hbm_bound = 819e9 / 3.0 / 1e9
        ceiling = min(mxu_bound, hbm_bound)
        if dt_k != dt_k:
            return float("nan"), (float("nan"),) * 2, float("nan")
        gpix = n_rows * 128 / dt_k / 1e9  # UNPADDED rows: 128 px/row
        # pair spread as roofline fractions (hi delta = slow = low mfu)
        spread = tuple(
            n_rows * 128 / d / 1e9 / ceiling for d in (dt_hi, dt_lo)
        )

        # ALSO time the production (B, 64) wrapper, which pays the XLA
        # layout-changing copy for i16 minor-dim-64 outputs (CLAUDE.md).
        # The fused production path never materializes that layout, so
        # `mfu` stays the bare-kernel figure — but the wrapper number
        # rides in the JSON so the gap stays visible (VERDICT r2 weak #5).
        px64 = px.reshape(-1, 64)
        dt_w, _ = kernel_delta(
            px64,
            # the production staged sequence (codec._fused_encode):
            # int32 straight from the kernel epilogue
            lambda p: tpk.encode_blocks_pallas(p, cfg, out_dtype=jnp.int32),
        )
        if dt_w != dt_w:
            wrap_frac = float("nan")
        else:
            # same UNPADDED numerator as the bare kernel: TILE_ROWS pad
            # is work the kernel does but not throughput
            wrap_frac = (n_rows * 128 / dt_w / 1e9) / ceiling
        return gpix / ceiling, spread, wrap_frac

    # ---- e2e decode throughput (VERDICT r3 item 4): host entropy decode
    # (native C++ when built) + device dequant+IDCT, pixels left on device
    # (the decode_to_device consumer path). The per-frame device sums are
    # fetched only after every frame is dispatched, so the ~32 ms tunnel
    # round trips overlap the host entropy decode of subsequent frames.
    #
    # Through the axon tunnel this number is dominated by the 4.2 MB/frame
    # int16 coefficient UPLOAD (the tunnel is the host link CLAUDE.md warns
    # about), so the codec's own work is reported alongside as
    # decode_host_value: the host entropy-decode half, which on any
    # direct-attached (PCIe) host is the bound — the device dequant+IDCT
    # half runs at 46-100 Gpix/s (benchmarks/decode.py).
    def measure_decode() -> tuple[float, float, float]:
        from dct_tpu import container as cont

        datas = [
            codec.ImageCodec(cfg).encode(np.asarray(f)) for f in frames
        ]
        dec = codec.ImageCodec(cfg)

        def once() -> None:
            sums = [
                jnp.sum(dec.decode_to_device(d).astype(jnp.uint32))
                for d in datas
            ]
            for s in sums:
                float(s)  # scalar fetch = true device sync

        once()  # compile + warm native decoder
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            once()
            best = min(best, time.perf_counter() - t0)
        e2e = FRAMES * H * W / best / 1e6

        # indexed containers (container v2): the entropy stage runs ON
        # DEVICE (ops/entropy_decode_pallas.py) — nothing but container
        # bytes crosses the host link, so this is the tunnel-honest
        # on-device decode number the host path can't reach
        dev_e2e = float("nan")
        if on_tpu:
            cfg_ix = cfg.replace(decode_index=True)
            datas_ix = [
                codec.ImageCodec(cfg_ix).encode(np.asarray(f))
                for f in frames
            ]
            dec_ix = codec.ImageCodec(cfg_ix)

            def once_ix() -> None:
                sums = [
                    jnp.sum(dec_ix.decode_to_device(d).astype(jnp.uint32))
                    for d in datas_ix
                ]
                for s in sums:
                    float(s)

            # the number is only meaningful if the kernel decodes
            # correctly — round 4's figure timed a kernel that produced
            # garbage for every block past lane 128 of a stripe (the
            # multi-chunk window bug), and the sum-only harness hid it
            dev_px = np.asarray(dec_ix.decode_to_device(datas_ix[0]))
            # use_pallas=False forces the host entropy decoder (einsum
            # IDCT — byte-identical to the Pallas one, a tested invariant)
            host_px = np.asarray(
                codec.ImageCodec(cfg_ix.replace(use_pallas=False)).decode(
                    datas_ix[0]
                )
            )
            assert np.array_equal(dev_px, host_px), (
                "device decode != host decode — not benchmarking this"
            )

            once_ix()  # compile (first decode-kernel shape: ~1-3 min)
            best_ix = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                once_ix()
                best_ix = min(best_ix, time.perf_counter() - t0)
            dev_e2e = FRAMES * H * W / best_ix / 1e6

        # host half alone (entropy decode to coefficients, no upload):
        # deserialize + table/geometry reconstruction outside the timed
        # region — the point is to isolate the per-symbol decode loop the
        # C++ decoder owns (same framing as benchmarks/decode.py)
        from dct_tpu.models import recovery

        parsed = [cont.deserialize(d) for d in datas]
        p0 = parsed[0].planes[0]
        ccfg = parsed[0].config
        # frame 0's table is reused for every frame below — only sound
        # with static tables (ADVICE r3: guard, don't assume)
        assert ccfg.static_tables, "decode_host loop assumes static tables"
        _, _, n_stripes, bps = recovery._geometry(p0, ccfg)
        mode, table, run_table = recovery._table(p0, ccfg)
        best_h = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for c in parsed:
                codec._decode_stripes(
                    c.planes[0], ccfg, table, mode, n_stripes, bps, run_table
                )
            best_h = min(best_h, time.perf_counter() - t0)
        return e2e, dev_e2e, FRAMES * H * W / best_h / 1e6

    # measure the kernel roofline BEFORE the sustained encode loops — the
    # ordering measurably affects kernel timings through the shared chip
    if on_tpu:
        mfu, mfu_spread, mfu_wrapper = measure_mfu()
    else:
        mfu, mfu_spread, mfu_wrapper = (
            float("nan"), (float("nan"),) * 2, float("nan")
        )
    decode_mpix, decode_dev_mpix, decode_host_mpix = measure_decode()

    t1, tk = timed(step1), timed(stepk)
    if tk <= t1:
        # noise-dominated delta: fall back to the conservative single-
        # dispatch time (includes ~32 ms tunnel overhead) rather than
        # printing a nonsense number
        import sys as _s

        print("warning: K-loop delta <= 0 (dispatch jitter); reporting "
              "single-dispatch throughput incl. overhead", file=_s.stderr)
        dt = t1
    else:
        dt = (tk - t1) / (K - 1)

    pixels = FRAMES * H * W
    mpix = pixels / dt / 1e6
    baseline = measure_c_baseline()
    out = {
        "metric": "encode_throughput_1080p_batch",
        "value": round(mpix, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix / baseline, 2),
    }
    if mfu == mfu:  # not NaN
        # roofline fraction of the standalone DCT kernel (north-star
        # metric; the headline encode above is entropy/pack-bound).
        # A fraction > 1.0 is PHYSICALLY IMPOSSIBLE (BENCH_r04 shipped
        # 1.182 from a jitter-passing estimator): flag it as invalid
        # instead of printing it as a result.
        if mfu > 1.0:
            out["mfu_invalid"] = round(mfu, 3)
        else:
            out["mfu"] = round(mfu, 3)
        if mfu_spread[0] == mfu_spread[0]:
            # (lo, hi) roofline fractions across the three pair deltas
            out["mfu_spread"] = [round(f, 3) for f in mfu_spread]
    if mfu_wrapper == mfu_wrapper:
        # same kernel through the production (B, 64) wrapper, which pays
        # XLA's i16 minor-dim-64 layout copy (kept visible on purpose)
        out["mfu_wrapper"] = round(mfu_wrapper, 3)
    if decode_mpix == decode_mpix:
        out["decode_value"] = round(decode_mpix, 2)
        out["decode_unit"] = "Mpix/s"
    if decode_dev_mpix == decode_dev_mpix:
        # fully on-device decode (container v2 decode index): the Pallas
        # entropy decoder replaces the host loop + coefficient upload
        out["decode_device_value"] = round(decode_dev_mpix, 2)
    if decode_host_mpix == decode_host_mpix:
        # the codec's own decode work (host entropy half); the e2e
        # decode_value above is upload-bound through the axon tunnel
        out["decode_host_value"] = round(decode_host_mpix, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
