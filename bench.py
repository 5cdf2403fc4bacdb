#!/usr/bin/env python
"""Headline benchmark: single-chip encode throughput (Mpix/s).

Workload: BASELINE.json config 2 shape — a batch of grayscale 1080p frames
through the FULL device encode pipeline (fused Pallas DCT+quant+zigzag
matmul, RLE prefix scans, scatter bit-pack, static category table), timed
with block_until_ready.

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

# Measured via oracle_encode_batch (-O2, single core) on the round-1 bench
# host; used only if the oracle cannot be built at bench time.
C_REF_MPIX_S_FALLBACK = 5.83

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
        t0 = time.perf_counter()
        oracle.encode_batch(px, 50)
        dt = time.perf_counter() - t0
        return px.shape[0] * 64 / dt / 1e6
    except Exception:
        return C_REF_MPIX_S_FALLBACK


def main() -> None:
    import jax
    import jax.numpy as jnp

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

    @jax.jit
    def step(fr):
        packed, _ = jax.vmap(lambda im: codec.encode_step(im, cfg, n_stripes))(fr)
        # Reduce on device: forces the full pipeline to execute while the
        # timed fetch stays 4 bytes (block_until_ready alone under-reports
        # through the axon relay, and fetching the full units buffer would
        # time the host link instead of the chip).
        return jnp.sum(packed.units), jnp.sum(packed.bit_lengths)

    float(step(frames_dev)[1])  # compile + warmup
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(frames_dev)
        float(out[1])  # scalar fetch = true device sync
    dt = (time.perf_counter() - t0) / iters

    pixels = FRAMES * H * W
    mpix = pixels / dt / 1e6
    baseline = measure_c_baseline()
    print(
        json.dumps(
            {
                "metric": "encode_throughput_1080p_batch",
                "value": round(mpix, 2),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(mpix / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
