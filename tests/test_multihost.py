"""Two-process jax.distributed simulation of a multi-host encode
(SURVEY.md section 4's multi-host test strategy: multi-process pytest with
jax.distributed.initialize on localhost = 2-host DCN simulation).

Each worker process owns 4 virtual CPU devices; together they form one
8-device global mesh. Both run the SPMD sharded encode; the container each
assembles (after the cross-host gather in parallel/shard_encode._host_full)
must be byte-identical to a plain single-process encode. The dynamic-table
variant additionally routes the Huffman histogram psum across the process
boundary.
"""

from __future__ import annotations

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = pathlib.Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{{port}}", num_processes=2, process_id=pid)
assert len(jax.devices()) == 8, jax.devices()

from dct_tpu.config import CodecConfig
from dct_tpu.parallel import mesh as meshlib
from dct_tpu.parallel import shard_encode
from dct_tpu.utils import image_io

import numpy as np

img = image_io.synthetic_image(128, 160, "photo", seed=21)
rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], -1)
mesh = meshlib.make_mesh(n_data=1, n_stripe=8, devices=jax.devices())

for name, cfg, src in (
    ("static", CodecConfig(quality=60, static_tables=True), img),
    ("dynamic", CodecConfig(quality=60, adaptive=True), img),
    ("color", CodecConfig(quality=60, chroma="420", coded_runs=True,
                          dc_prediction=True), rgb),
):
    data = shard_encode.encode_image_sharded(src, cfg, mesh)
    with open(f"{{outdir}}/out_{{name}}_p{{pid}}.tpdc", "wb") as f:
        f.write(data)
print(f"worker {{pid}} done", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_encode_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=str(_REPO)))
    port = _free_port()

    env = dict(os.environ, PYTHONPATH=str(_REPO))
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            if "distributed" in out.lower() and "unimplemented" in out.lower():
                pytest.skip(f"jax.distributed unsupported here: {out[-500:]}")
            raise AssertionError(f"worker failed:\n{out[-3000:]}")

    # single-process references (this pytest process: 8 local devices)
    from dct_tpu.config import CodecConfig
    from dct_tpu.models import codec
    from dct_tpu.utils import image_io

    from dct_tpu.models.color import ColorImageCodec

    img = image_io.synthetic_image(128, 160, "photo", seed=21)
    rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], -1)
    for name, cfg, enc in (
        ("static", CodecConfig(quality=60, static_tables=True),
         lambda c: codec.ImageCodec(c).encode(img)),
        ("dynamic", CodecConfig(quality=60, adaptive=True),
         lambda c: codec.ImageCodec(c).encode(img)),
        ("color", CodecConfig(quality=60, chroma="420", coded_runs=True,
                              dc_prediction=True),
         lambda c: ColorImageCodec(c).encode(rgb)),
    ):
        want = enc(cfg)
        for pid in (0, 1):
            got = (tmp_path / f"out_{name}_p{pid}.tpdc").read_bytes()
            assert got == want, (
                f"{name}: process {pid} container differs from single-process "
                f"({len(got)} vs {len(want)} bytes)"
            )
        # both processes also assembled identical bytes
        rec = codec.decode(want)
        assert rec.shape == (rgb.shape if name == "color" else img.shape)
